"""Gather micro-bench v2: serialize iterations with data dependencies and
fetch a scalar to host each run, so tunnel/async dispatch can't hide work.
Also calibrate against a plain HBM copy of known cost."""
import os, sys, time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

N = 1 << 20
NX = NY = 512
F = 5
ITERS = 20


def bench(label, step, init, bytes_moved=None, idx_count=None):
    """step: (carry) -> carry, jitted; chains ITERS times, host-fetch at end."""
    carry = init
    carry = step(carry)  # warmup/compile
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    c = init
    for _ in range(ITERS):
        c = step(c)
    jax.block_until_ready(c)
    # force host sync
    _ = np.asarray(jax.tree_util.tree_leaves(c)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS
    extra = ""
    if bytes_moved:
        extra += f", {bytes_moved/dt/1e9:.0f} GB/s"
    if idx_count:
        extra += f", {dt/idx_count*1e9:.2f} ns/idx"
    print(f"{label}: {dt*1e3:.3f} ms{extra}")
    return dt


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    fields = jnp.asarray(rng.standard_normal((F, NY, NX)), jnp.float32)
    idx0 = jnp.asarray(rng.integers(0, NY * NX, N), jnp.int32)
    big = jnp.asarray(rng.standard_normal((64, 1024, 1024)), jnp.float32)  # 256MB

    # calibration: 256MB copy (read+write = 512MB traffic)
    @jax.jit
    def copy_step(x):
        return x + 1.0
    bench("copy 256MB (r+w 512MB)", copy_step, big, bytes_moved=512e6)

    # per-tap 2-D take: chain by feeding output back into indices
    @jax.jit
    def per_tap(carry):
        idx, acc = carry
        flat = fields.reshape(F, NY * NX)
        out = 0.0
        for t in range(4):
            out = out + jnp.take(flat, (idx + t) % (NY * NX), axis=1)
        # new idx depends on out -> serializes iterations
        idx2 = (idx + out[0].astype(jnp.int32)) % (NY * NX)
        return idx2, acc + out[0, 0]
    bench("per-tap axis=1 take x4", per_tap, (idx0, jnp.float32(0)),
          idx_count=4 * N)

    # fused flat take
    @jax.jit
    def fused(carry):
        idx, acc = carry
        flat = fields.reshape(F * NY * NX)
        offs = (jnp.arange(F, dtype=jnp.int32) * (NY * NX))[:, None, None]
        taps = jnp.stack([(idx + t) % (NY * NX) for t in range(4)])
        bigidx = (taps[None] + offs).reshape(-1)
        g = jnp.take(flat, bigidx).reshape(F, 4, N)
        out = g.sum(axis=(0, 1))
        idx2 = (idx + out.astype(jnp.int32)) % (NY * NX)
        return idx2, acc + out[0]
    bench("fused flat take (20M idx)", fused, (idx0, jnp.float32(0)),
          idx_count=20 * N)

    # patch row take
    from juliaraytracingsw_tpu.rays.patch import build_patch_table
    table = jax.jit(build_patch_table, static_argnames="method")(fields)
    jax.block_until_ready(table)

    @jax.jit
    def rowtake(carry):
        idx, acc = carry
        rows = jnp.take(table, idx, axis=0)        # (N, 80)
        out = rows.sum(axis=1)
        idx2 = (idx + out.astype(jnp.int32)) % (NY * NX)
        return idx2, acc + out[0]
    bench("patch row take (1M idx, row=80)", rowtake, (idx0, jnp.float32(0)),
          bytes_moved=N * 80 * 4, idx_count=N)

    # patch table build
    @jax.jit
    def build(carry):
        f2, acc = carry
        T = build_patch_table(f2)
        return f2 + T[0, 0], acc + T[0, 0]
    bench("build_patch_table 4x4x5 @512^2", build, (fields, jnp.float32(0)),
          bytes_moved=(16 + 1) * 5 * NX * NY * 4)

    # gather via one-hot matmul on 128-wide blocks? skip (R too large).

    # dynamic_slice-based per-packet? skip.

    # row take with row width 8 / 16 / 128
    for W in (8, 128, 256):
        tW = jnp.asarray(rng.standard_normal((NY * NX, W)), jnp.float32)

        @jax.jit
        def rt(carry, tW=tW, W=W):
            idx, acc = carry
            rows = jnp.take(tW, idx, axis=0)
            out = rows.sum(axis=1)
            idx2 = (idx + out.astype(jnp.int32)) % (NY * NX)
            return idx2, acc + out[0]
        bench(f"row take width={W}", rt, (idx0, jnp.float32(0)),
              bytes_moved=N * W * 4, idx_count=N)


if __name__ == "__main__":
    main()
