"""Micro-benchmark: gather strategies for the ray hot path on real TPU.

Hypothesis (VERDICT round-1 regression diagnosis): XLA lowers scattered
jnp.take on TPU to a serial per-index loop (~13 ns/index) where up to 128
lanes of row width ride free with each index. Then:

  - fused flat take (current bilinear): 20 idx/packet/stage  -> slow (r01 bench)
  - per-tap axis=1 take (c1a373b):       4 idx/packet/stage  -> 5.26M rays/s
  - patch-table row take:                1 idx/packet/LEVEL  -> ~7x better
  - pallas VMEM-resident gather:         ?

Run: python benchmarks/profiling/prof_gather_variants.py
"""
import os, sys, time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

N = 1 << 20          # 1M packets
NX = NY = 512
F = 5


def timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    fields = jnp.asarray(rng.standard_normal((F, NY, NX)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, NY * NX, N), jnp.int32)
    iy = idx // NX
    ix = idx % NX

    # 1) per-tap 2-D take axis=1 (c1a373b path), x4 taps
    @jax.jit
    def per_tap(fields, idx):
        flat = fields.reshape(F, NY * NX)
        out = 0.0
        for t in range(4):
            out = out + jnp.take(flat, (idx + t) % (NY * NX), axis=1)
        return out

    t = timeit(per_tap, fields, idx)
    print(f"per-tap axis=1 take (4 taps x {N} idx, row={F}): {t*1e3:.2f} ms "
          f"-> {4*N/t/1e9:.2f} Gidx/s, {t/4/N*1e9:.2f} ns/idx")

    # 2) fused flat take (current path): 20M indices
    @jax.jit
    def fused_flat(fields, idx):
        flat = fields.reshape(F * NY * NX)
        offs = (jnp.arange(F, dtype=jnp.int32) * (NY * NX))[:, None, None]
        taps = jnp.stack([(idx + t) % (NY * NX) for t in range(4)])
        big = (taps[None] + offs).reshape(-1)
        return jnp.take(flat, big).reshape(F, 4, N)

    t = timeit(fused_flat, fields, idx)
    print(f"fused flat take ({F*4*N} idx): {t*1e3:.2f} ms "
          f"-> {t/(F*4*N)*1e9:.2f} ns/idx")

    # 3) patch-table row take: table (NY*NX, 80), 1M row indices
    from juliaraytracingsw_tpu.rays.patch import build_patch_table

    table = jax.jit(build_patch_table, static_argnames="method")(fields)
    jax.block_until_ready(table)
    print("patch table shape:", table.shape)

    t_build = timeit(jax.jit(build_patch_table, static_argnames="method"), fields)
    print(f"build_patch_table: {t_build*1e3:.2f} ms")

    @jax.jit
    def row_take(table, idx):
        return jnp.take(table, idx, axis=0)

    t = timeit(row_take, table, idx)
    print(f"patch row take ({N} idx, row={table.shape[1]}): {t*1e3:.2f} ms "
          f"-> {t/N*1e9:.2f} ns/idx, {N*table.shape[1]*4/t/1e9:.1f} GB/s")

    # 3b) row take from (R, 128) padded table
    table128 = jnp.pad(table, ((0, 0), (0, 128 - table.shape[1])))
    t = timeit(row_take, table128, idx)
    print(f"patch row take row=128: {t*1e3:.2f} ms -> {t/N*1e9:.2f} ns/idx, "
          f"{N*128*4/t/1e9:.1f} GB/s")

    # 3c) row take with SORTED indices (locality)
    idx_sorted = jnp.sort(idx)
    t = timeit(row_take, table, idx_sorted)
    print(f"patch row take sorted idx: {t*1e3:.2f} ms -> {t/N*1e9:.2f} ns/idx")

    # 4) single flat take 1M idx (row width 1) for calibration
    @jax.jit
    def flat1(fields, idx):
        return jnp.take(fields.reshape(-1), idx)

    t = timeit(flat1, fields, idx)
    print(f"flat take 1M idx row=1: {t*1e3:.2f} ms -> {t/N*1e9:.2f} ns/idx")

    # 5) pallas kernel: fields resident in VMEM, take inside kernel
    try:
        from juliaraytracingsw_tpu.ops.pallas_interp import ray_rhs_pallas
        x = jnp.asarray(rng.uniform(0, 2 * np.pi, N), jnp.float32)
        y = jnp.asarray(rng.uniform(0, 2 * np.pi, N), jnp.float32)
        k = jnp.ones(N, jnp.float32) * 5.0
        l = jnp.zeros(N, jnp.float32)
        sgn = jnp.ones(N, jnp.float32)
        dxg = 2 * np.pi / NX
        fn = lambda: ray_rhs_pallas(x, y, k, l, sgn, fields, x0=0.0, y0=0.0,
                                    dxg=dxg, dyg=dxg, f=3.0, Cg=1.0)
        t = timeit(lambda *_: fn(), warmup=1, iters=5)
        print(f"pallas ray_rhs (VMEM fields, 4x5 takes in-kernel): {t*1e3:.2f} ms "
              f"-> per-stage rays/s {N/t/1e6:.1f}M")
    except Exception as e:
        print("pallas ray_rhs failed:", repr(e)[:500])


if __name__ == "__main__":
    main()
