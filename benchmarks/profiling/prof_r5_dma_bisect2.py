"""Bisect round 2: k5 (round-robin per-row DMA) passed at lane width 128 /
16-iteration loops; the real probes failed at width 160 / 8192 iterations.
Cross the two factors, and time whatever compiles at scale."""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

R = 1 << 18
rng = np.random.default_rng(0)
print("device:", jax.devices()[0], flush=True)


def timeit_unique(fn, iters=3):
    cs = [jnp.int32(i + 1) for i in range(iters + 2)]
    jax.block_until_ready(fn(cs[0]))
    jax.block_until_ready(fn(cs[1]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(cs[i + 2])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def make_case(W, n_iter, K, grid_n, dtype=jnp.float32):
    tab = jnp.asarray(rng.standard_normal((R, W)), dtype)

    def kern(x_hbm, o_ref, sems):
        blk = pl.program_id(0)
        base = blk * n_iter

        def issue(i):
            r = ((base + i) * 40503 + 12345) % R
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(r, 1), :],
                o_ref.at[pl.ds(i % (2 * K), 1), :],
                sems.at[i % K])

        def body(i, _):
            @pl.when(i >= K)
            def _():
                issue(i - K).wait()
            issue(i).start()
            return 0

        jax.lax.fori_loop(0, n_iter, body, 0)

        def drain(i, _):
            issue(n_iter - K + i).wait()
            return 0

        jax.lax.fori_loop(0, K, drain, 0)

    call = pl.pallas_call(
        kern, grid=(grid_n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((2 * K, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * K, W), dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    @jax.jit
    def run(c):
        return call(tab + 0.0 * c.astype(dtype))

    return run


CASES = [
    ("W=128 it=16   g=8  K=4 ", 128, 16, 4, 8, jnp.float32),
    ("W=160 it=16   g=8  K=4 ", 160, 16, 4, 8, jnp.float32),
    ("W=128 it=8192 g=16 K=8 ", 128, 8192, 8, 16, jnp.float32),
    ("W=160 it=8192 g=16 K=8 ", 160, 8192, 8, 16, jnp.float32),
    ("W=128 it=8192 g=16 K=32", 128, 8192, 32, 16, jnp.float32),
    ("W=160b it=8192 g=16 K=8", 160, 8192, 8, 16, jnp.bfloat16),
]
for name, W, it, K, g, dt in CASES:
    try:
        fn = make_case(W, it, K, g, dt)
        t = timeit_unique(fn)
        rows = it * g
        print(f"{name}: OK {t*1e3:8.2f} ms for {rows} rows "
              f"({t/rows*1e9:6.1f} ns/row)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:130]}",
              flush=True)

print("done", flush=True)
