"""Round-5 probe v2: per-row DMA issue rate, Mosaic-compatible forms.

v1 (prof_r5_dma_probe.py) failed remote-compile with 1-D `.at[r]` row DMAs;
this version tries (a) 2-D `pl.ds(r, 1)` slices, (b) real scattered indices
staged HBM->SMEM per block (the form the production kernel would need), and
(c) Q consecutive rows per DMA (descriptor-count vs bytes).
"""
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
W2 = 160
rng = np.random.default_rng(0)


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


print("device:", jax.devices()[0], flush=True)
T32 = jnp.asarray(rng.standard_normal((R, W2)), jnp.float32)
ROWS = 1 << 17


# ---- (a) synthetic-index per-row DMA, 2-D slice form ----------------------
def kern_a(hbm_ref, out_ref, sems, *, rows_per_blk, K, Q):
    blk = pl.program_id(0)
    base = blk * rows_per_blk

    def issue(i):
        r = ((base + i) * 40503 + 12345) % (R - Q)
        slot = i % K
        return pltpu.make_async_copy(
            hbm_ref.at[pl.ds(r, Q), :],
            out_ref.at[pl.ds((i % (2 * K)) * Q, Q), :],
            sems.at[slot])

    def body(i, _):
        @pl.when(i >= K)
        def _():
            issue(i - K).wait()
        issue(i).start()
        return 0

    n_dma = rows_per_blk // Q
    jax.lax.fori_loop(0, n_dma, body, 0)

    def drain(i, _):
        issue(n_dma - K + i).wait()
        return 0

    jax.lax.fori_loop(0, K, drain, 0)


def make_a(K, Q):
    call = pl.pallas_call(
        lambda h, o, s: kern_a(h, o, s, rows_per_blk=8192, K=K, Q=Q),
        grid=(ROWS // 8192,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((2 * K * Q, W2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * K * Q, W2), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    @jax.jit
    def run(c):
        return call(T32 + 0.0 * c.astype(jnp.float32))

    return run


for K, Q in ((8, 1), (32, 1), (8, 8), (8, 32)):
    try:
        t = timeit_unique(make_a(K, Q))
        rows = ROWS
        print(f"(a) 2D-slice DMA K={K:2d} Q={Q:2d}: {t*1e3:7.2f} ms for "
              f"{rows} rows ({t/rows*1e9:6.1f} ns/row)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"(a) K={K} Q={Q}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)


# ---- (b) real scattered indices staged HBM->SMEM --------------------------
idx_np = rng.integers(0, R, ROWS).astype(np.int32)
IDX = jnp.asarray(idx_np)


def kern_b(idx_hbm, tab_hbm, out_ref, idx_smem, sems, isem, *,
           rows_per_blk, K):
    blk = pl.program_id(0)
    pltpu.make_async_copy(
        idx_hbm.at[pl.ds(blk * rows_per_blk, rows_per_blk)],
        idx_smem, isem).start()
    pltpu.make_async_copy(
        idx_hbm.at[pl.ds(blk * rows_per_blk, rows_per_blk)],
        idx_smem, isem).wait()

    def issue(i):
        r = idx_smem[i]
        return pltpu.make_async_copy(
            tab_hbm.at[pl.ds(r, 1), :],
            out_ref.at[pl.ds(i % (2 * K), 1), :],
            sems.at[i % K])

    def body(i, _):
        @pl.when(i >= K)
        def _():
            issue(i - K).wait()
        issue(i).start()
        return 0

    jax.lax.fori_loop(0, rows_per_blk, body, 0)

    def drain(i, _):
        issue(rows_per_blk - K + i).wait()
        return 0

    jax.lax.fori_loop(0, K, drain, 0)


def make_b(K):
    call = pl.pallas_call(
        lambda i_, t_, o_, s_, ss_, is_: kern_b(
            i_, t_, o_, s_, ss_, is_, rows_per_blk=8192, K=K),
        grid=(ROWS // 8192,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((2 * K, W2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * K, W2), jnp.float32),
        scratch_shapes=[pltpu.SMEM((8192,), jnp.int32),
                        pltpu.SemaphoreType.DMA((K,)),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    @jax.jit
    def run(c):
        return call(IDX, T32 + 0.0 * c.astype(jnp.float32))

    return run


for K in (8, 32):
    try:
        t = timeit_unique(make_b(K))
        print(f"(b) SMEM-idx DMA K={K:2d}: {t*1e3:7.2f} ms for {ROWS} rows "
              f"({t/ROWS*1e9:6.1f} ns/row)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"(b) K={K}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)

print("done", flush=True)
