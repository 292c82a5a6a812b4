"""Probe: can Mosaic do a fast vectorized gather from VMEM?

NOTE: the axon tunnel serves cached results when all executable args are
host-uploaded arrays, so every probe must consume a DEVICE-PRODUCED input
(jit(x*1.0)) to measure true execution time.
"""
import os, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


nx = ny = 512
N = 1 << 20
rng = np.random.default_rng(0)
_table = jnp.asarray(rng.standard_normal(ny * nx), jnp.float32)
_idx = jnp.asarray(rng.integers(0, nx * ny, N), jnp.int32)
# defeat the tunnel result cache: device-produced copies
table = jax.block_until_ready(jax.jit(lambda a: a * 1.0)(_table))
idx = jax.block_until_ready(jax.jit(lambda a: a + 0)(_idx))

# baseline: plain XLA take (true cost)
t = timeit(jax.jit(jnp.take), table, idx)
print(f"XLA take 1M (true)       : {t*1e3:8.2f} ms")

# pallas variant 1: whole table in VMEM, idx blocked 2-D (8, 128)*k
def k1(idx_ref, tab_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

BR, BC = 256, 512   # block of 256x512 = 128k indices
@jax.jit
def g1(idx2d, tab):
    R, C = idx2d.shape
    return pl.pallas_call(
        k1,
        grid=(R // BR,),
        in_specs=[pl.BlockSpec((BR, BC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, BC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
    )(idx2d, tab)

idx2d = idx.reshape(-1, BC)
try:
    t = timeit(g1, idx2d, table)
    ok = np.asarray(g1(idx2d, table)).reshape(-1)
    ref = np.asarray(_table)[np.asarray(_idx)]
    print(f"pallas take VMEM         : {t*1e3:8.2f} ms  "
          f"(match={np.allclose(ok, ref)})")
except Exception as e:
    print("pallas take VMEM FAILED:", str(e)[:200])

# pallas variant 2: table as (ny*nx//128, 128); gather rows via take along
# sublanes with idx//128, then select lane via one-hot dot (VPU)
def k2(iy_ref, il_ref, tab_ref, out_ref):
    rows = jnp.take(tab_ref[:], iy_ref[:], axis=0)   # (B, 128) row gather
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    out_ref[:] = jnp.sum(jnp.where(lane == il_ref[:][:, None], rows, 0.0),
                         axis=1, keepdims=True)

B2 = 1024
@jax.jit
def g2(idx, tab):
    tab2 = tab.reshape(-1, 128)
    iy = idx // 128
    il = idx % 128
    return pl.pallas_call(
        k2,
        grid=(idx.shape[0] // B2,),
        in_specs=[pl.BlockSpec((B2,), lambda i: (i,), memory_space=pltpu.VMEM),
                  pl.BlockSpec((B2,), lambda i: (i,), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B2, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], 1), jnp.float32),
    )(iy, il, tab2)

try:
    t = timeit(g2, idx, table)
    ok = np.asarray(g2(idx, table)).reshape(-1)
    ref = np.asarray(_table)[np.asarray(_idx)]
    print(f"pallas row+lane          : {t*1e3:8.2f} ms  "
          f"(match={np.allclose(ok, ref)})")
except Exception as e:
    print("pallas row+lane FAILED:", str(e)[:200])
