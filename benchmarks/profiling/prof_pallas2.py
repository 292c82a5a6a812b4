"""Probe Mosaic VMEM gather forms + one-hot MXU row gather, true costs."""
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

nx = ny = 512
N = 1 << 20
R = nx * ny // 128          # 2048 rows of 128 lanes
rng = np.random.default_rng(0)
tab3 = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)


def timeit_unique(fn, iters=6):
    cs = [jnp.int32(i) for i in range(iters + 2)]
    jax.block_until_ready(fn(cs[0]))
    jax.block_until_ready(fn(cs[1]))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(cs[i + 2])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


ridx2d = jnp.asarray(rng.integers(0, R - 8, (N // 128, 128)), jnp.int32)

# A. take_along_axis along sublanes inside pallas, table in VMEM
def kA(idx_ref, tab_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

BA = 1024
@jax.jit
def gA(c):
    idx = (ridx2d + c) % R
    return pl.pallas_call(
        kA,
        grid=(N // 128 // BA,),
        in_specs=[pl.BlockSpec((BA, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BA, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
    )(idx, tab3)

try:
    t = timeit_unique(gA)
    # verify
    got = np.asarray(gA(jnp.int32(0)))
    want = np.take_along_axis(np.asarray(tab3), np.asarray(ridx2d) % R, axis=0)
    print(f"A pallas taa sublane    : {t*1e3:8.2f} ms ({N/t/1e9:.2f} G idx/s) "
          f"match={np.allclose(got, want)}")
except Exception as e:
    print("A FAILED:", str(e)[:160])

# B. row gather inside pallas: jnp.take(tab, rows, axis=0), rows (B,)
rows1d = jnp.asarray(rng.integers(0, R - 8, N // 128), jnp.int32)  # 8192 rows
def kB(idx_ref, tab_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

BB = 1024
@jax.jit
def gB(c):
    idx = (rows1d + c) % R
    return pl.pallas_call(
        kB,
        grid=(N // 128 // BB,),
        in_specs=[pl.BlockSpec((BB,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
    )(idx, tab3)

try:
    t = timeit_unique(gB)
    got = np.asarray(gB(jnp.int32(0)))
    want = np.asarray(tab3)[np.asarray(rows1d) % R]
    print(f"B pallas row take       : {t*1e3:8.2f} ms ({(N//128)/t/1e6:.1f} M rows/s) "
          f"match={np.allclose(got, want)}")
except Exception as e:
    print("B FAILED:", str(e)[:160])

# C. one-hot MXU row gather in pallas: per block build (BB, R) one-hot bf16
def kC(idx_ref, tab_ref, out_ref):
    rows = idx_ref[:]                               # (BB,) int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows.shape[0], R), 1)
    oh = (iota == rows[:, None]).astype(jnp.bfloat16)
    out_ref[:] = jnp.dot(oh, tab_ref[:].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)

BC = 512
@jax.jit
def gC(c):
    idx = (rows1d + c) % R
    return pl.pallas_call(
        kC,
        grid=(N // 128 // BC,),
        in_specs=[pl.BlockSpec((BC,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BC, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
    )(idx, tab3)

try:
    t = timeit_unique(gC)
    got = np.asarray(gC(jnp.int32(0)))
    want = np.asarray(tab3)[np.asarray(rows1d) % R]
    print(f"C pallas onehot matmul  : {t*1e3:8.2f} ms ({(N//128)/t/1e6:.1f} M rows/s) "
          f"match={np.allclose(got, want)}")
except Exception as e:
    print("C FAILED:", str(e)[:160])

# D. XLA baseline row gather of same 8192 rows
@jax.jit
def gD(c):
    return jnp.take(tab3, (rows1d + c) % R, axis=0)
t = timeit_unique(gD)
print(f"D XLA row take 8k       : {t*1e3:8.2f} ms")

# E. pallas dynamic-slice loop row gather (scalar loop, fori)
def kE(idx_ref, tab_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = tab_ref[idx_ref[i], :]
        return 0
    jax.lax.fori_loop(0, idx_ref.shape[0], body, 0)

@jax.jit
def gE(c):
    idx = (rows1d + c) % R
    return pl.pallas_call(
        kE,
        grid=(N // 128 // BB,),
        in_specs=[pl.BlockSpec((BB,), lambda i: (i,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
    )(idx, tab3)

try:
    t = timeit_unique(gE)
    got = np.asarray(gE(jnp.int32(0)))
    want = np.asarray(tab3)[np.asarray(rows1d) % R]
    print(f"E pallas dynslice loop  : {t*1e3:8.2f} ms ({(N//128)/t/1e6:.1f} M rows/s) "
          f"match={np.allclose(got, want)}")
except Exception as e:
    print("E FAILED:", str(e)[:160])
