"""Iterate on Mosaic gather forms with full error output."""
import os, time, traceback
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

nx = ny = 512
N = 1 << 20
R = nx * ny // 128
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

# A: take_along_axis sublane, small block, print real error
def kA(idx_ref, tab_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

for BA in (256,):
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
        got = np.asarray(gA(jnp.int32(0)))
        want = np.take_along_axis(np.asarray(tab3), np.asarray(ridx2d) % R, 0)
        print(f"A taa sublane BA={BA}: {t*1e3:8.2f} ms match={np.allclose(got, want)}")
    except Exception:
        print(f"A BA={BA} FAILED:")
        traceback.print_exc(limit=2)
        err = traceback.format_exc()
        print(err[-1200:])

# A2: gather along LANES: idx (B,128) values in [0,128), gather within rows
lidx = jnp.asarray(rng.integers(0, 128, (N // 128, 128)), jnp.int32)
src = jnp.asarray(rng.standard_normal((N // 128, 128)), jnp.float32)
def kA2(idx_ref, src_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)

BA = 1024
@jax.jit
def gA2(c):
    idx = (lidx + c) % 128
    return pl.pallas_call(
        kA2,
        grid=(N // 128 // BA,),
        in_specs=[pl.BlockSpec((BA, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BA, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BA, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
    )(idx, src)
try:
    t = timeit_unique(gA2)
    got = np.asarray(gA2(jnp.int32(0)))
    want = np.take_along_axis(np.asarray(src), np.asarray(lidx) % 128, 1)
    print(f"A2 taa lanes           : {t*1e3:8.2f} ms ({N/t/1e9:.2f} G idx/s) "
          f"match={np.allclose(got, want)}")
except Exception:
    err = traceback.format_exc()
    print("A2 FAILED:", err[-800:])
