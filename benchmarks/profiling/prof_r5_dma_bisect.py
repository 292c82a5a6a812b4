"""Bisect which Mosaic feature the tunnel's remote-compile rejects.

Every per-row-DMA probe form fails with HTTP 500; the (DMA-free) fused
substep kernel compiles fine.  Features added one at a time:

  k0: plain VMEM in/out elementwise          (control, should pass)
  k1: input in pl.ANY + one whole-buffer DMA to a VMEM scratch
  k2: k1 with a DMA semaphore ARRAY (size 2) instead of a scalar one
  k3: k1 + dynamic (traced) source offset pl.ds(i*8, 8)
  k4: fori_loop of 8 sliced DMAs, one semaphore, start+wait serial
  k5: k4 with round-robin sem array + delayed waits (the probe pattern)
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

X = jnp.asarray(np.random.default_rng(0).standard_normal((256, 128)),
                jnp.float32)
print("device:", jax.devices()[0], flush=True)


def try_case(name, fn):
    try:
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        print(f"{name}: OK {float(jnp.sum(out)):.3f} "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}",
              flush=True)


# k0 control
def k0(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


try_case("k0 vmem-elementwise", lambda: pl.pallas_call(
    k0, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(X))


# k1 ANY + whole-buffer DMA
def k1(x_hbm, o_ref, scr, sem):
    c = pltpu.make_async_copy(x_hbm, scr, sem)
    c.start()
    c.wait()
    o_ref[:] = scr[:] * 2.0


try_case("k1 any+dma", lambda: pl.pallas_call(
    k1, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((256, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA(())])(X))


# k2 semaphore array
def k2(x_hbm, o_ref, scr, sems):
    c = pltpu.make_async_copy(x_hbm, scr, sems.at[0])
    c.start()
    c.wait()
    o_ref[:] = scr[:] * 2.0


try_case("k2 sem-array", lambda: pl.pallas_call(
    k2, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((256, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))])(X))


# k3 dynamic source offset
def k3(x_hbm, o_ref, scr, sem):
    i = pl.program_id(0)
    c = pltpu.make_async_copy(x_hbm.at[pl.ds(i * 8, 8), :],
                              scr, sem)
    c.start()
    c.wait()
    o_ref[:] = scr[:] * 2.0


try_case("k3 dynamic-slice dma", lambda: pl.pallas_call(
    k3, grid=(4,),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA(())])(X))


# k4 fori_loop of serial DMAs
def k4(x_hbm, o_ref, scr, sem):
    def body(i, _):
        c = pltpu.make_async_copy(x_hbm.at[pl.ds(i * 8, 8), :],
                                  scr.at[pl.ds(0, 8), :], sem)
        c.start()
        c.wait()
        return 0

    jax.lax.fori_loop(0, 8, body, 0)
    o_ref[:] = scr[:] * 2.0


try_case("k4 fori-serial-dma", lambda: pl.pallas_call(
    k4,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA(())])(X))


# k5 round-robin pipelined DMAs (the probe pattern, small)
def k5(x_hbm, o_ref, scr, sems):
    K = 4

    def issue(i):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds((i * 8) % 248, 8), :],
            scr.at[pl.ds((i % (2 * K)) * 8, 8), :],
            sems.at[i % K])

    def body(i, _):
        @pl.when(i >= K)
        def _():
            issue(i - K).wait()
        issue(i).start()
        return 0

    jax.lax.fori_loop(0, 16, body, 0)

    def drain(i, _):
        issue(16 - K + i).wait()
        return 0

    jax.lax.fori_loop(0, K, drain, 0)
    o_ref[:] = scr[:] * 2.0


try_case("k5 round-robin-dma", lambda: pl.pallas_call(
    k5,
    out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((64, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((4,))])(X))

print("done", flush=True)
