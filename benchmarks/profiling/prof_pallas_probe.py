"""Probe: does Mosaic/Pallas compile+run on this round's tunnel TPU?
Stage 1: trivial elementwise pallas_call.
Stage 2: the repo's fused ray-substep kernel (JRSW_FUSED=pallas) at 64k packets.
Stage 3: 1M-packet fused substep timing if stage 2 passes.
Each stage under its own alarm so a Mosaic hang can't eat the session.
"""
import os, signal, sys, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")

TIMEOUT = int(os.environ.get("PROBE_TIMEOUT", "600"))
signal.signal(signal.SIGALRM, lambda *a: (_ for _ in ()).throw(TimeoutError()))


def stage(name, fn):
    signal.alarm(TIMEOUT)
    t0 = time.perf_counter()
    try:
        fn()
        print(f"{name}: OK ({time.perf_counter()-t0:.1f}s)", flush=True)
        return True
    except TimeoutError:
        print(f"{name}: TIMEOUT after {TIMEOUT}s", flush=True)
        return False
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return False
    finally:
        signal.alarm(0)


def trivial():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0 + 1.0

    x = jnp.ones((256, 256), jnp.float32)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    out = jax.block_until_ready(f(x))
    assert float(out[0, 0]) == 3.0


print("device:", jax.devices()[0], flush=True)
ok = stage("trivial pallas_call", trivial)

if ok:
    from juliaraytracingsw_tpu.rays.packets import Packets
    from juliaraytracingsw_tpu.rays.patch import build_patch_table
    from juliaraytracingsw_tpu.rays.raytrace import (RayParams,
                                                     make_pair_table,
                                                     raytrace_tables)

    nx = ny = 512
    rng = np.random.default_rng(0)
    fo = jnp.asarray(rng.standard_normal((5, ny, nx)), jnp.float32)
    fn_ = jnp.asarray(rng.standard_normal((5, ny, nx)), jnp.float32)
    T_pair = jax.jit(lambda: make_pair_table(
        build_patch_table(fo, "bilinear"),
        build_patch_table(fn_, "bilinear")))()
    jax.block_until_ready(T_pair)
    rp = RayParams(f=3.0, Cg=1.0, x0=-np.pi, y0=-np.pi,
                   dx=2*np.pi/nx, dy=2*np.pi/ny)
    os.environ["JRSW_FUSED"] = "pallas"

    def run_n(N, iters=6):
        x = jnp.asarray(rng.uniform(-np.pi, np.pi, N), jnp.float32)
        y = jnp.asarray(rng.uniform(-np.pi, np.pi, N), jnp.float32)
        kk = jnp.full((N,), 5.0, jnp.float32)
        zz = jnp.zeros((N,), jnp.float32)
        sg = jnp.ones((N,), jnp.float32)

        @jax.jit
        def substep(c):
            p = Packets(x + c, y, kk, zz, sg)
            return raytrace_tables(p, T_pair, 0.0, 1e-3, rp, ny, nx,
                                   nsubsteps=1, method="rk4")
        cs = [jnp.float32(1e-6*i) for i in range(iters+2)]
        jax.block_until_ready(substep(cs[0]))
        jax.block_until_ready(substep(cs[1]))
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = substep(cs[i+2])
        jax.block_until_ready(out)
        t = (time.perf_counter()-t0)/iters
        print(f"fused pallas substep N={N}: {t*1e3:.2f} ms -> "
              f"{N/t/1e6:.1f} M rays/s", flush=True)

    ok2 = stage("fused kernel 64k", lambda: run_n(1 << 16))
    if ok2:
        stage("fused kernel 1M", lambda: run_n(1 << 20))
print("probe done", flush=True)
