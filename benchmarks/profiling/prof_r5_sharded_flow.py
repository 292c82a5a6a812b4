"""Sharded (slab-FFT) 512^2 RSW flow step on a mesh of 1: does the dense
1-D DFT slab path (round 5) carry the replicated backend's win?

Scan-amortized (200 steps per jit). JRSW_FFT=fft vs default (dft on TPU).
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

sys.path.insert(0, "/root/repo")

from juliaraytracingsw_tpu.core.grid import make_grid  # noqa: E402
from juliaraytracingsw_tpu.core.steppers import zero_clock  # noqa: E402
from juliaraytracingsw_tpu.coupled.driver import derive_nu  # noqa: E402
from juliaraytracingsw_tpu.coupled.initial_conditions import band_geo_wave_ic  # noqa: E402
from juliaraytracingsw_tpu.models import rsw  # noqa: E402
from juliaraytracingsw_tpu.parallel.mesh import make_mesh  # noqa: E402
from juliaraytracingsw_tpu.parallel.sharded_rsw import ShardedRSW  # noqa: E402

NX = 512
S = 200
g = make_grid(NX)
dt = 1e-3
model = rsw.make_model(g, nu=derive_nu(1.0, NX, 4, dt), nnu=4, f=3.0, Cg=1.0)
rng = np.random.default_rng(1)
sol0 = band_geo_wave_ic(g, rng, Kg=(10, 13), Kw=(0, 5), ag=0.5, aw=0.05,
                        f=3.0, Cg=1.0)
print(f"device: {jax.devices()[0]}  impl={os.environ.get('JRSW_FFT', 'auto')}",
      flush=True)

sh = ShardedRSW(g, model.params, make_mesh(1), dt=dt)
init_fn, step_fn = sh.stepper()
sol_sh = sh.shard_solution(sol0)


@jax.jit
def steps(sol, c):
    def body(carry, _):
        s, cl, st = carry
        return step_fn(s, cl, st), None

    sol = sol * (1.0 + 0.0 * c)
    (s, cl, st), _ = jax.lax.scan(body, (sol, zero_clock(), init_fn(sol)),
                                  None, length=S)
    return s


def timeit(fn, x, iters=3):
    cs = [jnp.float32(1e-9 * i) for i in range(iters + 1)]
    jax.block_until_ready(fn(x, cs[0]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(x, cs[i + 1])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / S


t = timeit(steps, sol_sh)
print(f"sharded 512^2 flow step (mesh of 1): {t*1e6:7.1f} us/step "
      f"({1/t:.0f} steps/s)", flush=True)
print("done", flush=True)
