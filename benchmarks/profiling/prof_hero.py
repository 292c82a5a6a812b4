"""Microbenchmark the hero coupled step components on the real TPU."""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from juliaraytracingsw_tpu.core.grid import make_grid
from juliaraytracingsw_tpu.core.steppers import zero_clock
from juliaraytracingsw_tpu.coupled.driver import derive_nu
from juliaraytracingsw_tpu.models import rsw
from juliaraytracingsw_tpu.models.base import build_stepper
from juliaraytracingsw_tpu.rays.packets import lattice_packets
from juliaraytracingsw_tpu.rays.raytrace import RayParams, fields_from_psih, raytrace
from juliaraytracingsw_tpu.rays.interp import _gather_taps


def timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


f, Cg, dt = 3.0, 1.0, 1e-3
nx, sqrtp = 512, 1024
grid = make_grid(nx)
model = rsw.make_model(grid, nu=derive_nu(1.0, nx, 4, dt), nnu=4, f=f, Cg=Cg)
init_fn, step_fn = build_stepper(model, "IFMAB3", dt=dt)
params = model.params

def psih_fn(sol):
    Kd2 = params.f**2 / params.Cg2
    qh = grid.ik * sol[1] - grid.il * sol[0] - params.f * sol[2]
    return -qh / (grid.Krsq + Kd2)

rp = RayParams(f=f, Cg=Cg, x0=float(grid.x[0]), y0=float(grid.y[0]),
               dx=grid.dx, dy=grid.dy)
rng = np.random.default_rng(1)
from juliaraytracingsw_tpu.coupled.initial_conditions import band_geo_wave_ic
sol = band_geo_wave_ic(grid, rng, Kg=(10, 13), Kw=(0, 5), ag=0.5, aw=0.05,
                       f=f, Cg=Cg)
packets = lattice_packets(sqrtp, grid.Lx, grid.Ly,
                          k0=float(np.sqrt(3.0) * f / Cg), k_ring=True)
N = sqrtp * sqrtp
state = init_fn(sol)
clock = zero_clock()

# 1. flow step alone
@jax.jit
def flow_step(sol, clock, state):
    return step_fn(sol, clock, state)
t = timeit(flow_step, sol, clock, state)
print(f"flow step            : {t*1e3:8.2f} ms")

# 2. fields_from_psih
@jax.jit
def fields_fn(sol):
    return fields_from_psih(psih_fn(sol), grid, rp.interp)
t = timeit(fields_fn, sol)
fields = fields_fn(sol)
print(f"fields_from_psih     : {t*1e3:8.2f} ms")

# 3. raytrace 1 substep rk4
def rt(p, fo, fn_):
    return raytrace(p, fo, fn_, 0.0, dt, rp, nsubsteps=1)
t = timeit(rt, packets, fields, fields)
print(f"raytrace rk4 x1      : {t*1e3:8.2f} ms  ({4*N/t/1e6:.0f}M RHS-interp/s)")

# 4. raw fused gather: 20 taps x 1M
idx = jnp.asarray(rng.integers(0, nx * nx, size=(4, N)), jnp.int32)
@jax.jit
def g(fields, idx):
    return _gather_taps(fields, idx)
t = timeit(g, fields, idx)
print(f"gather 5Fx4Tx1M      : {t*1e3:8.2f} ms  ({5*4*N*4/t/1e9:.1f} GB/s)")

# 5. blend alone
@jax.jit
def bl(a, b):
    return 0.5 * a + 0.5 * b
t = timeit(bl, fields, fields)
print(f"blend (5,512,512)    : {t*1e3:8.2f} ms")

# 6. single RHS via interpolate (bilinear)
from juliaraytracingsw_tpu.rays.interp import bilinear
@jax.jit
def interp1(fields, x, y):
    return bilinear(fields, x, y, rp.x0, rp.y0, rp.dx, rp.dy)
t = timeit(interp1, fields, packets.x, packets.y)
print(f"bilinear 5F x 1M     : {t*1e3:8.2f} ms")

# 7. dispatch overhead: trivial jitted op
@jax.jit
def nop(x):
    return x + 1.0
xsmall = jnp.zeros((8,))
t = timeit(nop, xsmall, iters=50)
print(f"dispatch overhead    : {t*1e3:8.2f} ms")
