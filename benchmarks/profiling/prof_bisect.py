import os, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
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


nx = ny = 512
N = 1 << 20
rng = np.random.default_rng(0)
fields_rand = jnp.asarray(rng.standard_normal((5, ny, nx)), jnp.float32)
g = jax.jit(_gather_taps)

for T in (1, 4, 16):
    idx = jnp.asarray(rng.integers(0, nx * ny, (T, N)), jnp.int32)
    t = timeit(g, fields_rand, idx)
    nel = 5 * T * N
    print(f"gather taps T={T:2d} (total {nel/1e6:5.1f}M): {t*1e3:8.2f} ms "
          f"({nel*4/t/1e9:6.1f} GB/s)")

# sorted indices
idx4 = jnp.asarray(np.sort(rng.integers(0, nx * ny, (4, N)), axis=1), jnp.int32)
t = timeit(g, fields_rand, idx4)
print(f"gather taps T=4 sorted           : {t*1e3:8.2f} ms")

# now with fields from the model pipeline
from juliaraytracingsw_tpu.core.grid import make_grid
from juliaraytracingsw_tpu.coupled.initial_conditions import band_geo_wave_ic
from juliaraytracingsw_tpu.rays.raytrace import fields_from_psih
grid = make_grid(nx)
sol = band_geo_wave_ic(grid, np.random.default_rng(1), f=3.0, Cg=1.0)
@jax.jit
def ff(sol):
    qh = grid.ik * sol[1] - grid.il * sol[0] - 3.0 * sol[2]
    return fields_from_psih(-qh / (grid.Krsq + 9.0), grid, "bilinear")
fields_model = ff(sol)
print("fields_model dtype/shape:", fields_model.dtype, fields_model.shape)
idx = jnp.asarray(rng.integers(0, nx * ny, (4, N)), jnp.int32)
t = timeit(g, fields_model, idx)
print(f"gather taps T=4 model fields     : {t*1e3:8.2f} ms")

# lattice positions through bilinear
from juliaraytracingsw_tpu.rays.packets import lattice_packets
from juliaraytracingsw_tpu.rays.interp import bilinear
pk = lattice_packets(1024, grid.Lx, grid.Ly, k0=3.0, k_ring=True)
print("packets dtype:", pk.x.dtype)
b = jax.jit(lambda f_, x_, y_: bilinear(f_, x_, y_, float(grid.x[0]),
                                        float(grid.y[0]), grid.dx, grid.dy))
t = timeit(b, fields_rand, pk.x, pk.y)
print(f"bilinear lattice pos rand fields : {t*1e3:8.2f} ms")
xr = jnp.asarray(rng.uniform(-np.pi, np.pi, N), jnp.float32)
yr = jnp.asarray(rng.uniform(-np.pi, np.pi, N), jnp.float32)
t = timeit(b, fields_rand, xr, yr)
print(f"bilinear random pos rand fields  : {t*1e3:8.2f} ms")
t = timeit(b, fields_model, xr, yr)
print(f"bilinear random pos model fields : {t*1e3:8.2f} ms")
t = timeit(b, fields_model, pk.x, pk.y)
print(f"bilinear lattice pos model fields: {t*1e3:8.2f} ms")
