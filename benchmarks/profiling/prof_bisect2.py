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
idx = jnp.asarray(rng.integers(0, nx * ny, (4, N)), jnp.int32)
g = jax.jit(_gather_taps)

from juliaraytracingsw_tpu.core.grid import make_grid
from juliaraytracingsw_tpu.coupled.initial_conditions import band_geo_wave_ic
from juliaraytracingsw_tpu.rays.raytrace import fields_from_psih
grid = make_grid(nx)
sol = band_geo_wave_ic(grid, np.random.default_rng(1), f=3.0, Cg=1.0)
@jax.jit
def ff(sol):
    qh = grid.ik * sol[1] - grid.il * sol[0] - 3.0 * sol[2]
    return fields_from_psih(-qh / (grid.Krsq + 9.0), grid, "bilinear")
fm = jax.block_until_ready(ff(sol))
print("devices:", fm.devices(), "| sharding:", fm.sharding)
print("format:", getattr(fm, "format", None))
print("rand format:", getattr(fields_rand, "format", None))
print("any nan/inf:", bool(jnp.any(~jnp.isfinite(fm))))

t = timeit(g, fm, idx);                      print(f"model fields direct    : {t*1e3:8.2f} ms")
fm2 = jax.device_put(np.asarray(fm))
t = timeit(g, fm2, idx);                     print(f"host round-trip        : {t*1e3:8.2f} ms")
fm3 = jax.block_until_ready(jax.jit(lambda a: a + 0.0)(fm))
t = timeit(g, fm3, idx);                     print(f"jit(+0) copy           : {t*1e3:8.2f} ms")
t = timeit(jax.jit(lambda a: a * 2.0), fm);  print(f"elementwise on model   : {t*1e3:8.2f} ms")
# does a trivially-jitted producer also poison it?
fr2 = jax.block_until_ready(jax.jit(lambda a: a * 1.0)(fields_rand))
t = timeit(g, fr2, idx);                     print(f"jit-produced rand      : {t*1e3:8.2f} ms")
# is it irfft2 specifically?
from juliaraytracingsw_tpu.core.spectral import irfft2, rfft2
fh = jax.jit(rfft2)(fields_rand)
fr3 = jax.block_until_ready(jax.jit(lambda a: irfft2(a, nx))(fh))
t = timeit(g, fr3, idx);                     print(f"irfft2-produced        : {t*1e3:8.2f} ms")
# value dependence: replace values with zeros but same producer
fz = jax.block_until_ready(jax.jit(lambda a: a * 0.0)(fm))
t = timeit(g, fz, idx);                      print(f"model*0                : {t*1e3:8.2f} ms")
print("fm abs range:", float(jnp.min(jnp.abs(fm))), float(jnp.max(jnp.abs(fm))))
