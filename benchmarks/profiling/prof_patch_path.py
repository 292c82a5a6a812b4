"""True-cost bench of the patch-gather ray path on the real TPU.

Methodology (see prof_true.py): unique small scalar inputs per call defeat
the axon tunnel's result cache; big arrays are closed over (shipped once at
compile time); block_until_ready on the output.
"""
import os, sys, time
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from juliaraytracingsw_tpu.rays.patch import build_patch_table
from juliaraytracingsw_tpu.rays.packets import Packets
from juliaraytracingsw_tpu.rays.raytrace import RayParams, raytrace_tables

nx = ny = 512
N = 1 << 20
rng = np.random.default_rng(0)


def timeit_unique(fn, iters=6):
    cs = [jnp.float32(1e-4 * i) for i in range(iters + 2)]
    jax.block_until_ready(fn(cs[0]))
    jax.block_until_ready(fn(cs[1]))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(cs[i + 2])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


print("device:", jax.devices()[0])
fields = jnp.asarray(rng.standard_normal((5, ny, nx)), jnp.float32)
fields2 = jnp.asarray(rng.standard_normal((5, ny, nx)), jnp.float32)

# 1. patch table build (bilinear 4x4)
@jax.jit
def build(c):
    return build_patch_table(fields * (1.0 + c), "bilinear")
t = timeit_unique(build)
print(f"build_patch_table bilinear 4x4 : {t*1e3:8.2f} ms")

T_old = jax.jit(lambda: build_patch_table(fields, "bilinear"))()
T_new = jax.jit(lambda: build_patch_table(fields2, "bilinear"))()
jax.block_until_ready((T_old, T_new))
W = T_old.shape[1]
print("table:", T_old.shape)

# 2. two separate W-wide row takes (the raytrace_tables pattern)
idx0 = jnp.asarray(rng.integers(0, nx * ny - 8, N), jnp.int32)
@jax.jit
def take2(c):
    i = idx0 + c.astype(jnp.int32)
    return jnp.take(T_old, i, axis=0).sum(1) + jnp.take(T_new, i, axis=0).sum(1)
t = timeit_unique(take2)
print(f"2x row take W={W}            : {t*1e3:8.2f} ms")

# 3. one combined W=160 take
T_comb = jnp.concatenate([T_old, T_new], axis=1)
@jax.jit
def take160(c):
    i = idx0 + c.astype(jnp.int32)
    return jnp.take(T_comb, i, axis=0).sum(1)
t = timeit_unique(take160)
print(f"1x row take W={2*W}           : {t*1e3:8.2f} ms")

# 4. full rk4 substep via raytrace_tables (1M packets, 1 substep)
x = jnp.asarray(rng.uniform(-np.pi, np.pi, N), jnp.float32)
y = jnp.asarray(rng.uniform(-np.pi, np.pi, N), jnp.float32)
kk = jnp.full((N,), 5.0, jnp.float32)
ll = jnp.zeros((N,), jnp.float32)
sgn = jnp.ones((N,), jnp.float32)
rp = RayParams(f=3.0, Cg=1.0, x0=-np.pi, y0=-np.pi,
               dx=2 * np.pi / nx, dy=2 * np.pi / ny)

@jax.jit
def substep(c):
    p = Packets(x + c, y, kk, ll, sgn)
    return raytrace_tables(p, T_old, T_new, 0.0, 1e-3, rp, ny, nx,
                           nsubsteps=1, method="rk4")
t = timeit_unique(substep)
print(f"patch rk4 substep 1M pkts      : {t*1e3:8.2f} ms -> "
      f"{N/t/1e6:6.1f} M ray-steps/s")

# 5. same with bspline 6x6 tables
Tb_old = jax.jit(lambda: build_patch_table(fields, "bspline"))()
Tb_new = jax.jit(lambda: build_patch_table(fields2, "bspline"))()
jax.block_until_ready((Tb_old, Tb_new))
rpb = rp._replace(interp="bspline")

@jax.jit
def substep_b(c):
    p = Packets(x + c, y, kk, ll, sgn)
    return raytrace_tables(p, Tb_old, Tb_new, 0.0, 1e-3, rpb, ny, nx,
                           nsubsteps=1, method="rk4")
t = timeit_unique(substep_b)
print(f"patch rk4 substep bspline 6x6  : {t*1e3:8.2f} ms -> "
      f"{N/t/1e6:6.1f} M ray-steps/s")

# 6. bspline table build
@jax.jit
def build_b(c):
    return build_patch_table(fields * (1.0 + c), "bspline")
t = timeit_unique(build_b)
print(f"build_patch_table bspline 6x6  : {t*1e3:8.2f} ms")
