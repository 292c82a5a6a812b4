"""Decompose the patch-path rk4 substep cost on the real TPU.

Where do the ~35 ms/substep (1M packets) go?  Candidates: the row gather
(serial ~13 ns/index), the (N,160) HBM round-trip of the gathered rows,
or the per-stage VPU interpolation math.  Methodology as prof_true.py:
unique scalar inputs defeat the tunnel result cache.
"""
import os, sys, time
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from juliaraytracingsw_tpu.rays.patch import build_patch_table, patch_interpolate
from juliaraytracingsw_tpu.rays.packets import Packets
from juliaraytracingsw_tpu.rays.raytrace import RayParams, raytrace_tables, make_pair_table

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
T_old = jax.jit(lambda: build_patch_table(fields, "bilinear"))()
T_new = jax.jit(lambda: build_patch_table(fields2, "bilinear"))()
T_pair = jax.jit(make_pair_table)(T_old, T_new)
jax.block_until_ready(T_pair)
W2 = T_pair.shape[1]
print("pair table:", T_pair.shape)

idx0 = jnp.asarray(rng.integers(0, nx * ny - 8, N), jnp.int32)

# 1. gather alone (pair, W=160)
@jax.jit
def take_pair(c):
    i = idx0 + c.astype(jnp.int32)
    return jnp.take(T_pair, i, axis=0).sum(1)
t = timeit_unique(take_pair)
print(f"take pair W={W2:3d} f32        : {t*1e3:8.2f} ms  ({t/N*1e9:5.1f} ns/idx)")

# 2. gather alone, bf16 pair table (half the bytes, same lane count?)
T_bf = T_pair.astype(jnp.bfloat16)
@jax.jit
def take_bf(c):
    i = idx0 + c.astype(jnp.int32)
    return jnp.take(T_bf, i, axis=0).astype(jnp.float32).sum(1)
t = timeit_unique(take_bf)
print(f"take pair W={W2:3d} bf16       : {t*1e3:8.2f} ms  ({t/N*1e9:5.1f} ns/idx)")

# 3. gather alone, W=80 single level
@jax.jit
def take_single(c):
    i = idx0 + c.astype(jnp.int32)
    return jnp.take(T_old, i, axis=0).sum(1)
t = timeit_unique(take_single)
print(f"take single W={T_old.shape[1]:3d} f32      : {t*1e3:8.2f} ms  ({t/N*1e9:5.1f} ns/idx)")

# 4. stage math alone: rows pre-gathered, 4 stages of local interp + blend
rows_fixed = jax.jit(lambda: jnp.take(T_pair, idx0, axis=0))()
jax.block_until_ready(rows_fixed)
Wl = rows_fixed.shape[1] // 2
lx0 = jnp.asarray(rng.uniform(0, 1, N), jnp.float32)
ly0 = jnp.asarray(rng.uniform(0, 1, N), jnp.float32)

@jax.jit
def stages_only(c):
    acc = 0.0
    for s in range(4):
        lx = lx0 + c * s
        ly = ly0 + c * s
        vo = patch_interpolate(rows_fixed[:, :Wl], lx, ly, method="bilinear")
        vn = patch_interpolate(rows_fixed[:, Wl:], lx, ly, method="bilinear")
        acc = acc + sum((1 - 0.3) * a + 0.3 * b for a, b in zip(vo, vn))
    return acc
t = timeit_unique(stages_only)
print(f"4x stage math (rows cached)  : {t*1e3:8.2f} ms")

# 5. full rk4 substep, current default impl
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
    return raytrace_tables(p, T_pair, 0.0, 1e-3, rp, ny, nx,
                           nsubsteps=1, method="rk4")
t = timeit_unique(substep)
print(f"full rk4 substep (split)     : {t*1e3:8.2f} ms -> {N/t/1e6:6.1f} M/s")

# 5b. full rk4 substep, bf16 pair table
rp_bf = rp._replace(table_dtype="bfloat16")
T_pair_bf = T_pair.astype(jnp.bfloat16)
@jax.jit
def substep_bf(c):
    p = Packets(x + c, y, kk, ll, sgn)
    return raytrace_tables(p, T_pair_bf, 0.0, 1e-3, rp_bf, ny, nx,
                           nsubsteps=1, method="rk4")
t = timeit_unique(substep_bf)
print(f"full rk4 substep (bf16 table): {t*1e3:8.2f} ms -> {N/t/1e6:6.1f} M/s")

# 6. full rk4 substep, mxu impl
os.environ["JRSW_PATCH_IMPL"] = "mxu"
jax.clear_caches()
@jax.jit
def substep_mxu(c):
    p = Packets(x + c, y, kk, ll, sgn)
    return raytrace_tables(p, T_pair, 0.0, 1e-3, rp, ny, nx,
                           nsubsteps=1, method="rk4")
t = timeit_unique(substep_mxu)
print(f"full rk4 substep (mxu)       : {t*1e3:8.2f} ms -> {N/t/1e6:6.1f} M/s")
os.environ["JRSW_PATCH_IMPL"] = "split"
