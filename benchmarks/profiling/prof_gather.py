"""Compare gather strategies for ray interpolation on the real TPU."""
import os, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


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
fields = jnp.asarray(rng.standard_normal((5, ny, nx)), jnp.float32)
xq = jnp.asarray(rng.uniform(0, 2 * np.pi, N), jnp.float32)
yq = jnp.asarray(rng.uniform(0, 2 * np.pi, N), jnp.float32)
kk = jnp.asarray(rng.standard_normal(N), jnp.float32)
ll = jnp.asarray(rng.standard_normal(N), jnp.float32)
sgn = jnp.ones(N, jnp.float32)
idx = jnp.asarray(rng.integers(0, nx * ny, N), jnp.int32)

# 1. pallas fused RHS kernel
from juliaraytracingsw_tpu.ops.pallas_interp import ray_rhs_pallas, ray_rhs_reference
kw = dict(x0=0.0, y0=0.0, dxg=2 * np.pi / nx, dyg=2 * np.pi / ny, f=3.0, Cg=1.0)
try:
    fn = jax.jit(lambda *a: ray_rhs_pallas(*a, **kw, block=8192))
    t = timeit(fn, xq, yq, kk, ll, sgn, fields)
    print(f"pallas ray_rhs (b=8192)  : {t*1e3:8.2f} ms")
except Exception as e:
    print("pallas ray_rhs FAILED:", str(e)[:300])

# 2. jnp reference RHS
fn = jax.jit(lambda *a: ray_rhs_reference(*a, **kw))
t = timeit(fn, xq, yq, kk, ll, sgn, fields)
print(f"jnp ray_rhs              : {t*1e3:8.2f} ms")

# 3. single flat 1-D take, 1M indices, 1 field
flat1 = fields[0].reshape(-1)
f3 = jax.jit(lambda a, i: jnp.take(a, i))
t = timeit(f3, flat1, idx)
print(f"flat take 1M x 1 field   : {t*1e3:8.2f} ms ({N*4/t/1e9:.2f} GB/s)")

# 4. row-then-col two-stage: gather rows (take axis=0) then take_along_axis
iy = idx // nx
ix = idx % nx
def two_stage(f2d, iy, ix):
    rows = jnp.take(f2d, iy, axis=0)          # (N, nx)
    return jnp.take_along_axis(rows, ix[:, None], axis=1)[:, 0]
t = timeit(jax.jit(two_stage), fields[0], iy, ix)
print(f"row+col two-stage        : {t*1e3:8.2f} ms")

# 5. one-hot matmul gather (blocked): rows one-hot @ field
def onehot_gather(f2d, iy, ix):
    B = 1 << 14
    outs = []
    for s in range(0, N, B):
        oy = jax.nn.one_hot(iy[s:s+B], ny, dtype=jnp.bfloat16)      # (B, ny)
        rows = jnp.dot(oy, f2d.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)           # (B, nx)
        ox = jax.nn.one_hot(ix[s:s+B], nx, dtype=jnp.bfloat16)
        outs.append(jnp.sum(rows * ox, axis=1))
    return jnp.concatenate(outs)
t = timeit(jax.jit(onehot_gather), fields[0], iy, ix, iters=3)
print(f"one-hot matmul gather    : {t*1e3:8.2f} ms")

# 6. sorted take: sort indices first (locality), then unsort
def sorted_take(a, i):
    order = jnp.argsort(i)
    g = jnp.take(a, i[order])
    return jnp.zeros_like(g).at[order].set(g)
t = timeit(jax.jit(sorted_take), flat1, idx)
print(f"sorted take              : {t*1e3:8.2f} ms")
