"""True-cost microbenchmarks: defeat the axon tunnel's result cache by
making every call's inputs unique (chained through a device-side counter)."""
import os, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

nx = ny = 512
N = 1 << 20
rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal(ny * nx), jnp.float32)
idx0 = jnp.asarray(rng.integers(0, nx * ny - 64, N), jnp.int32)


def timeit_unique(make_fn, iters=8):
    """make_fn(c) -> jitted call with a device scalar c mixed into inputs."""
    fn = make_fn()
    cs = [jnp.int32(i) for i in range(iters + 2)]
    out = fn(cs[0]); jax.block_until_ready(out)
    out = fn(cs[1]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(cs[i + 2])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# 1. flat take 1M, unique idx per call
def mk_take1():
    @jax.jit
    def f(c):
        return jnp.take(table, idx0 + c)
    return f
t = timeit_unique(mk_take1)
print(f"take 1M unique           : {t*1e3:8.2f} ms ({N*4/t/1e9:5.1f} GB/s out)")

# 2. fused take 20M (5 fields x 4 taps)
fields = jnp.asarray(rng.standard_normal((5, ny, nx)), jnp.float32)
idx4 = jnp.asarray(rng.integers(0, nx * ny - 64, (4, N)), jnp.int32)
def mk_take20():
    from juliaraytracingsw_tpu.rays.interp import _gather_taps
    @jax.jit
    def f(c):
        return _gather_taps(fields, idx4 + c)
    return f
t = timeit_unique(mk_take20)
print(f"take 20M fused unique    : {t*1e3:8.2f} ms ({20*N*4/t/1e9:5.1f} GB/s out)")

# 3. take 20M as 5 separate 4M takes (size-cliff check)
def mk_take4m():
    flat = fields.reshape(5, -1)
    @jax.jit
    def f(c):
        outs = [jnp.take(flat[i], (idx4 + c).reshape(-1)) for i in range(5)]
        return jnp.stack(outs)
    return f
t = timeit_unique(mk_take4m)
print(f"5x take 4M unique        : {t*1e3:8.2f} ms")

# 4. row gather: take axis=0 of (2048,128) panels, 1M rows
tab3 = jnp.asarray(rng.standard_normal((nx * ny // 128, 128)), jnp.float32)
rows0 = jnp.asarray(rng.integers(0, nx * ny // 128 - 64, N), jnp.int32)
def mk_rowg():
    @jax.jit
    def f(c):
        return jnp.take(tab3, rows0 + c, axis=0)
    return f
t = timeit_unique(mk_rowg, iters=4)
print(f"row gather 1Mx128 unique : {t*1e3:8.2f} ms ({N*128*4/t/1e9:5.1f} GB/s)")

# 5. take_along_axis along sublanes: (8192,128) idx into (2048,128)
ridx = jnp.asarray(rng.integers(0, nx * ny // 128 - 64, (N // 128, 128)),
                   jnp.int32)
def mk_taa():
    @jax.jit
    def f(c):
        return jnp.take_along_axis(tab3, (ridx + c) % 2048, axis=0)
    return f
t = timeit_unique(mk_taa)
print(f"take_along_axis sublanes : {t*1e3:8.2f} ms ({N*4/t/1e9:5.1f} GB/s out)")

# 6. full bilinear 5F x 1M unique positions
from juliaraytracingsw_tpu.rays.interp import bilinear
xq = jnp.asarray(rng.uniform(-3.0, 3.0, N), jnp.float32)
yq = jnp.asarray(rng.uniform(-3.0, 3.0, N), jnp.float32)
def mk_bil():
    @jax.jit
    def f(c):
        d = c.astype(jnp.float32) * 1e-3
        return bilinear(fields, xq + d, yq + d, -np.pi, -np.pi,
                        2 * np.pi / nx, 2 * np.pi / ny)
    return f
t = timeit_unique(mk_bil, iters=4)
print(f"bilinear 5Fx1M unique    : {t*1e3:8.2f} ms")

# 7. elementwise on 20M (sanity: pure VPU+HBM streaming)
big = jnp.asarray(rng.standard_normal(20 * N), jnp.float32)
def mk_ew():
    @jax.jit
    def f(c):
        return big * (1.0 + c.astype(jnp.float32))
    return f
t = timeit_unique(mk_ew)
print(f"elementwise 20M unique   : {t*1e3:8.2f} ms ({2*20*N*4/t/1e9:5.1f} GB/s)")
