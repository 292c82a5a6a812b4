import os, sys, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")

nx = ny = 512
N = 1 << 20
W = 160
rng = np.random.default_rng(0)
T = jnp.asarray(rng.standard_normal((ny * nx, W)), jnp.float32)
idx_rand = jnp.asarray(rng.integers(0, nx * ny - 8, N), jnp.int32)
idx_sorted = jnp.sort(idx_rand)
# "nearly sorted": sorted + small local jitter (what drifting packets give)
idx_near = jnp.asarray(np.clip(np.sort(np.asarray(idx_rand))
                               + rng.integers(-512, 512, N), 0, nx*ny-1), jnp.int32)
jax.block_until_ready((T, idx_rand, idx_sorted, idx_near))
print("device:", jax.devices()[0], flush=True)

def timeit(fn, iters=6):
    cs = [jnp.int32(i) for i in range(iters + 2)]
    jax.block_until_ready(fn(cs[0])); jax.block_until_ready(fn(cs[1]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(cs[i + 2])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

for tag, idx in (("random", idx_rand), ("sorted", idx_sorted),
                 ("near-sorted", idx_near)):
    @jax.jit
    def take(c, idx=idx):
        return jnp.take(T, jnp.minimum(idx + c, nx * ny - 1), axis=0).sum(1)
    t = timeit(take)
    print(f"take W=160 {tag:12s}: {t*1e3:7.2f} ms ({t/N*1e9:5.1f} ns/idx)",
          flush=True)

@jax.jit
def sort_cost(c):
    return jnp.sort(idx_rand + c)
t = timeit(sort_cost)
print(f"jnp.sort 1M i32        : {t*1e3:7.2f} ms", flush=True)

@jax.jit
def argsort_cost(c):
    return jnp.argsort(idx_rand + c)
t = timeit(argsort_cost)
print(f"jnp.argsort 1M i32     : {t*1e3:7.2f} ms", flush=True)
print("done", flush=True)
