"""Probe: row-gather cost vs row width and index locality (true cost)."""
import os, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

N = 1 << 20
R = 262144
rng = np.random.default_rng(0)


def timeit_unique(fn, iters=5):
    cs = [jnp.int32(i) for i in range(iters + 2)]
    jax.block_until_ready(fn(cs[0]))
    jax.block_until_ready(fn(cs[1]))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(cs[i + 2])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


idx = jnp.asarray(rng.integers(0, R - 8, N), jnp.int32)
idx_sorted = jnp.sort(idx)
# quasi-coherent: lattice cells in order + jitter (realistic packet layout)
idx_coh = jnp.asarray(
    (np.arange(N) // 4 + rng.integers(0, 3, N)) % R, jnp.int32)

for W in (8, 32, 80, 128, 160, 256):
    tab = jnp.asarray(rng.standard_normal((R, W)), jnp.float32)
    @jax.jit
    def g(c, tab=tab):
        return jnp.take(tab, (idx + c) % R, axis=0)
    t = timeit_unique(g)
    print(f"take W={W:4d} random : {t*1e3:8.2f} ms")

tab = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
@jax.jit
def gs(c):
    return jnp.take(tab, (idx_sorted + c) % R, axis=0)
t = timeit_unique(gs)
print(f"take W=128 sorted  : {t*1e3:8.2f} ms")
@jax.jit
def gc(c):
    return jnp.take(tab, (idx_coh + c) % R, axis=0)
t = timeit_unique(gc)
print(f"take W=128 coherent: {t*1e3:8.2f} ms")

# bf16 width 160 (combined old+new patch in half precision)
tabb = jnp.asarray(rng.standard_normal((R, 160)), jnp.bfloat16)
@jax.jit
def gb(c):
    return jnp.take(tabb, (idx + c) % R, axis=0)
t = timeit_unique(gb)
print(f"take W=160 bf16    : {t*1e3:8.2f} ms")

# two separate takes of W=80 (old & new tables) for comparison
tab80a = jnp.asarray(rng.standard_normal((R, 80)), jnp.float32)
tab80b = jnp.asarray(rng.standard_normal((R, 80)), jnp.float32)
@jax.jit
def g2(c):
    i = (idx + c) % R
    return jnp.take(tab80a, i, axis=0), jnp.take(tab80b, i, axis=0)
t = timeit_unique(g2)
print(f"2x take W=80       : {t*1e3:8.2f} ms")
