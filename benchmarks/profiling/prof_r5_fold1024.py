"""Does the dealias-FOLDED dense DFT win at 1024^2?

Unfolded dense-1024 loses to the XLA FFT (224 vs 140 us/transform,
prof_r5_flow_fft2.py). But the folded calcN transforms only compute the
kept 2/3-mask modes — 0.67x on one dim of every matmul (~0.45x total),
which would land dense-1024-folded near ~100 us/transform. If it wins,
_DFT_MAX_NX can stay 512 for the PLAIN transforms while the FOLDED
(calcN) transforms extend to 1024.

Scan-amortized: 100-iteration masked roundtrip (7ch irfft2_dealiased ->
pointwise -> 7ch rfft2_dealiased).
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

from juliaraytracingsw_tpu.core import spectral as sp  # noqa: E402
from juliaraytracingsw_tpu.core.grid import make_grid  # noqa: E402
from juliaraytracingsw_tpu.core.transfer import to_device, to_host  # noqa: E402

NX = int(os.environ.get("PROBE_NX", "1024"))
S = 100
g = make_grid(NX)
rng = np.random.default_rng(0)
print(f"device: {jax.devices()[0]}  nx={NX}  impl={os.environ.get('JRSW_FFT','auto')}",
      flush=True)

phys7 = rng.standard_normal((7, g.ny, NX)).astype(np.float32)
spec7 = to_device(to_host(jax.jit(sp.rfft2)(jnp.asarray(phys7))))


def roundtrip():
    def body(carry, _):
        ph = sp.irfft2_dealiased(carry, g)
        ph = ph * (1.0 + 1e-6 * ph)
        out = sp.rfft2_dealiased(ph, g)
        out = out / (1e-30 + jnp.max(jnp.abs(out))) * 0.1
        return out.astype(jnp.complex64), None

    @jax.jit
    def run(x, c):
        y, _ = jax.lax.scan(body, x + c * (1 + 0j), None, length=S)
        return y

    return run


def timeit(fn, x, iters=3):
    cs = [jnp.float32(1e-6 * i) for i in range(iters + 1)]
    jax.block_until_ready(fn(x, cs[0]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(x, cs[i + 1])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / S


t = timeit(roundtrip(), spec7)
print(f"masked 7ch roundtrip: {t*1e6:8.1f} us/iter "
      f"({t*1e6/14:6.2f} us/transform)", flush=True)
print("done", flush=True)
