"""Round-5 decomposition of the 2048^2 two-layer QG step (the reference's
largest production grid, swqg/TwoLayerParameters.jl:5).

After the folded-DFT extension to 2048^2 the step runs at ~78 steps/s
(12.8 ms). Where does it go?  Pieces timed scan-amortized (20 iterations
per jit at this size): the full IF-AB3 step, calcN alone, the folded
transform pair alone (6-ch inverse + 4-ch forward at 2048^2), one
apply_L (per-mode 2x2 channel einsum against the expm tables), and the
streamfunction inversion.  Run with JRSW_FFT={auto,fft,dft3} to compare
backends end-to-end.
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

from juliaraytracingsw_tpu.core.grid import make_grid  # noqa: E402
from juliaraytracingsw_tpu.core.spectral import (  # noqa: E402
    irfft2_dealiased,
    rfft2,
    rfft2_dealiased,
)
from juliaraytracingsw_tpu.core.steppers import (  # noqa: E402
    apply_L,
    expm_tables,
    zero_clock,
)
from juliaraytracingsw_tpu.coupled.driver import derive_nu  # noqa: E402
from juliaraytracingsw_tpu.models import twolayerqg  # noqa: E402
from juliaraytracingsw_tpu.models.base import build_stepper, run  # noqa: E402

NX = int(os.environ.get("NX", "2048"))
S = int(os.environ.get("S", "20"))
g = make_grid(NX)
dt = 1e-3
model = twolayerqg.make_model(g, U=0.2, mu=1e-2,
                              nu=derive_nu(1.0, NX, 4, dt), nnu=4)
rng = np.random.default_rng(7)
phys = rng.standard_normal((2, g.ny, g.nx)).astype(np.float32)
sol0 = rfft2(jnp.asarray(phys)) * g.dealias_mask
sol0 = (0.3 * sol0 * jnp.exp(-g.Krsq / 20.0**2)
        / jnp.abs(sol0).max()).astype(jnp.complex64)
print(f"device: {jax.devices()[0]}  NX={NX}  JRSW_FFT="
      f"{os.environ.get('JRSW_FFT', 'auto')}", flush=True)


def timeit(fn, x, iters=3):
    cs = [jnp.float32(1e-9 * i) for i in range(iters + 1)]
    jax.block_until_ready(fn(x, cs[0]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(x, cs[i + 1])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / S


init_fn, step_fn = build_stepper(model, "IFMAB3", dt=dt)


@jax.jit
def steps(sol, c):
    sol = sol * (1.0 + 0j * c)
    sol, clock, st = run(step_fn, sol, zero_clock(), init_fn(sol), S)
    return sol


t = timeit(steps, sol0)
print(f"full IF-AB3 step       : {t*1e6:8.1f} us/step ({1/t:.1f} steps/s)",
      flush=True)


@jax.jit
def calcs(sol, c):
    def body(carry, _):
        n = model.calcN(carry, 0.0)
        return (n / (1e-30 + jnp.max(jnp.abs(n))) * 0.02).astype(
            jnp.complex64), None

    out, _ = jax.lax.scan(body, sol * (1.0 + 0j * c), None, length=S)
    return out


t = timeit(calcs, sol0)
print(f"calcN alone            : {t*1e6:8.1f} us/iter", flush=True)


# the folded transform pair inside calcN: 6-channel inverse + 4-channel
# forward (psix*q, psiy*q per layer)
@jax.jit
def transforms(sol, c):
    def body(carry, _):
        stack = jnp.concatenate([carry, carry, carry])  # 6 channels
        phys = irfft2_dealiased(stack, g)
        back = rfft2_dealiased(phys[:4], g)
        out = back[:2] + 0.5 * back[2:4]
        return (out / (1e-30 + jnp.max(jnp.abs(out))) * 0.02).astype(
            jnp.complex64), None

    out, _ = jax.lax.scan(body, sol * (1.0 + 0j * c), None, length=S)
    return out


t = timeit(transforms, sol0)
print(f"6-ch inv + 4-ch fwd    : {t*1e6:8.1f} us/iter", flush=True)


# streamfunction inversion alone (per-mode 2x2 solve, elementwise)
@jax.jit
def inversions(sol, c):
    def body(carry, _):
        psih = twolayerqg.streamfunction_from_pv(carry, g, model.params)
        return (psih / (1e-30 + jnp.max(jnp.abs(psih))) * 0.02).astype(
            jnp.complex64), None

    out, _ = jax.lax.scan(body, sol * (1.0 + 0j * c), None, length=S)
    return out


t = timeit(inversions, sol0)
print(f"PV inversion alone     : {t*1e6:8.1f} us/iter", flush=True)


e1, e2 = expm_tables(twolayerqg.build_L(g, model.params), dt)


@jax.jit
def applyLs(sol, c):
    def body(carry, _):
        out = apply_L(e1, carry)
        return (out / (1e-30 + jnp.max(jnp.abs(out))) * 0.02).astype(
            jnp.complex64), None

    out, _ = jax.lax.scan(body, sol * (1.0 + 0j * c), None, length=S)
    return out


t = timeit(applyLs, sol0)
print(f"one apply_L            : {t*1e6:8.1f} us/iter (x3 per AB3 step)",
      flush=True)

print("done", flush=True)
