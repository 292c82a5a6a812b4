"""Round-5 flow-step decomposition AFTER the DFT backend landed.

rsw512 is now ~1565 steps/s (0.64 ms/step). Where does the remaining time
go?  Candidates: the (folded) DFT transforms themselves, the 3x per-step
``apply_L`` channel einsums (per-mode 3x3 complex matvecs against the
9.4 MB expm tables), the pointwise products, and AB3 bookkeeping.
Scan-amortized timing (200 iterations per jit) — per-call timings are
tunnel-dispatch-bound.
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
from juliaraytracingsw_tpu.core.steppers import (  # noqa: E402
    apply_L,
    expm_tables,
    zero_clock,
)
from juliaraytracingsw_tpu.models.base import build_stepper  # noqa: E402
from juliaraytracingsw_tpu.core.transfer import to_device, to_host  # noqa: E402
from juliaraytracingsw_tpu.coupled.driver import derive_nu  # noqa: E402
from juliaraytracingsw_tpu.coupled.initial_conditions import band_geo_wave_ic  # noqa: E402
from juliaraytracingsw_tpu.models import rsw  # noqa: E402
from juliaraytracingsw_tpu.models.base import run  # noqa: E402

NX = 512
S = 200
g = make_grid(NX)
dt = 1e-3
model = rsw.make_model(g, nu=derive_nu(1.0, NX, 4, dt), nnu=4, f=3.0, Cg=1.0)
rng = np.random.default_rng(1)
sol0 = band_geo_wave_ic(g, rng, Kg=(10, 13), Kw=(0, 5), ag=0.5, aw=0.05,
                        f=3.0, Cg=1.0)
print("device:", jax.devices()[0], flush=True)


def timeit(fn, x, iters=3):
    cs = [jnp.float32(1e-9 * i) for i in range(iters + 1)]
    jax.block_until_ready(fn(x, cs[0]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(x, cs[i + 1])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / S


# full step chain
init_fn, step_fn = build_stepper(model, "IFMAB3", dt=dt)


@jax.jit
def steps(sol, c):
    # AB3 state built INSIDE the jit: closing over a device-resident
    # complex state triggers the unimplemented complex d2h at trace time
    sol = sol * (1.0 + 0j * c)
    sol, clock, st = run(step_fn, sol, zero_clock(), init_fn(sol), S)
    return sol


t = timeit(steps, sol0)
print(f"full IF-AB3 step      : {t*1e6:7.1f} us/step ({1/t:.0f} steps/s)",
      flush=True)


# calcN alone (iterated on its own output, renormalized)
@jax.jit
def calcs(sol, c):
    def body(carry, _):
        n = model.calcN(carry, 0.0)
        return (n / (1e-30 + jnp.max(jnp.abs(n))) * 0.02).astype(
            jnp.complex64), None

    out, _ = jax.lax.scan(body, sol * (1.0 + 0j * c), None, length=S)
    return out


t = timeit(calcs, sol0)
print(f"calcN alone           : {t*1e6:7.1f} us/iter", flush=True)

# apply_L alone (the per-mode 3x3 channel einsum against expm tables)
e1, e2 = expm_tables(rsw.build_L(g, model.params), dt)


@jax.jit
def applyLs(sol, c):
    def body(carry, _):
        out = apply_L(e1, carry)
        return (out / (1e-30 + jnp.max(jnp.abs(out))) * 0.02).astype(
            jnp.complex64), None

    out, _ = jax.lax.scan(body, sol * (1.0 + 0j * c), None, length=S)
    return out


t = timeit(applyLs, sol0)
print(f"one apply_L           : {t*1e6:7.1f} us/iter (x3 per AB3 step)",
      flush=True)

print("done", flush=True)
