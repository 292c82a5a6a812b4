"""Flow-step decomposition at 512^2/1024^2: where does the ~1 ms go?
Chained scans (each iteration feeds the next) defeat caching/elision.
"""
import os, signal, sys, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")

from juliaraytracingsw_tpu.core.grid import make_grid
from juliaraytracingsw_tpu.core.spectral import irfft2, rfft2
from juliaraytracingsw_tpu.core.steppers import zero_clock, expm_tables, apply_L
from juliaraytracingsw_tpu.coupled.driver import derive_nu
from juliaraytracingsw_tpu.models import rsw
from juliaraytracingsw_tpu.models.base import build_stepper, run
from juliaraytracingsw_tpu.coupled.initial_conditions import band_geo_wave_ic

signal.signal(signal.SIGALRM, lambda *a: (_ for _ in ()).throw(TimeoutError()))
TO = 700


def section(name, fn):
    signal.alarm(TO)
    try:
        fn()
    except TimeoutError:
        print(f"{name}: TIMEOUT", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
    finally:
        signal.alarm(0)


def timeit(fn, c0=0, iters=4):
    jax.block_until_ready(fn(jnp.float32(c0)))
    jax.block_until_ready(fn(jnp.float32(c0 + 1)))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(jnp.float32(c0 + 2 + i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


print("device:", jax.devices()[0], flush=True)
STEPS = 20
for nx in (512,):
    grid = make_grid(nx)
    dt = 1e-3
    model = rsw.make_model(grid, nu=derive_nu(1.0, nx, 4, dt), nnu=4,
                           f=3.0, Cg=1.0)
    init_fn, step_fn = build_stepper(model, "IFMAB3", dt=dt)
    rng = np.random.default_rng(1)
    sol = band_geo_wave_ic(grid, rng, Kg=(10, 13), Kw=(0, 5), ag=0.5,
                           aw=0.05, f=3.0, Cg=1.0)
    state = init_fn(sol)

    @jax.jit
    def full(s, st, c):
        return run(step_fn, s + 1e-8 * c, zero_clock(), st, STEPS)

    t = timeit(lambda c: full(sol, state, c))
    print(f"nx={nx} full IF-AB3 step      : {t/STEPS*1e3:7.3f} ms/step "
          f"({STEPS/t:7.1f} steps/s)", flush=True)

    @jax.jit
    def calcn_only(s0, c):
        def body(s, _):
            return s + (1e-6 * dt) * model.calcN(s, 0.0), None
        s, _ = jax.lax.scan(body, s0 + 1e-8 * c, None, length=STEPS)
        return s
    calcn_only = __import__('functools').partial(calcn_only, sol)

    section(f"nx={nx} calcN", lambda: print(
        f"nx={nx} calcN only            : {timeit(calcn_only, 10)/STEPS*1e3:7.3f} ms/step",
        flush=True))

    @jax.jit
    def fft_only_(s0, c):
        def body(s, _):
            stack = jnp.stack([s[0], s[1], s[2], grid.ik * s[0],
                               grid.il * s[0], grid.ik * s[1], grid.il * s[1]])
            phys = irfft2(stack, grid.nx)
            pr = jnp.stack([phys[0] * phys[3] + phys[1] * phys[4],
                            phys[0] * phys[5] + phys[1] * phys[6],
                            phys[2] * phys[0], phys[2] * phys[1]])
            ph = rfft2(pr)
            return s + 1e-6 * jnp.stack([ph[0], ph[1], ph[2]]), None
        s, _ = jax.lax.scan(body, s0 + 1e-8 * c, None, length=STEPS)
        return s
    fft_only = __import__('functools').partial(fft_only_, sol)

    section(f"nx={nx} fft", lambda: print(
        f"nx={nx} 7-irfft2+4-rfft2+prods: {timeit(fft_only, 20)/STEPS*1e3:7.3f} ms/step",
        flush=True))

    expLdt, exp2Ldt = expm_tables(model.L, dt)

    @jax.jit
    def applyl_only_(s0, c):
        def body(s, _):
            return apply_L(expLdt, s) * (1.0 - 1e-9), None
        s, _ = jax.lax.scan(body, s0 + 1e-8 * c, None, length=3 * STEPS)
        return s
    applyl_only = __import__('functools').partial(applyl_only_, sol)

    section(f"nx={nx} applyL", lambda: print(
        f"nx={nx} apply_L (x1)          : {timeit(applyl_only, 30)/(3*STEPS)*1e3:7.3f} ms/call",
        flush=True))

    @jax.jit
    def dealias_only_(s0, c):
        def body(s, _):
            return grid.dealias(s) + 1e-12 * c, None
        s, _ = jax.lax.scan(body, s0 + 1e-8 * c, None, length=3 * STEPS)
        return s
    dealias_only = __import__('functools').partial(dealias_only_, sol)

    section(f"nx={nx} dealias", lambda: print(
        f"nx={nx} dealias (x1)          : {timeit(dealias_only, 40)/(3*STEPS)*1e3:7.3f} ms/call",
        flush=True))
print("done", flush=True)
