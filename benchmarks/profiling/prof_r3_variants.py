"""Round-3 fast-path variant profile on the real TPU.

Measures, with a per-section alarm (tunnel compiles can hang, see
prof_substep_decompose's stages_only pathology):

  1. full rk4 substep, split impl, f32 table     (round-2 default)
  2. full rk4 substep, split impl, bf16 table    (VERDICT item 2)
  3. full rk4 substep, mxu pair impl             (VERDICT item 2)
  4. per-frame fixed costs: build_patch_table, make_pair_table,
     fields_from_psih, one IF-AB3 flow step      (VERDICT item 7 — the
     262k-ensemble deficit is fixed-cost amortisation)

Methodology: unique scalar inputs defeat the tunnel result cache
(prof_true.py).
"""
import os
import signal
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from juliaraytracingsw_tpu.rays.packets import Packets
from juliaraytracingsw_tpu.rays.patch import build_patch_table
from juliaraytracingsw_tpu.rays.raytrace import (
    RayParams,
    make_pair_table,
    raytrace_tables,
)

nx = ny = 512
N = 1 << 20
rng = np.random.default_rng(0)
SECTION_TIMEOUT = int(os.environ.get("PROF_SECTION_TIMEOUT", "900"))


class SectionTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise SectionTimeout


signal.signal(signal.SIGALRM, _alarm)


def section(name, fn):
    signal.alarm(SECTION_TIMEOUT)
    t_start = time.perf_counter()
    try:
        fn()
    except SectionTimeout:
        print(f"{name}: TIMEOUT after {SECTION_TIMEOUT}s "
              f"(compile wall {time.perf_counter() - t_start:.0f}s)",
              flush=True)
    finally:
        signal.alarm(0)


def timeit_unique(fn, iters=6):
    cs = [jnp.float32(1e-4 * i) for i in range(iters + 2)]
    jax.block_until_ready(fn(cs[0]))
    jax.block_until_ready(fn(cs[1]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(cs[i + 2])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


print("device:", jax.devices()[0], flush=True)
fields = jnp.asarray(rng.standard_normal((5, ny, nx)), jnp.float32)
fields2 = jnp.asarray(rng.standard_normal((5, ny, nx)), jnp.float32)
T_old = jax.jit(lambda: build_patch_table(fields, "bilinear"))()
T_new = jax.jit(lambda: build_patch_table(fields2, "bilinear"))()
T_pair = jax.jit(make_pair_table)(T_old, T_new)
T_pair_bf = T_pair.astype(jnp.bfloat16)
jax.block_until_ready((T_pair, T_pair_bf))
print("pair table:", T_pair.shape, flush=True)

x = jnp.asarray(rng.uniform(-np.pi, np.pi, N), jnp.float32)
y = jnp.asarray(rng.uniform(-np.pi, np.pi, N), jnp.float32)
kk = jnp.full((N,), 5.0, jnp.float32)
ll = jnp.zeros((N,), jnp.float32)
sgn = jnp.ones((N,), jnp.float32)
rp = RayParams(f=3.0, Cg=1.0, x0=-np.pi, y0=-np.pi,
               dx=2 * np.pi / nx, dy=2 * np.pi / ny)
rp_bf = rp._replace(table_dtype="bfloat16")


def run_substep(tag, table, rparams):
    @jax.jit
    def substep(c):
        p = Packets(x + c, y, kk, ll, sgn)
        return raytrace_tables(p, table, 0.0, 1e-3, rparams, ny, nx,
                               nsubsteps=1, method="rk4")

    t = timeit_unique(substep)
    print(f"{tag:28s}: {t * 1e3:8.2f} ms -> {N / t / 1e6:6.1f} M rays/s",
          flush=True)


section("substep split f32", lambda: run_substep(
    "full rk4 substep split f32", T_pair, rp))
section("substep split bf16", lambda: run_substep(
    "full rk4 substep split bf16", T_pair_bf, rp_bf))


def run_mxu():
    os.environ["JRSW_PATCH_IMPL"] = "mxu"
    jax.clear_caches()
    run_substep("full rk4 substep mxu f32", T_pair, rp)
    os.environ["JRSW_PATCH_IMPL"] = "split"
    jax.clear_caches()


section("substep mxu", run_mxu)


def run_fixed_costs():
    @jax.jit
    def build(c):
        return build_patch_table(fields * (1 + 1e-12 * c), "bilinear")

    t = timeit_unique(build)
    print(f"{'build_patch_table 512^2':28s}: {t * 1e3:8.2f} ms", flush=True)

    @jax.jit
    def pair(c):
        return make_pair_table(T_old * (1 + 1e-12 * c), T_new)

    t = timeit_unique(pair)
    print(f"{'make_pair_table (concat)':28s}: {t * 1e3:8.2f} ms", flush=True)

    from juliaraytracingsw_tpu.core.grid import make_grid
    from juliaraytracingsw_tpu.rays.raytrace import fields_from_psih

    g = make_grid(nx)
    psih = jnp.asarray(
        rng.standard_normal((ny, nx // 2 + 1))
        + 1j * rng.standard_normal((ny, nx // 2 + 1)), jnp.complex64)

    @jax.jit
    def ffp(c):
        return fields_from_psih(psih * (1 + 1e-12 * c), g, "bilinear")

    t = timeit_unique(ffp)
    print(f"{'fields_from_psih 512^2':28s}: {t * 1e3:8.2f} ms", flush=True)

    from juliaraytracingsw_tpu.core.steppers import zero_clock
    from juliaraytracingsw_tpu.coupled.driver import derive_nu
    from juliaraytracingsw_tpu.models import rsw
    from juliaraytracingsw_tpu.models.base import build_stepper

    model = rsw.make_model(g, nu=derive_nu(1.0, nx, 4, 1e-3), nnu=4,
                           f=3.0, Cg=1.0)
    init_fn, step_fn = build_stepper(model, "IFMAB3", dt=1e-3)
    sol = jnp.zeros((3, ny, nx // 2 + 1), jnp.complex64).at[:, 2, 3].set(1e-3)
    state = init_fn(sol)

    @jax.jit
    def one_step(c):
        return step_fn(sol * (1 + 1e-12 * c), zero_clock(), state)

    t = timeit_unique(one_step)
    print(f"{'IF-AB3 flow step 512^2':28s}: {t * 1e3:8.2f} ms", flush=True)


section("fixed costs", run_fixed_costs)
print("done", flush=True)
