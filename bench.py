"""Single-chip benchmark on the flagship configuration.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: rays/s/chip on the hero config — 512^2 RSW turbulence
coupled to a 1M-packet WKB ray ensemble (BASELINE.md: "512^2 RSW + 1M
coupled ray packets"). The reference publishes no numbers
(BASELINE.json "published": {}), so the baseline is self-established:
vs_baseline is the ratio to the best recorded hero number in
BENCH_SELF.json.

The production hero uses bfloat16 pair tables (VERDICT r3 item 2): the
gathered rows upcast to f32 before any stage math, so the only error is
~2^-8 relative rounding of the stored field values — the same class of
storage quantisation as the reference's 9-bit texture-weight fixed point
(raytracing/GPURaytracing.jl:118-127) — and the trajectory divergence is
bounded by tests/test_rays.py::test_bf16_table_trajectory_divergence plus
the production-horizon measurement in docs/PERFORMANCE.md. A full-f32 row
(hero_f32) is always recorded alongside.

TIMING METHODOLOGY: the tunneled TPU runtime caches results of repeated
identical calls, so every timed call mixes a fresh tiny scalar into its
inputs (see benchmarks/profiling/prof_true.py); big arrays stay
device-resident across calls. Every metric is the MIN over N>=2 trials of
an iters-call average, and the trial spread (max-min)/min is recorded as
<tag>_spread — >10% flags a noisy shared host (VERDICT r3 item 6). A >20%
hero drop against BENCH_SELF.json is reported as a regression warning on
stderr.

Extra metrics (flow-only steps/s at 512^2 and 1024^2, f32/bspline heroes,
262k ensemble, 1024^2 coupled hero, birth/death hero, adaptive hero with
accept/reject counts, fwd+bwd step time, 100-step backward) go to stderr
and BENCH_SELF.json.
"""
from __future__ import annotations

import itertools
import json
import os
import sys
import time

import numpy as np

SELF_BASELINE_PATH = os.path.join(os.path.dirname(__file__), "BENCH_SELF.json")
_COUNTER = itertools.count()


def _timeit_unique(make_call, warmup=2, iters=3, trials=3):
    """make_call(c) runs the computation with scalar c mixed in; times the
    steady state with a fresh c per call (defeats the tunnel result cache).
    Returns (min-of-trials mean seconds, relative spread across trials)."""
    import jax

    out = None
    for _ in range(warmup):
        out = make_call(next(_COUNTER))
    jax.block_until_ready(out)
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = make_call(next(_COUNTER))
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    tmin = min(times)
    return tmin, (max(times) - tmin) / tmin


def main():
    import jax

    # first compiles on the tunneled TPU backend are minutes-slow; persist them
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from juliaraytracingsw_tpu.core.grid import make_grid
    from juliaraytracingsw_tpu.core.steppers import zero_clock
    from juliaraytracingsw_tpu.coupled.driver import derive_nu, make_coupled_frame, SimState
    from juliaraytracingsw_tpu.coupled.initial_conditions import band_geo_wave_ic
    from juliaraytracingsw_tpu.models import rsw
    from juliaraytracingsw_tpu.models.base import build_stepper, run
    from juliaraytracingsw_tpu.rays.packets import lattice_packets
    from juliaraytracingsw_tpu.rays.raytrace import RayParams, fields_from_psih
    from juliaraytracingsw_tpu.rays.resample import init_birth_death

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    f, Cg, dt = 3.0, 1.0, 1e-3
    results = {}

    def record(tag, value, spread, desc):
        results[tag] = value
        results[f"{tag}_spread"] = round(spread, 4)
        noisy = "  [NOISY HOST >10% spread]" if spread > 0.10 else ""
        print(f"# {desc} (spread {spread * 100:.1f}%){noisy}", file=sys.stderr)

    # --- flow-only spectral steps/s at 512^2 and 1024^2 ---------------------
    grids, models = {}, {}
    for nx in (512, 1024):
        grid = make_grid(nx)
        model = rsw.make_model(grid, nu=derive_nu(1.0, nx, 4, dt), nnu=4,
                               f=f, Cg=Cg)
        grids[nx], models[nx] = grid, model
        init_fn, step_fn = build_stepper(model, "IFMAB3", dt=dt)
        rng = np.random.default_rng(1)
        sol = band_geo_wave_ic(grid, rng, Kg=(10, 13), Kw=(0, 5), ag=0.5,
                               aw=0.05, f=f, Cg=Cg)
        state = init_fn(sol)
        clock = zero_clock()
        # 200 steps/jitted call: at DFT-backend speeds (~350 us/step) the
        # tunnel's ~5-6 ms per-call dispatch dominated the old 20-step
        # chunks and under-reported throughput ~2x (prof_r5_step_decompose:
        # scan-200 measures 2861 steps/s DFT vs 1451 XLA-FFT at 512^2);
        # production frames run >=100 steps per jitted call, so the long
        # chunk is the representative shape
        steps_per_call = 200

        @jax.jit
        def chunk(sol, clock, state, c):
            sol = sol * (1.0 + 1e-12 * c)
            return run(step_fn, sol, clock, state, steps_per_call)

        t, sp = _timeit_unique(
            lambda c: chunk(sol, clock, state, jnp.float32(c)), iters=4)
        record(f"rsw{nx}_flow_steps_per_s", steps_per_call / t, sp,
               f"rsw {nx}^2 flow: {steps_per_call / t:.1f} steps/s")

    # --- hero family: RSW + packets coupled ---------------------------------
    def psih_maker(grid, params):
        def psih_fn(sol):
            Kd2 = params.f**2 / params.Cg2
            qh = grid.ik * sol[1] - grid.il * sol[0] - params.f * sol[2]
            return -qh / (grid.Krsq + Kd2)
        return psih_fn

    k0 = float(np.sqrt(3.0) * f / Cg)
    flow_steps, ray_substeps = 5, 1
    sols = {}
    for nx in (512, 1024):
        rng = np.random.default_rng(1)
        sols[nx] = band_geo_wave_ic(grids[nx], rng, Kg=(10, 13), Kw=(0, 5),
                                    ag=0.5, aw=0.05, f=f, Cg=Cg)

    def hero(sqrtp, interp, tag, table_dtype="bfloat16", nx=512,
             birth_death=False, ray_method="rk4", ray_opts=None, trials=3):
        grid, model = grids[nx], models[nx]
        init_fn, step_fn = build_stepper(model, "IFMAB3", dt=dt)
        psih_fn = psih_maker(grid, model.params)
        rp = RayParams(f=f, Cg=Cg, x0=float(grid.x[0]), y0=float(grid.y[0]),
                       dx=grid.dx, dy=grid.dy, interp=interp,
                       table_dtype=table_dtype)
        packets = lattice_packets(sqrtp, grid.Lx, grid.Ly, k0=k0, k_ring=True)
        bd_cfg = dict(k_shape=1.5, lam=10.0) if birth_death else None
        frame = make_coupled_frame(model, step_fn, psih_fn, rp, flow_steps,
                                   ray_substeps=ray_substeps,
                                   ray_method=ray_method,
                                   k_cutoff=100.0 * f / Cg, k0=k0,
                                   birth_death=bd_cfg, ray_opts=ray_opts)
        fields0 = fields_from_psih(psih_fn(sols[nx]), grid, rp.interp)
        bd = (init_birth_death(jax.random.PRNGKey(0), packets.n)
              if birth_death else None)
        sim = SimState(sols[nx], zero_clock(), init_fn(sols[nx]), packets,
                       fields0, bd)

        def call(c):
            pk = packets._replace(x=packets.x + 1e-6 * c)
            return frame(sim._replace(packets=pk))

        t, sp = _timeit_unique(call, warmup=2, iters=3, trials=trials)
        # plausibility guard: every hero frame is >=5 ms by construction
        # (1M packets or a 1024^2 flow), so >1000 coupled steps/s means the
        # tunnel returned without completing (seen once, round 5: hero1024
        # read 36020 steps/s with 24% spread). Retry the measurement once.
        if flow_steps / t > 1000.0:
            print(f"# {tag}: implausible {flow_steps / t:.0f} coupled "
                  f"steps/s (tunnel glitch?) — retrying", file=sys.stderr)
            t, sp = _timeit_unique(call, warmup=2, iters=3, trials=trials)
        npackets = sqrtp * sqrtp
        rays_per_s = npackets * ray_substeps * flow_steps / t
        results[f"{tag}_coupled_steps_per_s"] = flow_steps / t
        record(f"{tag}_rays_per_s_per_chip", rays_per_s, sp,
               f"{tag}: {rays_per_s:.3e} ray-steps/s, "
               f"{flow_steps / t:.2f} coupled steps/s")
        return rays_per_s, rp, packets, sim

    rays_per_s, rp, packets, sim = hero(1024, "bilinear", "hero")
    hero(1024, "bilinear", "hero_f32", table_dtype="float32")
    hero(1024, "bspline", "hero_bspline")
    # bicubic Hermite corner-data hero (round 5: bicubic runs through the
    # fused kernel too — VERDICT r4 item 5)
    hero(1024, "bicubic", "hero_bicubic", trials=2)
    hero(512, "bilinear", "ensemble262k")   # reference's largest real ensemble
    # 1024^2 coupled + 262k packets (BASELINE config 5 minus multi-host;
    # reference 1024^2 capacity: rsw/FroudeParameters.jl:4) and birth/death
    # resampling on the 262k ensemble (VERDICT r3 item 7)
    hero(512, "bilinear", "hero1024", nx=1024, trials=2)
    hero(512, "bilinear", "hero_bd", birth_death=True, trials=2)
    # adaptive hero: the reference's production path is ADAPTIVE Vern7 with
    # DifferentialEquations defaults reltol=1e-3/abstol=1e-6
    # (GPURaytracing.jl:111-113,135-137; VERDICT r3 item 3). Embedded
    # DP5(4), forward-only while_loop so finished slots cost nothing.
    hero(1024, "bilinear", "hero_adaptive", ray_method="adaptive",
         ray_opts=dict(rtol=1e-3, atol=1e-6, max_steps=16, init_substeps=1,
                       loop="while"), trials=2)
    # accept/reject telemetry for the adaptive row (one representative
    # flow-step interval on the same fields/tolerances)
    from juliaraytracingsw_tpu.rays.raytrace import raytrace_adaptive

    grid512 = grids[512]
    f0_ = fields_from_psih(psih_maker(grid512, models[512].params)(sols[512]),
                           grid512, "bilinear")
    _, info = raytrace_adaptive(packets, f0_, f0_, 0.0, dt, rp,
                                rtol=1e-3, atol=1e-6, max_steps=16,
                                init_substeps=1, loop="while")
    results["hero_adaptive_accepted_per_interval"] = int(info["n_accepted"])
    results["hero_adaptive_rejected_per_interval"] = int(info["n_rejected"])
    print(f"# hero_adaptive: {int(info['n_accepted'])} accepted / "
          f"{int(info['n_rejected'])} rejected attempts per flow interval",
          file=sys.stderr)

    # --- sharded frame on a mesh of 1: the sharding-machinery tax ----------
    # (VERDICT r4 item 8 + item 2 hardware leg: the fused Pallas substep is
    # ACTIVE inside the sharded coupled frame here — JRSW_FUSED=auto
    # resolves to the real kernel — so this row also proves the kernel
    # under the shard_map/NamedSharding composition on hardware.)
    from juliaraytracingsw_tpu.parallel.mesh import make_mesh, shard_packets
    from juliaraytracingsw_tpu.parallel.sharded_rsw import ShardedRSW

    grid512 = grids[512]
    mesh1 = make_mesh(1)
    shm = ShardedRSW(grid512, models[512].params, mesh1, dt=dt)
    init_sh, _ = shm.stepper()
    frame_sh = shm.make_coupled_frame(rp, flow_steps, ray_substeps=1,
                                      k_cutoff=100.0 * f / Cg, k0=k0)
    sol_sh = shm.shard_solution(sols[512])
    state_sh = init_sh(sol_sh)
    pk_sh = shard_packets(packets, mesh1)

    def call_sh(c):
        pk = pk_sh._replace(x=pk_sh.x + 1e-6 * c)
        return frame_sh(sol_sh, zero_clock(), state_sh, pk)

    t, sp = _timeit_unique(call_sh, warmup=2, iters=3, trials=2)
    sh_rays = packets.n * flow_steps / t
    record("hero_sharded1_rays_per_s_per_chip", sh_rays, sp,
           f"hero_sharded1 (mesh of 1, fused kernel active): "
           f"{sh_rays:.3e} ray-steps/s = {sh_rays / rays_per_s:.2f}x "
           f"replicated hero")
    results["hero_sharded1_vs_replicated"] = sh_rays / rays_per_s

    # --- opt-in dft3 flow row (JRSW_FFT=dft3: BF16_X3 dense-DFT matmuls,
    # ~2.4e-5 relative accuracy (3M-stage re-quantified round 5), prof_r5_flow_fft2.py) ----------------------
    os.environ["JRSW_FFT"] = "dft3"
    try:
        grid, model = grids[512], models[512]
        init_fn, step_fn = build_stepper(model, "IFMAB3", dt=dt)
        rng = np.random.default_rng(1)
        sol3 = band_geo_wave_ic(grid, rng, Kg=(10, 13), Kw=(0, 5), ag=0.5,
                                aw=0.05, f=f, Cg=Cg)
        state3 = init_fn(sol3)
        steps_per_call = 200

        @jax.jit
        def chunk3(sol, clock, state, c):
            sol = sol * (1.0 + 1e-12 * c)
            return run(step_fn, sol, clock, state, steps_per_call)

        t, sp = _timeit_unique(
            lambda c: chunk3(sol3, zero_clock(), state3, jnp.float32(c)),
            iters=4, trials=2)
        record("rsw512_dft3_flow_steps_per_s", steps_per_call / t, sp,
               f"rsw 512^2 flow (JRSW_FFT=dft3): "
               f"{steps_per_call / t:.1f} steps/s")
    finally:
        del os.environ["JRSW_FFT"]

    # --- 2048^2 two-layer QG flow (the reference's LARGEST production grid,
    # swqg/TwoLayerParameters.jl:5): folded-DFT + 3M-Karatsuba default.
    # The dft3 opt-in at this size is recorded in scripts/hw_validation.md
    # (129.7 steps/s round 5) — kept out of bench to bound runtime. --------
    from juliaraytracingsw_tpu.core.spectral import rfft2 as _rfft2
    from juliaraytracingsw_tpu.models import twolayerqg

    grid2k = make_grid(2048)
    model2k = twolayerqg.make_model(grid2k, U=0.2, mu=1e-2,
                                    nu=derive_nu(1.0, 2048, 4, dt), nnu=4)
    init2k, step2k = build_stepper(model2k, "IFMAB3", dt=dt)
    rng = np.random.default_rng(7)
    phys2k = rng.standard_normal((2, 2048, 2048)).astype(np.float32)
    sol2k = _rfft2(jnp.asarray(phys2k)) * grid2k.dealias_mask
    sol2k = (0.3 * sol2k * jnp.exp(-grid2k.Krsq / 20.0**2)
             / jnp.abs(sol2k).max()).astype(jnp.complex64)
    steps2k = 40

    @jax.jit
    def chunk2k(sol, clock, state, c):
        sol = sol * (1.0 + 1e-12 * c)
        return run(step2k, sol, clock, state, steps2k)

    t, sp = _timeit_unique(
        lambda c: chunk2k(sol2k, zero_clock(), init2k(sol2k),
                          jnp.float32(c)), iters=2, trials=2)
    record("twolayer2048_flow_steps_per_s", steps2k / t, sp,
           f"2048^2 two-layer QG flow: {steps2k / t:.1f} steps/s")
    del sol2k, phys2k

    # --- fwd+bwd step time (differentiable hero step, full defaults) -------
    # The fused kernel's custom VJP linearizes the NORMAL-layout per-stage
    # formulation (ops/pallas_ray_step bwd), measured at parity with the
    # chunked-XLA AD backward (70.9 vs 70.1 ms) — so the gradient row runs
    # the same defaults as the forward rows.
    from juliaraytracingsw_tpu.rays.raytrace import raytrace

    grid, model = grids[512], models[512]
    init_fn, step_fn = build_stepper(model, "IFMAB3", dt=dt)
    psih_fn = psih_maker(grid, model.params)
    sol = sols[512]

    @jax.jit
    def grad_step(sol, pkts, c):
        def loss(s):
            s = s * (1.0 + 1e-12 * c)
            fields_old = fields_from_psih(psih_fn(s), grid, rp.interp)
            s1, c1, st1 = step_fn(s, zero_clock(), init_fn(s))
            fields_new = fields_from_psih(psih_fn(s1), grid, rp.interp)
            out = raytrace(pkts, fields_old, fields_new, 0.0, dt, rp,
                           nsubsteps=1)
            return jnp.mean(out.k**2 + out.l**2)

        return jax.value_and_grad(loss)(sol)

    t, sp = _timeit_unique(
        lambda c: grad_step(sol, packets, jnp.float32(c)),
        warmup=1, iters=3, trials=2)
    record("hero_fwd_bwd_step_s", t, sp,
           f"hero fwd+bwd step: {t * 1e3:.1f} ms")

    # --- long-horizon backward: grad through 100 coupled 512^2 steps --------
    # VERDICT r3 item 5 asked for a patch-path backward competitive with
    # taps at this scale; BOTH alternatives were built and measured
    # (rays/raytrace._patch_bwd_impl): the taps-custom-VJP patch path costs
    # 12.6 s here and the AD-table-transpose patch path 5.3 s — the pure
    # taps-gather configuration below (3.1 s) remains the measured optimum
    # for small-ensemble long-horizon gradients, because at 16k packets the
    # per-stage tap gathers are cheap while any patch path pays a
    # grid-sized table rebuild per step (docs/PERFORMANCE.md).
    rp_taps = RayParams(f=f, Cg=Cg, x0=float(grid.x[0]), y0=float(grid.y[0]),
                        dx=grid.dx, dy=grid.dy, interp="bilinear",
                        gather="taps")
    pk128 = lattice_packets(128, grid.Lx, grid.Ly, k0=k0, k_ring=True)
    frame100 = make_coupled_frame(model, step_fn, psih_fn, rp_taps,
                                  flow_steps=100, ray_substeps=1,
                                  k_cutoff=100.0 * f / Cg, k0=k0, remat=True)

    @jax.jit
    def grad_through_100(s, pkts, c):
        def loss(s):
            s = s * (1.0 + 1e-12 * c)
            fields0 = fields_from_psih(psih_fn(s), grid, rp_taps.interp)
            sim = SimState(s, zero_clock(), init_fn(s), pkts, fields0)
            out = frame100(sim)
            return jnp.mean(out.packets.k**2 + out.packets.l**2)

        return jax.value_and_grad(loss)(s)

    t, sp = _timeit_unique(
        lambda c: grad_through_100(sol, pk128, jnp.float32(c)),
        warmup=1, iters=2, trials=2)
    record("bwd100_remat_512_s", t, sp,
           f"grad through 100 coupled 512^2 steps "
           f"(remat, taps gather, 16k packets): {t:.2f} s")

    # --- self-baseline ratio + regression guard -----------------------------
    # The regression reference is the best hero number ever recorded
    # ("best_hero_rays_per_s"); fresh results are always merged back into
    # BENCH_SELF.json so new metrics accumulate across rounds.
    vs = 1.0
    prev = {}
    if os.path.exists(SELF_BASELINE_PATH):
        try:
            with open(SELF_BASELINE_PATH) as fh:
                prev = json.load(fh)
        except Exception:
            prev = {}
    best = prev.get("best_hero_rays_per_s",
                    prev.get("hero_rays_per_s_per_chip", 0.0)) or 0.0
    if best:
        vs = rays_per_s / best
        if vs < 0.8:
            print(f"# PERF REGRESSION: hero {rays_per_s:.3e} is {vs:.2f}x the "
                  f"recorded best {best:.3e} (BENCH_SELF.json)",
                  file=sys.stderr)
    merged = dict(prev)
    merged.update(results)
    merged["best_hero_rays_per_s"] = max(best, rays_per_s)
    merged["note"] = (
        "round 5: (1) flow side — JRSW_FFT dense-DFT-matmul backend + "
        "dealias-FOLDED calcN transforms (masked modes sliced out of the "
        "factor matrices, exact) + the 3-multiply Karatsuba c2c middle "
        "stage (4 -> 3 matmuls, JRSW_DFT_3M=off restores): rsw512 flow "
        "1451 (XLA FFT, 200-step chunks) -> ~3100 steps/s f32-exact; "
        "rsw512_dft3 row = the quantified BF16_X3 opt-in (~1.9e-5 rel); "
        "twolayer2048 row = the reference's largest grid, 72.6 -> 86.9 "
        "steps/s default (129.7 dft3, scripts/hw_validation.md); plain "
        "1024^2 transforms stay on the XLA FFT (dense N^3 crossover, "
        "measured — prof_r5_flow_fft2.py). "
        "(2) adaptive parity mode — the fused DP5(4) ATTEMPT kernel "
        "(7 stages + Hairer error row in VMEM, loop='while'): "
        "hero_adaptive 2.75e7 -> ~4.45e7 (+62%). (3) hero_bicubic = first "
        "bicubic hero row (Hermite corner weights in-kernel). "
        "(4) hero_sharded1 = the sharded coupled frame on a mesh of 1 "
        "WITH the fused Pallas kernel active: 0.99x replicated — the "
        "sharding-machinery tax is ~1% and the kernel survives the "
        "shard_map/NamedSharding composition on hardware (VERDICT r4 "
        "items 2+8). (5) gather-overlap ablation NEGATIVE and recorded: "
        "in-kernel per-row DMA issues at 114-115 ns/row (K=8/32) vs "
        "XLA's 19-22 ns/row take; sorted-window one-hot expansion wins "
        "inside the gather (9.6 ms/1M rows) but sort+permute upkeep "
        "costs more than it saves (argsort 5.8 ms + 17.5 ns/row narrow "
        "permutes) — docs/PERFORMANCE.md round-5 section. Round-4 "
        "context: hero defaults = bf16 pair tables + JRSW_RAY_CHUNK=65536 "
        "+ fused Pallas substep (JRSW_FUSED=auto); backward = AD table "
        "transpose; bwd100 optimum = pure taps at 16k packets."
    )
    with open(SELF_BASELINE_PATH, "w") as fh:
        json.dump(merged, fh, indent=1)

    print(json.dumps({
        "metric": "rays/s/chip (1M packets, 512^2 RSW coupled, bf16 tables)",
        "value": rays_per_s,
        "unit": "ray-steps/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
