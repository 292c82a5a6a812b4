"""Single-chip benchmark on the flagship configuration.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: rays/s/chip on the hero config — 512^2 RSW turbulence
coupled to a 1M-packet WKB ray ensemble (BASELINE.md: "512^2 RSW + 1M
coupled ray packets"). The reference publishes no numbers
(BASELINE.json "published": {}), so the baseline is self-established:
vs_baseline is the ratio to the best recorded hero number in
BENCH_SELF.json.

TIMING METHODOLOGY: the tunneled TPU runtime caches results of repeated
identical calls, so every timed call mixes a fresh tiny scalar into its
inputs (see benchmarks/profiling/prof_true.py); big arrays stay
device-resident across calls. A >20% hero drop against BENCH_SELF.json is
reported as a regression warning on stderr (VERDICT round-1 item 10).

Extra metrics (flow-only steps/s at 512^2 and 1024^2, bspline hero, 262k
ensemble, fwd+bwd step time) go to stderr and BENCH_SELF.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

SELF_BASELINE_PATH = os.path.join(os.path.dirname(__file__), "BENCH_SELF.json")


def _timeit_unique(make_call, warmup=2, iters=4):
    """make_call(c) runs the computation with scalar c mixed in; times the
    steady state with a fresh c per call (defeats the tunnel result cache)."""
    import jax

    cs = list(range(warmup + iters))
    out = None
    for i in range(warmup):
        out = make_call(cs[i])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = make_call(cs[warmup + i])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


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

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    f, Cg, dt = 3.0, 1.0, 1e-3
    results = {}

    # --- flow-only spectral steps/s at 512^2 and 1024^2 ---------------------
    for nx in (512, 1024):
        grid = make_grid(nx)
        model = rsw.make_model(grid, nu=derive_nu(1.0, nx, 4, dt), nnu=4,
                               f=f, Cg=Cg)
        init_fn, step_fn = build_stepper(model, "IFMAB3", dt=dt)
        rng = np.random.default_rng(1)
        sol = band_geo_wave_ic(grid, rng, Kg=(10, 13), Kw=(0, 5), ag=0.5,
                               aw=0.05, f=f, Cg=Cg)
        state = init_fn(sol)
        clock = zero_clock()
        steps_per_call = 20

        @jax.jit
        def chunk(sol, clock, state, c):
            sol = sol * (1.0 + 1e-12 * c)
            return run(step_fn, sol, clock, state, steps_per_call)

        t = _timeit_unique(
            lambda c: chunk(sol, clock, state, jnp.float32(c)))
        results[f"rsw{nx}_flow_steps_per_s"] = steps_per_call / t
        print(f"# rsw {nx}^2 flow: {steps_per_call / t:.1f} steps/s",
              file=sys.stderr)

    # --- hero: 512^2 RSW + packets coupled ----------------------------------
    nx = 512
    grid = make_grid(nx)
    model = rsw.make_model(grid, nu=derive_nu(1.0, nx, 4, dt), nnu=4,
                           f=f, Cg=Cg)
    init_fn, step_fn = build_stepper(model, "IFMAB3", dt=dt)
    params = model.params

    def psih_fn(sol):
        Kd2 = params.f**2 / params.Cg2
        qh = grid.ik * sol[1] - grid.il * sol[0] - params.f * sol[2]
        return -qh / (grid.Krsq + Kd2)

    rng = np.random.default_rng(1)
    sol = band_geo_wave_ic(grid, rng, Kg=(10, 13), Kw=(0, 5), ag=0.5,
                           aw=0.05, f=f, Cg=Cg)
    k0 = float(np.sqrt(3.0) * f / Cg)
    flow_steps, ray_substeps = 5, 1

    def hero(sqrtp, interp, tag, table_dtype="float32"):
        rp = RayParams(f=f, Cg=Cg, x0=float(grid.x[0]), y0=float(grid.y[0]),
                       dx=grid.dx, dy=grid.dy, interp=interp,
                       table_dtype=table_dtype)
        packets = lattice_packets(sqrtp, grid.Lx, grid.Ly, k0=k0, k_ring=True)
        frame = make_coupled_frame(model, step_fn, psih_fn, rp, flow_steps,
                                   ray_substeps=ray_substeps,
                                   k_cutoff=100.0 * f / Cg, k0=k0)
        fields0 = fields_from_psih(psih_fn(sol), grid, rp.interp)
        sim = SimState(sol, zero_clock(), init_fn(sol), packets, fields0)

        def call(c):
            pk = packets._replace(x=packets.x + 1e-6 * c)
            return frame(sim._replace(packets=pk))

        t = _timeit_unique(call, warmup=2, iters=3)
        npackets = sqrtp * sqrtp
        rays_per_s = npackets * ray_substeps * flow_steps / t
        results[f"{tag}_rays_per_s_per_chip"] = rays_per_s
        results[f"{tag}_coupled_steps_per_s"] = flow_steps / t
        print(f"# {tag}: {rays_per_s:.3e} ray-steps/s, "
              f"{flow_steps / t:.2f} coupled steps/s", file=sys.stderr)
        return rays_per_s, rp, packets, sim

    rays_per_s, rp, packets, sim = hero(1024, "bilinear", "hero")
    hero(1024, "bilinear", "hero_bf16", table_dtype="bfloat16")
    hero(1024, "bspline", "hero_bspline")
    hero(512, "bilinear", "ensemble262k")   # reference's largest real ensemble

    # --- fwd+bwd step time (differentiable hero step) ----------------------
    from juliaraytracingsw_tpu.rays.raytrace import raytrace

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

    t = _timeit_unique(lambda c: grad_step(sol, packets, jnp.float32(c)),
                       warmup=1, iters=3)
    results["hero_fwd_bwd_step_s"] = t
    print(f"# hero fwd+bwd step: {t * 1e3:.1f} ms", file=sys.stderr)

    # --- long-horizon backward: grad through 100 coupled 512^2 steps --------
    # VERDICT round-1 item 8 / SURVEY §5.7: the "long-context" problem here is
    # the backward pass through many coupled steps. remat=True checkpoints
    # each interleaved step; the taps gather path keeps the scan carry small
    # (no per-step patch table), so 100 512^2 steps fit single-chip HBM.
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

    t = _timeit_unique(lambda c: grad_through_100(sol, pk128, jnp.float32(c)),
                       warmup=1, iters=2)
    results["bwd100_remat_512_s"] = t
    print(f"# grad through 100 coupled 512^2 steps (remat, 16k packets): "
          f"{t:.2f} s", file=sys.stderr)

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
        "round 3: fast-path ablation measured (benchmarks/profiling/"
        "prof_r3_variants.py): the 1M-row pair gather is index-latency-"
        "bound (~15-18 ns/row at ~4% of HBM peak; width and dtype nearly "
        "free), so bf16 tables buy only ~5-7% and JRSW_PATCH_IMPL=mxu is "
        "net slower. New default stage math JRSW_PATCH_IMPL=pairsplit "
        "(weights shared between time levels) measured +6.5% over split "
        "(33.5 vs 35.9 ms/substep). Deeper cuts need the fused Mosaic "
        "kernel, which cannot compile in this environment (trivial "
        "pallas_call times out 600 s; recorded: benchmarks/profiling/"
        "PALLAS_PROBE_r3.md). ensemble262k per-ray deficit vs hero is the "
        "~3 ms/step fixed flow+fields+table cost amortised over fewer "
        "rays (t=F+N*v fit: F~3 ms, v~32 ns/ray) — per-ray throughput is "
        "monotone INCREASING in ensemble size, as it should be. 512^2 "
        "flow step is XLA-FFT-bound (docs/PERFORMANCE.md roofline)."
    )
    with open(SELF_BASELINE_PATH, "w") as fh:
        json.dump(merged, fh, indent=1)

    print(json.dumps({
        "metric": "rays/s/chip (1M packets, 512^2 RSW coupled)",
        "value": rays_per_s,
        "unit": "ray-steps/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
