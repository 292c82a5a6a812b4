"""bf16-table trajectory divergence at production horizon (VERDICT r3
item 2: quantify the accuracy cost of the promoted bf16 hero).

Runs the EXACT hero configuration (512^2 RSW + 1M packets, the same jitted
frame bench.py compiles) for N_FRAMES x 5 coupled steps with float32 and
bfloat16 pair tables from identical initial conditions, then reports the
trajectory divergence in physically meaningful units:

- max / p99 position divergence in CELLS (vs the 512-cell domain),
- max / p99 relative wavenumber divergence vs k0.

The bf16 error model: field values stored in the gathered table round to
~2^-8 relative; stage math upcasts to f32 (rays/raytrace.RayParams
docstring). The reference's CUDA texture path stores f32 fields but rounds
the bilinear *weights* to 9-bit fixed point (GPURaytracing.jl:118-127) —
the same storage-quantisation error class. Divergence grows with horizon as
packets sample chaotic flow; the numbers recorded in docs/PERFORMANCE.md
bound the production output cadence (packet telemetry every ~30 steps).
"""
from __future__ import annotations

import sys
sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import os
import sys

import numpy as np

N_FRAMES = int(os.environ.get("JRSW_DIV_FRAMES", "100"))   # x5 steps each


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from juliaraytracingsw_tpu.core.grid import make_grid
    from juliaraytracingsw_tpu.core.steppers import zero_clock
    from juliaraytracingsw_tpu.coupled.driver import (
        SimState, derive_nu, make_coupled_frame)
    from juliaraytracingsw_tpu.coupled.initial_conditions import band_geo_wave_ic
    from juliaraytracingsw_tpu.models import rsw
    from juliaraytracingsw_tpu.models.base import build_stepper
    from juliaraytracingsw_tpu.rays.packets import lattice_packets
    from juliaraytracingsw_tpu.rays.raytrace import RayParams, fields_from_psih

    f, Cg, dt = 3.0, 1.0, 1e-3
    nx, sqrtp, flow_steps = 512, 1024, 5
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
    packets = lattice_packets(sqrtp, grid.Lx, grid.Ly, k0=k0, k_ring=True)
    print(f"# device: {jax.devices()[0]}; horizon {N_FRAMES * flow_steps} "
          f"coupled steps (dt={dt})")

    finals = {}
    for table_dtype in ("float32", "bfloat16"):
        rp = RayParams(f=f, Cg=Cg, x0=float(grid.x[0]), y0=float(grid.y[0]),
                       dx=grid.dx, dy=grid.dy, table_dtype=table_dtype)
        frame = make_coupled_frame(model, step_fn, psih_fn, rp, flow_steps,
                                   k_cutoff=100.0 * f / Cg, k0=k0)
        fields0 = fields_from_psih(psih_fn(sol), grid, rp.interp)
        sim = SimState(sol, zero_clock(), init_fn(sol), packets, fields0)
        for _ in range(N_FRAMES):
            sim = frame(sim)
        sim = jax.block_until_ready(sim)
        finals[table_dtype] = np.stack(
            [np.asarray(sim.packets.x), np.asarray(sim.packets.y),
             np.asarray(sim.packets.k), np.asarray(sim.packets.l)])

    a, b = finals["float32"], finals["bfloat16"]
    # periodic-aware position difference in cells
    L = grid.Lx
    dxy = np.abs(a[:2] - b[:2])
    dxy = np.minimum(dxy, L - dxy) / grid.dx
    dk = np.hypot(a[2] - b[2], a[3] - b[3]) / k0
    for name, d in (("position [cells]", dxy.ravel()),
                    ("wavenumber [rel k0]", dk.ravel())):
        print(f"bf16 divergence {name}: max {d.max():.3e}  "
              f"p99 {np.percentile(d, 99):.3e}  median "
              f"{np.median(d):.3e}")
    print(f"(domain {nx} cells across; production packet-telemetry cadence "
          f"~30 steps, horizon here {N_FRAMES * flow_steps} steps)")


if __name__ == "__main__":
    main()
