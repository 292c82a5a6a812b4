"""Round-4 ablation: packet-chunked RK4 stage math (JRSW_RAY_CHUNK).

VERDICT r3 item 4: the hero substep spends ~half its time re-reading the
gathered (N, 2W) pair rows from HBM once per RK stage x time level (8 row
passes). The XLA-only lever is ``lax.map`` over packet chunks sized so a
chunk's rows could stay VMEM-resident across the fused stage chain
(rays/raytrace._ray_chunk). This script measures the hero frame (512^2 RSW
+ 1M packets, 5 coupled steps) at the requested chunk sizes.

Usage:  python benchmarks/profiling/prof_r4_chunk.py [chunk ...]
        default chunks: 0 65536 262144; each NONZERO chunk is a fresh XLA
        program (minutes-slow first compile through the tunnel).

Result (bench TPU v5e, recorded in the table below after running): see
docs/PERFORMANCE.md "Stage-math HBM re-reads" for the conclusion.
"""
from __future__ import annotations

import sys
sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import os
import sys
import time

import numpy as np


def main(chunks):
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
    print(f"# device: {jax.devices()[0]}")

    for table_dtype in ("bfloat16", "float32"):
        for chunk in chunks:
            os.environ["JRSW_RAY_CHUNK"] = str(chunk)
            jax.clear_caches()
            rp = RayParams(f=f, Cg=Cg, x0=float(grid.x[0]),
                           y0=float(grid.y[0]), dx=grid.dx, dy=grid.dy,
                           table_dtype=table_dtype)
            frame = make_coupled_frame(model, step_fn, psih_fn, rp,
                                       flow_steps, k_cutoff=100.0 * f / Cg,
                                       k0=k0)
            fields0 = fields_from_psih(psih_fn(sol), grid, rp.interp)
            sim = SimState(sol, zero_clock(), init_fn(sol), packets, fields0)

            def call(c):
                pk = packets._replace(x=packets.x + 1e-6 * c)
                return frame(sim._replace(packets=pk))

            out = None
            for c in range(2):
                out = call(c)
            jax.block_until_ready(out)
            times = []
            for trial in range(3):
                t0 = time.perf_counter()
                for c in range(3):
                    out = call(100 + trial * 10 + c)
                jax.block_until_ready(out)
                times.append((time.perf_counter() - t0) / 3)
            t = min(times)
            rays = sqrtp * sqrtp * flow_steps / t
            print(f"chunk={chunk:>7d} dtype={table_dtype:>9s}: "
                  f"{t * 1e3:7.1f} ms/frame  {rays:.3e} ray-steps/s  "
                  f"(spread {(max(times) - t) / t * 100:.1f}%)")
    del os.environ["JRSW_RAY_CHUNK"]


if __name__ == "__main__":
    chunks = [int(a) for a in sys.argv[1:]] or [0, 65536, 262144]
    main(chunks)
