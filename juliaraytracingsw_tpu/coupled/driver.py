"""Coupled PDE <-> ray-tracing experiment driver.

Functional re-design of the reference's driver family
(raytracing/RaytracingDriver.jl:156-292, swqg/RaytracingDriver.jl,
rsw/RSWRaytracingDriver.jl, ...):

- ``derive_dt`` / ``derive_nu``: CFL-tuned time step and hyperviscosity
  (raytracing/RaytracingDriver.jl:62-63).
- ``make_coupled_frame``: one jitted ``lax.scan`` over K flow steps, each
  interleaving an IF-AB3 flow step with a ray substep through the
  (old, new) snapshot pair — the whole frame is one XLA program, no
  host round-trips inside (the reference re-launches kernels and rebinds
  10 textures per step).
- ``CoupledDriver``: thin host loop around the jitted frame handling
  spinup, packet spinup, rolling outputs, diagnostics, CFL/walltime logging,
  NaN abort, frozen-background option and bit-exact checkpointing.

Everything inside a frame is differentiable; gradients flow through flow
steps and ray integration alike.
"""
from __future__ import annotations

import time
from dataclasses import dataclass

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.steppers import Clock, zero_clock
from ..models.base import Model, build_stepper
from ..rays.packets import Packets
from ..rays.patch import build_patch_table
from ..rays.raytrace import (  # noqa: F401 (resolve_gather re-exported use)
    RayParams,
    _table_impl,
    _use_patch,
    build_pair,
    fields_from_psih,
    make_pair_table,
    raytrace,
    raytrace_adaptive,
    raytrace_tables,
    raytrace_tables_fb,
    resolve_gather,
    sample_gradients,
    sample_velocity,
)
from ..rays.resample import (
    BirthDeathState,
    init_birth_death,
    k_cutoff_reset,
    weibull_birth_death,
)
from ..io.output import SequencedWriter, save_problem

__all__ = [
    "derive_dt", "derive_nu", "SimState", "make_coupled_frame",
    "CoupledDriver",
]


def derive_dt(cfltune: float, umax: float, dx: float) -> float:
    """dt = cfltune / umax * dx (raytracing/RaytracingDriver.jl:62)."""
    return cfltune / umax * dx


def derive_nu(nutune: float, nx: int, nnu: int, dt: float) -> float:
    """nu = nutune * (2 pi / nx) / kmax^{2 nnu} / dt with kmax = nx/2 - 1
    (raytracing/RaytracingDriver.jl:63)."""
    kmax = nx / 2 - 1
    return nutune * 2.0 * np.pi / nx / (kmax ** (2 * nnu)) / dt


class SimState(NamedTuple):
    """Full coupled simulation state — one pytree, one checkpoint unit.

    ``bd`` (when birth/death resampling is on) carries the ensemble ages,
    lifetimes, cumulative birth count AND the PRNG key, so checkpoints are
    bit-exact including the stochastic stream."""

    sol: jax.Array
    clock: Clock
    stepper_state: tuple | NamedTuple
    packets: Packets
    fields: jax.Array   # (5, ny, nx) current interpolation fields
    bd: BirthDeathState | None = None


def make_coupled_frame(
    model: Model,
    step_fn: Callable,
    psih_fn: Callable,
    rp: RayParams,
    flow_steps: int,
    ray_substeps: int = 1,
    ray_method: str = "rk4",
    k_cutoff: float | None = None,
    k0: float | None = None,
    frozen_flow: bool = False,
    dt: float | None = None,
    remat: bool = False,
    birth_death: dict | None = None,
    ray_opts: dict | None = None,
    n_packets: int | None = None,
):
    """Jitted frame: ``flow_steps`` interleaved flow/ray steps.

    ``ray_method='adaptive'`` selects the embedded Dormand-Prince 5(4)
    integrator (reference GPU parity, GPURaytracing.jl:111-113) — tune it
    with ``ray_opts`` = dict(rtol=..., atol=..., max_steps=...).

    ``birth_death`` (optional) = dict(k_shape=..., lam=...) switches on
    Weibull birth/death resampling of the ensemble each flow step
    (reference prototype Notebooks/BirthDeathPackets.ipynb cells 1-4;
    BASELINE config 5 "birth/death packet ensembles"); requires
    ``SimState.bd`` from rays/resample.init_birth_death.

    ``psih_fn(sol) -> psih`` extracts the advecting streamfunction
    (model-specific: PV inversion for RSW, barotropic/baroclinic mean for
    2-layer QG, ...).

    With the patch gather path (RayParams.gather == 'patch', the default)
    each step builds ONE new patch table for the fresh snapshot and reuses
    the previous step's table for the old time level, so the table build is
    amortised over the whole frame.

    ``remat=True`` wraps each interleaved step in ``jax.checkpoint`` so the
    backward pass through long frames rematerialises the step instead of
    storing every FFT/gather intermediate (SURVEY.md §5.7: gradients through
    many coupled steps are the long-context problem here).
    """
    grid = model.grid
    if rp.gather == "auto":
        # measured patch-vs-taps crossover (rays/raytrace.resolve_gather);
        # needs the ensemble size at frame-build time
        if n_packets is None:
            raise ValueError(
                "rp.gather='auto' requires n_packets= so the frame can "
                "resolve the patch-vs-taps crossover at build time")
        rp = resolve_gather(rp, n_packets, grid.ny, grid.nx)
    adaptive = ray_method in ("adaptive", "adaptive7")
    # the adaptive integrator builds its own patch tables from the fields
    use_patch = _use_patch(rp) and not adaptive
    ray_opts = dict(ray_opts or {})
    if adaptive:
        # 'adaptive' -> embedded DP5(4); 'adaptive7' -> Fehlberg 7(8), the
        # reference's Vern7 accuracy class (GPURaytracing.jl:111-113)
        ray_opts.setdefault("pair",
                            "rkf78" if ray_method == "adaptive7" else "dopri5")
    ny, nx = grid.ny, grid.nx

    conv_build = _table_impl() == "conv"

    def one(carry, _):
        sol, clock, sstate, packets, fields_old, T_old, bd = carry
        t0 = clock.t
        if frozen_flow:
            # advance only the clock (use_stationary_background_flow,
            # raytracing/RaytracingDriver.jl:257-259)
            clock = Clock(clock.t + dt, clock.step + 1)
            fields_new, T_new = fields_old, T_old
            if use_patch:
                T_pair = (build_pair(fields_old, fields_new, rp) if conv_build
                          else make_pair_table(T_old, T_new, rp.table_dtype))
            else:
                T_pair = ()
        else:
            sol, clock, sstate = step_fn(sol, clock, sstate)
            fields_new = fields_from_psih(psih_fn(sol), grid, rp.interp)
            if use_patch and conv_build:
                # one-op pair build straight from the two field stacks —
                # no per-level table carry, no 2W concat
                T_new = ()
                T_pair = build_pair(fields_old, fields_new, rp)
            elif use_patch:
                T_new = build_patch_table(fields_new, rp.interp)
                T_pair = make_pair_table(T_old, T_new, rp.table_dtype)
            else:
                T_new, T_pair = (), ()
        if adaptive:
            packets, _info = raytrace_adaptive(
                packets, fields_old, fields_new, t0, clock.t, rp, **ray_opts,
            )
        elif use_patch:
            # fb variant: same fast forward; the backward formulation is
            # selectable (JRSW_PATCH_BWD — default AD table transpose,
            # opt-in taps-style re-interpolation custom VJP; both measured,
            # rays/raytrace._patch_bwd_impl)
            packets = raytrace_tables_fb(
                packets, T_pair, fields_old, fields_new, t0, clock.t, rp,
                ny, nx, nsubsteps=ray_substeps, method=ray_method,
            )
        else:
            packets = raytrace(
                packets, fields_old, fields_new, t0, clock.t, rp,
                nsubsteps=ray_substeps, method=ray_method,
            )
        if k_cutoff is not None:
            packets = k_cutoff_reset(packets, k_cutoff, k0)
        if birth_death is not None:
            packets, bd, _ = weibull_birth_death(
                packets, bd, clock.t - t0, grid.Lx, grid.Ly, k0,
                k_shape=birth_death.get("k_shape", 1.5),
                lam=birth_death.get("lam", 10.0),
                x0=rp.x0, y0=rp.y0,
            )
        return (sol, clock, sstate, packets, fields_new, T_new, bd), None

    if remat:
        one = jax.checkpoint(one, prevent_cse=False)

    @jax.jit
    def frame(sim: SimState) -> SimState:
        T0 = (build_patch_table(sim.fields, rp.interp)
              if use_patch and not conv_build else ())
        carry = (sim.sol, sim.clock, sim.stepper_state, sim.packets,
                 sim.fields, T0, sim.bd)
        carry, _ = jax.lax.scan(one, carry, None, length=flow_steps)
        return SimState(*(carry[:5] + (carry[6],)))

    return frame


def make_flow_frame(model: Model, step_fn, psih_fn, rp: RayParams, flow_steps: int):
    """Jitted pure-flow frame (spinup): step the PDE, refresh fields."""
    grid = model.grid

    @jax.jit
    def frame(sim: SimState) -> SimState:
        def one(carry, _):
            sol, clock, sstate = carry
            sol, clock, sstate = step_fn(sol, clock, sstate)
            return (sol, clock, sstate), None

        (sol, clock, sstate), _ = jax.lax.scan(
            one, (sim.sol, sim.clock, sim.stepper_state), None, length=flow_steps
        )
        fields = fields_from_psih(psih_fn(sol), grid, rp.interp)
        return SimState(sol, clock, sstate, sim.packets, fields, sim.bd)

    return frame


@dataclass
class CoupledDriver:
    """Host-side experiment orchestration (the reference's start_raytracing!).

    Typical use::

        drv = CoupledDriver(model, psih_fn, rp, dt=dt, stepper="IFMAB3", ...)
        drv.init(sol0, packets)
        drv.spinup(n_spinup_steps)
        drv.run(n_frames, flow_steps_per_frame)
    """

    model: Model
    psih_fn: Callable
    rp: RayParams
    dt: float
    stepper: str = "IFMAB3"
    use_filter: bool = False
    filter_kwargs: dict | None = None
    ray_substeps: int = 1
    ray_method: str = "rk4"  # 'rk4'|'dopri5'|'midpoint'|'adaptive'|'adaptive7'
    ray_opts: dict | None = None   # adaptive: rtol/atol/max_steps
    k_cutoff: float | None = None
    k0: float | None = None
    frozen_flow: bool = False
    remat: bool = False
    # Weibull birth/death resampling (Notebooks/BirthDeathPackets.ipynb)
    birth_death: bool = False
    bd_k_shape: float = 1.5
    bd_lam: float = 10.0
    bd_seed: int = 0
    # outputs
    snapshot_writer: SequencedWriter | None = None
    packet_writer: SequencedWriter | None = None
    write_gradients: bool = True
    diagnostics: dict | None = None      # name -> fn(sol, grid, params)
    diag_every_frames: int = 1
    log_every_frames: int = 1
    log_fn: Callable = print
    # live dashboard (utils/live.LiveDashboard or None) — headless stand-in
    # for the reference's in-window Makie Observables figures
    # (TwoLayerSimulation.jl:44-70); refreshed after each frame's
    # diagnostics are recorded
    live: object | None = None

    def __post_init__(self):
        self._init_fn, self._step_fn = build_stepper(
            self.model, self.stepper, self.dt, self.use_filter,
            self.filter_kwargs,
        )
        self.sim: SimState | None = None
        self.diag_series: dict = {
            name: [] for name in (self.diagnostics or {})
        }
        self.diag_times: list = []
        self._frame_cache: dict = {}
        self._start_wall = time.time()

    # --- lifecycle -----------------------------------------------------------
    def init(self, sol0, packets: Packets, clock: Clock | None = None):
        grid = self.model.grid
        fields = fields_from_psih(self.psih_fn(sol0), grid, self.rp.interp)
        bd = None
        if self.birth_death:
            bd = init_birth_death(
                jax.random.PRNGKey(self.bd_seed), packets.n,
                k_shape=self.bd_k_shape, lam=self.bd_lam,
            )
        self.sim = SimState(
            sol=sol0,
            clock=clock if clock is not None else zero_clock(),
            stepper_state=self._init_fn(sol0),
            packets=packets,
            fields=fields,
            bd=bd,
        )
        if self.snapshot_writer is not None:
            save_problem(
                self.snapshot_writer, grid, self.model.params, self.dt
            )
        if self.packet_writer is not None:
            self.packet_writer.write("params/f0", self.rp.f)
            self.packet_writer.write("params/Cg", self.rp.Cg)
            self.packet_writer.write("params/dt", self.dt)
            self.packet_writer.write("params/N", packets.n)
            self.packet_writer.write("params/omega_sign", np.asarray(packets.sign))
        return self.sim

    def _get_frame(self, kind: str, flow_steps: int):
        key = (kind, flow_steps)
        if key not in self._frame_cache:
            if kind == "coupled":
                bd_cfg = (dict(k_shape=self.bd_k_shape, lam=self.bd_lam)
                          if self.birth_death else None)
                self._frame_cache[key] = make_coupled_frame(
                    self.model, self._step_fn, self.psih_fn, self.rp,
                    flow_steps, self.ray_substeps, self.ray_method,
                    self.k_cutoff, self.k0, self.frozen_flow, self.dt,
                    self.remat, bd_cfg, self.ray_opts,
                )
            else:
                self._frame_cache[key] = make_flow_frame(
                    self.model, self._step_fn, self.psih_fn, self.rp, flow_steps
                )
        return self._frame_cache[key]

    # --- phases --------------------------------------------------------------
    def spinup(self, nsteps: int, chunk: int = 500):
        """Flow-only spinup in jitted chunks with NaN checks between."""
        frame = None
        done = 0
        while done < nsteps:
            k = min(chunk, nsteps - done)
            frame = self._get_frame("flow", k)
            self.sim = frame(self.sim)
            done += k
            self._check_nan("spinup")
        return self.sim

    def run(self, n_frames: int, flow_steps_per_frame: int,
            snapshot_every: int = 1):
        """Main coupled loop: n_frames x (flow_steps interleaved with rays),
        writing packet telemetry each frame and snapshots every
        ``snapshot_every`` frames."""
        frame = self._get_frame("coupled", flow_steps_per_frame)
        for i in range(n_frames):
            self.sim = frame(self.sim)
            self._check_nan(f"frame {i}")
            self._record_diagnostics(i)
            self._write_packet_frame()
            if self.live is not None:
                self.live.update(self.sim, self.model.grid,
                                 self.diag_times, self.diag_series)
            if self.snapshot_writer is not None and i % snapshot_every == 0:
                step = int(self.sim.clock.step)
                from ..core.transfer import to_host

                self.snapshot_writer.write_frame(
                    step, sol=to_host(self.sim.sol),
                )
                self.snapshot_writer.write(
                    f"snapshots/t/{step}", float(self.sim.clock.t)
                )
            if i % self.log_every_frames == 0:
                self._log(i)
        self.flush()
        return self.sim

    # --- helpers -------------------------------------------------------------
    def _check_nan(self, where: str):
        if not bool(jnp.isfinite(jnp.abs(self.sim.sol).max())):
            self.flush()
            raise FloatingPointError(
                f"solution is NaN/Inf at {where} (t={float(self.sim.clock.t):.3f})"
                " — aborting (reference NaN guard,"
                " raytracing/RaytracingDriver.jl:282-287)"
            )

    def _record_diagnostics(self, i: int):
        if not self.diagnostics or i % self.diag_every_frames:
            return
        self.diag_times.append(float(self.sim.clock.t))
        for name, fn in self.diagnostics.items():
            self.diag_series[name].append(
                np.asarray(fn(self.sim.sol, self.model.grid, self.model.params))
            )

    def _write_packet_frame(self):
        if self.packet_writer is None:
            return
        sim = self.sim
        u, v = sample_velocity(sim.packets, sim.fields, self.rp)
        pos = np.stack([np.asarray(sim.packets.x), np.asarray(sim.packets.y)], 1)
        wav = np.stack([np.asarray(sim.packets.k), np.asarray(sim.packets.l)], 1)
        vel = np.stack([np.asarray(u), np.asarray(v)], 1)
        grad = None
        if self.write_gradients:
            gx = sample_gradients(sim.packets, sim.fields, self.rp)
            grad = np.stack([np.asarray(a) for a in gx], 1)
        self.packet_writer.write_packets(
            int(sim.clock.step), float(sim.clock.t), x=pos, k=wav, u=vel, g=grad
        )
        if sim.bd is not None:
            # population telemetry: cumulative rebirths + current age spread
            step = int(sim.clock.step)
            self.packet_writer.write(f"p/births/{step}", int(sim.bd.births))
            self.packet_writer.write(
                f"p/mean_age/{step}", float(jnp.mean(sim.bd.age))
            )

    def _log(self, i: int):
        sim = self.sim
        umax = float(jnp.max(jnp.abs(sim.fields[:2])))
        cfl = self.dt * umax / min(self.model.grid.dx, self.model.grid.dy)
        self.log_fn(
            f"step: {int(sim.clock.step):06d}, t: {float(sim.clock.t):.2f}, "
            f"cfl: {cfl:.2e}, wall: {(time.time() - self._start_wall) / 60:.2f} min"
        )

    def save_diagnostics(self, path: str):
        import h5py

        with h5py.File(path, "w") as f:
            f["t"] = np.asarray(self.diag_times)
            for name, series in self.diag_series.items():
                f[name] = np.asarray(series)

    def flush(self):
        for w in (self.snapshot_writer, self.packet_writer):
            if w is not None:
                w.flush()

    def close(self):
        for w in (self.snapshot_writer, self.packet_writer):
            if w is not None:
                w.close()

    # --- checkpointing -------------------------------------------------------
    def checkpoint(self, path: str):
        from ..io.checkpoint import save_checkpoint

        save_checkpoint(path, self.sim)

    def restore(self, path: str):
        from ..io.checkpoint import load_checkpoint

        if self.sim is None:
            raise RuntimeError("call init() first to establish state shapes")
        self.sim = load_checkpoint(path, self.sim)
        return self.sim
