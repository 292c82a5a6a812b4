"""Slab-sharded RSW simulation: the multi-chip field path, end-to-end.

For grids too large to replicate (1024^2+, BASELINE config 5; the reference
caps at single-GPU memory, swqg/TwoLayerParameters.jl:5 shows 2048^2), the
spectral state lives kr-column-sharded across the mesh and every transform
in ``calcN`` runs as local FFT -> ICI all_to_all transpose -> local FFT
(parallel/fft.local_rfft2 / local_irfft2). The whole IF-AB3 step — matrix-
exponential apply, AB3 history, dealiasing — is elementwise in spectral
space and therefore embarrassingly sharded; only the transposes touch the
interconnect.

Coupled ray tracing on top: after each sharded flow step the 5 interpolation
fields are formed locally in y-slabs and ``all_gather``-ed to every device
(SURVEY.md §2.7 "all-gather of the interpolation fields per step is the
ICI-bandwidth-critical path"); the patch table is then built replicated and
packets advance data-parallel along their own axis.

Layout conventions:
- global sharded spectral state: (3, nl, nkr_pad), PartitionSpec
  (None, None, axis); nkr_pad = padded_nkr(nx, P) and the pad columns stay
  identically zero (L, masks and factors are zero there);
- requires ny % P == 0 and uses one 1-D mesh axis for both the field slabs
  and the packet batch.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.steppers import AB3State, AB3_H1, AB3_H2, AB3_H3, Clock, apply_L, expm_tables
from ..models import rsw
from ..rays.interp import bspline_prefilter_mask
from ..rays.packets import Packets
from ..rays.patch import build_patch_table
from ..rays.raytrace import RayParams, make_pair_table, raytrace_tables
from ..rays.resample import k_cutoff_reset
from .fft import local_irfft2, local_rfft2, padded_nkr

__all__ = ["ShardedRSW"]


def _pad_last(a: np.ndarray, size: int) -> np.ndarray:
    out = np.zeros(a.shape[:-1] + (size,), a.dtype)
    out[..., : a.shape[-1]] = a
    return out


@dataclass
class ShardedRSW:
    """Factory bundle for slab-sharded RSW stepping + coupled rays.

    Usage::

        sh = ShardedRSW(grid, params, mesh, dt=dt)
        sol_sh = sh.shard_solution(sol)          # (3, nl, nkr_pad) sharded
        init_fn, step_fn = sh.stepper()          # same protocol as build_stepper
        fields = sh.fields(sol_sh)               # (5, ny, nx) replicated
        frame = sh.make_coupled_frame(...)       # flow+rays, one jitted program
    """

    grid: object
    params: object
    mesh: Mesh
    dt: float
    axis: str = "packets"
    interp: str = "bilinear"

    def __post_init__(self):
        g, par = self.grid, self.params
        nproc = self.mesh.shape[self.axis]
        if g.ny % nproc:
            raise ValueError(f"ny={g.ny} not divisible by mesh size {nproc}")
        self.nkr_pad = padded_nkr(g.nx, nproc)
        nl, nkr, nkrp = g.nl, g.nkr, self.nkr_pad

        # --- padded constants, device_put with their production shardings --
        L = rsw.build_L(g, par)                       # (3, 3, nl, nkr) host
        e1, e2 = expm_tables(L, self.dt)
        kr = np.asarray(g.kr, np.float64)
        ell = np.asarray(g.l, np.float64)[:, None]
        Krsq = np.asarray(g.Krsq, np.float64)
        Kd2 = par.f ** 2 / par.Cg2

        def put(a, spec):
            return jax.device_put(jnp.asarray(a),
                                  NamedSharding(self.mesh, spec))

        sK = P(None, self.axis)                       # (nl|1, nkr_pad)
        self._expL = put(_pad_last(e1, nkrp), P(None, None, None, self.axis))
        self._exp2L = put(_pad_last(e2, nkrp), P(None, None, None, self.axis))
        self._ik = put(_pad_last(1j * kr[None, :], nkrp).astype(np.complex64), sK)
        self._il = put((1j * ell).astype(np.complex64) * np.ones((1, 1)), P(None, None))
        self._deal = put(_pad_last(np.asarray(g.dealias_mask), nkrp), sK)
        self._pvfac = put(
            _pad_last(-1.0 / (Krsq + Kd2), nkrp).astype(np.float32), sK)
        if self.interp == "bspline":
            fmask = np.asarray(bspline_prefilter_mask(g))
        else:
            fmask = np.ones((nl, nkr), np.float32)
        self._fmask = put(_pad_last(fmask, nkrp), sK)
        self._spec_consts = (self._ik, self._il, self._deal)
        self._spec_specs = (sK, P(None, None), sK)

        self.sol_sharding = NamedSharding(self.mesh, P(None, None, self.axis))

    # --- state movement ------------------------------------------------------
    def shard_solution(self, sol):
        """(3, nl, nkr) replicated/host -> (3, nl, nkr_pad) sharded."""
        sol_np = np.asarray(sol)
        return jax.device_put(
            jnp.asarray(_pad_last(sol_np, self.nkr_pad)), self.sol_sharding
        )

    def unshard(self, sol_sh):
        """Crop the pad and pull to host (3, nl, nkr)."""
        return np.asarray(sol_sh)[..., : self.grid.nkr]

    # --- local (per-shard) physics -------------------------------------------
    def _calcN_local(self, solh, ik, il, deal):
        """rsw._advection_N on one kr-column shard: same math, transforms
        replaced by slab-local FFT + all_to_all (rsw/RotatingShallowWater.jl
        calcN!, :140-230)."""
        g = self.grid
        solh = solh * deal
        uh, vh, etah = solh[0], solh[1], solh[2]
        fields = jnp.stack([uh, vh, etah, ik * uh, il * uh, ik * vh, il * vh])
        phys = local_irfft2(fields, g.nx, self.axis)   # (7, ny/P, nx)
        u, v, eta, ux, uy, vx, vy = (phys[i] for i in range(7))
        prods = jnp.stack([u * ux + v * uy, u * vx + v * vy, eta * u, eta * v])
        prodh = local_rfft2(prods, self.nkr_pad, self.axis)
        Nu = -prodh[0]
        Nv = -prodh[1]
        Neta = -(ik * prodh[2] + il * prodh[3])
        return jnp.stack([Nu, Nv, Neta]) * deal

    def _step_local(self, sol, step, N1, N2, expL, exp2L, ik, il, deal):
        """One IF-AB3 step on local shards (core/steppers.make_ifab3 logic
        with explicit per-shard constants)."""
        N = self._calcN_local(sol, ik, il, deal)
        dt = self.dt

        def euler(_):
            return apply_L(expL, sol + dt * N)

        def ab3(_):
            incr = dt * (
                AB3_H1 * N
                - AB3_H2 * apply_L(expL, N1)
                + AB3_H3 * apply_L(exp2L, N2)
            )
            return apply_L(expL, sol + incr)

        new = jax.lax.cond(step < 3, euler, ab3, None)
        return new, N, N1

    def _fields_local(self, sol, ik, il, pvfac, fmask):
        """PV-inversion streamfunction -> 5 interpolation fields, local
        y-slab inverse transform, then all_gather to full replication (the
        ICI-critical collective, SURVEY.md §2.7)."""
        f0 = self.params.f
        uh_, vh_, etah_ = sol[0], sol[1], sol[2]
        qh = ik * vh_ - il * uh_ - f0 * etah_
        psih = qh * pvfac
        uh = -il * psih
        vh = ik * psih
        stack = jnp.stack([uh, vh, ik * uh, il * uh, ik * vh]) * fmask
        phys = local_irfft2(stack, self.grid.nx, self.axis)  # (5, ny/P, nx)
        # untiled gather + explicit transpose/reshape: the tiled form makes
        # XLA:CPU feed the irfft a non-dim0-major layout (fft_thunk RET_CHECK)
        gat = jax.lax.all_gather(phys, self.axis)            # (P, 5, ny/P, nx)
        return jnp.transpose(gat, (1, 0, 2, 3)).reshape(
            phys.shape[0], self.grid.ny, self.grid.nx)

    # --- public jitted entry points -------------------------------------------
    def stepper(self):
        """(init_fn, step_fn) with the standard protocol, on sharded state."""
        ax = self.axis
        sol_spec = P(None, None, ax)
        smapped = jax.shard_map(
            self._step_local, mesh=self.mesh,
            in_specs=(sol_spec, P(), sol_spec, sol_spec,
                      P(None, None, None, ax), P(None, None, None, ax),
                      *self._spec_specs),
            out_specs=(sol_spec, sol_spec, sol_spec),
        )
        consts = (self._expL, self._exp2L, *self._spec_consts)
        dt = self.dt

        def init_fn(sol_sh):
            z = sol_sh * 0
            return AB3State(z, z)

        @jax.jit
        def step_fn(sol, clock: Clock, state: AB3State):
            new, N1, N2 = smapped(sol, clock.step, state.N1, state.N2, *consts)
            return new, Clock(clock.t + dt, clock.step + 1), AB3State(N1, N2)

        return init_fn, step_fn

    def fields(self, sol_sh):
        return self._fields_jit()(sol_sh)

    def _fields_jit(self):
        ax = self.axis
        sol_spec = P(None, None, ax)
        smapped = jax.shard_map(
            self._fields_local, mesh=self.mesh,
            in_specs=(sol_spec, *self._spec_specs[:2],
                      P(None, ax), P(None, ax)),
            out_specs=P(None, None, None),
            # the tiled all_gather makes the output bit-identical on every
            # device, but shard_map can't infer that statically
            check_vma=False,
        )
        consts = (self._ik, self._il, self._pvfac, self._fmask)
        return jax.jit(lambda sol: smapped(sol, *consts))

    def make_coupled_frame(self, rp: RayParams, flow_steps: int,
                           ray_substeps: int = 1, ray_method: str = "rk4",
                           k_cutoff: float | None = None,
                           k0: float | None = None,
                           overlap: bool = False):
        """Jitted frame interleaving sharded flow steps with data-parallel
        ray substeps — the multi-chip equivalent of
        coupled.driver.make_coupled_frame.

        ``overlap=True`` pipelines the rays one flow interval behind the
        PDE: each scan iteration advances the flow to t_{n+2} (whose
        interpolation-field ``all_gather`` rides the ICI) while the packets
        advance through the already-gathered [t_n, t_{n+1}] pair — the two
        halves share no data, so XLA's latency-hiding scheduler can overlap
        the collective with the ray gather/VPU work (SURVEY.md §2.7
        "flow/ray overlap"). A final catch-up interval after the scan makes
        the trajectories IDENTICAL to the sequential frame — same field
        pairs, same order — pinned by tests/test_sharded_rsw.py."""
        g = self.grid
        ny, nx = g.ny, g.nx
        _, step_fn = self.stepper()
        fields_fn = self._fields_jit()

        def trace(packets, T_old, T_new, t0, t1):
            packets = raytrace_tables(
                packets, make_pair_table(T_old, T_new, rp.table_dtype), t0, t1, rp, ny, nx,
                nsubsteps=ray_substeps, method=ray_method,
            )
            if k_cutoff is not None:
                packets = k_cutoff_reset(packets, k_cutoff, k0)
            return packets

        def one(carry, _):
            sol, clock, sstate, packets, fields_old, T_old = carry
            t0 = clock.t
            sol, clock, sstate = step_fn(sol, clock, sstate)
            fields_new = fields_fn(sol)
            T_new = build_patch_table(fields_new, rp.interp)
            packets = trace(packets, T_old, T_new, t0, clock.t)
            return (sol, clock, sstate, packets, fields_new, T_new), None

        def one_overlap(carry, _):
            # carry: flow at t_{n+1}; packets at t_n with the gathered
            # (T_n, T_{n+1}) pair in hand
            sol, clock, sstate, packets, T_prev, T_cur, t_prev = carry
            t_cur = clock.t
            sol, clock, sstate = step_fn(sol, clock, sstate)   # -> t_{n+2}
            fields_next = fields_fn(sol)                       # all_gather
            T_next = build_patch_table(fields_next, rp.interp)
            # independent of the step/gather above -> overlappable
            packets = trace(packets, T_prev, T_cur, t_prev, t_cur)
            return (sol, clock, sstate, packets, T_cur, T_next, t_cur), None

        @jax.jit
        def frame(sol, clock, sstate, packets: Packets):
            fields0 = fields_fn(sol)
            T0 = build_patch_table(fields0, rp.interp)
            if not overlap:
                carry = (sol, clock, sstate, packets, fields0, T0)
                carry, _ = jax.lax.scan(one, carry, None, length=flow_steps)
                return carry[:4]
            # prologue: flow 0 -> 1 (no ray interval exists yet)
            t0 = clock.t
            sol, clock, sstate = step_fn(sol, clock, sstate)
            fields1 = fields_fn(sol)
            T1 = build_patch_table(fields1, rp.interp)
            carry = (sol, clock, sstate, packets, T0, T1, t0)
            carry, _ = jax.lax.scan(one_overlap, carry, None,
                                    length=flow_steps - 1)
            sol, clock, sstate, packets, T_prev, T_cur, t_prev = carry
            # epilogue: catch the rays up through the last interval
            packets = trace(packets, T_prev, T_cur, t_prev, clock.t)
            return sol, clock, sstate, packets

        return frame
