"""Batched WKB ray integration through evolving 2-D flows.

Rays obey (reference raytracing/Raytracing.jl:78-89):

    dx/dt =  u(x, t) + Cg^2 k / omega
    dk/dt = -(u_x k + v_x l)
    dl/dt = -(u_y k + v_y l),   with v_y = -u_x (incompressible flow)

The flow enters through 5 gridded fields stacked (5, ny, nx):
``[u, v, u_x, u_y, v_x]`` evaluated spectrally from a streamfunction
(core/spectral.spectral_gradients). Between two flow snapshots the fields
are blended linearly in time, u(t) = (1-a) u_old + a u_new with
a = (t - t0)/(t1 - t0). NOTE: the reference GPU kernel weights the *first*
texture set by a (raytracing/GPURaytracing.jl:33,52-64) while drivers pass
(old, new) — a time-reversed blend; we implement the intended physics and
pin it with a regression test (SURVEY.md §7 "hard parts").

TPU design: packets are structure-of-arrays; each integrator stage blends
the full field stacks once (streaming VPU work, ~MBs) and then performs ONE
batched gather for all 5 fields (rays/interp.py) — this is cheaper than
per-packet double interpolation as soon as N_packets is comparable to the
grid size. Substeps run under ``lax.scan``; everything is differentiable.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.spectral import irfft2, spectral_gradients
from .dispersion import group_velocity
from .interp import bspline_prefilter_mask, interpolate
from .packets import Packets

__all__ = [
    "RayParams",
    "fields_from_psih",
    "fields_from_velocity_spectra",
    "raytrace",
    "sample_velocity",
    "sample_gradients",
]


class RayParams(NamedTuple):
    """Static ray-tracing parameters (python floats; close over them)."""

    f: float
    Cg: float
    x0: float      # grid origin (first node coordinate)
    y0: float
    dx: float
    dy: float
    interp: str = "bilinear"   # 'bilinear' | 'bspline'


def _maybe_prefilter(stackh, grid, interp: str):
    if interp == "bspline":
        return stackh * bspline_prefilter_mask(grid)
    return stackh


def fields_from_psih(psih, grid, interp: str = "bilinear"):
    """(5, ny, nx) [u, v, ux, uy, vx] from a streamfunction spectrum.

    Equivalent of the drivers' ``get_velocity_info`` 6-derivative extraction
    (swqg/RaytracingDriver.jl:164-185) done as one batched irfft2. For
    'bspline' interpolation the spectral B-spline prefilter is folded in
    here — exact and free (one elementwise multiply).
    """
    uh, vh, uxh, uyh, vxh = spectral_gradients(psih, grid)
    stackh = jnp.stack([uh, vh, uxh, uyh, vxh])
    stackh = _maybe_prefilter(stackh, grid, interp)
    return irfft2(stackh, grid.nx)


def fields_from_velocity_spectra(uh, vh, grid, interp: str = "bilinear"):
    """Same field stack from explicit (uh, vh) — for flows not derived from a
    streamfunction. v_y is NOT assumed -u_x here; we still only store vx and
    rely on incompressibility downstream, so callers should pass the
    divergence-free (rotational) part."""
    ik, il = grid.ik, grid.il
    stackh = jnp.stack([uh, vh, ik * uh, il * uh, ik * vh])
    stackh = _maybe_prefilter(stackh, grid, interp)
    return irfft2(stackh, grid.nx)


def blend(fields_old, fields_new, a):
    """Linear time blend: a=0 -> old snapshot, a=1 -> new snapshot.

    This is the *intended* physics; the reference GPU kernel's alpha weights
    the first texture set, which drivers bind to the OLD field — a
    time-reversed blend (raytracing/GPURaytracing.jl:33,52-64). Pinned by
    tests/test_rays.py::test_time_blend_convention.
    """
    return (1.0 - a) * fields_old + a * fields_new


def _rhs(p: Packets, fields, rp: RayParams):
    vals = interpolate(
        fields, p.x, p.y, rp.x0, rp.y0, rp.dx, rp.dy, method=rp.interp
    )
    u, v, ux, uy, vx = vals[0], vals[1], vals[2], vals[3], vals[4]
    cgx, cgy = group_velocity(p.k, p.l, rp.f, rp.Cg, p.sign)
    dx = u + cgx
    dy = v + cgy
    dk = -(ux * p.k + vx * p.l)
    dl = -(uy * p.k - ux * p.l)  # vy = -ux
    return Packets(dx, dy, dk, dl, jnp.zeros_like(p.sign))


def _axpy(p: Packets, d: Packets, h):
    return Packets(p.x + h * d.x, p.y + h * d.y, p.k + h * d.k, p.l + h * d.l, p.sign)


def _lincomb(p: Packets, ds, ws, h):
    acc = [jnp.zeros_like(p.x)] * 4
    for d, w in zip(ds, ws):
        acc[0] = acc[0] + w * d.x
        acc[1] = acc[1] + w * d.y
        acc[2] = acc[2] + w * d.k
        acc[3] = acc[3] + w * d.l
    return Packets(
        p.x + h * acc[0], p.y + h * acc[1], p.k + h * acc[2], p.l + h * acc[3], p.sign
    )


# Dormand-Prince 5(4) tableau (fixed-step use)
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)


def _step(p: Packets, blend_fields, a0, da, h, rp: RayParams, method: str):
    """One substep from relative time a0 (in [0,1] units of the flow step);
    da = h / (t1 - t0)."""
    if method == "rk4":
        F0 = blend_fields(a0)
        Fh = blend_fields(a0 + 0.5 * da)
        F1 = blend_fields(a0 + da)
        k1 = _rhs(p, F0, rp)
        k2 = _rhs(_axpy(p, k1, 0.5 * h), Fh, rp)
        k3 = _rhs(_axpy(p, k2, 0.5 * h), Fh, rp)
        k4 = _rhs(_axpy(p, k3, h), F1, rp)
        return _lincomb(p, (k1, k2, k3, k4), (1 / 6, 1 / 3, 1 / 3, 1 / 6), h)
    if method == "dopri5":
        ks = []
        for ci, ai in zip(_DP_C, _DP_A):
            Fi = blend_fields(a0 + ci * da)
            q = _lincomb(p, ks, ai, h) if ai else p
            ks.append(_rhs(q, Fi, rp))
        return _lincomb(p, ks, _DP_B, h)
    if method == "midpoint":
        # implicit midpoint via fixed-point iteration (symplectic; the
        # reference CPU path uses ImplicitMidpoint, raytracing/Raytracing.jl:109)
        Fm = blend_fields(a0 + 0.5 * da)
        d = _rhs(p, Fm, rp)
        for _ in range(4):
            mid = _axpy(p, d, 0.5 * h)
            d = _rhs(mid, Fm, rp)
        return _axpy(p, d, h)
    raise ValueError(f"unknown ray integrator {method!r}")


@partial(jax.jit, static_argnames=("nsubsteps", "method", "rp"))
def raytrace(
    packets: Packets,
    fields_old,
    fields_new,
    t0,
    t1,
    rp: RayParams,
    nsubsteps: int = 1,
    method: str = "rk4",
) -> Packets:
    """Advance packets from t0 to t1 through linearly-blended flow fields.

    Equivalent of the reference ``raytrace!`` (raytracing/GPURaytracing.jl:115-142)
    with fixed substeps in place of adaptive Vern7 (SURVEY.md §7 stance).
    """
    h = (t1 - t0) / nsubsteps
    da = 1.0 / nsubsteps

    def blend_fields(a):
        return blend(fields_old, fields_new, a)

    def body(p, i):
        a0 = i * da
        return _step(p, blend_fields, a0, da, h, rp, method), None

    packets, _ = jax.lax.scan(
        body, packets, jnp.arange(nsubsteps, dtype=fields_old.dtype)
    )
    return packets


def sample_velocity(packets: Packets, fields, rp: RayParams):
    """(u, v) at packet positions (reference interpolate_velocity!,
    raytracing/GPURaytracing.jl:67-82)."""
    vals = interpolate(
        fields[:2], packets.x, packets.y, rp.x0, rp.y0, rp.dx, rp.dy, rp.interp
    )
    return vals[0], vals[1]


def sample_gradients(packets: Packets, fields, rp: RayParams):
    """(ux, uy, vx, vy) at packet positions (reference
    interpolate_gradients!, raytracing/GPURaytracing.jl:84-109); vy = -ux."""
    vals = interpolate(
        fields[2:5], packets.x, packets.y, rp.x0, rp.y0, rp.dx, rp.dy, rp.interp
    )
    return vals[0], vals[1], vals[2], -vals[0]
