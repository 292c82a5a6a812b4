"""Spectral energy/enstrophy transfer (flux) functions with triad
wave-vortex decomposition.

Equivalent of the reference's RSWTransferFunction
(analysis/Notebooks/rsw_suite/RSWTransferFunction.jl): per-mode flux
densities E(k,l) = Re[ (conj(uh) du/dt_N + conj(vh) dv/dt_N)/2
+ Cg^2/2 conj(etah) deta/dt_N ] and the linearised-PV enstrophy analog,
with the quadratic RHS B(a, b) evaluated with advecting field a and
advected field b, decomposed into triad classes by the number of wave
factors: ggg / ggw / gww / www (:63-93).

Device (jnp) implementation with batched FFTs; one call per snapshot,
accumulated over time by the caller (see ``time_mean_transfer``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.spectral import irfft2, rfft2
from ..models.wave_vortex import wave_balanced_decomposition

__all__ = ["quadratic_rhs", "flux_fields", "triad_transfer", "time_mean_transfer"]


def _phys_fields(solh, grid):
    """(u, v, eta, ux, vx, etax, uy, vy, etay) physical + qh spectral."""
    uh, vh, etah = solh[0], solh[1], solh[2]
    ik, il = grid.ik, grid.il
    stack = jnp.stack([
        uh, vh, etah,
        ik * uh, ik * vh, ik * etah,
        il * uh, il * vh, il * etah,
    ])
    return irfft2(stack, grid.nx)


def quadratic_rhs(phys1, phys2, grid):
    """B(a, b): quadratic RSW tendency with advecting a, advected b
    (RSWTransferFunction.jl:117-137): returns (du, dv, deta) spectral."""
    u1, v1, eta1 = phys1[0], phys1[1], phys1[2]
    ux2, vx2, etax2 = phys2[3], phys2[4], phys2[5]
    uy2, vy2, etay2 = phys2[6], phys2[7], phys2[8]
    u2, v2 = phys2[0], phys2[1]
    prods = jnp.stack([
        u1 * ux2 + v1 * uy2,
        u1 * vx2 + v1 * vy2,
        eta1 * u2,
        eta1 * v2,
    ])
    prodh = rfft2(prods)
    du = -prodh[0]
    dv = -prodh[1]
    deta = -(grid.ik * prodh[2] + grid.il * prodh[3])
    return jnp.stack([du, dv, deta])


def flux_fields(solh, dsol, grid, params):
    """(E(k,l), Z(k,l)) per-mode flux densities (RSWTransferFunction.jl:138-148)."""
    uh, vh, etah = solh[0], solh[1], solh[2]
    du, dv, deta = dsol[0], dsol[1], dsol[2]
    E = jnp.real(
        0.5 * (jnp.conj(uh) * du + jnp.conj(vh) * dv)
        + 0.5 * params.Cg2 * jnp.conj(etah) * deta
    )
    qh = grid.ik * vh - grid.il * uh - params.f * etah
    dq = grid.ik * dv - grid.il * du - params.f * deta
    Z = jnp.real(jnp.conj(qh) * dq)
    return E, Z


def triad_transfer(solh, grid, params):
    """Per-snapshot triad-decomposed flux densities.

    Returns dict of (E, Z) pairs keyed 'total', 'ggg', 'ggw', 'gww', 'www'
    (grouping follows RSWTransferFunction.jl:68-93).
    """
    solh = grid.dealias(solh)
    geo, wave = wave_balanced_decomposition(solh, grid, params)
    pt = _phys_fields(solh, grid)
    pg = _phys_fields(geo, grid)
    pw = _phys_fields(wave, grid)

    Bgg = quadratic_rhs(pg, pg, grid)
    Bgw = quadratic_rhs(pg, pw, grid) + quadratic_rhs(pw, pg, grid)
    Bww = quadratic_rhs(pw, pw, grid)
    Btot = quadratic_rhs(pt, pt, grid)

    out = {}
    out["total"] = flux_fields(solh, Btot, grid, params)
    out["ggg"] = flux_fields(geo, Bgg, grid, params)
    Eggw1, Zggw1 = flux_fields(geo, Bgw, grid, params)
    Eggw2, Zggw2 = flux_fields(wave, Bgg, grid, params)
    out["ggw"] = (Eggw1 + Eggw2, Zggw1 + Zggw2)
    Egww1, Zgww1 = flux_fields(geo, Bww, grid, params)
    Egww2, Zgww2 = flux_fields(wave, Bgw, grid, params)
    out["gww"] = (Egww1 + Egww2, Zgww1 + Zgww2)
    out["www"] = flux_fields(wave, Bww, grid, params)
    return out


def time_mean_transfer(snapshots, grid, params):
    """Average triad transfers over an iterable of (3, nl, nkr) snapshots."""
    acc = None
    count = 0
    fn = jax.jit(lambda s: triad_transfer(s, grid, params))
    for sol in snapshots:
        cur = fn(jnp.asarray(sol) if not isinstance(sol, jax.Array) else sol)
        if acc is None:
            acc = {k: (np.asarray(v[0], np.float64), np.asarray(v[1], np.float64))
                   for k, v in cur.items()}
        else:
            for k, v in cur.items():
                acc[k] = (acc[k][0] + np.asarray(v[0], np.float64),
                          acc[k][1] + np.asarray(v[1], np.float64))
        count += 1
    return {k: (e / count, z / count) for k, (e, z) in acc.items()}
