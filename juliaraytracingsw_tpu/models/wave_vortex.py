"""Wave/vortex (wave/balanced) decomposition of RSW states.

Two equivalent views (reference rsw/RSWUtils.jl):

1. PV-inversion split (:5-20): linear PV q = v_x - u_y - f eta, balanced
   streamfunction psi = -q/(K^2 + Kd^2), geostrophic fields
   (u_g, v_g, eta_g) = (-psi_y, psi_x, f psi / Cg^2); wave part = residual.
2. Linear eigenbasis (:22-61): orthonormal vortical/+wave/-wave modes
   Phi_0, Phi_+, Phi_- of the linear RSW operator with
   omega = sqrt(f^2 + Cg^2 K^2) in the energy inner product
   <a,b> = u_a u_b* + v_a v_b* + Cg^2 eta_a eta_b*; projection weights
   c_0, c_+, c_- and reconstruction.

All arrays are (nl, nkr) spectral; the basis is (3, nl, nkr) per mode
ordered (u, v, Cg*eta) so the inner product is plain channel contraction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .rsw import RSWParams

__all__ = [
    "wave_balanced_decomposition",
    "balanced_wave_bases",
    "project_balanced_wave",
    "reconstruct",
]


def wave_balanced_decomposition(solh, grid, params: RSWParams):
    """((ugh, vgh, etagh), (uwh, vwh, etawh)) from state [uh, vh, etah]."""
    uh, vh, etah = solh[0], solh[1], solh[2]
    Kd2 = params.f**2 / params.Cg2
    qh = grid.ik * vh - grid.il * uh - params.f * etah
    psih = -qh / (grid.Krsq + Kd2)
    ugh = -grid.il * psih
    vgh = grid.ik * psih
    etagh = params.f / params.Cg2 * psih
    geo = jnp.stack([ugh, vgh, etagh])
    wave = solh - geo
    return geo, wave


def balanced_wave_bases(grid, params: RSWParams):
    """(Phi0, Phip, Phim), each (3, nl, nkr) complex, rows (u, v, Cg eta).

    Formulas from rsw/RSWUtils.jl:22-46 (built on host in float64; note the
    reference's (nkr, nl) layout is transposed here).
    """
    f, Cg2 = params.f, params.Cg2
    Cg = np.sqrt(Cg2)
    kr = np.asarray(grid.kr, np.float64)[None, :]
    ell = np.asarray(grid.l, np.float64)[:, None]
    Krsq = np.asarray(grid.Krsq, np.float64)
    invK = np.asarray(grid.invKrsq, np.float64)
    om = np.sqrt(f**2 + Cg2 * Krsq)
    s = np.sqrt(invK / 2.0)

    # NOTE: the reference writes the eta component as -f/omega
    # (rsw/RSWUtils.jl:32), which makes Phi0 non-orthogonal to Phi+/Phi-
    # (<Phi0, Phi+> = -2 f K^2 sqrt(invK/2) Cg / omega^2 != 0) and
    # inconsistent with its own geostrophic split eta_g = +f psi / Cg^2
    # (rsw/RSWUtils.jl:15). We use +f/omega, which yields an exactly
    # orthonormal basis (verified in tests) — a deliberate defect fix.
    Phi0 = np.empty((3,) + Krsq.shape, np.complex128)
    Phi0[0] = -1j * ell * Cg / om
    Phi0[1] = 1j * kr * Cg / om
    Phi0[2] = f / om
    Phi0[:, 0, 0] = [0.0, 0.0, 1.0]

    Phip = np.empty_like(Phi0)
    Phip[0] = (om * kr + 1j * f * ell) * s / om
    Phip[1] = (om * ell - 1j * f * kr) * s / om
    Phip[2] = Cg * Krsq * s / om
    Phip[:, 0, 0] = np.asarray([1j, 1.0, 0.0]) / np.sqrt(2.0)

    Phim = np.empty_like(Phi0)
    Phim[0] = (-om * kr + 1j * f * ell) * s / om
    Phim[1] = (-om * ell - 1j * f * kr) * s / om
    Phim[2] = Cg * Krsq * s / om
    Phim[:, 0, 0] = np.asarray([-1j, 1.0, 0.0]) / np.sqrt(2.0)

    cast = lambda a: a.astype(np.complex64)
    return cast(Phi0), cast(Phip), cast(Phim)


def project_balanced_wave(solh, bases, params: RSWParams):
    """(c0, cp, cm) projection weights (rsw/RSWUtils.jl:48-54).

    Inner product contracts (uh, vh, Cg*etah) against conj(Phi)."""
    Cg = np.sqrt(params.Cg2)
    state = jnp.stack([solh[0], solh[1], Cg * solh[2]])

    def proj(Phi):
        return jnp.sum(state * jnp.conj(Phi), axis=0)

    return tuple(proj(Phi) for Phi in bases)


def reconstruct(c0, cp, cm, bases, params: RSWParams):
    """(uh, vh, etah) from eigen-weights (rsw/RSWUtils.jl:56-61)."""
    Phi0, Phip, Phim = bases
    out = c0 * Phi0 + cp * Phip + cm * Phim
    Cg = np.sqrt(params.Cg2)
    return jnp.stack([out[0], out[1], out[2] / Cg])
