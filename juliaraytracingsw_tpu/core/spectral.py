"""Spectral transforms, derivatives and Parseval energetics.

FFT convention: forward unnormalised, inverse 1/(nx*ny) — identical to
FFTW / FourierFlows ``mul!``/``ldiv!`` with an rfft plan (reference
rsw/RotatingShallowWater.jl:110-113), so spectral fields are numerically
comparable with the reference.

All transforms operate on the *last two* axes, so a channel-leading
``(C, ny, nx)`` stack transforms in one batched XLA FFT call — on TPU this
is the efficient shape (one fusion, no per-field dispatch).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "rfft2",
    "irfft2",
    "parseval_sum",
    "parseval_sum2",
    "enforce_reality",
    "spectral_gradients",
]


def rfft2(field: jax.Array) -> jax.Array:
    """Real -> half-complex transform over the last two axes."""
    return jnp.fft.rfft2(field, axes=(-2, -1))


def irfft2(fieldh: jax.Array, nx: int) -> jax.Array:
    """Half-complex -> real inverse transform over the last two axes.

    ``nx`` disambiguates odd/even physical size of the last axis.
    """
    return jnp.fft.irfft2(fieldh, s=(fieldh.shape[-2], nx), axes=(-2, -1))


def _doubling_weights(grid) -> jax.Array:
    """Conjugate-symmetry doubling weights for rfft storage.

    Column kr=0 appears once; all kr>0 columns represent +/- k pairs. Matches
    FourierFlows ``parsevalsum2`` which doubles every kr>0 column (including
    Nyquist — harmless for dealiased fields where that column is zero).
    """
    w = jnp.ones((grid.nkr,), jnp.float32).at[1:].set(2.0)
    if grid.nx % 2 == 0:
        # the kr = nx/2 Nyquist column is self-conjugate: count once
        w = w.at[-1].set(1.0)
    return w[None, :]


def parseval_sum2(fieldh: jax.Array, grid) -> jax.Array:
    """sum |f|^2 over physical space = Lx*Ly/(nx^2 ny^2) * sum_modes w*|fh|^2.

    Equivalent of FourierFlows ``parsevalsum2`` (used by every energy
    diagnostic, e.g. reference rsw/RotatingShallowWater.jl:323-336).
    """
    w = _doubling_weights(grid)
    norm = grid.Lx * grid.Ly / (grid.nx**2 * grid.ny**2)
    return norm * jnp.sum(w * jnp.abs(fieldh) ** 2, axis=(-2, -1))


def parseval_sum(fieldh: jax.Array, grid) -> jax.Array:
    """Real part of the mode sum with conjugate doubling (FourierFlows
    ``parsevalsum``): integrates a real quantity stored spectrally."""
    w = _doubling_weights(grid)
    norm = grid.Lx * grid.Ly / (grid.nx**2 * grid.ny**2)
    return norm * jnp.sum(w * jnp.real(fieldh), axis=(-2, -1))


def enforce_reality(solh: jax.Array, grid) -> jax.Array:
    """Purge conjugate-symmetry drift by a physical-space round trip.

    Equivalent of the reference ``enforce_reality_condition!``
    (rsw/RotatingShallowWater.jl:118-133): irfft . rfft projects onto the
    exactly-conjugate-symmetric subspace.
    """
    return rfft2(irfft2(grid.dealias(solh), grid.nx))


def spectral_gradients(psih: jax.Array, grid):
    """Velocity and velocity-gradient spectra from a streamfunction.

    u = -psi_y, v = psi_x; returns (uh, vh, uxh, uyh, vxh) —
    v_y = -u_x by incompressibility (reference
    swqg/RaytracingDriver.jl:164-185, raytracing/GPURaytracing.jl:62-64).
    """
    ik, il = grid.ik, grid.il
    uh = -il * psih
    vh = ik * psih
    uxh = ik * uh
    uyh = il * uh
    vxh = ik * vh
    return uh, vh, uxh, uyh, vxh
