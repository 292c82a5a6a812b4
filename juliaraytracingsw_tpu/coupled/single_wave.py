"""Single wave-packet-in-envelope experiment support.

Equivalent of the reference rsw/SingleWaveRSWRaytracingDriver.jl: build a
plane wave times Gaussian envelope with the linear RSW wave polarisation
(:47-85), and inject it into the *geostrophic part* of a spun-up flow
(:87-105) so one resolved wave packet plus one ray-traced packet co-evolve.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.spectral import enforce_reality, rfft2
from ..core.transfer import to_device
from ..models.wave_vortex import wave_balanced_decomposition

__all__ = ["gaussian_envelope", "single_wave_state", "inject_single_wave"]


def gaussian_envelope(grid, x0: float, y0: float, env_size: float):
    """Periodic Gaussian envelope centred at (x0, y0)
    (SingleWaveRSWRaytracingDriver.jl:47-52)."""
    x = np.asarray(grid.x, np.float64)
    y = np.asarray(grid.y, np.float64)
    mx = np.mod(x - x0 - x[0], grid.Lx) + x[0]
    my = np.mod(y - y0 - y[0], grid.Ly) + y[0]
    return np.exp(-((mx[None, :] / env_size) ** 2)
                  - (my[:, None] / env_size) ** 2)


def single_wave_state(grid, params, x0, y0, k0_idx, l0_idx, phase=0.0,
                      env_size=0.5, aw=0.1):
    """(3, nl, nkr) spectral wave state: enveloped plane wave with linear RSW
    polarisation, normalised so max |u_w| = aw (:54-86)."""
    k0 = float(np.asarray(grid.kr)[k0_idx])
    l0 = float(np.asarray(grid.l)[l0_idx])
    Ksq = k0 * k0 + l0 * l0
    invKsq = 1.0 / Ksq
    f = params.f
    omK = np.sqrt(f * f + params.Cg2 * Ksq)

    env = gaussian_envelope(grid, x0, y0, env_size)
    X = np.asarray(grid.x, np.float64)[None, :]
    Y = np.asarray(grid.y, np.float64)[:, None]
    waveform = env * np.exp(1j * (k0 * X + l0 * Y + phase))

    etaw = np.real(0.5 * waveform)
    uw = np.real(invKsq * (0.5 * k0 * omK + 0.5j * f * l0) * waveform)
    vw = np.real(invKsq * (0.5 * l0 * omK - 0.5j * f * k0) * waveform)
    s = aw / max(np.abs(uw).max(), 1e-30)
    stack = np.stack([uw * s, vw * s, etaw * s])
    return rfft2(jnp.asarray(stack, jnp.float32))


def inject_single_wave(solh, grid, params, **wave_kwargs):
    """Replace the wave part of a spun-up state with the enveloped packet:
    keep the geostrophic (PV) part, add the fresh wave
    (SingleWaveRSWRaytracingDriver.jl:87-105)."""
    geo, _ = wave_balanced_decomposition(solh, grid, params)
    wave = single_wave_state(grid, params, **wave_kwargs)
    return enforce_reality(geo + wave, grid)
