"""High-wavenumber exponential spectral filter.

Re-implements the FourierFlows ``makefilter`` semantics used by the
reference's filtered steppers (utils/IFMAB3.jl:81, "FilteredAB3"/"FilteredRK4"
in raytracing/Parameters.jl:7): an exponential cutoff in the normalised
wavenumber K' = sqrt((kr*dx/pi)^2 + (l*dy/pi)^2) in [0, sqrt(2)]:

    filter(K') = 1                                         K' <= innerK
               = exp(-decay * (K' - innerK)^order)         K' >  innerK

with decay chosen so the filter reaches machine epsilon at K' = outerK.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_filter"]


def make_filter(
    grid,
    order: float = 4.0,
    innerK: float = 0.65,
    outerK: float = 1.0,
    tol: float = 1e-15,
) -> jax.Array:
    """(nl, nkr) multiplicative filter mask."""
    Kx = np.asarray(grid.kr) * grid.dx / np.pi
    Ky = np.asarray(grid.l) * grid.dy / np.pi
    K = np.sqrt(Kx[None, :] ** 2 + Ky[:, None] ** 2)
    decay = -np.log(tol) / (outerK - innerK) ** order
    filt = np.exp(-decay * np.maximum(K - innerK, 0.0) ** order)
    filt[K < innerK] = 1.0
    return jnp.asarray(filt, jnp.float32)
