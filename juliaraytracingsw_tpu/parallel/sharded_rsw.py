"""Slab-sharded rotating-shallow-water simulation.

``ShardedRSW`` instantiates the model-generic slab-sharded core
(parallel/sharded.ShardedSpectralModel — kr-column-sharded state, slab-local
FFTs with ICI all_to_all transposes, all-gathered interpolation fields,
data-parallel coupled rays) for the 3-field RSW system
(rsw/RotatingShallowWater.jl): full 3x3 non-diagonal L handled by the
matrix-exponential IF-AB3, advection + height-flux nonlinearity, and the
PV-inversion streamfunction for ray advection
(rsw/RSWRaytracingDriver.jl:56-67).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..models import rsw
from .sharded import ShardedSpectralModel

__all__ = ["ShardedRSW"]


@dataclass
class ShardedRSW(ShardedSpectralModel):
    """Slab-sharded RSW stepping + coupled rays (``params`` is RSWParams)."""

    nfields = 3

    def _build_L(self):
        return rsw.build_L(self.grid, self.params)

    def _extra_consts(self):
        K2 = np.asarray(self.grid.Krsq, np.float64)
        Kd2 = self.params.f ** 2 / self.params.Cg2
        return {"pvfac": (-1.0 / (K2 + Kd2)).astype(np.float32)}

    def _calcN_local(self, solh, c):
        """rsw._advection_N on one kr-column shard: same math, transforms
        replaced by slab-local FFT + all_to_all (rsw/RotatingShallowWater.jl
        calcN!, :140-230)."""
        from .fft import local_irfft2, local_rfft2

        g = self.grid
        ik, il, deal = c["ik"], c["il"], c["deal"]
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

    def _psih_local(self, sol, c):
        """PV-inversion streamfunction psih = -q/(K^2 + Kd^2)
        (rsw/RSWRaytracingDriver.jl:56-67) on one shard."""
        ik, il = c["ik"], c["il"]
        qh = ik * sol[1] - il * sol[0] - self.params.f * sol[2]
        return qh * c["pvfac"]
