"""Linborg shallow-water variant: advection by the rotational flow only.

Same linear operator as full RSW; the *advecting* velocity in the momentum
equations is replaced by the divergence-free (rotational) component derived
from the vorticity streamfunction (reference rsw/LinborgShallowWater.jl:155-237,
module also named RotatingShallowWater there — file-swap config pattern).
"""
from __future__ import annotations

from .base import Model
from .rsw import RSWParams, _advection_N, build_L

__all__ = ["make_model"]


def make_model(grid, nu=1e-16, nnu=4, f=1.0, Cg=1.0, forcing=None) -> Model:
    params = RSWParams(nu=float(nu), nnu=int(nnu), f=float(f), Cg2=float(Cg) ** 2)
    L = build_L(grid, params)

    def calcN(solh, t):
        N = _advection_N(solh, grid, rotational_only=True)
        if forcing is not None:
            N = N + forcing(solh, t)
        return N

    return Model(
        name="linborg_sw", grid=grid, params=params, L=L, calcN=calcN, nfields=3
    )
