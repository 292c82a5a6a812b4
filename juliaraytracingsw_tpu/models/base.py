"""Model protocol and the stepper registry.

A *model* is a plain container of pure functions and arrays:

- ``L``      : per-mode linear operator — diagonal (broadcastable to the
               state) or blockwise ``(C, C, nl, nkr)``;
- ``calcN``  : nonlinear pseudo-spectral RHS, ``(sol, t) -> N``;
- energetics and helper closures.

Steppers are built by name with the same vocabulary the reference drivers
use ("IFMAB3", "ETDRK4", "FilteredAB3", "FilteredRK4", ... — e.g.
rsw/RotatingShallowWater.jl:79, raytracing/Parameters.jl:7).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core import steppers as _steppers
from ..core.filters import make_filter
from ..core.steppers import Clock, zero_clock

__all__ = ["Model", "build_stepper", "run", "STEPPERS"]


@dataclass(frozen=True)
class Model:
    """A spectral PDE model on a 2-D periodic grid (static; close over it)."""

    name: str
    grid: Any
    params: Any
    L: jax.Array
    calcN: Callable[[jax.Array, jax.Array], jax.Array]
    nfields: int
    # optional extras (model-specific diagnostics etc.)
    extras: dict = field(default_factory=dict)


STEPPERS = {
    "IFMAB3": _steppers.make_ifab3,
    "ETDAB3": _steppers.make_ifab3,  # reference's ETDAB3 is the same scheme
    "IFRK4": _steppers.make_ifrk4,
    "ETDRK4": _steppers.make_etdrk4,
    "FilteredETDRK4": _steppers.make_etdrk4,
    "AB3": _steppers.make_filtered_ab3,
    "FilteredAB3": _steppers.make_filtered_ab3,
    "RK4": _steppers.make_filtered_rk4,
    "FilteredRK4": _steppers.make_filtered_rk4,
}

_ALWAYS_FILTERED = {"FilteredAB3", "FilteredRK4", "FilteredETDRK4"}


def build_stepper(
    model: Model,
    stepper: str = "IFMAB3",
    dt: float = 5e-2,
    use_filter: bool = False,
    filter_kwargs: dict | None = None,
):
    """Return ``(init_fn, step_fn)`` for the named stepper on this model."""
    try:
        factory = STEPPERS[stepper]
    except KeyError:
        raise ValueError(
            f"unknown stepper {stepper!r}; available: {sorted(STEPPERS)}"
        ) from None
    filt = None
    if use_filter or stepper in _ALWAYS_FILTERED:
        filt = make_filter(model.grid, **(filter_kwargs or {}))
    return factory(model.L, model.calcN, dt, filt)


def run(step_fn, sol, clock: Clock, state, nsteps: int,
        remat: bool = False):
    """Advance ``nsteps`` with ``lax.scan`` (jit/grad/shard friendly).

    ``remat=True`` checkpoints each step for the backward pass so gradients
    through long horizons fit HBM (rematerialise forward work instead of
    storing every FFT intermediate — SURVEY.md §5.7: this, not ring
    attention, is the long-context problem here).
    """

    def body(carry, _):
        sol, clock, state = carry
        sol, clock, state = step_fn(sol, clock, state)
        return (sol, clock, state), None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)

    (sol, clock, state), _ = jax.lax.scan(
        body, (sol, clock, state), None, length=nsteps
    )
    return sol, clock, state
