"""Packet ensemble maintenance: k-cutoff reset and birth/death resampling.

- ``k_cutoff_reset``: packets whose wavenumber magnitude exceeds a cutoff are
  reset to the injection wavenumber (k0, 0) — the reference applies this each
  packet frame to stop runaway refraction (raytracing/TwoLayerRaytracing.jl:136-141,
  raytracing/GPUTwoLayerRaytracing.jl:136-138). Implemented as ``jnp.where``:
  branch-free, shape-static.

- ``weibull_birth_death``: Weibull-age birth/death resampling of the ensemble
  (prototyped in the reference notebook Notebooks/BirthDeathPackets.ipynb,
  never productionised — SURVEY.md §2.8). Packets carry an age and a sampled
  lifetime; dead packets are reborn at fresh lattice/random positions with
  the injection wavenumber. Fixed ensemble size keeps shapes static for XLA.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .packets import Packets

__all__ = ["k_cutoff_reset", "BirthDeathState", "init_birth_death", "weibull_birth_death"]


def k_cutoff_reset(p: Packets, k_cutoff: float, k0: float) -> Packets:
    """Reset packets with |k| >= k_cutoff to (k0, 0)."""
    mag2 = p.k * p.k + p.l * p.l
    reset = mag2 >= (k_cutoff * k_cutoff)
    return Packets(
        p.x,
        p.y,
        jnp.where(reset, jnp.asarray(k0, p.k.dtype), p.k),
        jnp.where(reset, jnp.zeros((), p.l.dtype), p.l),
        p.sign,
    )


class BirthDeathState(NamedTuple):
    age: jax.Array       # (N,) current packet age
    lifetime: jax.Array  # (N,) sampled Weibull lifetime
    key: jax.Array       # PRNG key (checkpointed with the SimState so
                         # resumed runs continue the exact stochastic stream)
    births: jax.Array    # () cumulative rebirth count (population telemetry)


def _weibull(key, shape, k_shape, lam):
    u = jax.random.uniform(key, shape, minval=1e-12, maxval=1.0)
    return lam * (-jnp.log(u)) ** (1.0 / k_shape)


def init_birth_death(key, n, k_shape: float = 1.5, lam: float = 10.0, stagger: bool = True):
    """Sample initial lifetimes; with ``stagger`` initial ages are uniform in
    [0, lifetime) so deaths de-synchronise (as in the notebook's
    birth-interval sampling)."""
    k1, k2, k3 = jax.random.split(key, 3)
    lifetime = _weibull(k1, (n,), k_shape, lam)
    age = jnp.where(
        stagger, jax.random.uniform(k2, (n,)) * lifetime, jnp.zeros((n,))
    )
    return BirthDeathState(age=age, lifetime=lifetime, key=k3,
                           births=jnp.zeros((), jnp.int32))


def weibull_birth_death(
    p: Packets,
    state: BirthDeathState,
    dt: float,
    Lx: float,
    Ly: float,
    k0: float,
    k_shape: float = 1.5,
    lam: float = 10.0,
    x0: float = None,
    y0: float = None,
):
    """Age the ensemble by dt; dead packets (age >= lifetime) are reborn at
    uniform random positions with wavenumber (k0, 0) and a fresh lifetime.
    Returns (packets', state', born_mask)."""
    x0 = -Lx / 2.0 if x0 is None else x0
    y0 = -Ly / 2.0 if y0 is None else y0
    n = p.x.shape[0]
    age = state.age + dt
    dead = age >= state.lifetime
    key, kx, ky, kl, ks = jax.random.split(state.key, 5)
    new_x = x0 + jax.random.uniform(kx, (n,), dtype=p.x.dtype) * Lx
    new_y = y0 + jax.random.uniform(ky, (n,), dtype=p.y.dtype) * Ly
    new_life = _weibull(kl, (n,), k_shape, lam).astype(state.lifetime.dtype)
    new_sign = jnp.where(
        jax.random.uniform(ks, (n,)) < 0.5, 1.0, -1.0
    ).astype(p.sign.dtype)
    out = Packets(
        x=jnp.where(dead, new_x, p.x),
        y=jnp.where(dead, new_y, p.y),
        k=jnp.where(dead, jnp.asarray(k0, p.k.dtype), p.k),
        l=jnp.where(dead, jnp.zeros((), p.l.dtype), p.l),
        sign=jnp.where(dead, new_sign, p.sign),
    )
    new_state = BirthDeathState(
        age=jnp.where(dead, 0.0, age),
        lifetime=jnp.where(dead, new_life, state.lifetime),
        key=key,
        births=state.births + jnp.sum(dead).astype(jnp.int32),
    )
    return out, new_state, dead
