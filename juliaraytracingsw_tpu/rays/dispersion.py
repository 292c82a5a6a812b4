"""WKB dispersion relation for near-inertial internal waves.

omega(k) = sign * sqrt(f^2 + Cg^2 |k|^2), group velocity c_g = Cg^2 k / omega
(reference raytracing/Raytracing.jl:63-71, raytracing/GPURaytracing.jl:22-29).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["omega", "group_velocity", "doppler_frequency"]


def omega(k, l, f, Cg, sign=1.0):
    return sign * jnp.sqrt(f * f + Cg * Cg * (k * k + l * l))


def group_velocity(k, l, f, Cg, sign=1.0):
    w = omega(k, l, f, Cg, sign)
    c = Cg * Cg / w
    return c * k, c * l


def doppler_frequency(k, l, u, v, f, Cg, sign=1.0):
    """Absolute frequency Omega = omega + k . u (AnalysisUtils Doppler helper,
    analysis/Notebooks/AnalysisUtils.jl:396-414)."""
    return omega(k, l, f, Cg, sign) + k * u + l * v
