"""1-D ray-tracing prototype + micro-benchmark.

1-D *analogue* of the reference's packet benchmark
raytracing/JuliaRaytracing1D.jl (which is itself 2-D: x/y positions, U/V
textures, omega = sqrt(1 + k1^2 + k2^2), @btime of Vern7 vs Vern8 at
:98-111). This module reduces the same structure to one dimension —
structure-of-arrays packets over a 1-D periodic velocity field u(x),
omega = sqrt(1 + k^2), RHS dx/dt = u + c_g, dk/dt = -u_x k — and
micro-benchmarks the fixed-substep rk4 vs implicit-midpoint steppers.

This is the smallest end-to-end exercise of the ray stack — useful as a
compile-time/throughput canary and as the on-ramp for new integrators.
"""
from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Rays1D", "init_rays1d", "raytrace1d", "benchmark_integrators"]


class Rays1D(NamedTuple):
    x: jax.Array  # (N,) positions
    k: jax.Array  # (N,) wavenumbers


def init_rays1d(n: int, L: float = 2 * np.pi, k0: float = 1.0,
                dtype=jnp.float32) -> Rays1D:
    """Uniform packet lattice with k = k0 (JuliaRaytracing1D.jl:20-31)."""
    x = (np.arange(n) + 0.5) * (L / n) - L / 2
    return Rays1D(x=jnp.asarray(x, dtype), k=jnp.full((n,), k0, dtype))


def _interp1d_periodic(field, xq, L):
    """Linear periodic interpolation on a uniform 1-D grid (the 1-D analogue
    of the production bilinear gather; texture setup in the reference
    :33-52)."""
    n = field.shape[0]
    s = (xq % L) / L * n
    i0 = jnp.floor(s).astype(jnp.int32)
    a = s - i0
    f0 = jnp.take(field, i0 % n)
    f1 = jnp.take(field, (i0 + 1) % n)
    return f0 + a * (f1 - f0)


def _rhs1d(r: Rays1D, u, ux, L):
    """dx/dt = u + dw/dk, dk/dt = -u_x k with omega = sqrt(1 + k^2)
    (JuliaRaytracing1D.jl:60-76)."""
    uq = _interp1d_periodic(u, r.x, L)
    uxq = _interp1d_periodic(ux, r.x, L)
    cg = r.k / jnp.sqrt(1.0 + r.k * r.k)
    return Rays1D(x=uq + cg, k=-uxq * r.k)


@partial(jax.jit, static_argnames=("nsteps", "method"))
def raytrace1d(rays: Rays1D, u, ux, dt: float, nsteps: int, L: float,
               method: str = "rk4") -> Rays1D:
    """Integrate the 1-D ray ODEs through a frozen field under lax.scan."""

    def axpy(r, d, h):
        return Rays1D(x=r.x + h * d.x, k=r.k + h * d.k)

    def step(r, _):
        if method == "rk4":
            k1 = _rhs1d(r, u, ux, L)
            k2 = _rhs1d(axpy(r, k1, dt / 2), u, ux, L)
            k3 = _rhs1d(axpy(r, k2, dt / 2), u, ux, L)
            k4 = _rhs1d(axpy(r, k3, dt), u, ux, L)
            out = Rays1D(
                x=r.x + dt / 6 * (k1.x + 2 * k2.x + 2 * k3.x + k4.x),
                k=r.k + dt / 6 * (k1.k + 2 * k2.k + 2 * k3.k + k4.k),
            )
        elif method == "midpoint":
            half = _rhs1d(r, u, ux, L)
            mid = _rhs1d(axpy(r, half, dt / 2), u, ux, L)
            out = axpy(r, mid, dt)
        else:
            raise ValueError(method)
        return out, None

    out, _ = jax.lax.scan(step, rays, None, length=nsteps)
    return out


def benchmark_integrators(n_packets: int = 4096, nx: int = 512,
                          nsteps: int = 1000, dt: float = 1e-3,
                          methods: tuple = ("rk4", "midpoint")):
    """Integrator micro-benchmark (JuliaRaytracing1D.jl:98-111 @btime block).

    Returns {method: seconds} for nsteps of n_packets rays through a random
    band-limited 1-D field.
    """
    L = 2 * np.pi
    rng = np.random.default_rng(0)
    x = np.linspace(0, L, nx, endpoint=False)
    u = np.zeros(nx)
    for m in range(1, 6):
        u += rng.normal() * np.cos(m * x) + rng.normal() * np.sin(m * x)
    ux = np.gradient(u, x)
    uj = jnp.asarray(u, jnp.float32)
    uxj = jnp.asarray(ux, jnp.float32)
    rays = init_rays1d(n_packets, L)
    out = {}
    for method in methods:
        r = raytrace1d(rays, uj, uxj, dt, nsteps, L, method)
        jax.block_until_ready(r)  # compile
        t0 = time.perf_counter()
        r = raytrace1d(rays, uj, uxj, dt, nsteps, L, method)
        jax.block_until_ready(r)
        out[method] = time.perf_counter() - t0
    return out
