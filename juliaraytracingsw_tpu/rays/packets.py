"""Wave-packet ensembles as structure-of-arrays pytrees.

The reference stores GPU packets as an (N, 4) CuArray [x y k l]
(raytracing/GPURaytracing.jl:32) plus a per-packet frequency sign
(``pos_neg``). Here packets are a NamedTuple of 1-D arrays — a natural JAX
pytree that shards along its single axis with
``PartitionSpec('packets')`` and vmaps/scans cleanly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Packets", "lattice_packets", "packets_to_array", "packets_from_array"]


class Packets(NamedTuple):
    x: jax.Array     # (N,) position x
    y: jax.Array     # (N,) position y
    k: jax.Array     # (N,) wavenumber x-component
    l: jax.Array     # (N,) wavenumber y-component
    sign: jax.Array  # (N,) +/-1 branch of the dispersion relation

    @property
    def n(self) -> int:
        return self.x.shape[0]


def lattice_packets(
    sqrt_npackets: int,
    Lx: float,
    Ly: float,
    k0: float,
    alternate_sign: bool = True,
    k_ring: bool = False,
    dtype=jnp.float32,
    x0: float | None = None,
    y0: float | None = None,
) -> Packets:
    """Uniform lattice of packets with |k| = k0 and alternating +/- branches.

    Mirrors the reference's ``generate_initial_wavepackets``
    (raytracing/RaytracingDriver.jl:27-47): packets on a sqrtN x sqrtN
    lattice spanning the domain; with ``k_ring`` the wavevector of packet j
    points at phase 2*pi*j/N around the ring of radius k0 (:41-42),
    otherwise all packets start with k = (k0, 0)
    (raytracing/GPUTwoLayerRaytracing.jl:10-27). Frequency signs alternate
    packet-by-packet (:45).
    """
    n = sqrt_npackets
    x0 = -Lx / 2.0 if x0 is None else x0
    y0 = -Ly / 2.0 if y0 is None else y0
    xs = x0 + (np.arange(n) + 0.5) * (Lx / n)
    ys = y0 + (np.arange(n) + 0.5) * (Ly / n)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    N = n * n
    if alternate_sign:
        S = np.where(np.arange(N) % 2 == 0, -1.0, 1.0)
    else:
        S = np.ones((N,))
    if k_ring:
        phase = 2.0 * np.pi * np.arange(1, N + 1) / N
        kx = k0 * np.cos(phase)
        ky = k0 * np.sin(phase)
    else:
        kx = np.full((N,), k0)
        ky = np.zeros((N,))
    return Packets(
        x=jnp.asarray(X.reshape(N), dtype),
        y=jnp.asarray(Y.reshape(N), dtype),
        k=jnp.asarray(kx, dtype),
        l=jnp.asarray(ky, dtype),
        sign=jnp.asarray(S, dtype),
    )


def packets_to_array(p: Packets) -> jax.Array:
    """(N, 4) [x y k l] view for I/O parity with the reference layout."""
    return jnp.stack([p.x, p.y, p.k, p.l], axis=1)


def packets_from_array(arr, sign) -> Packets:
    return Packets(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], jnp.asarray(sign))
