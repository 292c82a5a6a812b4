"""Device meshes and sharding policies.

The scaling story (SURVEY.md §2.7): rays never interact, so packets shard
perfectly over chips (``PartitionSpec('packets')``); the Eulerian spectral
state is replicated per chip at production sizes (512^2 x 3 complex64
~ 3 MB) and every chip computes the flow step redundantly — zero
communication on the ICI except the packet-loss psum in the backward pass.
Slab-decomposed distributed FFT for 1024^2+ lives in parallel/fft.py.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_packets", "replicate", "packet_sharding"]

PACKET_AXIS = "packets"


def make_mesh(n_devices: int | None = None, axis: str = PACKET_AXIS) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.array(devs[:n]), (axis,))


def packet_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(PACKET_AXIS))


def shard_packets(packets, mesh: Mesh):
    """Place every per-packet leaf with its leading axis split over the mesh."""
    sh = packet_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), packets)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)
