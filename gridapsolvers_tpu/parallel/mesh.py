"""Device meshes for SPMD domain decomposition.

Replaces the reference's MPI communicator world (MPI.jl + PartitionedArrays,
SURVEY.md §2.9): ranks become devices of a 1D jax.sharding.Mesh over axis
"p"; the row partition of every vector/matrix is a NamedSharding over that
axis. Collectives (dot/norm reductions, halo exchange) are inserted by XLA's
SPMD partitioner from the sharding annotations, riding ICI on real hardware.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_mesh(n_devices: Optional[int] = None, axis: str = "p") -> Mesh:
    """1D mesh over the first `n_devices` devices (default: all)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def device_mesh_nd(
    shape: Sequence[int], axes: Optional[Sequence[str]] = None
) -> Mesh:
    """Multi-axis device mesh for D-dimensional domain partitioning — the
    reference's per-level processor boxes (np_per_level NTuple{D},
    ModelHierarchies.jl:82). axes default to ('px', 'py', 'pz', ...)."""
    shape = tuple(shape)
    if axes is None:
        axes = tuple(f"p{'xyz'[d]}" for d in range(len(shape)))
    n = int(np.prod(shape))
    devs = jax.devices()
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]).reshape(shape), tuple(axes))


def row_sharding(mesh: Mesh, ndim: int = 1, axis: str = "p") -> NamedSharding:
    """Shard the leading (grid/row) dimension; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def axis_size(mesh: Mesh, axis: str = "p") -> int:
    return mesh.shape[axis]
