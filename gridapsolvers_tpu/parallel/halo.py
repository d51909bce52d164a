"""Explicit halo-exchange SpMV via shard_map + ppermute.

The hand-scheduled alternative to the GSPMD-automatic path in dist.py
(SURVEY.md §7 stage 1: "consistent/assemble halo exchange via shard_map +
ppermute; SpMV with compute/comm overlap"). Each device owns a contiguous
slab of the leading grid axis; the one-deep halo planes move over the ICI
ring with two ppermutes, and the local stencil apply reads the
halo-augmented slab. XLA overlaps the ppermutes with the local interior
compute (they have no data dependence on it).

This is the reference's PartitionedArrays `consistent!` made explicit: the
ghost copy is the received plane; `assemble!` (ghost->owner reduction) is
not needed because the stencil apply is owner-computes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..algebra.stencil import StencilMatrix, shift


def _local_stencil_apply(bands_loc, x_halo, offsets, inner_shape):
    """Apply the stencil on a halo-augmented local slab.

    bands_loc: (n_off, nloc, *rest); x_halo: (nloc + 2, *rest)."""
    nloc = bands_loc.shape[1]
    y = None
    for s, off in enumerate(offsets):
        sl = jax.lax.slice_in_dim(x_halo, 1 + off[0], 1 + off[0] + nloc, axis=0)
        if any(o != 0 for o in off[1:]):
            sl = shift(sl, (0,) + tuple(off[1:]))
        contrib = bands_loc[s] * sl
        y = contrib if y is None else y + contrib
    return y


def halo_spmv(A: StencilMatrix, mesh: Mesh, axis: str = "p"):
    """Returns a jittable matvec closure using explicit halo exchange.

    A must be sharded over the leading grid axis (grid_vectors=True,
    padded rows — see dist.shard_stencil)."""
    offsets = A.offsets
    ndim = len(A.grid_shape)
    band_spec = P(None, axis, *([None] * (ndim - 1)))
    vec_spec = P(axis, *([None] * (ndim - 1)))
    nprocs = mesh.shape[axis]

    def local_fn(bands_loc, x_loc):
        # send my last plane right (it becomes the right neighbor's left
        # halo) and my first plane left
        fwd = [(i, i + 1) for i in range(nprocs - 1)]
        bwd = [(i, i - 1) for i in range(1, nprocs)]
        left_halo = jax.lax.ppermute(x_loc[-1:], axis, fwd)
        right_halo = jax.lax.ppermute(x_loc[:1], axis, bwd)
        x_halo = jnp.concatenate([left_halo, x_loc, right_halo], axis=0)
        return _local_stencil_apply(bands_loc, x_halo, offsets, None)

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(band_spec, vec_spec),
        out_specs=vec_spec,
    )

    def matvec(x):
        return fn(A.bands, x)

    return matvec
