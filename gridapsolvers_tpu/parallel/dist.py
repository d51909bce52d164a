"""Distributed (sharded) operators and problems.

The TPU-native replacement for the reference's PartitionedArrays layer
(PVector/PSparseMatrix + consistent!/assemble! ghost exchange, SURVEY.md
§2.8-2.9), designed per the scaling-book recipe: pick a mesh, annotate
shardings, let XLA insert collectives.

- Vectors are GRID-shaped arrays sharded over the leading grid axis
  (NamedSharding P('p')) — a row-block partition like the reference's, but
  the "ghost exchange" is implicit: XLA's SPMD partitioner converts the
  stencil matvec's shifted slices and the transfer convs into neighbor
  halo exchanges (ppermute/collective-permute on ICI), overlapped with
  local compute by the scheduler.
- dots/norms on sharded leaves lower to psum — the reference's
  MPI_Allreduce inside PartitionedArrays norms.
- Coarse GMG levels re-shard to replicated below a size cutoff: the
  restriction's output sharding constraint makes XLA insert the gather —
  this is the analog of the reference's RedistributionOperator +
  subcommunicator shrinkage (GridTransferOperators.jl:106-157), except all
  devices stay in the computation (no `with_level` masking needed).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..algebra.stencil import StencilMatrix
from .mesh import replicated, row_sharding


def pad0(n: int, nprocs: int) -> int:
    """Padded size of the sharded leading grid axis: next multiple of
    nprocs. Vertex grids have 2^k+1 rows — never divisible — so the
    distributed path pads the leading axis with identity rows (decoupled
    dofs pinned at zero). Static padding is the TPU-idiomatic answer:
    aligned equal shards, no uneven-sharding bookkeeping."""
    return ((n + nprocs - 1) // nprocs) * nprocs


def pad_stencil(A: StencilMatrix, nprocs: int) -> StencilMatrix:
    """Pad the leading grid axis to a multiple of nprocs: zero bands on pad
    rows except a unit diagonal (identity rows -> pad dofs stay zero)."""
    n0 = A.grid_shape[0]
    n0p = pad0(n0, nprocs)
    if n0p == n0:
        return A
    bands = np.asarray(A.bands)
    pad_widths = [(0, 0), (0, n0p - n0)] + [(0, 0)] * (len(A.grid_shape) - 1)
    bands = np.pad(bands, pad_widths)
    center = A.offsets.index(tuple(0 for _ in A.grid_shape))
    bands[center, n0:] = 1.0
    new_shape = (n0p,) + A.grid_shape[1:]
    return StencilMatrix(bands, A.offsets, new_shape, A.grid_vectors)


def pad_grid_vector(x: jnp.ndarray, grid_shape, nprocs: int) -> jnp.ndarray:
    xg = jnp.asarray(x).reshape(grid_shape)
    n0 = grid_shape[0]
    n0p = pad0(n0, nprocs)
    if n0p == n0:
        return xg
    pw = [(0, n0p - n0)] + [(0, 0)] * (len(grid_shape) - 1)
    return jnp.pad(xg, pw)


def unpad_grid_vector(xg: jnp.ndarray, grid_shape) -> jnp.ndarray:
    return xg[: grid_shape[0]]


def shard_stencil(
    A: StencilMatrix, mesh: Mesh, axis: str = "p", pad: bool = True
) -> StencilMatrix:
    """Shard a stencil operator's bands over the leading grid axis and
    switch it to grid-shaped vectors. Pads the leading axis to the device
    count if needed."""
    if pad:
        A = pad_stencil(A, mesh.shape[axis])
    ndim = len(A.grid_shape)
    sh = NamedSharding(mesh, P(None, axis, *([None] * (ndim - 1))))
    bands = jax.device_put(A.bands, sh)
    return StencilMatrix(bands, A.offsets, A.grid_shape, grid_vectors=True)


def replicate_stencil(A: StencilMatrix, mesh: Mesh) -> StencilMatrix:
    bands = jax.device_put(A.bands, replicated(mesh))
    return StencilMatrix(bands, A.offsets, A.grid_shape, grid_vectors=True)


def shard_grid_vector(
    x: jnp.ndarray,
    mesh: Mesh,
    grid_shape: Tuple[int, ...],
    axis: str = "p",
    pad: bool = True,
) -> jnp.ndarray:
    xg = jnp.asarray(x).reshape(grid_shape)
    if pad:
        xg = pad_grid_vector(xg, grid_shape, mesh.shape[axis])
    return jax.device_put(xg, row_sharding(mesh, len(grid_shape), axis))


def _fit0(y: jnp.ndarray, target: int) -> jnp.ndarray:
    """Slice or zero-pad the leading axis to `target` rows."""
    n0 = y.shape[0]
    if n0 > target:
        return y[:target]
    if n0 < target:
        pw = [(0, target - n0)] + [(0, 0)] * (y.ndim - 1)
        return jnp.pad(y, pw)
    return y


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DistProlongation:
    """Factor-2 Q1 interpolation between PADDED sharded grids: conv over the
    padded coarse grid, then slice/pad the leading axis to the padded fine
    size. Pad rows carry zeros (identity dofs) so the conv's spill into the
    pad region is inert; masks zero any leakage at the real/pad seam."""

    fine_shape: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    coarse_shape: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    mask_fine: Optional[jnp.ndarray] = None

    def matvec(self, xc: jnp.ndarray) -> jnp.ndarray:
        from ..multilevel.transfer import prolong_slices

        y = _fit0(prolong_slices(xc), self.fine_shape[0])
        if self.mask_fine is not None:
            y = y * self.mask_fine
        return y


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DistRestriction:
    """Full-weighting restriction between PADDED sharded grids (transpose of
    DistProlongation on the real region)."""

    fine_shape: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    coarse_shape: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    mask_coarse: Optional[jnp.ndarray] = None
    mask_fine: Optional[jnp.ndarray] = None

    def matvec(self, xf: jnp.ndarray) -> jnp.ndarray:
        from ..multilevel.transfer import restrict_slices

        if self.mask_fine is not None:
            xf = xf * self.mask_fine
        y = _fit0(restrict_slices(xf), self.coarse_shape[0])
        if self.mask_coarse is not None:
            y = y * self.mask_coarse
        return y


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Resharded:
    """Wrap an operator so its output is constrained to a target sharding —
    the grid-transfer redistribution stage (reference
    GridTransferOperators.jl:316-347 appends a redistribute! after the
    transfer; here it is one sharding constraint and XLA emits the moves)."""

    op: object
    out_spec: P = dataclasses.field(metadata=dict(static=True))
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))

    def matvec(self, x):
        y = self.op.matvec(x)
        return jax.lax.with_sharding_constraint(
            y, NamedSharding(self.mesh, self.out_spec)
        )


def grid_spec(ndim: int, shard: bool, axis: str = "p") -> P:
    return P(axis, *([None] * (ndim - 1))) if shard else P()


def distributed_poisson_gmg(
    hierarchy,
    mesh: Mesh,
    smoother=None,
    min_sharded_rows: Optional[int] = None,
    axis: str = "p",
    dtype=jnp.float64,
    **kw,
):
    """Distributed GMG for Poisson on a device mesh: fine levels sharded,
    coarse levels replicated once the per-device row count drops below
    `min_sharded_rows` (default: 2 rows of the leading grid axis per
    device). Returns (gmg_solver, A_fine_sharded).
    """
    from ..fem.assembly import eliminate_dirichlet, laplacian
    from ..linear.gmg import GMGSolver
    from ..linear.smoothers import ChebyshevSmoother

    nprocs = mesh.shape[axis]
    ndim = hierarchy[0].dim
    min_rows = min_sharded_rows if min_sharded_rows is not None else 2

    def is_sharded(mesh_lev) -> bool:
        return mesh_lev.vertex_shape[0] >= min_rows * nprocs

    def padded_shape(m):
        vs = m.vertex_shape
        return (pad0(vs[0], nprocs),) + vs[1:]

    def padded_free_mask(m):
        free = (~m.boundary_vertex_mask()).astype(np.dtype(dtype))
        pw = [(0, pad0(free.shape[0], nprocs) - free.shape[0])] + [(0, 0)] * (
            ndim - 1
        )
        return jnp.asarray(np.pad(free, pw))

    ops = []
    for m in hierarchy.meshes:
        A = eliminate_dirichlet(
            laplacian(m, np.dtype(dtype)), m.boundary_vertex_mask()
        )
        A = pad_stencil(A, nprocs)
        ndim_b = len(A.grid_shape)
        if is_sharded(m):
            sh = NamedSharding(mesh, P(None, axis, *([None] * (ndim_b - 1))))
        else:
            sh = replicated(mesh)
        bands = jax.device_put(A.bands, sh)
        ops.append(
            StencilMatrix(bands, A.offsets, A.grid_shape, grid_vectors=True)
        )

    prolongs, restricts = [], []
    for l in range(hierarchy.num_levels - 1):
        fine, coarse = hierarchy[l], hierarchy[l + 1]
        mf = padded_free_mask(fine)
        mc = padded_free_mask(coarse)
        Pop = DistProlongation(padded_shape(fine), padded_shape(coarse), mf)
        Rop = DistRestriction(
            padded_shape(fine), padded_shape(coarse), mc, mf
        )
        prolongs.append(
            Resharded(Pop, grid_spec(ndim, is_sharded(fine), axis), mesh)
        )
        restricts.append(
            Resharded(Rop, grid_spec(ndim, is_sharded(coarse), axis), mesh)
        )

    gmg = GMGSolver(
        coarse_ops=tuple(ops[1:]),
        prolongations=tuple(prolongs),
        restrictions=tuple(restricts),
        smoother=smoother or ChebyshevSmoother(degree=3),
        **kw,
    )
    return gmg, ops[0]
