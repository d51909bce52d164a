"""Distributed Stokes: the flagship multi-chip configuration.

The reference's headline scalability benchmark is 2D Stokes solved with
FGMRES + upper block-triangular preconditioning (velocity GMG, pressure
mass CG) on up to 3,072 cores (joss_paper/scalability/src/stokes_gmg.jl,
test/Applications/StokesGMG.jl:79-166). This module builds the same
configuration on a 1-D TPU device axis:

- the saddle-point block system sharded field-wise (dist_block.py) with
  GRID-ALIGNED PROPORTIONAL padding — each shard owns whole grid rows and
  the velocity/pressure slabs cover the same spatial region, so every
  coupling block keeps a one-hop halo;
- velocity GMG with conv transfers on sharded node grids, coarse levels
  replicated below a row cutoff (the reference's subcommunicator
  shrinkage, re-expressed as a sharding change);
- pressure mass solved by Jacobi-CG on the sharded mass matrix;
- optionally a distributed Vanka smoother over the coupled system.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..algebra.block import FieldwiseOperator
from ..multilevel.hierarchy import cartesian_hierarchy
from ..multilevel.multifield import MultiFieldTransfer
from ..parallel.dist import DistProlongation, DistRestriction, Resharded
from ..parallel.dist_block import (
    FieldLayout,
    shard_block_system,
    shard_block_vector,
    unshard_block_vector,
)
from ..parallel.dist_ell import pad_multiple, shard_csr
from . import assembly2 as asm
from .mesh import CartesianMesh
from .stokes import StokesProblem, stokes_problem


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FlatGrid:
    """Adapter: run a grid-shaped transfer on flat (sharded) vectors."""

    op: object
    in_shape: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))

    def matvec(self, x):
        return self.op.matvec(x.reshape(self.in_shape)).reshape(-1)


def stokes_grid_pads(ncells, nprocs: int) -> Tuple[tuple, tuple]:
    """Grid-aligned proportional padded node-grid shapes (velocity Q2,
    pressure Q1): pressure leading axis padded to the device count, the
    velocity one to exactly twice that, so each shard's velocity slab
    covers its pressure slab spatially (one-hop coupling halos)."""
    n0 = ncells[0]
    gp = -(-(n0 + 1) // nprocs)          # pressure grid rows per shard
    P0p = nprocs * gp
    V0p = 2 * P0p
    vshape = (V0p,) + tuple(2 * n + 1 for n in ncells[1:])
    pshape = (P0p,) + tuple(n + 1 for n in ncells[1:])
    return vshape, pshape


def distributed_stokes_system(
    ncells,
    mesh: Mesh,
    axis: str = "p",
    nu: float = 1.0,
    dtype=np.float64,
):
    """Serial-assembled Stokes problem sharded over the device axis.

    Returns (prob, A_dist, b_dist, layout, leaves_info)."""
    dim = len(ncells)
    prob = stokes_problem(ncells, nu=nu, dtype=dtype)
    nprocs = mesh.shape[axis]
    vshape, pshape = stokes_grid_pads(ncells, nprocs)
    n_u_pad = int(np.prod(vshape))
    n_p_pad = int(np.prod(pshape))
    pads = [n_u_pad] * dim + [n_p_pad]
    A_dist, layout, leaves_info = shard_block_system(
        prob.A, mesh, axis=axis, field_pads=pads
    )
    b_dist = shard_block_vector(prob.b, layout)
    return prob, A_dist, b_dist, layout, leaves_info


def dist_velocity_gmg(
    ncells,
    num_levels: int,
    mesh: Mesh,
    axis: str = "p",
    nu: float = 1.0,
    smoother=None,
    min_sharded_rows: int = 2,
    dtype=np.float64,
    **kw,
):
    """Sharded GMG for the Stokes velocity block (matches
    fem/stokes.velocity_gmg but on the distributed layout): fine levels'
    vector stiffness sharded as DistELL with grid-aligned padding; coarse
    levels replicated (reference subcommunicator shrinkage,
    GridTransferOperators.jl:106-157)."""
    from ..linear.gmg import GMGSolver
    from ..linear.smoothers import ChebyshevSmoother

    dim = len(ncells)
    nprocs = mesh.shape[axis]
    hierarchy = cartesian_hierarchy(ncells, num_levels)
    vshape_f, _ = stokes_grid_pads(ncells, nprocs)

    def padded_vshape(lev_mesh, lev):
        gs = asm.node_grid_shape(lev_mesh, 2)
        if lev == 0:
            return vshape_f
        return (pad_multiple(gs[0], nprocs),) + gs[1:]

    def is_sharded(lev_mesh, lev=None):
        if lev is not None and lev == num_levels - 1:
            # coarsest level always replicated: its dense factorization is
            # the reference's gathered MUMPS/subcommunicator coarse solve
            return False
        return asm.node_grid_shape(lev_mesh, 2)[0] >= min_sharded_rows * nprocs

    def assemble_K_dist(lev_mesh, lev):
        m = asm.boundary_node_mask(lev_mesh, 2)
        Kc = asm.dirichlet_square(
            asm.assemble_bilinear(lev_mesh, 2, "stiffness", scale=nu), m
        )
        if is_sharded(lev_mesh, lev):
            gsp = padded_vshape(lev_mesh, lev)
            n_pad = int(np.prod(gsp))
            K1 = shard_csr(
                Kc, mesh, axis=axis, n_rows_pad=n_pad, n_cols_pad=n_pad,
                identity_pad=True, dtype=dtype,
            )
        else:
            # replicated coarse level (plain ELL on replicated vectors)
            K1 = asm.to_ell(Kc)
        return FieldwiseOperator(tuple(K1 for _ in range(dim)))

    def padded_free_mask(lev_mesh, gsp):
        gs = asm.node_grid_shape(lev_mesh, 2)
        free = (~asm.boundary_node_mask(lev_mesh, 2)).astype(dtype).reshape(gs)
        pw = [(0, gsp[0] - gs[0])] + [(0, 0)] * (len(gs) - 1)
        return jnp.asarray(np.pad(free, pw))

    ops, prolongs, restricts = [], [], []
    for lev, lev_mesh in enumerate(hierarchy.meshes):
        ops.append(assemble_K_dist(lev_mesh, lev))
    for lev in range(num_levels - 1):
        fine, coarse = hierarchy[lev], hierarchy[lev + 1]
        fsh = (
            padded_vshape(fine, lev)
            if is_sharded(fine, lev)
            else asm.node_grid_shape(fine, 2)
        )
        csh = (
            padded_vshape(coarse, lev + 1)
            if is_sharded(coarse, lev + 1)
            else asm.node_grid_shape(coarse, 2)
        )
        mf = padded_free_mask(fine, fsh)
        mc = padded_free_mask(coarse, csh)
        Pop = FlatGrid(DistProlongation(fsh, csh, mf), csh)
        Rop = FlatGrid(DistRestriction(fsh, csh, mc, mf), fsh)
        spec_f = P(axis) if is_sharded(fine, lev) else P()
        spec_c = P(axis) if is_sharded(coarse, lev + 1) else P()
        prolongs.append(
            MultiFieldTransfer(
                tuple(Resharded(Pop, spec_f, mesh) for _ in range(dim))
            )
        )
        restricts.append(
            MultiFieldTransfer(
                tuple(Resharded(Rop, spec_c, mesh) for _ in range(dim))
            )
        )

    return GMGSolver(
        coarse_ops=tuple(ops[1:]),
        prolongations=tuple(prolongs),
        restrictions=tuple(restricts),
        smoother=smoother or ChebyshevSmoother(degree=3),
        **kw,
    )


def dist_pressure_mass(
    ncells, mesh: Mesh, axis: str = "p", dtype=np.float64
):
    """Sharded pressure (Q1) mass matrix aligned with the Stokes layout."""
    dim = len(ncells)
    domain = tuple(x for _ in range(dim) for x in (0.0, 1.0))
    cmesh = CartesianMesh(tuple(ncells), domain)
    Mp = asm.assemble_bilinear(cmesh, 1, "mass")
    _, pshape = stokes_grid_pads(ncells, mesh.shape[axis])
    n_pad = int(np.prod(pshape))
    return shard_csr(
        Mp, mesh, axis=axis, n_rows_pad=n_pad, n_cols_pad=n_pad,
        identity_pad=True, dtype=dtype,
    )


def distributed_stokes_solver(
    ncells,
    num_levels: int,
    mesh: Mesh,
    axis: str = "p",
    nu: float = 1.0,
    rtol: float = 1e-8,
    maxiter: int = 60,
    gmg_kw: Optional[dict] = None,
):
    """The flagship configuration (reference StokesGMG.jl:129-155):
    FGMRES + upper block-triangular P with velocity GMG and Jacobi-CG on
    the pressure mass. Returns (solver, gmg) — call solver.setup(A_dist)."""
    from ..blocks import (
        BlockTriangularSolver,
        LinearSystemBlock,
        MatrixBlock,
    )
    from ..linear import CGSolver, FGMRESSolver, JacobiSolver

    gmg = dist_velocity_gmg(
        ncells, num_levels, mesh, axis=axis, nu=nu, **(gmg_kw or {})
    )
    Mp_dist = dist_pressure_mass(ncells, mesh, axis=axis)
    prec = BlockTriangularSolver(
        solvers=(gmg, CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=40)),
        blocks=((LinearSystemBlock(), None), (None, MatrixBlock(Mp_dist))),
        half="upper",
    )
    solver = FGMRESSolver(m=30, Pr=prec, rtol=rtol, maxiter=maxiter)
    return solver, gmg
