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
from jax.sharding import Mesh, PartitionSpec as P

from ..algebra.block import FieldwiseOperator
from ..multilevel.hierarchy import cartesian_hierarchy
from ..multilevel.multifield import MultiFieldTransfer
from ..parallel.dist import DistProlongation, DistRestriction, Resharded
from ..parallel.dist_block import shard_block_system, shard_block_vector
from ..parallel.dist_ell import pad_multiple, shard_csr
from . import assembly2 as asm
from .mesh import CartesianMesh
from .stokes import stokes_problem


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
    dtype=np.float64,
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
        ncells, num_levels, mesh, axis=axis, nu=nu, dtype=dtype,
        **(gmg_kw or {})
    )
    Mp_dist = dist_pressure_mass(ncells, mesh, axis=axis, dtype=dtype)
    prec = BlockTriangularSolver(
        solvers=(gmg, CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=40)),
        blocks=((LinearSystemBlock(), None), (None, MatrixBlock(Mp_dist))),
        half="upper",
    )
    solver = FGMRESSolver(m=30, Pr=prec, rtol=rtol, maxiter=maxiter)
    return solver, gmg


# ---------------------------------------------------------------------------
# augmented-Lagrangian (grad-div) distributed configuration — the sharded
# version of the reference's actual StokesGMG.jl solver (alpha=1e3,
# Q2/P1disc, patch smoothers, patch prolongations)
# ---------------------------------------------------------------------------


def graddiv_level_pads(
    ncells, nprocs: int, num_levels: int, min_sharded_rows: int = 4
):
    """NESTED x-row-aligned pads for the augmented (Q2/P1disc) hierarchy.

    The grad-div path shards its FE-embedding transfer matrices as
    DistELL matvecs, which need every shard of level L to cover exactly
    the same spatial x-interval as its level-L+1 counterpart (flat
    `pad_multiple` padding cuts shards mid-grid-row and the transfer
    halos blow past one hop). Per-shard x-rows are therefore chosen
    nested: mx_L = mxc * 2^(L_sh-1-L) with mxc = ceil(rows at the
    coarsest sharded level / nprocs), and the flat end-padding lands on
    whole x-rows because each shard size is a multiple of the row pitch.

    Returns (vel_pads, n_p_pad, sharded): per-level padded velocity
    sizes, the P1disc pressure pad (cells sharded at gc = mx_0/2 cell
    rows — the velocity shard's spatial footprint), and the per-level
    sharded flags (coarsest level always replicated)."""
    n0 = ncells[0]
    dim = len(ncells)
    rows = [2 * (n0 // 2 ** L) + 1 for L in range(num_levels)]
    sharded = [
        L < num_levels - 1 and rows[L] >= min_sharded_rows * nprocs
        for L in range(num_levels)
    ]
    L_sh = sum(sharded)
    assert all(sharded[L] == (L < L_sh) for L in range(num_levels))
    vel_pads = []
    mx0 = None
    if L_sh:
        mxc = -(-rows[L_sh - 1] // nprocs)
        if L_sh == 1 and mxc % 2:
            mxc += 1  # mx_0 must be even (pressure cell alignment)
        mx = [mxc * 2 ** (L_sh - 1 - L) for L in range(L_sh)]
        mx0 = mx[0]
    for L in range(num_levels):
        rest = int(
            np.prod([2 * (n // 2 ** L) + 1 for n in ncells[1:]])
        )
        if sharded[L]:
            vel_pads.append(nprocs * mx[L] * rest)
        else:
            vel_pads.append(rows[L] * rest)  # replicated: real size
    if mx0 is None:
        mx0 = 2 * (-(-(n0 + 1) // nprocs))
    gc = mx0 // 2
    n_p_pad = nprocs * gc * int(np.prod(ncells[1:])) * (dim + 1)
    return vel_pads, n_p_pad, sharded


def _velocity_star_topo(lev_mesh, dim):
    """Field-major vertex-star velocity patch topology (the serial
    velocity_vanka_smoother's patches), for the distributed Vanka."""
    from ..patches.topology import concat_patches, vertex_star_patches

    gs = asm.node_grid_shape(lev_mesh, 2)
    free = ~asm.boundary_node_mask(lev_mesh, 2).reshape(gs)
    t = vertex_star_patches(gs, free_mask=free, radius=1, stride=2)
    n_u = int(np.prod(gs))
    return concat_patches([t] * dim, [n_u] * dim)


def _cc_interior_topo(fine_mesh, coarse_mesh, dim):
    from ..patches.topology import coarse_cell_patches, concat_patches

    gs = asm.node_grid_shape(fine_mesh, 2)
    free = ~asm.boundary_node_mask(fine_mesh, 2).reshape(gs)
    t = coarse_cell_patches(
        coarse_mesh.ncells, order=2, free_mask=free, interior=True
    )
    n_u = int(np.prod(gs))
    return concat_patches([t] * dim, [n_u] * dim)


def dist_velocity_gmg_graddiv(
    ncells,
    num_levels: int,
    mesh: Mesh,
    axis: str = "p",
    nu: float = 1.0,
    graddiv_alpha: float = 1.0e3,
    min_sharded_rows: int = 4,
    dtype=np.float64,
    **kw,
):
    """Sharded GMG for the grad-div augmented velocity block (the
    distributed version of fem/stokes.velocity_gmg with graddiv_alpha):
    per-level augmented operators sharded as 2x2 DistELL blocks,
    distributed vertex-star Vanka smoothers (Richardson 10 x 0.2),
    EXACT Q2 FE-embedding transfers as sharded rectangular DistELL
    matvecs, and coarse-cell-interior patch prolongations with the
    grad-div-only rhs — all pieces match the serial augmented GMG, so
    sharded == serial up to roundoff."""
    from ..linear.gmg import GMGSolver
    from ..linear.smoothers import RichardsonSmoother
    from ..multilevel.transfer import fe_transfer_pair
    from ..parallel.dist_block import shard_block_system
    from ..patches.dist_vanka import make_dist_vanka
    from ..patches.transfer import PatchProlongation
    from ..patches.vanka import VankaSolver
    from .stokes import graddiv_velocity_block

    dim = len(ncells)
    nprocs = mesh.shape[axis]
    hierarchy = cartesian_hierarchy(ncells, num_levels)
    vel_pads, _, sharded_flags = graddiv_level_pads(
        ncells, nprocs, num_levels, min_sharded_rows
    )

    def vel_pad(lev_mesh, lev):
        return vel_pads[lev]

    def is_sharded(lev_mesh, lev):
        return sharded_flags[lev]

    ops, smoothers, layouts = [], [], []
    gd_ops, serial_augs, leaves_infos = [], [], []
    for lev, lev_mesh in enumerate(hierarchy.meshes):
        K_aug, G = graddiv_velocity_block(
            lev_mesh, nu, graddiv_alpha, return_graddiv=True
        )
        serial_augs.append(K_aug)
        if is_sharded(lev_mesh, lev):
            pads = [vel_pad(lev_mesh, lev)] * dim
            K_dist, vlayout, vleaves = shard_block_system(
                K_aug, mesh, axis=axis, field_pads=pads
            )
            G_dist, _, _ = shard_block_system(
                G, mesh, axis=axis, field_pads=pads
            )
            ops.append(K_dist)
            gd_ops.append(G_dist)
            layouts.append(vlayout)
            leaves_infos.append(vleaves)
            star = _velocity_star_topo(lev_mesh, dim)
            if lev < num_levels - 1:
                smoothers.append(
                    RichardsonSmoother(
                        make_dist_vanka(
                            K_aug, vlayout, vleaves, topo=star,
                            weighting="unit",
                        ),
                        niter=10,
                        omega=0.2,
                    )
                )
        else:
            ops.append(K_aug)
            gd_ops.append(G)
            layouts.append(None)
            leaves_infos.append(None)
            if lev < num_levels - 1:
                from .stokes import velocity_vanka_smoother

                smoothers.append(
                    RichardsonSmoother(
                        velocity_vanka_smoother(lev_mesh, omega=1.0),
                        niter=10,
                        omega=0.2,
                    )
                )

    prolongs, restricts = [], []
    for lev in range(num_levels - 1):
        fine, coarse = hierarchy[lev], hierarchy[lev + 1]
        mask_f = asm.boundary_node_mask(fine, 2)
        mask_c = asm.boundary_node_mask(coarse, 2)
        from ..multilevel.transfer import fe_grid_interpolation
        import scipy.sparse as sp

        Pcsr = fe_grid_interpolation(coarse.ncells, 2)
        Pcsr = asm.zero_rows(Pcsr, mask_f)
        Pcsr = asm.zero_columns(Pcsr, mask_c)
        Pcsr.eliminate_zeros()
        Rcsr = Pcsr.T.tocsr()
        f_sh, c_sh = is_sharded(fine, lev), is_sharded(coarse, lev + 1)
        if f_sh and c_sh:
            np_f, np_c = vel_pad(fine, lev), vel_pad(coarse, lev + 1)
            Pop = shard_csr(
                Pcsr, mesh, axis=axis, n_rows_pad=np_f, n_cols_pad=np_c,
                identity_pad=False, dtype=dtype,
            )
            Rop = shard_csr(
                Rcsr, mesh, axis=axis, n_rows_pad=np_c, n_cols_pad=np_f,
                identity_pad=False, dtype=dtype,
            )
            spec_f, spec_c = P(axis), P(axis)
        else:
            from ..algebra.ell import ell_from_scipy

            if f_sh:
                # pad rows so the output reshards onto the fine layout
                np_f = vel_pad(fine, lev)
                Pcsr = sp.vstack(
                    [Pcsr,
                     sp.csr_matrix((np_f - Pcsr.shape[0], Pcsr.shape[1]))]
                ).tocsr()
                Rcsr = Pcsr.T.tocsr()
            Pop = ell_from_scipy(Pcsr)
            Rop = ell_from_scipy(Rcsr)
            spec_f = P(axis) if f_sh else P()
            spec_c = P(axis) if c_sh else P()
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

    # patch-corrected prolongations (coarse-cell-interior solves of the
    # FINE augmented operator, grad-div-only rhs)
    for lev in range(num_levels - 1):
        fine, coarse = hierarchy[lev], hierarchy[lev + 1]
        cc = _cc_interior_topo(fine, coarse, dim)
        if is_sharded(fine, lev):
            vanka = make_dist_vanka(
                serial_augs[lev], layouts[lev], leaves_infos[lev],
                topo=cc, weighting="unit",
            )
            vanka = dataclasses.replace(vanka, jacobi_uncovered=False)
        else:
            vanka = VankaSolver(
                topo=cc, omega=1.0, weighting="unit", jacobi_uncovered=False
            )
        vstate = vanka.setup(ops[lev])
        prolongs[lev] = PatchProlongation(
            prolongs[lev], ops[lev], vanka, vstate, rhs_op=gd_ops[lev]
        )

    return GMGSolver(
        coarse_ops=tuple(ops[1:]),
        prolongations=tuple(prolongs),
        restrictions=tuple(restricts),
        smoother=smoothers,
        **kw,
    )


def distributed_stokes_graddiv_system(
    ncells,
    mesh: Mesh,
    num_levels: int = 3,
    axis: str = "p",
    nu: float = 1.0,
    graddiv_alpha: float = 1.0e3,
    min_sharded_rows: int = 4,
    dtype=np.float64,
):
    """Augmented (Q2/P1disc) Stokes system sharded over the device axis.
    num_levels and min_sharded_rows must match the GMG's (the velocity
    pad is nested across the hierarchy's sharded levels —
    distributed_stokes_graddiv_solver passes both through)."""
    dim = len(ncells)
    prob = stokes_problem(
        ncells, nu=nu, dtype=dtype, graddiv_alpha=graddiv_alpha
    )
    nprocs = mesh.shape[axis]
    vel_pads, n_p_pad, sharded = graddiv_level_pads(
        ncells, nprocs, num_levels, min_sharded_rows
    )
    if not sharded[0]:
        raise ValueError(
            f"fine level ({2 * ncells[0] + 1} velocity rows) is below the "
            f"sharding threshold ({min_sharded_rows} rows/shard x "
            f"{nprocs} shards) — use the serial augmented solver "
            "(fem/stokes.velocity_gmg) instead"
        )
    n_u_pad = vel_pads[0]
    pads = [n_u_pad] * dim + [n_p_pad]
    A_dist, layout, leaves_info = shard_block_system(
        prob.A, mesh, axis=axis, field_pads=pads
    )
    b_dist = shard_block_vector(prob.b, layout)
    return prob, A_dist, b_dist, layout, leaves_info


def distributed_stokes_graddiv_solver(
    ncells,
    num_levels: int,
    mesh: Mesh,
    axis: str = "p",
    nu: float = 1.0,
    graddiv_alpha: float = 1.0e3,
    min_sharded_rows: int = 4,
    rtol: float = 1e-8,
    maxiter: int = 40,
    gmg_kw: Optional[dict] = None,
    dtype=np.float64,
):
    """Distributed augmented-Lagrangian flagship (StokesGMG.jl:129-160
    sharded): FGMRES + upper block-triangular [augmented velocity GMG,
    -(1/alpha) Mp], coeffs [[1,1],[0,1]]. min_sharded_rows governs the
    nested level pads — it is forwarded to the GMG (do not override it
    via gmg_kw: the system builder must use the same value)."""
    from ..blocks import (
        BlockTriangularSolver,
        LinearSystemBlock,
        MatrixBlock,
    )
    from ..linear import CGSolver, FGMRESSolver, JacobiSolver

    assert not (gmg_kw and "min_sharded_rows" in gmg_kw), (
        "pass min_sharded_rows directly (the system/Mp pads must match)"
    )
    dim = len(ncells)
    gmg = dist_velocity_gmg_graddiv(
        ncells, num_levels, mesh, axis=axis, nu=nu,
        graddiv_alpha=graddiv_alpha, min_sharded_rows=min_sharded_rows,
        dtype=dtype, **(gmg_kw or {}),
    )
    # -(1/alpha) P1disc mass, sharded on the pressure pad
    domain = tuple(x for _ in range(dim) for x in (0.0, 1.0))
    cmesh = CartesianMesh(tuple(ncells), domain)
    Mp = asm.pdisc_mass_matrix(cmesh) * (-1.0 / graddiv_alpha)
    _, n_p_pad, _ = graddiv_level_pads(
        ncells, mesh.shape[axis], num_levels, min_sharded_rows
    )
    Mp_dist = shard_csr(
        Mp.tocsr(), mesh, axis=axis, n_rows_pad=n_p_pad,
        n_cols_pad=n_p_pad, identity_pad=True, dtype=dtype,
    )
    prec = BlockTriangularSolver(
        solvers=(gmg, CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=40)),
        blocks=((LinearSystemBlock(), None), (None, MatrixBlock(Mp_dist))),
        coeffs=((1.0, 1.0), (0.0, 1.0)),
        half="upper",
    )
    solver = FGMRESSolver(m=20, Pr=prec, rtol=rtol, maxiter=maxiter)
    return solver, gmg
