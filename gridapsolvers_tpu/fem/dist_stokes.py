"""Distributed Stokes: the flagship multi-chip configuration (1-D axis).

The reference's headline scalability benchmark is 2D Stokes solved with
FGMRES + upper block-triangular preconditioning (velocity GMG, pressure
mass CG) on up to 3,072 cores (joss_paper/scalability/src/stokes_gmg.jl,
test/Applications/StokesGMG.jl:79-166).

Round 3 consolidation (VERDICT #5): the 1-D window-shift distribution
design that used to live here (grid-aligned proportional pads, nested
`graddiv_level_pads` bookkeeping, `patches/dist_vanka.py`) is RETIRED.
A 1-D device axis is just the (p,) special case of the N-D box-partition
/ neighbor-offset-table design (`parallel/dist_ell_nd.py`,
`fem/dist_stokes_nd.py`, `patches/dist_vanka_nd.py`), which DESIGN.md
measured as the better lowering ("tables beat windows") and which needs
no level-nesting pad gymnastics: box partitions align GMG levels
spatially by construction. This module keeps the 1-D entry points as
thin delegations so drivers/tests keep a one-axis spelling.

The reference's single exchange mechanism (ExchangeGraph,
src/SolverInterfaces/PAExtras.jl:84-97) serves all its layers the same
way; `dist_ell.py` (window design) remains only for the consumers that
still ride it (fem/dist_navier_stokes.py, parallel/dist_block.py,
linear/amg.py DistAMG).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
from jax.sharding import Mesh

from .dist_stokes_nd import (
    dist_pressure_mass_nd,
    dist_velocity_gmg_graddiv_nd,
    dist_velocity_gmg_nd,
    distributed_stokes_graddiv_solver_nd,
    distributed_stokes_graddiv_system_nd,
    distributed_stokes_solver_nd,
    distributed_stokes_system_nd,
    unshard_stokes_solution_nd,
)


def _ms1(mesh: Mesh, axis: str) -> tuple:
    """1-D box-partition shape from a one-axis device mesh."""
    return (int(mesh.shape[axis]),)


def distributed_stokes_system(
    ncells, mesh: Mesh, axis: str = "p", nu: float = 1.0, dtype=np.float64
):
    """Serial-assembled Stokes problem sharded over the device axis
    (leading-grid-axis slabs = 1-D box partition).
    Returns (prob, A_dist, b_dist, part_v, part_p)."""
    return distributed_stokes_system_nd(
        ncells, mesh, _ms1(mesh, axis), nu=nu, dtype=dtype
    )


def dist_velocity_gmg(
    ncells, num_levels: int, mesh: Mesh, axis: str = "p", **kw
):
    """Sharded GMG for the Stokes velocity block on the 1-D slab
    partition (coarse levels replicated — the reference's
    subcommunicator shrinkage re-expressed as a sharding change)."""
    gmg, _ = dist_velocity_gmg_nd(
        ncells, num_levels, mesh, _ms1(mesh, axis), **kw
    )
    return gmg


def dist_pressure_mass(
    ncells, mesh: Mesh, axis: str = "p", dtype=np.float64
):
    """Sharded pressure (Q1) mass matrix aligned with the Stokes layout."""
    return dist_pressure_mass_nd(ncells, mesh, _ms1(mesh, axis), dtype=dtype)


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
    return distributed_stokes_solver_nd(
        ncells, num_levels, mesh, _ms1(mesh, axis), nu=nu, rtol=rtol,
        maxiter=maxiter, gmg_kw=gmg_kw, dtype=dtype,
    )


def distributed_stokes_graddiv_system(
    ncells,
    mesh: Mesh,
    num_levels: int = 3,      # kept for driver symmetry; box partitions
    axis: str = "p",          # need no level-nested pad coupling
    nu: float = 1.0,
    graddiv_alpha: float = 1.0e3,
    min_sharded_rows: int = 4,
    dtype=np.float64,
):
    """Augmented (Q2/P1disc) Stokes system sharded over the device axis.
    Returns (prob, A_dist, b_dist, part_v, part_p)."""
    del num_levels, min_sharded_rows  # no nested pads in the box design
    return distributed_stokes_graddiv_system_nd(
        ncells, mesh, _ms1(mesh, axis), nu=nu,
        graddiv_alpha=graddiv_alpha, dtype=dtype,
    )


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
    -(1/alpha) Mp], coeffs [[1,1],[0,1]]."""
    gmg_kw = dict(gmg_kw or {})
    gmg_kw.setdefault("min_sharded_rows", min_sharded_rows)
    return distributed_stokes_graddiv_solver_nd(
        ncells, num_levels, mesh, _ms1(mesh, axis), nu=nu,
        graddiv_alpha=graddiv_alpha, rtol=rtol, maxiter=maxiter,
        gmg_kw=gmg_kw, dtype=dtype,
    )


def unshard_stokes_solution(
    x, ncells, mesh: Mesh, n_u: int, n_p: int,
    axis: str = "p", pressure: str = "q1",
):
    """Sharded block solution -> host ((u_x, ...), p) in global order."""
    return unshard_stokes_solution_nd(
        x, ncells, _ms1(mesh, axis), n_u, n_p, pressure=pressure
    )
