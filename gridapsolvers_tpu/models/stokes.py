"""Stokes driver: FGMRES + upper block-triangular preconditioner with
velocity GMG and pressure mass CG — the reference's headline configuration
(test/Applications/StokesGMG.jl:79-166)."""
from __future__ import annotations

from typing import Tuple

from ..blocks import BlockTriangularSolver, MatrixBlock
from ..fem.stokes import stokes_problem, velocity_gmg
from ..linear import CGSolver, FGMRESSolver, JacobiSolver


def solve_stokes(
    ncells: Tuple[int, int],
    num_levels: int = 3,
    nu: float = 1.0,
    rtol: float = 1e-9,
    maxiter: int = 120,
):
    prob = stokes_problem(ncells, nu=nu)
    gmg = velocity_gmg(ncells, num_levels=num_levels, nu=nu, ncycles=2)
    P = BlockTriangularSolver(
        solvers=(gmg, CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=50)),
        blocks=((None, None), (None, MatrixBlock(prob.Mp))),
        half="upper",
    )
    solver = FGMRESSolver(m=40, Pr=P, rtol=rtol, maxiter=maxiter)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    u, p = x
    return x, stats, {
        "residual": prob.residual_norm(x),
        "velocity_error": prob.velocity_error(u),
        "pressure_error": prob.pressure_error(p),
        "problem": prob,
    }
