"""Mixed Darcy driver (RT0/Q0): block-preconditioned GMRES
(reference test/Applications/DarcyGMG.jl analog)."""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..algebra import DenseMatrix
from ..blocks import BlockDiagonalSolver, MatrixBlock
from ..fem.darcy import darcy_problem
from ..linear import DenseLUSolver, GMRESSolver, JacobiSolver


def solve_darcy(
    ncells: Tuple[int, int], rtol: float = 1e-9, maxiter: int = 400
):
    prob = darcy_problem(ncells)
    n_p = prob.p_exact.shape[0]
    P = BlockDiagonalSolver(
        solvers=(JacobiSolver(), DenseLUSolver()),
        blocks=(
            None,
            MatrixBlock(DenseMatrix(jnp.eye(n_p) * prob.cell_volume)),
        ),
    )
    solver = GMRESSolver(m=80, Pr=P, rtol=rtol, maxiter=maxiter)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    u, p = x
    return x, stats, {
        "residual": prob.residual_norm(x),
        "pressure_error": prob.pressure_error(p),
        "problem": prob,
    }
