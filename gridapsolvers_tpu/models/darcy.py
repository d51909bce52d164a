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
    ncells: Tuple[int, int],
    rtol: float = 1e-9,
    maxiter: int = 400,
    graddiv_alpha: float = 0.0,
    num_levels: int = 3,
):
    """graddiv_alpha > 0 selects the reference's DarcyGMG configuration
    (DarcyGMG.jl:70-115): div-div augmented velocity block, FGMRES +
    upper block-triangular [H(div) GMG, -(1/alpha) Mp]."""
    prob = darcy_problem(ncells, graddiv_alpha=graddiv_alpha)
    n_p = prob.p_exact.shape[0]
    if graddiv_alpha > 0.0:
        from ..blocks import BlockTriangularSolver
        from ..fem.hdiv import hdiv_gmg
        from ..linear import FGMRESSolver

        gmg, _, _ = hdiv_gmg(
            ncells, num_levels=num_levels, alpha=graddiv_alpha
        )
        Mp_pc = DenseMatrix(
            jnp.eye(n_p) * (-prob.cell_volume / graddiv_alpha)
        )
        P = BlockTriangularSolver(
            solvers=(gmg, JacobiSolver()),
            blocks=((None, None), (None, MatrixBlock(Mp_pc))),
            coeffs=((1.0, 1.0), (0.0, 1.0)),
            half="upper",
        )
        solver = FGMRESSolver(m=20, Pr=P, rtol=rtol, maxiter=maxiter)
    else:
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
