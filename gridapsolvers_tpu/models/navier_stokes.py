"""Navier-Stokes driver: Newton + block-preconditioned FGMRES with
nonlinear block refresh per iterate
(reference test/Applications/NavierStokesGMG.jl:132-176)."""
from __future__ import annotations

from typing import Tuple

from ..blocks import (
    BlockTriangularSolver,
    MatrixBlock,
    NonlinearSystemBlock,
)
from ..fem.navier_stokes import navier_stokes_problem
from ..linear import CGSolver, DenseLUSolver, FGMRESSolver, JacobiSolver
from ..nonlinear import (
    ContinuationOperator,
    ContinuationSwitch,
    NewtonSolver,
)


def solve_navier_stokes(
    ncells: Tuple[int, int],
    nu: float = 1.0,
    rtol: float = 1e-9,
    newton_maxiter: int = 15,
    picard_first: int = 0,
    graddiv_alpha: float = 0.0,
    num_levels: int = 2,
):
    """graddiv_alpha > 0 selects the reference's NavierStokesGMG
    configuration (augmented-Lagrangian, nonlinear patch-smoothed
    velocity GMG, -(1/alpha) Mp pressure block)."""
    import dataclasses

    prob = navier_stokes_problem(ncells, nu=nu, graddiv_alpha=graddiv_alpha)
    if graddiv_alpha > 0.0:
        from ..fem.navier_stokes import ns_velocity_gmg

        u_solver = ns_velocity_gmg(
            ncells, num_levels=num_levels, nu=nu,
            graddiv_alpha=graddiv_alpha,
        )
        Mp_pc = dataclasses.replace(
            prob.Mp, values=prob.Mp.values * (-1.0 / graddiv_alpha)
        )
        coeffs = ((1.0, 1.0), (0.0, 1.0))
    else:
        u_solver, Mp_pc, coeffs = DenseLUSolver(), prob.Mp, None
    P = BlockTriangularSolver(
        solvers=(
            u_solver,
            CGSolver(Pl=JacobiSolver(), rtol=1e-10, maxiter=60),
        ),
        blocks=(
            (NonlinearSystemBlock(), None),
            (None, MatrixBlock(Mp_pc)),
        ),
        coeffs=coeffs,
        half="upper",
    )
    fgmres = FGMRESSolver(m=40, Pr=P, rtol=1e-10, maxiter=150)
    newton = NewtonSolver(fgmres, maxiter=newton_maxiter, rtol=rtol)
    op = prob
    if picard_first > 0:

        class _Picard:
            def residual(self, x):
                return prob.residual(x)

            def jacobian(self, x):
                return prob.picard_jacobian(x)

        op = ContinuationOperator(
            _Picard(), prob, ContinuationSwitch(niter=picard_first)
        )
    x, stats = newton.solve(op, prob.zero_guess())
    u, p = x
    return x, stats, {
        "velocity_error": prob.velocity_error(u),
        "problem": prob,
    }
