"""Solver tolerances and convergence flags.

Functional analog of the reference's SolverTolerances
(src/SolverInterfaces/SolverTolerances.jl:11-16,40-49,97-128): a static
container of (maxiter, atol, rtol, dtol) plus jit-friendly convergence
predicates usable inside lax.while_loop.
"""
from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp


class ConvergenceFlag(enum.IntEnum):
    """Why a solve finished (reference SolverConvergenceFlag,
    SolverTolerances.jl:1-9)."""

    ITERATING = 0
    CONVERGED_ATOL = 1
    CONVERGED_RTOL = 2
    DIVERGED_MAXITER = 3
    DIVERGED_BREAKDOWN = 4
    # finer than the reference's 4-flag enum: dtol blow-up is reported
    # distinctly from a true breakdown (non-finite residual)
    DIVERGED_DTOL = 5


@dataclasses.dataclass(frozen=True)
class SolverTolerances:
    """Static solver stopping criteria.

    maxiter : max number of iterations (static — sizes residual history).
    atol    : absolute tolerance on the residual norm.
    rtol    : relative tolerance w.r.t. the initial residual norm.
    dtol    : divergence tolerance (residual growth factor); <=0 disables.
    """

    maxiter: int = 1000
    atol: float = 0.0
    rtol: float = 1.0e-5
    dtol: float = 0.0

    def target(self, r0norm):
        """Target residual norm: max(atol, rtol * ||r0||)."""
        return jnp.maximum(self.atol, self.rtol * r0norm)

    def converged(self, rnorm, r0norm):
        """jit-friendly convergence predicate
        (reference SolverTolerances.jl:40-44)."""
        return rnorm <= self.target(r0norm)

    def diverged(self, rnorm, r0norm):
        if self.dtol > 0:
            return rnorm > self.dtol * r0norm
        return jnp.asarray(False)

    def finished(self, niter, rnorm, r0norm):
        """Stop condition (reference SolverTolerances.jl:46-49)."""
        return (
            (niter >= self.maxiter)
            | self.converged(rnorm, r0norm)
            | self.diverged(rnorm, r0norm)
            | ~jnp.isfinite(rnorm)
        )

    def finished_flag(self, niter, rnorm, r0norm):
        """Integer ConvergenceFlag for a finished solve, with the
        reference's priority order rtol > atol > maxiter > divergence
        (reference SolverTolerances.jl:97-110). Finer than the reference
        on the divergence side: dtol blow-up reports DIVERGED_DTOL while
        BREAKDOWN is reserved for a non-finite residual."""
        conv_r = rnorm <= self.rtol * r0norm
        conv_a = rnorm <= self.atol
        maxed = niter >= self.maxiter
        dtol_hit = self.diverged(rnorm, r0norm)
        flag = jnp.where(
            conv_r,
            int(ConvergenceFlag.CONVERGED_RTOL),
            jnp.where(
                conv_a,
                int(ConvergenceFlag.CONVERGED_ATOL),
                jnp.where(
                    maxed,
                    int(ConvergenceFlag.DIVERGED_MAXITER),
                    jnp.where(
                        dtol_hit & jnp.isfinite(rnorm),
                        int(ConvergenceFlag.DIVERGED_DTOL),
                        int(ConvergenceFlag.DIVERGED_BREAKDOWN),
                    ),
                ),
            ),
        )
        return flag
