"""Newton-Raphson nonlinear driver.

Analog of the reference's NewtonSolver
(src/NonlinearSolvers/NewtonRaphsonSolver.jl:11-20,31-80). The defining
behavior replicated exactly: the current iterate x is threaded into the
linear solver's setup/update (`numerical_setup(ss, A, x)` /
`numerical_setup!(ns, A, x)`) so solution-dependent preconditioners — GMG
with reassembled level Jacobians, Triform/NonlinearSystemBlock block
preconditioners, Vanka patches — refresh at every Newton step.

The nonlinear operator protocol:
    op.residual(x) -> r (pytree)
    op.jacobian(x) -> operator (pytree with .matvec)
Both may be jax-jitted functions (on-device reassembly) or host-side.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..interfaces import (
    LinearSolver,
    SolverStats,
    SolverTolerances,
)
from ..interfaces.tolerances import ConvergenceFlag
from ..utils import pytrees as pt


class NonlinearOperator:
    """Duck-typed base for nonlinear problems."""

    def residual(self, x):
        raise NotImplementedError

    def jacobian(self, x):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class NewtonSolver:
    linear: LinearSolver
    maxiter: int = 20
    atol: float = 1e-12
    rtol: float = 1e-8

    @property
    def tols(self):
        return SolverTolerances(self.maxiter, self.atol, self.rtol)

    def solve(self, op, x0):
        """Host-driven Newton loop with jitted inner solves (the assembly
        callbacks decide what runs on device)."""
        x = x0
        r = op.residual(x)
        rnorm = float(pt.norm(r))
        r0 = rnorm
        residuals = [rnorm]

        A = op.jacobian(x)
        ls_state = self.linear.setup(A, x)

        it = 0
        while it < self.maxiter and not self._done(rnorm, r0):
            dx, _ = self.linear.solve(ls_state, pt.scale(-1.0, r))
            x = pt.add(x, dx)
            r = op.residual(x)
            rnorm = float(pt.norm(r))
            residuals.append(rnorm)
            it += 1
            if self._done(rnorm, r0):
                break
            A = op.jacobian(x)
            ls_state = self.linear.update(ls_state, A, x)

        hist = np.full(self.maxiter + 1, np.nan)
        hist[: len(residuals)] = residuals
        flag = (
            ConvergenceFlag.CONVERGED_ATOL
            if rnorm <= self.atol
            else ConvergenceFlag.CONVERGED_RTOL
            if rnorm <= self.rtol * r0
            else ConvergenceFlag.DIVERGED_MAXITER
        )
        stats = SolverStats(
            niter=jnp.asarray(it),
            flag=jnp.asarray(int(flag)),
            residuals=jnp.asarray(hist),
        )
        return x, stats

    def _done(self, rnorm, r0):
        return rnorm <= max(self.atol, self.rtol * r0)
