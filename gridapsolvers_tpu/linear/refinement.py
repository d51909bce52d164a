"""Linear iterative refinement with a double-f32 iterate.

The f32 analog of the reference's f64 CI tolerances on LINEAR systems
(KrylovTests.jl:25,67: L2 < 1e-8 at rtol 1e-8): a plain f32 Krylov
solve bottoms out at ~eps32 * kappa-ish relative residual because both
the iterate's representation and the residual evaluation are f32.
Classic Wilkinson refinement with (a) the solution stored as an
unevaluated (hi, lo) pair of f32 vectors and (b) the residual
r = b - A(x_hi (+) x_lo) evaluated through error-free transforms
(utils/compensated) recovers ~f64-grade residuals while every inner
solve stays the unchanged f32 preconditioned Krylov method.

Works for StencilMatrix (banded/grid) and ELLMatrix operators; each
refinement step is one jit program with operators as arguments.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..algebra.ell import ELLMatrix
from ..algebra.stencil import StencilMatrix
from ..utils import pytrees as pt
from ..utils.compensated import (
    comp_ell_matvec,
    comp_stencil_matvec,
    fast_two_sum,
    two_sum,
)


def comp_residual(A, b, x_hi, x_lo):
    """b - A (x_hi + x_lo) with compensated matvec; returns an f32
    vector (small near convergence, so the final rounding is free)."""
    if isinstance(A, StencilMatrix) or hasattr(A, "bands"):
        Ainner = getattr(A, "inner", A)
        hi, lo = comp_stencil_matvec(Ainner, x_hi, x_lo)
    elif isinstance(A, ELLMatrix):
        hi, lo = comp_ell_matvec(A.values, A.cols, x_hi, x_lo)
    else:
        raise TypeError(
            f"comp_residual: unsupported operator {type(A).__name__}"
        )
    s, e = two_sum(b.reshape(hi.shape), -hi)
    s, e2 = fast_two_sum(s, e - lo)
    return s + e2


@dataclasses.dataclass(frozen=True)
class IterativeRefinementSolver:
    """solve(A x = b): inner f32 solve + `niter` compensated refinement
    steps on a double-f32 iterate. State = the inner solver's state."""

    inner: object
    niter: int = 2

    def setup(self, A, x=None):
        return {"A": A, "inner": self.inner.setup(A, x)}

    def update(self, state, A, x=None):
        return {"A": A, "inner": self.inner.update(state["inner"], A, x)}

    def solve(self, state, b, x0=None):
        inner = self.inner

        @jax.jit
        def first(st, b):
            x, stats = inner.solve(st, b)
            return x, stats

        @jax.jit
        def step(A, st, b, x_hi, x_lo):
            r = comp_residual(A, b, x_hi, x_lo)
            dx, _ = inner.solve(st, r.reshape(jnp.shape(b)))
            s, e = two_sum(x_hi, dx.reshape(jnp.shape(x_hi)))
            x_hi2, x_lo2 = fast_two_sum(s, e + x_lo)
            return x_hi2, x_lo2, jnp.linalg.norm(r.ravel())

        @jax.jit
        def resnorm(A, b, x_hi, x_lo):
            return jnp.linalg.norm(
                comp_residual(A, b, x_hi, x_lo).ravel()
            )

        A = state["A"]
        x_hi, stats = first(state["inner"], b)
        x_lo = jnp.zeros_like(x_hi)
        for _ in range(self.niter):
            x_hi, x_lo, _ = step(A, state["inner"], b, x_hi, x_lo)
        # report the compensated residual of the FINAL iterate
        rnorm = resnorm(A, b, x_hi, x_lo)
        return (x_hi, x_lo), (stats, rnorm)
