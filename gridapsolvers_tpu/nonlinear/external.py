"""External nonlinear-solver wrapper (SciPy).

Analog of the reference's NLsolveNonlinearSolver
(src/NonlinearSolvers/NLsolve.jl:13-28,55-98): wrap an external nonlinear
library (methods: hybr/krylov/anderson/broyden...) while injecting OUR
linear solver stack as the inner solve, so preconditioners drive the
Newton-Krylov iterations. Host-side and serial-only — exactly like the
reference notes for its NLsolve wrapper (NLsolve.jl:10-11).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..interfaces import LinearSolver


def _flatten(x):
    leaves, treedef = jax.tree_util.tree_flatten(x)
    return np.concatenate([np.asarray(l).ravel() for l in leaves]), (
        treedef,
        [(l.shape, l.dtype) for l in leaves],
    )


def _unflatten(flat, info):
    treedef, shapes = info
    out, off = [], 0
    for shape, dtype in shapes:
        size = int(np.prod(shape))
        out.append(jnp.asarray(flat[off : off + size].reshape(shape), dtype))
        off += size
    return jax.tree_util.tree_unflatten(treedef, out)


@dataclasses.dataclass
class ScipyNonlinearSolver:
    """scipy.optimize.root driver over our NonlinearOperator protocol.

    method='custom_newton' uses scipy's 'krylov' with our linear solver as
    the inner preconditioner-resolved solve; other methods ('hybr',
    'anderson', 'broyden1', 'df-sane') pass through.
    """

    method: str = "krylov"
    linear: Optional[LinearSolver] = None
    maxiter: int = 50
    tol: float = 1e-8

    def solve(self, op, x0):
        import scipy.optimize as sopt

        flat0, info = _flatten(x0)

        state = {"x": x0}

        def fun_tracking(z):
            x = _unflatten(z, info)
            state["x"] = x
            r, _ = _flatten(op.residual(x))
            return r

        kwargs = {}
        if self.method == "krylov" and self.linear is not None:
            from scipy.sparse.linalg import LinearOperator

            def precond_mv(rhs):
                x = state["x"]
                A = op.jacobian(x)
                st = self.linear.setup(A, x)
                z, _ = self.linear.solve(st, _unflatten(rhs, info))
                out, _ = _flatten(z)
                return out

            inner_M = LinearOperator(
                (flat0.size, flat0.size), matvec=precond_mv,
                dtype=flat0.dtype,
            )
            kwargs["options"] = {
                "jac_options": {"inner_M": inner_M},
                "maxiter": self.maxiter,
            }
        sol = sopt.root(
            fun_tracking, flat0, method=self.method, tol=self.tol, **kwargs
        )
        return _unflatten(sol.x, info), sol
