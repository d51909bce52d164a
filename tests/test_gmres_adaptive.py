"""Adaptive (restart-growing) GMRES + live convergence verbosity.

Reference parity targets:
- `expand_krylov_caches!` (src/LinearSolvers/Krylov/GMRESSolvers.jl:76-92):
  the reference grows its Krylov caches when the iteration exceeds the
  allocated basis; `AdaptiveGMRESSolver` doubles the restart length on
  stagnation (host-level recompile — the static-shape analog).
- verbose ConvergenceLog (src/SolverInterfaces/ConvergenceLogs.jl:101-150):
  per-iteration residual lines printed DURING the solve with depth
  indentation, here via jax.debug.callback from inside the compiled loop.
"""
import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from gridapsolvers_tpu.algebra.ell import ell_from_scipy
from gridapsolvers_tpu.fem import poisson_problem
from gridapsolvers_tpu.linear import (
    AdaptiveGMRESSolver,
    CGSolver,
    GMRESSolver,
    JacobiSolver,
)


def _shift_system(n=32, eps=1e-3):
    """Near-circulant shift operator: restarted GMRES(m) with m << n makes
    essentially no progress (the Krylov space of a shift matrix needs ~n
    vectors to see the identity component), while full-basis GMRES
    converges in <= n iterations — the canonical stagnation example."""
    S = sp.eye(n, format="csr") * eps + sp.csr_matrix(
        (np.ones(n - 1), (np.arange(1, n), np.arange(n - 1))), shape=(n, n)
    )
    S = S + sp.csr_matrix(([1.0], ([0], [n - 1])), shape=(n, n))
    A = ell_from_scipy(S.tocsr(), dtype=np.float32)
    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.randn(n).astype(np.float32))
    return A, b


def test_fixed_restart_stagnates_adaptive_converges():
    A, b = _shift_system(32)
    fixed = GMRESSolver(m=5, rtol=1e-6, maxiter=60)
    x_f, st_f = fixed.solve(fixed.setup(A), b)
    res_f = float(np.asarray(st_f.residuals)[int(st_f.niter)])
    r0 = float(np.asarray(st_f.residuals)[0])
    assert res_f > 0.5 * r0  # m=5 restarts: essentially no progress

    grow = AdaptiveGMRESSolver(m=5, m_max=64, rtol=1e-6, maxiter=200)
    x_g, st_g = grow.solve(grow.setup(A), b)
    assert st_g.converged(), np.asarray(st_g.residuals)[:20]
    # true residual check
    r = np.asarray(b) - np.asarray(A.matvec(x_g))
    assert np.linalg.norm(r) <= 1e-5 * np.linalg.norm(np.asarray(b))


def test_adaptive_matches_fixed_on_easy_problem():
    """On a problem where m=10 already converges, growth never triggers
    and the result matches plain restarted GMRES."""
    prob = poisson_problem((8, 8), dtype=np.float64)
    b = jnp.asarray(prob.b)
    fixed = GMRESSolver(m=30, rtol=1e-10, maxiter=200)
    grow = AdaptiveGMRESSolver(m=30, m_max=60, rtol=1e-10, maxiter=200)
    x_f, _ = fixed.solve(fixed.setup(prob.A), b)
    x_g, st_g = grow.solve(grow.setup(prob.A), b)
    assert st_g.converged()
    rel = float(
        np.linalg.norm(np.asarray(x_g) - np.asarray(x_f))
        / np.linalg.norm(np.asarray(x_f))
    )
    assert rel < 1e-8


def test_live_verbose_nested_prints(capfd):
    """verbose=True prints depth-indented per-iteration residual lines
    DURING the solve (reference ConvergenceLogs.jl:101-150) for a nested
    GMRES(outer) + CG(inner preconditioner) pair, and verbose=False stays
    silent."""
    prob = poisson_problem((8, 8), dtype=np.float64)
    b = jnp.asarray(prob.b)
    inner = CGSolver(
        Pl=JacobiSolver(), rtol=1e-10, maxiter=40,
        verbose=True, name="innerCG", depth=1,
    )
    outer = GMRESSolver(
        m=30, Pr=inner, flexible=True, rtol=1e-9, maxiter=60,
        verbose=True, name="outerFGMRES",
    )
    x, stats = outer.solve(outer.setup(prob.A), b)
    out = capfd.readouterr().out
    assert stats.converged()
    lines = out.splitlines()
    outer_lines = [l for l in lines if l.startswith("outerFGMRES:")]
    inner_lines = [l for l in lines if l.startswith("  innerCG:")]
    assert len(outer_lines) == int(stats.niter)
    assert len(inner_lines) > int(stats.niter)  # inner iterates more
    assert "iteration" in outer_lines[0] and "r = " in outer_lines[0]

    import dataclasses

    quiet_inner = dataclasses.replace(inner, verbose=False)
    silent = GMRESSolver(m=30, Pr=quiet_inner, flexible=True,
                         rtol=1e-9, maxiter=60)
    x2, _ = silent.solve(silent.setup(prob.A), b)
    assert capfd.readouterr().out == ""


def test_minres_and_newton_verbose(capfd):
    """MINRES and Newton emit live per-iteration lines when verbose."""
    import dataclasses

    import jax

    from gridapsolvers_tpu.linear import MINRESSolver
    from gridapsolvers_tpu.nonlinear import NewtonSolver

    prob = poisson_problem((8, 8), dtype=np.float64)
    b = jnp.asarray(prob.b)
    mr = MINRESSolver(rtol=1e-8, maxiter=200, verbose=True, name="MR")
    x, stats = mr.solve(mr.setup(prob.A), b)
    out = capfd.readouterr().out
    assert stats.converged()
    assert sum(l.startswith("MR: iteration") for l in out.splitlines()) \
        == int(stats.niter)

    # tiny scalar-field nonlinear problem: F(u) = A u + u^3 - b
    @jax.tree_util.register_dataclass
    @dataclasses.dataclass
    class Cubic:
        A: object
        b: object

        def residual(self, x):
            return self.A.matvec(x) + x**3 - self.b

        def jacobian(self, x):
            A, b = self.A, self.b

            class J:
                def matvec(self, v, _x=x, _A=A):
                    return _A.matvec(v) + 3.0 * _x**2 * v

                def diag(self, _x=x, _A=A):
                    return _A.diag() + 3.0 * _x**2

            return J()

    from gridapsolvers_tpu.linear import CGSolver as _CG

    op = Cubic(prob.A, b)
    newton = NewtonSolver(
        _CG(rtol=1e-10, maxiter=200), maxiter=10, rtol=1e-10,
        verbose=True, name="NEWT",
    )
    x, stats = newton.solve(op, jnp.zeros_like(b))
    out = capfd.readouterr().out
    assert stats.converged()
    newt_lines = [l for l in out.splitlines()
                  if l.startswith("NEWT: iteration")]
    assert len(newt_lines) == int(stats.niter)
