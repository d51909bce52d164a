"""Observability / interfaces tests: ConvergenceLog printing, solver-info
trees, tolerances flags, nullspace utilities, PTimer."""
import numpy as np
import pytest

import jax.numpy as jnp

from gridapsolvers_tpu.fem import poisson_problem
from gridapsolvers_tpu.interfaces import (
    ConvergenceFlag,
    ConvergenceLog,
    NullSpace,
    SolverTolerances,
    VerboseLevel,
    constant_nullspace,
    format_solver_tree,
    get_solver_info,
    make_orthogonal,
    make_orthonormal,
    project,
    reconstruct,
)
from gridapsolvers_tpu.linear import CGSolver, JacobiSolver
from gridapsolvers_tpu.utils.timing import PTimer
from gridapsolvers_tpu.utils import pytrees as pt


def _solved():
    prob = poisson_problem((8, 8))
    solver = CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=200)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    return solver, stats


def test_convergence_flags():
    tols = SolverTolerances(maxiter=10, atol=1e-12, rtol=1e-6)
    # rtol has priority when both hold (reference SolverTolerances.jl:101-104)
    assert int(tols.finished_flag(5, jnp.asarray(1e-13), jnp.asarray(1.0))) == int(
        ConvergenceFlag.CONVERGED_RTOL
    )
    atol_only = SolverTolerances(maxiter=10, atol=1e-12, rtol=0.0)
    assert int(
        atol_only.finished_flag(5, jnp.asarray(1e-13), jnp.asarray(1.0))
    ) == int(ConvergenceFlag.CONVERGED_ATOL)
    assert int(tols.finished_flag(5, jnp.asarray(1e-7), jnp.asarray(1.0))) == int(
        ConvergenceFlag.CONVERGED_RTOL
    )
    assert int(tols.finished_flag(10, jnp.asarray(1.0), jnp.asarray(1.0))) == int(
        ConvergenceFlag.DIVERGED_MAXITER
    )
    # dtol blow-up is distinguished from a true (NaN) breakdown
    dtols = SolverTolerances(maxiter=10, atol=0.0, rtol=1e-6, dtol=1e3)
    assert int(dtols.finished_flag(5, jnp.asarray(1e4), jnp.asarray(1.0))) == int(
        ConvergenceFlag.DIVERGED_DTOL
    )
    assert int(
        dtols.finished_flag(5, jnp.asarray(float("nan")), jnp.asarray(1.0))
    ) == int(ConvergenceFlag.DIVERGED_BREAKDOWN)


def test_convergence_log_report(capsys):
    solver, stats = _solved()
    log = ConvergenceLog("cg", solver.tols, verbose=VerboseLevel.HIGH, depth=1)
    text = log.report(stats)
    out = capsys.readouterr().out
    assert "CONVERGED" in out
    assert out.startswith("  ")  # depth indentation
    assert f"iter " in out


def test_solver_info_and_tree():
    solver, stats = _solved()
    info = get_solver_info(solver, stats)
    assert info["type"] == "CGSolver"
    assert info["niter"] > 0
    assert "CONVERGED" in info["flag"]
    tree = format_solver_tree(solver)
    assert "CGSolver" in tree and "JacobiSolver" in tree


def test_nullspace_roundtrip():
    rng = np.random.default_rng(0)
    vs = [jnp.asarray(rng.normal(size=20)) for _ in range(3)]
    ns = make_orthonormal(NullSpace(vs))
    # orthonormality
    for i, q in enumerate(ns.vectors):
        for j, w in enumerate(ns.vectors):
            d = float(pt.dot(q, w))
            assert abs(d - (1.0 if i == j else 0.0)) < 1e-12
    x = jnp.asarray(rng.normal(size=20))
    x_orth, coefs = make_orthogonal(ns, x)
    for q in ns.vectors:
        assert abs(float(pt.dot(q, x_orth))) < 1e-12
    x_back = reconstruct(ns, x_orth, coefs)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-12)


def test_ptimer():
    t = PTimer()
    with t.phase("a"):
        sum(range(1000))
    t.tic("b")
    t.toc("b")
    assert "a" in t.data and t.data["a"] >= 0
    assert "b" in t.report()


def test_colored_gs_on_ell():
    """Multicolor GS on a general ELL matrix (native coloring path)."""
    from gridapsolvers_tpu.linear import ColoredGaussSeidel

    prob = poisson_problem((10, 10))
    A_ell = prob.A.to_ell()
    sm = ColoredGaussSeidel(niter=2, sweep="symmetric")
    st = sm.setup(A_ell)
    x = jnp.zeros(A_ell.shape[0])
    r = jnp.asarray(prob.b)
    r0 = float(jnp.linalg.norm(r))
    for _ in range(5):
        x, r = sm.smooth(st, x, r)
    assert float(jnp.linalg.norm(r)) < 0.2 * r0
    np.testing.assert_allclose(
        np.asarray(jnp.asarray(prob.b) - A_ell.matvec(x)), np.asarray(r),
        atol=1e-10,
    )


def test_live_verbose_cg(capsys):
    """Per-iteration residual printing from inside the jitted loop
    (reference ConvergenceLog verbose output)."""
    import jax

    prob = poisson_problem((8, 8))
    solver = CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=50, verbose=True,
                      name="cg-test", depth=1)
    state = solver.setup(prob.A)
    solve = jax.jit(lambda st, b: solver.solve(st, b))
    x, stats = solve(state, prob.b)
    jax.effects_barrier()
    out = capsys.readouterr().out
    assert "cg-test: iteration" in out
    assert out.startswith("  ")


def test_ssor_smoother():
    """SSOR = symmetric multicolor GS with relaxation (reference
    IterativeSolversExt IS_SSOR parity)."""
    from gridapsolvers_tpu.linear import ColoredGaussSeidel

    prob = poisson_problem((10, 10))
    sm = ColoredGaussSeidel(niter=1, sweep="symmetric", omega=1.3)
    st = sm.setup(prob.A)
    solver = CGSolver(Pl=sm, rtol=1e-9, maxiter=100)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert stats.converged()
    assert float(prob.l2_error(x)) < 1e-7


def test_colored_gs_stencil_fast_path_equals_generic():
    """The banded fast path (compact parity subgrids, ~1 matvec of band
    traffic per sweep instead of 2^d) produces the SAME iteration as the
    generic color-masked path, for every sweep kind and niter."""
    from gridapsolvers_tpu.linear import ColoredGaussSeidel

    prob = poisson_problem((9, 11))  # odd sizes stress subgrid shapes
    A = prob.A
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.normal(size=A.shape[0]))
    for sweep in ("forward", "backward", "symmetric"):
        for niter, omega in ((1, 1.0), (2, 1.3)):
            sm = ColoredGaussSeidel(niter=niter, sweep=sweep, omega=omega)
            st = sm.setup(A)
            xf, rf = sm._smooth_stencil_fast(st, jnp.zeros(A.shape[0]), b)
            xr, rr = sm._smooth_generic(st, jnp.zeros(A.shape[0]), b)
            np.testing.assert_allclose(
                np.asarray(xf), np.asarray(xr), atol=1e-12, err_msg=sweep
            )
            np.testing.assert_allclose(
                np.asarray(rf), np.asarray(rr), atol=1e-12, err_msg=sweep
            )
    # the PUBLIC dispatch must reach the compact path (guard regression
    # would otherwise silently fall back to masked and hide breakage)
    smc = ColoredGaussSeidel(niter=1, sweep="symmetric", impl="compact")
    stc = smc.setup(A)
    xc, rc = smc.smooth(stc, jnp.zeros(A.shape[0]), b)
    xd, rd = smc._smooth_stencil_fast(stc, jnp.zeros(A.shape[0]), b)
    np.testing.assert_allclose(np.asarray(xc), np.asarray(xd), atol=0.0)
