"""Wrapper-solver tests — mirrors the reference's SchwarzSolversTests,
NullspaceTests, CallbackSolver usage."""
import numpy as np
import pytest

import jax.numpy as jnp

from gridapsolvers_tpu.algebra import DenseMatrix
from gridapsolvers_tpu.fem import poisson_problem
from gridapsolvers_tpu.fem.mesh import CartesianMesh
from gridapsolvers_tpu.fem.assembly import laplacian
from gridapsolvers_tpu.interfaces import NullSpace, constant_nullspace
from gridapsolvers_tpu.linear import (
    CallbackSolver,
    CGSolver,
    DenseLUSolver,
    JacobiSolver,
    LinearSolverFromSmoother,
    NullspaceSolver,
    RichardsonSmoother,
    SchwarzLinearSolver,
)


def test_schwarz_preconditioned_cg():
    """CG + additive Schwarz (reference SchwarzSolversTests.jl:12-50,
    L2 < 1e-8)."""
    prob = poisson_problem((24, 24))
    P = SchwarzLinearSolver(n_subdomains=4, overlap=2)
    solver = CGSolver(Pl=P, rtol=1e-9, maxiter=200)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert stats.converged()
    assert float(prob.l2_error(x)) < 1e-8


def test_nullspace_solver_pure_neumann():
    """Singular pure-Neumann Laplacian solved with the constant-nullspace
    constraint (reference NullspaceTests semantics)."""
    mesh = CartesianMesh((8, 8), (0.0, 1.0, 0.0, 1.0))
    A = laplacian(mesh)  # singular: constants in kernel
    rng = np.random.default_rng(0)
    x_true = jnp.asarray(rng.normal(size=A.n))
    x_true = x_true - jnp.mean(x_true)
    b = A.matvec(x_true)

    ns = constant_nullspace(b)
    from gridapsolvers_tpu.linear import MINRESSolver

    cases = [
        (True, False, DenseLUSolver()),
        (False, False, CGSolver(rtol=1e-12, maxiter=500)),
        # matrix-free augmented path: A never densified, indefinite
        # saddle system solved by MINRES on the composed matvec
        (True, True, MINRESSolver(rtol=1e-12, maxiter=800)),
    ]
    for constrain, mfree, inner in cases:
        solver = NullspaceSolver(
            solver=inner,
            nullspace=ns,
            constrain_matrix=constrain,
            matrix_free=mfree,
        )
        state = solver.setup(A)
        x, _ = solver.solve(state, b)
        x = x - jnp.mean(x)
        assert float(jnp.linalg.norm(x - x_true)) < 1e-7, (constrain, mfree)


def test_callback_solver():
    prob = poisson_problem((8, 8))
    seen = []
    inner = CGSolver(Pl=JacobiSolver(), rtol=1e-10, maxiter=200)
    solver = CallbackSolver(inner, lambda x: seen.append(1) or None)
    state = solver.setup(prob.A)
    x, _ = solver.solve(state, prob.b)
    assert seen == [1]
    assert float(prob.l2_error(x)) < 1e-7


def test_linear_solver_from_smoother():
    prob = poisson_problem((8, 8))
    sm = RichardsonSmoother(JacobiSolver(), niter=5, omega=0.8)
    solver = LinearSolverFromSmoother(sm)
    state = solver.setup(prob.A)
    # one application reduces the residual
    x, _ = solver.solve(state, prob.b)
    r = prob.b - prob.A.matvec(x)
    assert float(jnp.linalg.norm(r)) < float(jnp.linalg.norm(prob.b))
