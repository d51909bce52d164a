"""Staggered operators, BlockFEOperator, LocalProjectionMap tests
(reference: StaggeredFEOperatorsTests, BlockFEOperatorsTests,
LocalProjectionMaps usage)."""
import numpy as np

import jax.numpy as jnp

from gridapsolvers_tpu.algebra import DenseMatrix
from gridapsolvers_tpu.blocks.staggered import (
    BlockFEOperator,
    StaggeredAffineOperator,
    StaggeredSolver,
)
from gridapsolvers_tpu.fem import CartesianMesh
from gridapsolvers_tpu.fem import assembly2 as asm
from gridapsolvers_tpu.linear import CGSolver, DenseLUSolver, JacobiSolver
from gridapsolvers_tpu.multilevel.local_projection import LocalProjectionMap
from gridapsolvers_tpu.nonlinear import NewtonSolver
from gridapsolvers_tpu.linear import GMRESSolver


def test_staggered_affine_two_stage():
    """Stage 1: A1 x1 = b1. Stage 2: A2 x2 = b2 - C x1 (one-way coupling).
    Compare against the monolithic block-triangular solve."""
    rng = np.random.default_rng(0)
    n = 20
    A1 = jnp.asarray(rng.normal(size=(n, n)) + 5 * np.eye(n))
    A2 = jnp.asarray(rng.normal(size=(n, n)) + 5 * np.eye(n))
    C = jnp.asarray(rng.normal(size=(n, n)))
    b1 = jnp.asarray(rng.normal(size=n))
    b2 = jnp.asarray(rng.normal(size=n))

    op = StaggeredAffineOperator(
        operators=[
            lambda up: DenseMatrix(A1),
            lambda up: DenseMatrix(A2),
        ],
        rhs=[
            lambda up: b1,
            lambda up: b2 - C @ up[0],
        ],
    )
    solver = StaggeredSolver([DenseLUSolver(), DenseLUSolver()])
    (x1, x2), cache = solver.solve(op)
    x1_ref = jnp.linalg.solve(A1, b1)
    x2_ref = jnp.linalg.solve(A2, b2 - C @ x1_ref)
    np.testing.assert_allclose(x1, x1_ref, rtol=1e-10)
    np.testing.assert_allclose(x2, x2_ref, rtol=1e-9)
    # cached re-solve path
    (y1, y2), _ = solver.solve(op, cache=cache)
    np.testing.assert_allclose(y2, x2_ref, rtol=1e-9)


def test_block_fe_operator_newton():
    """Mixed linear/nonlinear blocks: linear blocks cached, nonlinear
    reassembled; Newton solves the coupled system."""
    rng = np.random.default_rng(1)
    n = 12
    A = rng.normal(size=(n, n)) + 6 * np.eye(n)
    B = 0.1 * rng.normal(size=(n, n))

    def nonlinear_block(x):
        # diagonal operator depending on x[1]: D(x) = diag(3 + x1^2)
        return DenseMatrix(jnp.diag(3.0 + jnp.asarray(x[1]) ** 2))

    rhs = (jnp.asarray(rng.normal(size=n)), jnp.asarray(rng.normal(size=n)))
    op = BlockFEOperator(
        blocks=[
            [DenseMatrix(jnp.asarray(A)), DenseMatrix(jnp.asarray(B))],
            [None, nonlinear_block],
        ],
        rhs=rhs,
    )
    newton = NewtonSolver(
        GMRESSolver(m=30, rtol=1e-12, maxiter=200), maxiter=30, rtol=1e-10
    )
    x0 = (jnp.zeros(n), jnp.zeros(n))
    x, stats = newton.solve(op, x0)
    assert stats.converged()
    from gridapsolvers_tpu.utils import pytrees as pt

    assert float(pt.norm(op.residual(x))) < 1e-8


def test_local_projection_exact_on_linears():
    """Projecting a Q2 field that is globally linear onto Q1 must be exact."""
    mesh = CartesianMesh((6, 5), (0.0, 1.0, 0.0, 1.0))
    proj = LocalProjectionMap(mesh, order_from=2, order_to=1)
    xy2 = asm.node_coords(mesh, 2)
    xy1 = asm.node_coords(mesh, 1)
    u2 = jnp.asarray(1.0 + 2.0 * xy2[:, 0] - 3.0 * xy2[:, 1])
    u1 = proj(u2)
    expect = 1.0 + 2.0 * xy1[:, 0] - 3.0 * xy1[:, 1]
    np.testing.assert_allclose(np.asarray(u1), expect, atol=1e-12)


def test_local_projection_divergence_use():
    """Pi_Q1(quadratic) is a genuine projection: idempotent on its range."""
    mesh = CartesianMesh((4, 4), (0.0, 1.0, 0.0, 1.0))
    proj = LocalProjectionMap(mesh, 2, 1)
    xy2 = asm.node_coords(mesh, 2)
    u2 = jnp.asarray(xy2[:, 0] ** 2 * xy2[:, 1])
    p1 = proj(u2)
    assert p1.shape == (asm.num_nodes(mesh, 1),)
    assert np.isfinite(np.asarray(p1)).all()


def test_space_projection_unconstrained_matches_reffe():
    """With no constraints SpaceProjectionMap degenerates to the
    ReffeProjectionMap analog (reference LocalProjectionMaps.jl:181-208:
    same local systems, ids = all)."""
    from gridapsolvers_tpu.multilevel.local_projection import (
        SpaceProjectionMap,
    )
    from gridapsolvers_tpu.multilevel.spaces import FESpace

    mesh = CartesianMesh((5, 4), (0.0, 1.0, 0.0, 1.0))
    space = FESpace(mesh, order=1, dirichlet=None)
    sproj = SpaceProjectionMap(space, order_from=2)
    rproj = LocalProjectionMap(mesh, order_from=2, order_to=1)
    rng = np.random.default_rng(3)
    u2 = jnp.asarray(rng.normal(size=asm.num_nodes(mesh, 2)))
    np.testing.assert_allclose(
        np.asarray(sproj(u2)), np.asarray(rproj(u2)), atol=1e-12
    )


def test_space_projection_constrained_brute_force():
    """Constrained projection equals the per-cell restricted mass solve
    (the reference's ids-restricted Cholesky, LocalProjectionMaps.jl:
    250-279) done brute-force cell by cell; constrained dofs exactly 0."""
    from gridapsolvers_tpu.fem.elements import TensorElement, mass_matrix
    from gridapsolvers_tpu.multilevel.local_projection import (
        SpaceProjectionMap,
    )
    from gridapsolvers_tpu.multilevel.spaces import FESpace

    mesh = CartesianMesh((4, 3), (0.0, 1.0, 0.0, 1.0))
    space = FESpace(mesh, order=1, dirichlet="boundary")
    proj = SpaceProjectionMap(space, order_from=2)
    rng = np.random.default_rng(4)
    u2 = rng.normal(size=asm.num_nodes(mesh, 2))
    got = np.asarray(proj(jnp.asarray(u2)))

    # brute force
    e_from = TensorElement(2, mesh.h, nquad=3)
    e_to = TensorElement(1, mesh.h, nquad=3)
    Vt, Vf = e_to._phi_table(None), e_from._phi_table(None)
    W = e_to.quad_weights()
    B = np.einsum("iq,jq,q->ij", Vt, Vf, W)
    M = mass_matrix(e_to)
    conn1 = asm.connectivity(mesh, 1)
    conn2 = asm.connectivity(mesh, 2)
    free = ~asm.boundary_node_mask(mesh, 1)
    n1 = asm.num_nodes(mesh, 1)
    acc, cnt = np.zeros(n1), np.zeros(n1)
    for c in range(conn1.shape[0]):
        ids = np.where(free[conn1[c]])[0]
        loc = np.zeros(conn1.shape[1])
        if len(ids):
            rhs = B[ids] @ u2[conn2[c]]
            loc[ids] = np.linalg.solve(M[np.ix_(ids, ids)], rhs)
        acc[conn1[c]] += loc
        cnt[conn1[c]] += 1.0
    expect = acc / np.maximum(cnt, 1.0)
    np.testing.assert_allclose(got, expect, atol=1e-12)
    assert np.all(got[~free] == 0.0)


def test_scipy_nonlinear_wrapper():
    """External nonlinear solver wrapper (reference NLsolve analog):
    scipy Newton-Krylov with our linear solver as inner preconditioner."""
    import jax.numpy as jnp

    from gridapsolvers_tpu.nonlinear.external import ScipyNonlinearSolver

    n = 10
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(n, n)) + 4 * np.eye(n))
    b = jnp.asarray(rng.normal(size=n))

    class Op:
        def residual(self, x):
            return A @ x + 0.1 * x ** 3 - b

        def jacobian(self, x):
            return DenseMatrix(A + jnp.diag(0.3 * x ** 2))

    solver = ScipyNonlinearSolver(
        method="krylov", linear=DenseLUSolver(), tol=1e-10
    )
    x, sol = solver.solve(Op(), jnp.zeros(n))
    r = np.asarray(Op().residual(x))
    assert np.linalg.norm(r) < 1e-7
