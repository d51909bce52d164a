"""Application tests: Elasticity and Darcy — mirrors the reference's
test/Applications/{Elasticity,DarcyGMG}.jl."""
import numpy as np
import pytest

import jax.numpy as jnp

from gridapsolvers_tpu.blocks import BlockDiagonalSolver, MatrixBlock
from gridapsolvers_tpu.fem.darcy import darcy_problem
from gridapsolvers_tpu.fem.elasticity import (
    elasticity_gmg,
    elasticity_operator,
    elasticity_problem,
)
from gridapsolvers_tpu.fem.mesh import CartesianMesh
from gridapsolvers_tpu.interfaces import rigid_body_modes
from gridapsolvers_tpu.linear import (
    CGSolver,
    DenseLUSolver,
    GMRESSolver,
    JacobiSolver,
    MINRESSolver,
)


def test_elasticity_operator_spd_and_rigid_body_kernel():
    """Unconstrained elasticity operator: symmetric, PSD, annihilates the
    rigid-body modes (the PETScElasticitySolver near-nullspace,
    ElasticitySolvers.jl:83-108)."""
    mesh = CartesianMesh((4, 4), (0.0, 1.0, 0.0, 1.0))
    A = elasticity_operator(mesh, mu=1.0, lam=1.0, dirichlet_mask=None)
    D = np.asarray(A.todense())
    np.testing.assert_allclose(D, D.T, atol=1e-12)
    ev = np.linalg.eigvalsh(D)
    assert ev.min() > -1e-10
    # kernel: 3 rigid body modes in 2D
    assert (ev < 1e-10).sum() == 3
    coords = mesh.vertex_coords()
    ns = rigid_body_modes(jnp.asarray(coords))
    for q in ns.vectors:
        qv = np.concatenate([np.asarray(l) for l in [q]])  # flat (2n,)
        # mode layout: node-major (n, d) flatten; operator layout is
        # component-major blocks -> reorder
        n = coords.shape[0]
        qq = np.asarray(q).reshape(n, 2)
        vec = np.concatenate([qq[:, 0], qq[:, 1]])
        assert np.linalg.norm(D @ vec) < 1e-10


def test_elasticity_gmg_cg():
    """Clamped elasticity solved by GMG-preconditioned CG (replacement for
    the reference's PETSc AMG elasticity solve)."""
    prob = elasticity_problem((16, 16), mu=1.0, lam=1.0)
    gmg = elasticity_gmg((16, 16), num_levels=3)
    solver = CGSolver(Pl=gmg, rtol=1e-8, maxiter=40)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert stats.converged()
    assert int(stats.niter) <= 40
    assert prob.residual_norm(x) < 1e-7
    # sanity: beam deflects downward
    assert float(jnp.mean(x[1])) < 0.0


def test_elasticity_matches_direct():
    prob = elasticity_problem((8, 8))
    lu = DenseLUSolver()
    x_ref, _ = lu.solve(lu.setup(prob.A), prob.b)
    gmg = elasticity_gmg((8, 8), num_levels=2)
    solver = CGSolver(Pl=gmg, rtol=1e-10, maxiter=60)
    x, _ = solver.solve(solver.setup(prob.A), prob.b)
    for a, b in zip(x, x_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_darcy_mixed_solve():
    """RT0 mixed Darcy: MINRES + block-diagonal preconditioner (velocity
    mass Jacobi, pressure identity-scaled) converges; manufactured-solution
    errors are discretization-level."""
    prob = darcy_problem((16, 16))
    P = BlockDiagonalSolver(
        solvers=(JacobiSolver(), DenseLUSolver()),
        blocks=(None, MatrixBlock(_pressure_scaling(prob))),
    )
    solver = GMRESSolver(m=80, Pr=P, rtol=1e-9, maxiter=400)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert prob.residual_norm(x) < 1e-6
    u, p = x
    # RT0: O(h) flux error, O(h) pressure error
    assert prob.pressure_error(p) < 0.15
    err_ux = float(jnp.max(jnp.abs(u[0] - prob.u_exact[0])))
    assert err_ux < 0.2


def _pressure_scaling(prob):
    from gridapsolvers_tpu.algebra import DenseMatrix

    n = prob.p_exact.shape[0]
    return DenseMatrix(jnp.eye(n) * prob.cell_volume)


def test_darcy_convergence_with_h():
    errs = []
    for n in (8, 16):
        prob = darcy_problem((n, n))
        P = BlockDiagonalSolver(
            solvers=(JacobiSolver(), DenseLUSolver()),
            blocks=(None, MatrixBlock(_pressure_scaling(prob))),
        )
        solver = GMRESSolver(m=80, Pr=P, rtol=1e-10, maxiter=500)
        state = solver.setup(prob.A)
        x, _ = solver.solve(state, prob.b)
        errs.append(prob.pressure_error(x[1]))
    assert errs[1] < 0.7 * errs[0]


def test_darcy_gmg_graddiv():
    """The reference's DarcyGMG application (test/Applications/
    DarcyGMG.jl:70-115): RT0 mixed Darcy with the div-div augmented
    velocity biform (alpha=1e2), FGMRES + upper block-triangular
    preconditioner [velocity H(div)-GMG with vertex-patch smoothers,
    pressure -(1/alpha) Mp], coeffs [[1,1],[0,1]]. The augmentation is
    made exactly consistent by the rhs shift alpha Bᵀ D⁻¹ F (div u = f
    here, unlike the reference's divergence-free manufactured field)."""
    from gridapsolvers_tpu.algebra import DenseMatrix
    from gridapsolvers_tpu.blocks import BlockTriangularSolver
    from gridapsolvers_tpu.fem.hdiv import hdiv_gmg
    from gridapsolvers_tpu.linear import FGMRESSolver

    alpha = 1.0e2
    nc = (16, 16)
    prob = darcy_problem(nc, graddiv_alpha=alpha)
    gmg, _, _ = hdiv_gmg(nc, num_levels=3, alpha=alpha)
    n_p = prob.p_exact.shape[0]
    Mp_scaled = DenseMatrix(
        jnp.eye(n_p) * (-prob.cell_volume / alpha)
    )
    P = BlockTriangularSolver(
        solvers=(gmg, JacobiSolver()),
        blocks=((None, None), (None, MatrixBlock(Mp_scaled))),
        coeffs=((1.0, 1.0), (0.0, 1.0)),
        half="upper",
    )
    solver = FGMRESSolver(m=20, Pr=P, rtol=1e-10, maxiter=40)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert int(stats.niter) <= 16, int(stats.niter)
    assert prob.residual_norm(x) < 1e-7
    u, p = x
    assert prob.pressure_error(p) < 0.15
    err_ux = float(jnp.max(jnp.abs(u[0] - prob.u_exact[0])))
    assert err_ux < 0.2
