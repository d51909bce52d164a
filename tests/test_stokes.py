"""Stokes saddle-point tests — mirrors the reference's block-solver and
StokesGMG application tests (test/LinearSolvers/BlockDiagonalSolversTests.jl,
test/Applications/StokesGMG.jl:79-166: FGMRES + upper block-triangular
preconditioner with velocity GMG and pressure mass CG, final residual <
1e-7)."""
import numpy as np
import pytest

import jax.numpy as jnp

from gridapsolvers_tpu.blocks import (
    BlockDiagonalSolver,
    BlockTriangularSolver,
    MatrixBlock,
)
from gridapsolvers_tpu.fem.elements import TensorElement, mass_matrix, stiffness
from gridapsolvers_tpu.fem.stokes import stokes_problem, velocity_gmg
from gridapsolvers_tpu.linear import (
    CGSolver,
    DenseLUSolver,
    FGMRESSolver,
    GMRESSolver,
    JacobiSolver,
    MINRESSolver,
)
from gridapsolvers_tpu.linear.schur import SchurComplementSolver


@pytest.fixture(scope="module")
def stokes16():
    return stokes_problem((16, 16))


def test_element_matrices_exact():
    """Q1/Q2 1D element matrices against closed forms."""
    e1 = TensorElement(1, (1.0,))
    np.testing.assert_allclose(
        stiffness(e1), np.array([[1.0, -1.0], [-1.0, 1.0]]), atol=1e-14
    )
    np.testing.assert_allclose(
        mass_matrix(e1), np.array([[2.0, 1.0], [1.0, 2.0]]) / 6.0, atol=1e-14
    )
    e2 = TensorElement(2, (1.0,))
    K2 = np.array([[7.0, -8.0, 1.0], [-8.0, 16.0, -8.0], [1.0, -8.0, 7.0]]) / 3.0
    M2 = np.array([[4.0, 2.0, -1.0], [2.0, 16.0, 2.0], [-1.0, 2.0, 4.0]]) / 30.0
    np.testing.assert_allclose(stiffness(e2), K2, atol=1e-13)
    np.testing.assert_allclose(mass_matrix(e2), M2, atol=1e-13)


def test_stokes_system_consistency(stokes16):
    """The exact solution satisfies the discrete system to discretization
    accuracy: residual of interpolated exact solution is small."""
    prob = stokes16
    x = (prob.u_exact, prob.p_exact)
    # b - A x_exact should shrink as O(h^2)+ : compare against problem scale
    r = prob.residual_norm(x)
    bnorm = float(
        jnp.linalg.norm(
            jnp.concatenate([jnp.ravel(l) for l in (*prob.b[0], prob.b[1])])
        )
    )
    assert r < 0.5 * max(bnorm, 1e-10) or r < 1e-2


def test_stokes_direct_solve(stokes16):
    """Dense LU on the full system (with pinned pressure mean via nullspace
    handling) reproduces the manufactured solution at discretization order."""
    prob = stokes16
    solver = GMRESSolver(m=60, rtol=1e-10, maxiter=2000)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    u, p = x
    assert prob.velocity_error(u) < 5e-4
    assert prob.pressure_error(p) < 5e-2


def test_stokes_block_diagonal_minres(stokes16):
    """MINRES + block-diagonal preconditioner (velocity LU, pressure mass):
    the canonical SPD saddle-point preconditioner."""
    prob = stokes16
    P = BlockDiagonalSolver(
        solvers=(DenseLUSolver(), CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=50)),
        blocks=(None, MatrixBlock(prob.Mp)),
    )
    solver = MINRESSolver(Pl=P, rtol=1e-9, maxiter=200)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert int(stats.niter) < 80
    u, p = x
    assert prob.velocity_error(u) < 5e-4
    assert prob.pressure_error(p) < 5e-2


def test_stokes_block_triangular_fgmres(stokes16):
    """FGMRES + upper block-triangular preconditioner — the reference's
    headline Stokes configuration (StokesGMG.jl:154-155) with LU velocity."""
    prob = stokes16
    P = BlockTriangularSolver(
        solvers=(DenseLUSolver(), CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=50)),
        blocks=((None, None), (None, MatrixBlock(prob.Mp))),
        half="upper",
    )
    solver = FGMRESSolver(m=40, Pr=P, rtol=1e-9, maxiter=120)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert int(stats.niter) < 60
    u, p = x
    assert prob.velocity_error(u) < 5e-4
    # reference acceptance: residual < 1e-7 (StokesGMG.jl:162-165)
    assert prob.residual_norm(x) < 1e-7


def test_stokes_gmg_velocity_block():
    """Full config 3 (BASELINE.json): FGMRES + block-triangular P with
    velocity GMG + pressure mass CG."""
    prob = stokes_problem((16, 16))
    gmg = velocity_gmg((16, 16), num_levels=3, ncycles=2)
    P = BlockTriangularSolver(
        solvers=(gmg, CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=50)),
        blocks=((None, None), (None, MatrixBlock(prob.Mp))),
        half="upper",
    )
    solver = FGMRESSolver(m=40, Pr=P, rtol=1e-9, maxiter=120)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert int(stats.niter) < 80
    assert prob.residual_norm(x) < 1e-7
    u, p = x
    assert prob.velocity_error(u) < 5e-4


def test_stokes_schur_complement(stokes16):
    """Exact Schur-complement solver as preconditioner
    (reference SchurComplementSolversTests.jl:90-121): pressure mass as S̃."""
    prob = stokes16
    P = SchurComplementSolver(
        A_solver=DenseLUSolver(),
        S_solver=CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=50),
        S_op=prob.Mp,
    )
    solver = FGMRESSolver(m=40, Pr=P, rtol=1e-9, maxiter=100)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert int(stats.niter) < 50
    assert prob.residual_norm(x) < 1e-7


def test_stokes_3d():
    """3D Stokes (reference sweeps {2D,3D} x stokes): block-triangular
    FGMRES with LU velocity on a small 3D Taylor-Hood system."""
    prob = stokes_problem((4, 4, 4))
    P = BlockTriangularSolver(
        solvers=(DenseLUSolver(), CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=60)),
        blocks=((None, None), (None, MatrixBlock(prob.Mp))),
        half="upper",
    )
    solver = FGMRESSolver(m=40, Pr=P, rtol=1e-9, maxiter=100)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert prob.residual_norm(x) < 1e-7
    u, p = x
    assert prob.velocity_error(u) < 5e-3


def test_stokes_3d_gmg_velocity():
    """3D Stokes with velocity-block GMG (config 3 in 3D)."""
    prob = stokes_problem((4, 4, 4))
    gmg = velocity_gmg((4, 4, 4), num_levels=2, ncycles=2)
    P = BlockTriangularSolver(
        solvers=(gmg, CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=60)),
        blocks=((None, None), (None, MatrixBlock(prob.Mp))),
        half="upper",
    )
    solver = FGMRESSolver(m=40, Pr=P, rtol=1e-9, maxiter=150)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert prob.residual_norm(x) < 1e-7


def test_stokes_graddiv_augmented_gmg():
    """Augmented-Lagrangian Stokes — the reference's actual StokesGMG
    configuration (StokesGMG.jl:105-160): grad-div stabilized velocity block
    (alpha = 1e3), vertex-star patch-Vanka GMG on the velocity (Richardson
    0.2 x 10, StokesGMG.jl:57), pressure block -(1/alpha) Mp, coeffs
    [[1,1],[0,1]]. The augmented Schur complement is spectrally
    -(1/alpha) Mp, so FGMRES converges in a handful of iterations (vs ~40
    for the plain formulation at the same tolerance)."""
    import dataclasses

    alpha = 1.0e3
    prob = stokes_problem((16, 16), graddiv_alpha=alpha)
    gmg = velocity_gmg((16, 16), num_levels=3, graddiv_alpha=alpha)
    Mp_scaled = dataclasses.replace(
        prob.Mp, values=prob.Mp.values * (-1.0 / alpha)
    )
    P = BlockTriangularSolver(
        solvers=(
            gmg,
            CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=50),
        ),
        blocks=((None, None), (None, MatrixBlock(Mp_scaled))),
        coeffs=((1.0, 1.0), (0.0, 1.0)),
        half="upper",
    )
    solver = FGMRESSolver(m=20, Pr=P, rtol=1e-9, maxiter=60)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert int(stats.niter) <= 15
    # reference acceptance: residual < 1e-7 (StokesGMG.jl:162-165)
    assert prob.residual_norm(x) < 1e-7
    u, p = x
    assert prob.velocity_error(u) < 5e-4
    assert prob.pressure_error(p) < 5e-2


def test_stokes_graddiv_chebyshev_vanka_smoother():
    """Chebyshev over the Vanka-preconditioned operator (cheby_degree=4)
    matches the reference Richardson(10x0.2) smoothing: same handful of
    FGMRES iterations, alpha-robust, at (d+1)/10 of the smoother SpMVs
    (the flagship's dominant cost — DESIGN.md round 4)."""
    import dataclasses

    for alpha in (1.0e2, 1.0e4):
        prob = stokes_problem((16, 16), graddiv_alpha=alpha)
        gmg = velocity_gmg(
            (16, 16), num_levels=3, graddiv_alpha=alpha, cheby_degree=4
        )
        Mp_scaled = dataclasses.replace(
            prob.Mp, values=prob.Mp.values * (-1.0 / alpha)
        )
        P = BlockTriangularSolver(
            solvers=(
                gmg,
                CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=50),
            ),
            blocks=((None, None), (None, MatrixBlock(Mp_scaled))),
            coeffs=((1.0, 1.0), (0.0, 1.0)),
            half="upper",
        )
        solver = FGMRESSolver(m=20, Pr=P, rtol=1e-9, maxiter=60)
        state = solver.setup(prob.A)
        x, stats = solver.solve(state, prob.b)
        assert int(stats.niter) <= 12, (alpha, int(stats.niter))
        assert prob.residual_norm(x) < 1e-7


def test_stokes_graddiv_augmented_gmg_3d():
    """3D augmented-Lagrangian Stokes (StokesGMG.jl main_3d): same
    configuration as the 2D case — all pieces (P1disc element, cell-local
    grad-div, coarse-cell-interior patches, FE-embedding transfers) are
    dimension-general."""
    import dataclasses

    alpha = 1.0e3
    prob = stokes_problem((8, 8, 8), graddiv_alpha=alpha)
    gmg = velocity_gmg((8, 8, 8), num_levels=2, graddiv_alpha=alpha)
    Mp_scaled = dataclasses.replace(
        prob.Mp, values=prob.Mp.values * (-1.0 / alpha)
    )
    P = BlockTriangularSolver(
        solvers=(
            gmg,
            CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=50),
        ),
        blocks=((None, None), (None, MatrixBlock(Mp_scaled))),
        coeffs=((1.0, 1.0), (0.0, 1.0)),
        half="upper",
    )
    solver = FGMRESSolver(m=20, Pr=P, rtol=1e-9, maxiter=40)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert int(stats.niter) <= 12
    assert prob.residual_norm(x) < 1e-7
    u, p = x
    assert prob.velocity_error(u) < 5e-3


def test_stokes_graddiv_gmg_cycles():
    """The augmented velocity GMG stays alpha-robust across V/W/F cycles
    (reference GMGTests.jl cycle sweep applied to the StokesGMG
    configuration)."""
    alpha = 1.0e3
    prob = stokes_problem((16, 16), graddiv_alpha=alpha)
    Kv = prob.A.block(0, 0)
    rhs = prob.b[0]
    for cycle in ("v", "w", "f"):
        gmg = velocity_gmg(
            (16, 16), num_levels=3, graddiv_alpha=alpha,
            cycle=cycle, mode="solver", rtol=1e-8, maxiter=14,
        )
        st = gmg.setup(Kv)
        xu, stats = gmg.solve(st, rhs)
        assert int(stats.niter) <= 12, (cycle, int(stats.niter))


def test_stokes_lid_driven_cavity_graddiv():
    """The reference's ACTUAL StokesGMG problem (StokesGMG.jl:93-96):
    lid-driven cavity, u = (1,0) on the top-face interior, zero forcing,
    augmented-Lagrangian solver. Acceptance matches the reference
    (residual < 1e-7, StokesGMG.jl:162-165) plus a recirculation sanity
    check (back-flow below the lid on the vertical centerline)."""
    import dataclasses

    import numpy as np

    alpha = 1.0e3
    nc = (16, 16)
    prob = stokes_problem(nc, graddiv_alpha=alpha, bc="cavity")
    gmg = velocity_gmg(nc, num_levels=3, graddiv_alpha=alpha)
    Mp_scaled = dataclasses.replace(
        prob.Mp, values=prob.Mp.values * (-1.0 / alpha)
    )
    P = BlockTriangularSolver(
        solvers=(gmg, CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=50)),
        blocks=((None, None), (None, MatrixBlock(Mp_scaled))),
        coeffs=((1.0, 1.0), (0.0, 1.0)),
        half="upper",
    )
    # reference tolerances: rtol 1e-12 (StokesGMG.jl:155) — the cavity
    # rhs carries alpha-scaled lift terms, so a relative tolerance this
    # tight is needed for the absolute 1e-7 acceptance
    solver = FGMRESSolver(m=25, Pr=P, rtol=1e-12, maxiter=60)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert int(stats.niter) <= 25, int(stats.niter)
    assert prob.residual_norm(x) < 1e-7
    u, p = x
    from gridapsolvers_tpu.fem import assembly2 as asm2

    gs = asm2.node_grid_shape(prob.mesh, 2)
    ux = np.asarray(u[0]).reshape(gs)
    # lid value enforced; back-flow in the lower half of the centerline
    assert abs(ux[gs[0] // 2, -1] - 1.0) < 1e-10
    assert ux[gs[0] // 2, gs[1] // 4] < -1e-3, ux[gs[0] // 2, gs[1] // 4]
