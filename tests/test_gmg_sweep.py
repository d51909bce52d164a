"""GMG regression sweep — mirrors the reference's GMGTests.jl matrix
(test/LinearSolvers/GMGTests.jl:386-414): {2D,3D} x cycle {v,w,f} x
smoother {chebyshev, jacobi-richardson, patch} on Poisson, plus the
from-matrices / from-hierarchy duals (GMGTests.jl:289-296) and both GMG
modes (preconditioner vs standalone solver)."""
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gridapsolvers_tpu.fem import poisson_problem
from gridapsolvers_tpu.fem.assembly import eliminate_dirichlet, laplacian
from gridapsolvers_tpu.linear import (
    CGSolver,
    ChebyshevSmoother,
    JacobiSolver,
    RichardsonSmoother,
)
from gridapsolvers_tpu.linear.gmg import GMGSolver, gmg_from_hierarchy
from gridapsolvers_tpu.multilevel import cartesian_hierarchy
from gridapsolvers_tpu.patches import PatchSolver, vertex_star_patches


def _assemble(mesh):
    return eliminate_dirichlet(laplacian(mesh), mesh.boundary_vertex_mask())


def _smoother(kind, hierarchy):
    if kind == "chebyshev":
        return ChebyshevSmoother(degree=3)
    if kind == "jacobi":
        return RichardsonSmoother(JacobiSolver(), niter=2, omega=0.67)
    # patch: per-level vertex-star smoothers
    out = []
    for m in hierarchy.meshes[:-1]:
        topo = vertex_star_patches(
            m.vertex_shape, ~m.boundary_vertex_mask()
        )
        out.append(
            RichardsonSmoother(
                PatchSolver(topo, weighting="overlap"), niter=1, omega=0.8
            )
        )
    return out


CASES = [
    (ncells, cycle, smoother)
    for ncells in [(16, 16), (8, 8, 8)]
    for cycle in ("v", "w", "f")
    for smoother in ("chebyshev", "jacobi", "patch")
]


@pytest.mark.parametrize("ncells,cycle,smoother", CASES)
def test_gmg_sweep(ncells, cycle, smoother):
    prob = poisson_problem(ncells)
    hierarchy = cartesian_hierarchy(ncells, 2)
    gmg = gmg_from_hierarchy(
        hierarchy,
        _assemble,
        smoother=_smoother(smoother, hierarchy),
        cycle=cycle,
    )
    solver = CGSolver(Pl=gmg, rtol=1e-8, maxiter=30)
    st = solver.setup(prob.A)
    x, stats = solver.solve(st, prob.b)
    assert stats.converged(), (ncells, cycle, smoother, int(stats.niter))
    assert int(stats.niter) <= 20
    assert float(prob.l2_error(x)) < 1e-4


def test_from_matrices_equals_from_hierarchy():
    """GMGSolver fed explicit per-level matrices == gmg_from_hierarchy
    (the reference's from-matrices / from-weakform dual drivers)."""
    from gridapsolvers_tpu.multilevel import (
        compute_hierarchy_matrices,
        setup_transfer_operators,
    )

    prob = poisson_problem((16, 16))
    hierarchy = cartesian_hierarchy((16, 16), 3)
    mats = compute_hierarchy_matrices(hierarchy, _assemble)
    P, R = setup_transfer_operators(hierarchy)
    gmg_mats = GMGSolver(
        coarse_ops=tuple(mats[1:]),
        prolongations=tuple(P),
        restrictions=tuple(R),
        smoother=ChebyshevSmoother(degree=3),
    )
    gmg_hier = gmg_from_hierarchy(
        hierarchy, _assemble, smoother=ChebyshevSmoother(degree=3)
    )
    s1 = CGSolver(Pl=gmg_mats, rtol=1e-8, maxiter=30)
    s2 = CGSolver(Pl=gmg_hier, rtol=1e-8, maxiter=30)
    x1, st1 = s1.solve(s1.setup(prob.A), prob.b)
    x2, st2 = s2.solve(s2.setup(prob.A), prob.b)
    assert int(st1.niter) == int(st2.niter)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-10)


def test_gmg_solver_mode():
    """GMG as a standalone solver (mode='solver') reaches rtol on its own
    (reference GMGLinearSolvers.jl:612-645 solve mode)."""
    prob = poisson_problem((32, 32))
    hierarchy = cartesian_hierarchy((32, 32), 3)
    gmg = gmg_from_hierarchy(
        hierarchy,
        _assemble,
        smoother=ChebyshevSmoother(degree=3),
        mode="solver",
        rtol=1e-8,
        maxiter=30,
    )
    st = gmg.setup(prob.A)
    x, stats = gmg.solve(st, prob.b)
    assert stats.converged()
    assert int(stats.niter) <= 20
    assert float(prob.l2_error(x)) < 1e-6


@pytest.mark.parametrize("cycle", ["w", "f"])
def test_hdiv_gmg_cycles(cycle):
    """H(div) GMG with W/F cycles (the reference's hdiv rows of the
    GMGTests.jl sweep run every cycle kind, :386-414): alpha-robust
    vertex-patch smoothing converges within the same budget as V."""
    from gridapsolvers_tpu.fem.hdiv import hdiv_gmg

    gmg, A, free = hdiv_gmg((16, 16), num_levels=3, alpha=100.0, cycle=cycle)
    solver = CGSolver(Pl=gmg, rtol=1e-6, maxiter=20)
    rng = np.random.default_rng(7)
    b = (
        jnp.asarray(rng.normal(size=17 * 16)) * free[0],
        jnp.asarray(rng.normal(size=16 * 17)) * free[1],
    )
    st = solver.setup(A)
    x, stats = solver.solve(st, b)
    assert stats.converged(), (cycle, int(stats.niter))
    assert int(stats.niter) <= 12, (cycle, int(stats.niter))


@pytest.mark.parametrize("cycle", ["w", "f"])
def test_stokes_velocity_gmg_cycles(cycle):
    """Full Stokes solve with W/F-cycle velocity GMG inside the block
    preconditioner (reference StokesGMG sweep x GMG cycle kinds)."""
    import dataclasses

    from gridapsolvers_tpu.blocks import BlockTriangularSolver, MatrixBlock
    from gridapsolvers_tpu.fem.stokes import stokes_problem, velocity_gmg
    from gridapsolvers_tpu.linear import FGMRESSolver

    prob = stokes_problem((16, 16))
    gmg = velocity_gmg((16, 16), num_levels=2, ncycles=2, cycle=cycle)
    prec = BlockTriangularSolver(
        solvers=(gmg, CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=40)),
        blocks=((None, None), (None, MatrixBlock(prob.Mp))),
        coeffs=((1.0, 1.0), (0.0, 1.0)),
        half="upper",
    )
    solver = FGMRESSolver(m=30, Pr=prec, rtol=1e-8, maxiter=60)
    x, stats = solver.solve(solver.setup(prob.A), prob.b)
    assert stats.converged(), (cycle, int(stats.niter))
    assert float(prob.velocity_error(x[0])) < 1e-3


@pytest.mark.parametrize("cycle", ["v", "w", "f"])
def test_vector_laplace_gmg_cycles(cycle):
    """Vector Laplacian GMG across cycle kinds — the reference sweep's
    `vector_laplace` rows (GMGTests.jl:386-414): Q2 vector field through
    the fieldwise machinery, CG budget <= 20 iters at rtol 1e-6."""
    from gridapsolvers_tpu.algebra.block import FieldwiseOperator
    from gridapsolvers_tpu.multilevel.multifield import MultiFieldTransfer
    from gridapsolvers_tpu.multilevel.spaces import fe_space_hierarchy

    h = cartesian_hierarchy((16, 16), 3)
    sh = fe_space_hierarchy(h, order=2, dirichlet="boundary")
    mats = sh.compute_matrices("stiffness")
    P, R = sh.transfer_operators()
    vec = lambda op: FieldwiseOperator(ops=(op, op))
    gmg = GMGSolver(
        coarse_ops=tuple(vec(m) for m in mats[1:]),
        prolongations=tuple(MultiFieldTransfer((p, p)) for p in P),
        restrictions=tuple(MultiFieldTransfer((r, r)) for r in R),
        smoother=ChebyshevSmoother(degree=3),
        cycle=cycle,
    )
    solver = CGSolver(Pl=gmg, rtol=1e-6, maxiter=20)
    A0 = vec(mats[0])
    st = solver.setup(A0)
    s0 = sh[0]
    xy = s0.node_coords()
    free = np.asarray(s0.free_mask(np.float64))
    b0 = np.sin(2 * np.pi * xy[:, 0]) * np.sin(np.pi * xy[:, 1]) * free
    b1 = np.sin(np.pi * xy[:, 0]) * xy[:, 1] * (1 - xy[:, 1]) * free
    x, stats = solver.solve(st, (jnp.asarray(b0), jnp.asarray(b1)))
    assert stats.converged(), (cycle, int(stats.niter))
    assert int(stats.niter) <= 15, (cycle, int(stats.niter))


@pytest.mark.parametrize("cycle", ["w", "f"])
def test_multifield_mhd_gmg_cycles(cycle):
    """3D multifield (MHD-like) GMG with W/F cycles — completes the
    reference sweep's multifield x cycle matrix (GMGTests.jl:325-359,
    386-414); V is covered by tests/test_multifield.py."""
    from gridapsolvers_tpu.fem.mhd import mhd_gmg
    from gridapsolvers_tpu.linear import FGMRESSolver

    gmg, prob = mhd_gmg((8, 8, 8), 2, maxiter=1, cycle=cycle)
    solver = FGMRESSolver(m=30, Pr=gmg, rtol=1e-6, maxiter=40)
    st = solver.setup(prob.A)
    x, stats = solver.solve(st, prob.b)
    assert stats.converged(), (cycle, int(stats.niter))
    assert int(stats.niter) <= 20, (cycle, int(stats.niter))
    assert prob.residual_norm(x) < 1e-5
