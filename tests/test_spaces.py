"""Explicit FESpaceHierarchy / TriangulationHierarchy objects
(reference src/MultilevelTools/FESpaceHierarchies.jl:1-16,39-61,104-174 and
TriangulationHierarchies.jl:2-34)."""
import numpy as np

from gridapsolvers_tpu.fem import poisson_problem
from gridapsolvers_tpu.linear import CGSolver, ChebyshevSmoother
from gridapsolvers_tpu.linear.gmg import GMGSolver
from gridapsolvers_tpu.multilevel import (
    FESpaceHierarchy,
    TriangulationHierarchy,
    cartesian_hierarchy,
    fe_space_hierarchy,
    multifield_hierarchy,
)


def test_fe_space_basic():
    h = cartesian_hierarchy((16, 16), 3)
    sh = fe_space_hierarchy(h, order=1)
    assert sh.num_levels == 3
    s = sh[0]
    assert s.grid_shape == (17, 17)
    assert s.num_dofs == 17 * 17
    # whole-boundary Dirichlet: 15^2 interior free dofs
    assert s.num_free_dofs == 15 * 15
    coords = s.node_coords()
    assert coords.shape == (17 * 17, 2)
    np.testing.assert_allclose(coords.min(axis=0), [0.0, 0.0])
    np.testing.assert_allclose(coords.max(axis=0), [1.0, 1.0])


def test_space_hierarchy_drives_gmg():
    """compute_matrices + transfer_operators compose into a working GMG
    (the FESpaceHierarchy-driven analog of compute_hierarchy_matrices →
    GMGLinearSolverFromMatrices, FESpaceHierarchies.jl:141-174)."""
    prob = poisson_problem((16, 16))
    h = cartesian_hierarchy((16, 16), 3)
    sh = fe_space_hierarchy(h, order=1)
    mats = sh.compute_matrices("stiffness")
    P, R = sh.transfer_operators()
    gmg = GMGSolver(
        coarse_ops=tuple(mats[1:]),
        prolongations=tuple(P),
        restrictions=tuple(R),
        smoother=ChebyshevSmoother(degree=3),
    )
    solver = CGSolver(Pl=gmg, rtol=1e-8, maxiter=30)
    st = solver.setup(mats[0])
    x, stats = solver.solve(st, prob.b)
    assert stats.converged()
    assert int(stats.niter) <= 20
    assert float(prob.l2_error(x)) < 1e-4


def test_q2_space_hierarchy():
    """Order-2 spaces: the Q2 node grid of mesh n is the Q1 grid of mesh
    2n, so the structured transfers apply unchanged."""
    h = cartesian_hierarchy((8, 8), 2)
    sh = fe_space_hierarchy(h, order=2)
    assert sh[0].grid_shape == (17, 17)
    assert sh[1].grid_shape == (9, 9)
    P, R = sh.transfer_operators()
    assert len(P) == 1 and len(R) == 1


def test_multifield_hierarchy():
    h = cartesian_hierarchy((8, 8), 2)
    mf = multifield_hierarchy(h, orders=(2, 1))
    assert len(mf) == 2
    assert len(mf[0].fields) == 2
    assert mf[0].num_dofs == 17 * 17 + 9 * 9
    masks = mf[0].free_masks()
    assert len(masks) == 2


def test_triangulation_hierarchy():
    h = cartesian_hierarchy((16, 16), 3)
    th = TriangulationHierarchy(h)
    assert th.num_levels == 3
    assert th[0].ncells == (16, 16)
    assert th[2].ncells == (4, 4)
