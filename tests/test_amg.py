"""Smoothed-aggregation AMG tests (PETSc GAMG parity: coarse solves and
elasticity with rigid-body near-nullspace)."""
import numpy as np
import pytest

import jax.numpy as jnp

from gridapsolvers_tpu.fem import poisson_problem
from gridapsolvers_tpu.fem.elasticity import elasticity_problem
from gridapsolvers_tpu.interfaces import rigid_body_modes
from gridapsolvers_tpu.linear import CGSolver
from gridapsolvers_tpu.linear.amg import AMGSolver


def test_amg_cg_poisson():
    """CG + AMG on 2D Poisson: mesh-independent-ish iterations without any
    geometric hierarchy."""
    iters = []
    for n in (16, 32):
        prob = poisson_problem((n, n))
        amg = AMGSolver(coarse_size=100)
        solver = CGSolver(Pl=amg, rtol=1e-8, maxiter=60)
        state = solver.setup(prob.A)
        x, stats = solver.solve(state, prob.b)
        assert stats.converged()
        assert float(prob.l2_error(x)) < 1e-6
        iters.append(int(stats.niter))
    assert iters[1] <= iters[0] + 8, iters


def test_amg_hierarchy_shrinks():
    prob = poisson_problem((32, 32))
    amg = AMGSolver(coarse_size=50)
    state = amg.setup(prob.A)
    sizes = [m.shape[0] for m in state["mats"]]
    assert len(sizes) >= 3
    assert all(sizes[i + 1] < sizes[i] for i in range(len(sizes) - 1))
    assert sizes[-1] <= 150


def test_amg_elasticity_rigid_body_candidates():
    """AMG with rigid-body near-nullspace candidates on clamped elasticity
    (the PETScElasticitySolver recipe, ElasticitySolvers.jl:83-108)."""
    prob = elasticity_problem((12, 12))
    coords = prob.mesh.vertex_coords()
    ns = rigid_body_modes(jnp.asarray(coords))
    n = coords.shape[0]
    # modes are node-major (n, d); system is component-major blocks
    cand = np.stack(
        [
            np.concatenate(
                [np.asarray(q).reshape(n, 2)[:, 0],
                 np.asarray(q).reshape(n, 2)[:, 1]]
            )
            for q in ns.vectors
        ],
        axis=1,
    )
    amg = AMGSolver(coarse_size=80, near_nullspace=cand)
    solver = CGSolver(Pl=amg, rtol=1e-8, maxiter=80)
    state = solver.setup(prob.A)
    x, stats = solver.solve(state, prob.b)
    assert stats.converged()
    assert prob.residual_norm(x) < 1e-6
