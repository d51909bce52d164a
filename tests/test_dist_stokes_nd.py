"""Multi-axis distributed Stokes: the flagship FGMRES + block-triangular
(velocity GMG, pressure-mass CG) configuration on a 2-D device grid —
the reference's actual scalability layout (np=(px,py) processor boxes,
joss_paper/scalability/preparejobs.jl:80-105). Sharded runs must
reproduce the single-device solve (iterations and solution)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gridapsolvers_tpu.fem.dist_stokes_nd import (
    dist_velocity_gmg_nd,
    distributed_stokes_solver_nd,
    distributed_stokes_system_nd,
    unshard_stokes_solution_nd,
)
from gridapsolvers_tpu.parallel import device_mesh_nd


def _solve(ncells, mesh_shape, num_levels=2, rtol=1e-9):
    mesh = device_mesh_nd(mesh_shape)
    prob, A, b, pv, pq = distributed_stokes_system_nd(
        ncells, mesh, mesh_shape
    )
    solver, gmg = distributed_stokes_solver_nd(
        ncells, num_levels, mesh, mesh_shape, rtol=rtol, maxiter=60
    )
    state = solver.setup(A)
    x, stats = jax.jit(lambda s, v: solver.solve(s, v))(state, b)
    u, p = unshard_stokes_solution_nd(
        x, ncells, mesh_shape, pv.n, pq.n
    )
    return prob, u, p, int(stats.niter)


def test_stokes_nd_sharded_matches_single_device():
    """(2,4) box-sharded flagship == single-device run: same FGMRES
    iteration count and solution, and the MMS errors are discretization-
    accurate."""
    ncells = (16, 16)
    prob1, u1, p1, it1 = _solve(ncells, (1, 1))
    prob8, u8, p8, it8 = _solve(ncells, (2, 4))
    assert abs(it8 - it1) <= 1, (it8, it1)
    for a, b in zip(u8, u1):
        np.testing.assert_allclose(a, b, atol=1e-7)
    np.testing.assert_allclose(p8, p1, atol=1e-6)
    # physical accuracy on the manufactured solution
    verr = prob8.velocity_error(tuple(jnp.asarray(c) for c in u8))
    assert verr < 5e-4, verr


def test_stokes_nd_velocity_gmg_levels_sharded():
    """Fine level sharded over both axes, coarsest replicated."""
    mesh_shape = (2, 4)
    mesh = device_mesh_nd(mesh_shape)
    gmg, parts = dist_velocity_gmg_nd((16, 16), 3, mesh, mesh_shape)
    assert parts[0] is not None and parts[1] is not None
    assert parts[-1] is None
    # one level's component operator exchanges over <= 8 box offsets
    K1 = gmg.coarse_ops[0].ops[0]
    assert type(K1).__name__ == "DistGraphELL"
    assert len(K1.dirs) <= 8


def test_stokes_nd_3d_mesh():
    """3-D Stokes on a (2,2,2) device grid solves to tolerance."""
    ncells = (6, 6, 6)
    prob, u, p, it = _solve(ncells, (2, 2, 2), num_levels=2, rtol=1e-8)
    assert it <= 60, it
    verr = prob.velocity_error(tuple(jnp.asarray(c) for c in u))
    assert verr < 5e-3, verr
