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


# ---------------- augmented-Lagrangian (grad-div) on multi-axis meshes


def test_nd_dist_vanka_matches_serial():
    """Box-partitioned distributed Vanka == serial VankaSolver on the
    augmented velocity block (both weightings)."""
    from gridapsolvers_tpu.fem import assembly2 as asm
    from gridapsolvers_tpu.fem.dist_stokes_nd import _velocity_star_topo
    from gridapsolvers_tpu.fem.dist_stokes_nd import _shard_block_nd
    from gridapsolvers_tpu.fem.mesh import CartesianMesh
    from gridapsolvers_tpu.fem.stokes import graddiv_velocity_block
    from gridapsolvers_tpu.parallel import box_partition
    from gridapsolvers_tpu.parallel.dist_ell_nd import (
        shard_vector_nd,
        unshard_vector_nd,
    )
    from gridapsolvers_tpu.patches.dist_vanka_nd import make_dist_vanka_nd
    from gridapsolvers_tpu.patches.vanka import VankaSolver

    mesh2 = CartesianMesh((8, 8), (0, 1, 0, 1))
    dim = 2
    K_aug, _ = graddiv_velocity_block(mesh2, 1.0, 1e3, return_graddiv=True)
    star = _velocity_star_topo(mesh2, dim)
    n_u = int(np.prod(asm.node_grid_shape(mesh2, 2)))
    rng = np.random.default_rng(0)
    r = tuple(jnp.asarray(rng.normal(size=n_u)) for _ in range(dim))

    ms = (2, 4)
    dmesh = device_mesh_nd(ms)
    pv = box_partition(asm.node_grid_shape(mesh2, 2), ms)
    Kd = _shard_block_nd(K_aug, pv, dmesh, np.float64)
    rd = tuple(shard_vector_nd(np.asarray(rc), pv, dmesh) for rc in r)
    for weighting in ("unit", "overlap"):
        sv = VankaSolver(topo=star, omega=1.0, weighting=weighting)
        z_serial = sv.apply(sv.setup(K_aug), r)
        dv = make_dist_vanka_nd(Kd, (pv,) * dim, star, weighting=weighting)
        z_dist = jax.jit(dv.apply)(dv.setup(Kd), rd)
        for c in range(dim):
            np.testing.assert_allclose(
                unshard_vector_nd(z_dist[c], pv, n_u),
                np.asarray(z_serial[c]),
                atol=1e-10,
            )


def _run_graddiv_flagship(ms, **gmg_kw):
    """Shared harness: the augmented grad-div flagship on a (px,py)
    device grid, returning (problem, velocity, pressure, iters)."""
    from gridapsolvers_tpu.fem.dist_stokes_nd import (
        distributed_stokes_graddiv_solver_nd,
        distributed_stokes_graddiv_system_nd,
    )

    mesh = device_mesh_nd(ms)
    prob, A, b, pv, pp = distributed_stokes_graddiv_system_nd(
        (16, 16), mesh, ms
    )
    solver, _ = distributed_stokes_graddiv_solver_nd(
        (16, 16), 2, mesh, ms, rtol=1e-9, maxiter=40,
        gmg_kw=gmg_kw or None,
    )
    st = solver.setup(A)
    x, stats = jax.jit(lambda s, v: solver.solve(s, v))(st, b)
    u, p = unshard_stokes_solution_nd(
        x, (16, 16), ms, pv.n, pp.n, pressure="p1disc"
    )
    return prob, u, p, int(stats.niter)


def test_nd_graddiv_flagship_matches_single_device():
    """The AUGMENTED grad-div flagship (alpha=1e3, Q2/P1disc, distributed
    vertex-star Vanka, patch prolongations) on a (2,4) processor grid ==
    single-device: same alpha-robust iteration count (~9) and solution."""
    prob1, u1, p1, it1 = _run_graddiv_flagship((1, 1))
    prob8, u8, p8, it8 = _run_graddiv_flagship((2, 4))
    assert abs(it8 - it1) <= 1, (it8, it1)
    assert it8 <= 14, it8  # alpha-robust regime
    for a, b in zip(u8, u1):
        np.testing.assert_allclose(a, b, atol=1e-7)
    np.testing.assert_allclose(p8, p1, atol=1e-6)
    verr = prob8.velocity_error(tuple(jnp.asarray(c) for c in u8))
    assert verr < 5e-4, verr


def test_nd_graddiv_flagship_chebyshev_vanka():
    """cheby_degree=4: Chebyshev over the DISTRIBUTED vertex-star Vanka
    (shard_map apply inside the setup-time power iteration) — sharded ==
    serial iteration count and solution, still in the alpha-robust
    regime, at ~5/11 of the Richardson(10) smoother SpMVs (5 Vanka
    applies + 4 residual SpMVs per sweep vs 10 + 10)."""
    prob1, u1, p1, it1 = _run_graddiv_flagship((1, 1), cheby_degree=4)
    prob8, u8, p8, it8 = _run_graddiv_flagship((2, 4), cheby_degree=4)
    assert abs(it8 - it1) <= 1, (it8, it1)
    assert it8 <= 14, it8  # alpha-robust regime holds under Chebyshev
    for a, b in zip(u8, u1):
        np.testing.assert_allclose(a, b, atol=1e-7)
    np.testing.assert_allclose(p8, p1, atol=1e-6)


def test_weak_scaling_stokes_multi_axis():
    """Flagship weak scaling over BOX layouts (the reference's (px,py)
    processor grids): outer FGMRES counts stay flat from (1,1) to (2,4)."""
    from gridapsolvers_tpu.parallel.weak_scaling import weak_scaling_stokes

    res = weak_scaling_stokes(
        local_cells=(8, 8),
        device_counts=[(1, 1), (2, 2), (2, 4)],
        base_levels=2,
        rtol=1e-6,
        maxiter=60,
    )
    iters = [r["iters"] for r in res]
    assert max(iters) - min(iters) <= 4, iters
