"""Distributed (sharded) path tests on the 8-device simulated CPU mesh —
the analog of the reference's sequential DebugArray backend runs
(SURVEY.md §4): same code, full distributed semantics, no real multi-chip.

Checks that sharded solves produce the same answers as single-device ones
and that coarse-level re-sharding (sharded fine levels, replicated coarse)
converges identically.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gridapsolvers_tpu.fem import CartesianMesh, poisson_problem
from gridapsolvers_tpu.fem.assembly import eliminate_dirichlet, laplacian
from gridapsolvers_tpu.linear import CGSolver, ChebyshevSmoother, JacobiSolver
from gridapsolvers_tpu.multilevel import cartesian_hierarchy
from gridapsolvers_tpu.parallel import (
    device_mesh,
    distributed_poisson_gmg,
    shard_grid_vector,
    shard_stencil,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8
    return device_mesh(8)


def test_sharded_spmv_matches_serial(mesh8):
    prob = poisson_problem((16, 16, 16))
    A = prob.A
    Ad = shard_stencil(A, mesh8)  # pads 17 -> 24 rows
    assert Ad.grid_shape == (24, 17, 17)
    x = np.random.default_rng(0).normal(size=A.n)
    y_serial = np.asarray(A.matvec(jnp.asarray(x)))
    xd = shard_grid_vector(jnp.asarray(x), mesh8, A.grid_shape)
    y_dist = np.asarray(jax.jit(Ad.matvec)(xd))[: 17].reshape(-1)
    np.testing.assert_allclose(y_dist, y_serial, rtol=1e-12)


def test_sharded_cg_matches_serial(mesh8):
    prob = poisson_problem((16, 16, 16))
    solver = CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=400)

    state = solver.setup(prob.A)
    x_serial, stats_serial = solver.solve(state, prob.b)

    Ad = shard_stencil(prob.A, mesh8)
    bd = shard_grid_vector(prob.b, mesh8, prob.A.grid_shape)
    state_d = solver.setup(Ad)
    solve = jax.jit(lambda st, b: solver.solve(st, b))
    x_dist, stats_dist = solve(state_d, bd)

    assert abs(int(stats_dist.niter) - int(stats_serial.niter)) <= 1
    np.testing.assert_allclose(
        np.asarray(x_dist)[: 17].reshape(-1), np.asarray(x_serial), atol=1e-7
    )


def test_distributed_gmg_cg(mesh8):
    """Sharded fine levels + replicated coarse levels: convergence must
    match the serial GMG within tolerance."""
    prob = poisson_problem((16, 16, 16))
    hierarchy = cartesian_hierarchy((16, 16, 16), 3)
    gmg, Ad = distributed_poisson_gmg(
        hierarchy, mesh8, smoother=ChebyshevSmoother(degree=3)
    )
    solver = CGSolver(Pl=gmg, rtol=1e-6, maxiter=20)
    bd = shard_grid_vector(
        prob.b, mesh8, prob.A.grid_shape, target_shape=Ad.grid_shape
    )
    state = solver.setup(Ad)
    solve = jax.jit(lambda st, b: solver.solve(st, b))
    x, stats = solve(state, bd)
    assert stats.converged()
    assert int(stats.niter) <= 20
    err = prob.l2_error(jnp.asarray(np.asarray(x)[: 17].reshape(-1)))
    assert float(err) < 1e-5


def test_resharding_boundary_levels(mesh8):
    """Check the sharded->replicated switch sits mid-hierarchy (so the test
    actually exercises redistribution)."""
    hierarchy = cartesian_hierarchy((16, 16, 16), 3)
    gmg, Ad = distributed_poisson_gmg(hierarchy, mesh8)
    # fine level sharded: 17 rows over 8 devices >= 2/dev
    specs = [
        op.bands.sharding.spec for op in [Ad] + list(gmg.coarse_ops)
    ]
    assert specs[0] == P(None, "p", None, None)
    # coarsest (5 rows < 16) must be replicated
    assert specs[-1] in (P(), P(None, None, None, None))


def test_weak_scaling_iteration_counts(mesh8):
    """Algorithmic weak scaling on the simulated mesh: GMG-CG iteration
    counts stay ~constant as devices and problem grow together with
    deepened hierarchies (the reference's weak-scaling claim,
    BASELINE.md: 'relatively constant, even decreasing')."""
    from gridapsolvers_tpu.parallel.weak_scaling import weak_scaling_poisson

    results = weak_scaling_poisson(
        local_cells=(8, 16, 16),
        device_counts=(1, 4),
        base_levels=2,
        rtol=1e-6,
        maxiter=25,
    )
    iters = [r["iters"] for r in results]
    assert all(r["iters"] <= 20 for r in results), results
    assert max(iters) - min(iters) <= 3, iters


def test_halo_spmv_matches_gspmd(mesh8):
    """Explicit shard_map+ppermute halo SpMV == GSPMD-auto stencil matvec."""
    from gridapsolvers_tpu.parallel.halo import halo_spmv

    prob = poisson_problem((16, 16, 16))
    Ad = shard_stencil(prob.A, mesh8)
    xd = shard_grid_vector(
        jnp.asarray(np.random.default_rng(3).normal(size=prob.A.n)),
        mesh8,
        prob.A.grid_shape,
    )
    y_auto = np.asarray(jax.jit(Ad.matvec)(xd))
    mv = halo_spmv(Ad, mesh8)
    y_halo = np.asarray(jax.jit(mv)(xd))
    np.testing.assert_allclose(y_halo, y_auto, rtol=1e-12, atol=1e-12)


def test_resharding_roundtrip(mesh8):
    """Redistribution round-trip (reference RedistributeToolsTests.jl:19-60:
    FE functions moved old->new partition and back are unchanged): shard ->
    replicate -> shard preserves values exactly."""
    from jax.sharding import NamedSharding

    from gridapsolvers_tpu.parallel import replicated, row_sharding

    prob = poisson_problem((8, 8, 8))
    x = jnp.asarray(np.random.default_rng(7).normal(size=prob.A.n))
    xd = shard_grid_vector(x, mesh8, prob.A.grid_shape)

    @jax.jit
    def roundtrip(v):
        rep = jax.lax.with_sharding_constraint(v, replicated(mesh8))
        back = jax.lax.with_sharding_constraint(
            rep, row_sharding(mesh8, v.ndim)
        )
        return back

    out = roundtrip(xd)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(xd))
    assert out.sharding.spec == xd.sharding.spec


def test_multi_axis_mesh_gmg():
    """D-dimensional box partition (reference np_per_level NTuple{D},
    ModelHierarchies.jl:82): GMG-CG on a (2,4) device mesh matches the
    1-D-partition iteration count and error."""
    import jax
    import jax.numpy as jnp

    from gridapsolvers_tpu.fem import poisson_problem
    from gridapsolvers_tpu.linear import CGSolver, ChebyshevSmoother
    from gridapsolvers_tpu.multilevel import cartesian_hierarchy
    from gridapsolvers_tpu.parallel import (
        device_mesh_nd,
        distributed_poisson_gmg,
        shard_grid_vector,
    )
    from gridapsolvers_tpu.parallel.dist import unpad_grid_vector

    prob = poisson_problem((32, 32))
    hier = cartesian_hierarchy((32, 32), 3)
    iters = {}
    for layout in [(2, 4), (2, 2, 1)] if False else [(2, 4)]:
        mesh = device_mesh_nd(layout)
        gmg, Ad = distributed_poisson_gmg(
            hier, mesh, smoother=ChebyshevSmoother(degree=3), axis=None
        )
        solver = CGSolver(Pl=gmg, rtol=1e-8, maxiter=30)
        bd = shard_grid_vector(
            jnp.asarray(prob.b), mesh, prob.A.grid_shape, axis=None
        )
        st = solver.setup(Ad)
        x, stats = jax.jit(solver.solve)(st, bd)
        xh = unpad_grid_vector(np.asarray(x), prob.A.grid_shape).reshape(-1)
        assert prob.l2_error(jnp.asarray(xh)) < 1e-5
        iters[layout] = int(stats.niter)

    # 1-D partition baseline on the same problem
    from gridapsolvers_tpu.parallel import device_mesh

    mesh1 = device_mesh(8)
    gmg1, Ad1 = distributed_poisson_gmg(
        hier, mesh1, smoother=ChebyshevSmoother(degree=3)
    )
    s1 = CGSolver(Pl=gmg1, rtol=1e-8, maxiter=30)
    bd1 = shard_grid_vector(
        jnp.asarray(prob.b), mesh1, prob.A.grid_shape,
        target_shape=Ad1.grid_shape,
    )
    st1 = s1.setup(Ad1)
    _, stats1 = jax.jit(s1.solve)(st1, bd1)
    assert iters[(2, 4)] == int(stats1.niter)


def test_multi_axis_mesh_3d():
    """(2,2,2) box partition of a 3D Poisson GMG solve."""
    import jax
    import jax.numpy as jnp

    from gridapsolvers_tpu.fem import poisson_problem
    from gridapsolvers_tpu.linear import CGSolver, ChebyshevSmoother
    from gridapsolvers_tpu.multilevel import cartesian_hierarchy
    from gridapsolvers_tpu.parallel import (
        device_mesh_nd,
        distributed_poisson_gmg,
        shard_grid_vector,
    )
    from gridapsolvers_tpu.parallel.dist import unpad_grid_vector

    prob = poisson_problem((16, 16, 16))
    hier = cartesian_hierarchy((16, 16, 16), 2)
    mesh = device_mesh_nd((2, 2, 2))
    gmg, Ad = distributed_poisson_gmg(
        hier, mesh, smoother=ChebyshevSmoother(degree=3), axis=None
    )
    solver = CGSolver(Pl=gmg, rtol=1e-8, maxiter=30)
    bd = shard_grid_vector(
        jnp.asarray(prob.b), mesh, prob.A.grid_shape, axis=None
    )
    st = solver.setup(Ad)
    x, stats = jax.jit(solver.solve)(st, bd)
    xh = unpad_grid_vector(np.asarray(x), prob.A.grid_shape).reshape(-1)
    assert prob.l2_error(jnp.asarray(xh)) < 1e-4


def test_weak_scaling_multi_axis():
    """Weak scaling with a box layout keeps iteration counts flat."""
    from gridapsolvers_tpu.parallel.weak_scaling import weak_scaling_poisson

    res = weak_scaling_poisson(
        local_cells=(8, 8),
        device_counts=[(1, 1), (2, 2), (2, 4)],
        base_levels=2,
        rtol=1e-6,
    )
    iters = [r["iters"] for r in res]
    assert max(iters) - min(iters) <= 2, iters


def test_distributed_periodic_poisson_gmg(mesh8):
    """Periodic stencils on the SHARDED grid-vector path: the wraparound
    shift lowers to one extra ppermute closing the device ring. Sharded
    GMG-CG on the all-periodic torus must match the serial answer and
    iteration count (reference CartesianModelHierarchy isperiodic,
    ModelHierarchies.jl:85-87)."""
    from gridapsolvers_tpu.fem.assembly import mass
    from gridapsolvers_tpu.interfaces.nullspaces import NullSpace
    from gridapsolvers_tpu.linear.gmg import GMGSolver
    from gridapsolvers_tpu.linear.wrappers import NullspaceSolver
    from gridapsolvers_tpu.multilevel.transfer import setup_transfer_operators

    hier = cartesian_hierarchy((32, 32), 3, periodic=(True, True))
    mesh_f = hier[0]
    xs = [np.arange(n) / n for n in mesh_f.ncells]
    X, Y = np.meshgrid(xs[0], xs[1], indexing="ij")
    u_ex = np.sin(2 * np.pi * X) * np.sin(2 * np.pi * Y)
    M = mass(mesh_f)
    b = M.matvec(jnp.asarray((8 * np.pi ** 2 * u_ex).reshape(-1)))
    b = b - jnp.mean(b)

    # serial baseline
    ops = [laplacian(m) for m in hier.meshes]
    Pt, Rt = setup_transfer_operators(hier)
    coarsest = NullspaceSolver(
        nullspace=NullSpace(vectors=(jnp.ones(ops[-1].n),)),
        constrain_matrix=True,
    )
    gmg_s = GMGSolver(
        coarse_ops=tuple(ops[1:]),
        prolongations=tuple(Pt),
        restrictions=tuple(Rt),
        smoother=ChebyshevSmoother(degree=3),
        coarsest_solver=coarsest,
    )
    solver = CGSolver(Pl=gmg_s, rtol=1e-8, maxiter=30)
    st_s = solver.setup(ops[0])
    x_s, stats_s = solver.solve(st_s, b)

    # sharded: 32 rows over 8 devices fine, 16 sharded, 8x8 replicated
    gmg_d, Ad = distributed_poisson_gmg(
        hier,
        mesh8,
        smoother=ChebyshevSmoother(degree=3),
        coarsest_solver=NullspaceSolver(
            nullspace=NullSpace(vectors=(jnp.ones((8, 8)),)),
            constrain_matrix=True,
        ),
    )
    assert Ad.periodic == (True, True)
    assert Ad.grid_shape == (32, 32)  # periodic axes: no pad rows
    solver_d = CGSolver(Pl=gmg_d, rtol=1e-8, maxiter=30)
    bd = shard_grid_vector(b, mesh8, (32, 32))
    st_d = solver_d.setup(Ad)
    x_d, stats_d = jax.jit(solver_d.solve)(st_d, bd)

    assert stats_d.converged()
    assert abs(int(stats_d.niter) - int(stats_s.niter)) <= 1
    xs_ = np.asarray(x_s) - float(jnp.mean(x_s))
    xd_ = np.asarray(x_d).reshape(-1) - float(np.mean(np.asarray(x_d)))
    np.testing.assert_allclose(xd_, xs_, atol=1e-6)
