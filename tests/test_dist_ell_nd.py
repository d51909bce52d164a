"""Multi-axis (box-partitioned) distributed ELL tests — the D-dimensional
processor grids of the reference (np_per_level NTuple{D} boxes,
src/MultilevelTools/ModelHierarchies.jl:82) for UNSTRUCTURED sparsity.
Sharded matvec/adjoint/diag and full Krylov solves must match serial
exactly on the 8-device simulated CPU mesh."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from gridapsolvers_tpu.algebra import ell_from_scipy
from gridapsolvers_tpu.algebra.convert import to_scipy
from gridapsolvers_tpu.fem import poisson_problem
from gridapsolvers_tpu.linear import CGSolver, JacobiSolver
from gridapsolvers_tpu.parallel import device_mesh_nd
from gridapsolvers_tpu.parallel.dist_ell_nd import (
    box_partition,
    shard_csr_nd,
    shard_vector_nd,
    unshard_vector_nd,
)


@pytest.fixture(scope="module")
def mesh24():
    return device_mesh_nd((2, 4))


@pytest.fixture(scope="module")
def mesh222():
    return device_mesh_nd((2, 2, 2))


def _poisson_csr(ncells):
    prob = poisson_problem(ncells)
    return to_scipy(prob.A), prob


def test_box_partition_layout():
    part = box_partition((5, 7), (2, 4))
    assert part.n_shards == 8
    assert part.box_shape == (3, 2)
    # every dof owned exactly once, slots within the padded box
    assert part.owner.shape == (35,)
    assert (part.slot < part.m).all()
    pidx = part.padded_index()
    assert len(np.unique(pidx)) == 35
    # dof (0,0) on shard (0,0) slot 0; dof (4,6) on the last shard
    assert part.owner[0] == 0 and part.slot[0] == 0
    assert part.owner[-1] == 7


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
def test_nd_spmv_matches_serial_2d(mesh_shape):
    """2-D Poisson matrix over a 2-D device grid: matvec, adjoint, diag."""
    S, _ = _poisson_csr((13, 18))  # 14 x 19 nodes, non-divisible
    n = S.shape[0]
    part = box_partition((14, 19), mesh_shape)
    mesh = device_mesh_nd(mesh_shape)
    A = shard_csr_nd(S, part, mesh, identity_pad=True)
    # 2-D Q1 stencil: at most the 8 box neighbors
    assert len(A.dirs) <= 8
    rng = np.random.default_rng(0)
    x = rng.normal(size=n)
    xd = shard_vector_nd(x, part, mesh)
    np.testing.assert_allclose(
        unshard_vector_nd(jax.jit(A.matvec)(xd), part, n), S @ x, rtol=1e-12
    )
    np.testing.assert_allclose(
        unshard_vector_nd(jax.jit(A.matvec_t)(xd), part, n),
        S.T @ x,
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        unshard_vector_nd(A.diag(), part, n), S.diagonal(), rtol=1e-12
    )


def test_nd_spmv_matches_serial_3d(mesh222):
    """3-D Poisson over a (2,2,2) device grid (26 neighbor offsets max)."""
    S, _ = _poisson_csr((7, 6, 5))
    n = S.shape[0]
    part = box_partition((8, 7, 6), (2, 2, 2))
    A = shard_csr_nd(S, part, mesh222, identity_pad=True)
    assert len(A.dirs) <= 26
    rng = np.random.default_rng(1)
    x = rng.normal(size=n)
    xd = shard_vector_nd(x, part, mesh222)
    np.testing.assert_allclose(
        unshard_vector_nd(jax.jit(A.matvec)(xd), part, n), S @ x, rtol=1e-12
    )
    np.testing.assert_allclose(
        unshard_vector_nd(jax.jit(A.matvec_t)(xd), part, n),
        S.T @ x,
        rtol=1e-12,
    )


def test_nd_cg_matches_serial(mesh24):
    """CG+Jacobi on the box-sharded operator reproduces the serial solve
    (same iteration count, same solution)."""
    S, prob = _poisson_csr((16, 16))
    n = S.shape[0]
    # random rhs: manufactured-solution rhs vectors are near-eigenvectors
    # of the uniform Laplacian and converge unrealistically fast
    b = np.random.default_rng(7).normal(size=n)
    solver = CGSolver(Pl=JacobiSolver(), rtol=1e-10, maxiter=500)

    A_serial = ell_from_scipy(S)
    st = solver.setup(A_serial)
    x_serial, stats_serial = solver.solve(st, jnp.asarray(b))
    assert int(stats_serial.niter) > 10  # a real CG run

    part = box_partition((17, 17), (2, 4))
    Ad = shard_csr_nd(S, part, mesh24, identity_pad=True)
    bd = shard_vector_nd(b, part, mesh24)
    st_d = solver.setup(Ad)
    solve = jax.jit(lambda s, b: solver.solve(s, b))
    xd, stats_d = solve(st_d, bd)

    assert abs(int(stats_d.niter) - int(stats_serial.niter)) <= 1
    np.testing.assert_allclose(
        unshard_vector_nd(xd, part, n), np.asarray(x_serial), atol=1e-8
    )


def test_nd_rectangular_transfer(mesh24):
    """Rectangular operator with DIFFERENT row/col partitions: a
    fine-to-coarse aggregation matrix (rows on the coarse grid's boxes,
    columns on the fine grid's boxes of the SAME device grid)."""
    fine, coarse = (12, 16), (6, 8)
    part_f = box_partition(fine, (2, 4))
    part_c = box_partition(coarse, (2, 4))
    # 4-point average: coarse (i,j) <- fine (2i..2i+1, 2j..2j+1)
    rows, cols, vals = [], [], []
    for i in range(coarse[0]):
        for j in range(coarse[1]):
            for di in range(2):
                for dj in range(2):
                    rows.append(i * coarse[1] + j)
                    cols.append((2 * i + di) * fine[1] + (2 * j + dj))
                    vals.append(0.25)
    R = sp.coo_matrix(
        (vals, (rows, cols)), shape=(np.prod(coarse), np.prod(fine))
    ).tocsr()
    Rd = shard_csr_nd(R, part_c, mesh24, part_cols=part_f)
    rng = np.random.default_rng(2)
    x = rng.normal(size=R.shape[1])
    xd = shard_vector_nd(x, part_f, mesh24)
    yd = jax.jit(Rd.matvec)(xd)
    np.testing.assert_allclose(
        unshard_vector_nd(yd, part_c), R @ x, rtol=1e-12
    )
    # adjoint: coarse -> fine scatter
    y = rng.normal(size=R.shape[0])
    ydc = shard_vector_nd(y, part_c, mesh24)
    np.testing.assert_allclose(
        unshard_vector_nd(jax.jit(Rd.matvec_t)(ydc), part_f),
        R.T @ y,
        rtol=1e-12,
    )


def _interp_1d(m_coarse):
    """Linear interpolation matrix for interior nodes: (2m+1) x m."""
    mf = 2 * m_coarse + 1
    Pm = sp.lil_matrix((mf, m_coarse))
    for j in range(m_coarse):
        i = 2 * j + 1
        Pm[i, j] = 1.0
        Pm[i - 1, j] += 0.5
        Pm[i + 1, j] += 0.5
    return Pm.tocsr()


def _lap_1d(m):
    return sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m)).tocsr()


def test_nd_distributed_gmg_cg_matches_serial(mesh24):
    """Full GMG-CG on box-sharded unstructured operators: 3 Galerkin
    levels, rectangular sharded transfers, replicated dense coarse solve —
    the from-matrices distributed GMG of the reference
    (GMGLinearSolvers.jl) on a 2-D device grid."""
    from gridapsolvers_tpu.algebra import DenseMatrix
    from gridapsolvers_tpu.linear import ChebyshevSmoother, GMGSolver
    from gridapsolvers_tpu.linear.direct import DenseInverseSolver
    from gridapsolvers_tpu.parallel.dist_ell_nd import dense_padded_nd

    # interior-node 2-D Laplacians: 31^2 -> 15^2 -> 7^2 (Galerkin)
    sizes = [31, 15, 7]
    T = _lap_1d(sizes[0])
    Iy = sp.eye(sizes[0], format="csr")
    mats = [sp.kron(T, Iy, format="csr") + sp.kron(Iy, T, format="csr")]
    Ps, Rs = [], []
    for m_c in sizes[1:]:
        P1 = _interp_1d(m_c)
        P2 = sp.kron(P1, P1, format="csr")
        Ps.append(P2)
        Rs.append((0.25 * P2.T).tocsr())
        mats.append((Rs[-1] @ mats[-1] @ P2).tocsr())

    rng = np.random.default_rng(11)
    b = rng.normal(size=mats[0].shape[0])

    def build(serial):
        if serial:
            ops = [ell_from_scipy(S) for S in mats[:-1]]
            ops.append(DenseMatrix(jnp.asarray(mats[-1].todense())))
            prolong = [ell_from_scipy(Pm) for Pm in Ps]
            restrict = [ell_from_scipy(Rm) for Rm in Rs]
            bd = jnp.asarray(b)
            return ops, prolong, restrict, bd, None
        parts = [box_partition((s, s), (2, 4)) for s in sizes]
        ops = [
            shard_csr_nd(S, p, mesh24, identity_pad=True)
            for S, p in zip(mats[:-1], parts[:-1])
        ]
        ops.append(
            DenseMatrix(jnp.asarray(dense_padded_nd(mats[-1], parts[-1])))
        )
        prolong = [
            shard_csr_nd(Pm, pf, mesh24, part_cols=pc)
            for Pm, pf, pc in zip(Ps, parts[:-1], parts[1:])
        ]
        restrict = [
            shard_csr_nd(Rm, pc, mesh24, part_cols=pf)
            for Rm, pc, pf in zip(Rs, parts[1:], parts[:-1])
        ]
        bd = shard_vector_nd(b, parts[0], mesh24)
        return ops, prolong, restrict, bd, parts

    results = {}
    for serial in (True, False):
        ops, prolong, restrict, bd, parts = build(serial)
        gmg = GMGSolver(
            coarse_ops=tuple(ops[1:]),
            prolongations=tuple(prolong),
            restrictions=tuple(restrict),
            smoother=ChebyshevSmoother(degree=3),
            coarsest_solver=DenseInverseSolver(),
        )
        solver = CGSolver(Pl=gmg, rtol=1e-9, maxiter=40)
        st = solver.setup(ops[0])
        x, stats = jax.jit(lambda s, v: solver.solve(s, v))(st, bd)
        assert int(stats.niter) < 15, int(stats.niter)
        results[serial] = (
            np.asarray(x)
            if serial
            else unshard_vector_nd(x, parts[0]),
            int(stats.niter),
        )

    assert abs(results[True][1] - results[False][1]) <= 1
    np.testing.assert_allclose(
        results[False][0], results[True][0], atol=1e-7
    )


def test_nd_trailing_component_axis(mesh24):
    """Vector-valued fields: trailing (component) axis stays unsplit, so a
    2-component 2-D field partitions by node boxes."""
    nodes = (10, 12)
    part = box_partition(nodes + (2,), (2, 4))
    assert part.box_shape == (5, 3, 2)
    n = np.prod(nodes) * 2
    rng = np.random.default_rng(3)
    # block-diagonal per-component Poisson-like coupling + component mixing
    S1, _ = _poisson_csr((nodes[0] - 1, nodes[1] - 1))
    # interleave components: A acts identically on both components
    Sk = sp.kron(S1, sp.eye(2), format="csr")
    A = shard_csr_nd(Sk, part, mesh24, identity_pad=True)
    x = rng.normal(size=n)
    xd = shard_vector_nd(x, part, mesh24)
    np.testing.assert_allclose(
        unshard_vector_nd(jax.jit(A.matvec)(xd), part, n), Sk @ x, rtol=1e-12
    )


def test_redistribute_vector_between_device_counts(mesh24):
    """RedistributionOperator analog (reference redistribute! /
    DistributedGridTransferOperators' redist stage): a box-ordered sharded
    vector moves onto a DIFFERENT box partition over a DIFFERENT device
    mesh — here 8 devices (2,4) -> 4 devices (2,2) and back — with the
    global content preserved exactly and a sharded matvec running on the
    target layout."""
    from gridapsolvers_tpu.parallel.dist_ell_nd import redistribute_vector_nd

    nodes = (14, 19)
    n = int(np.prod(nodes))
    rng = np.random.default_rng(11)
    x = rng.normal(size=n)

    part8 = box_partition(nodes, (2, 4))
    mesh22 = device_mesh_nd((2, 2))
    part4 = box_partition(nodes, (2, 2))

    xd8 = shard_vector_nd(x, part8, mesh24)
    xd4 = redistribute_vector_nd(xd8, part8, part4, mesh22)
    np.testing.assert_allclose(unshard_vector_nd(xd4, part4, n), x, rtol=0)

    # the redistributed vector is live on the target layout: sharded SpMV
    S, _ = _poisson_csr((nodes[0] - 1, nodes[1] - 1))
    A4 = shard_csr_nd(S, part4, mesh22, identity_pad=True)
    np.testing.assert_allclose(
        unshard_vector_nd(jax.jit(A4.matvec)(xd4), part4, n),
        S @ x,
        rtol=1e-12,
    )

    # round-trip back up to 8 devices (growing the communicator)
    xd8b = redistribute_vector_nd(xd4, part4, part8, mesh24)
    np.testing.assert_allclose(unshard_vector_nd(xd8b, part8, n), x, rtol=0)
