"""Periodic Q_k (k>=2) nodal assembly + GMG.

The reference supports `isperiodic` with any reffe
(src/MultilevelTools/ModelHierarchies.jl:85-87); round 2 rejected periodic
meshes in the Q_k layer (commit 81ac767), round 3 lifts that: the node grid
drops the duplicate endpoint on periodic axes and the connectivity wraps.

Correctness oracle: assembling on the periodic mesh must equal assembling
non-periodically and FOLDING the endpoint nodes onto the start nodes
(dof identification sums rows/columns) — exact to roundoff.
"""
import numpy as np
import scipy.sparse as sp

from gridapsolvers_tpu.fem import assembly2 as asm
from gridapsolvers_tpu.fem.mesh import CartesianMesh
from gridapsolvers_tpu.linear import CGSolver, ChebyshevSmoother
from gridapsolvers_tpu.linear.gmg import GMGSolver
from gridapsolvers_tpu.multilevel import (
    cartesian_hierarchy,
    fe_space_hierarchy,
)


def _fold_matrix(mesh_np, mesh_per, order):
    """(n_per, n_nonper) 0/1 map identifying non-periodic endpoint nodes
    with their periodic images (flat C-order on both grids)."""
    shape_np = asm.node_grid_shape(mesh_np, order)
    shape_per = asm.node_grid_shape(mesh_per, order)
    grids = np.meshgrid(
        *[np.arange(n) for n in shape_np], indexing="ij"
    )
    folded = [
        g % s if p else g
        for g, s, p in zip(grids, shape_per, mesh_per.periodic)
    ]
    strides = np.cumprod([1] + list(shape_per[::-1]))[:-1][::-1]
    tgt = sum(f.reshape(-1) * s for f, s in zip(folded, strides))
    n_np = int(np.prod(shape_np))
    n_per = int(np.prod(shape_per))
    return sp.coo_matrix(
        (np.ones(n_np), (tgt, np.arange(n_np))), shape=(n_per, n_np)
    ).tocsr()


def test_periodic_q2_assembly_matches_folded():
    for kind in ("stiffness", "mass"):
        for order in (2, 3):
            mesh_np = CartesianMesh((4, 3), (0.0, 1.0, 0.0, 2.0))
            mesh_per = CartesianMesh(
                (4, 3), (0.0, 1.0, 0.0, 2.0), periodic=(True, False)
            )
            A_np = asm.assemble_bilinear(mesh_np, order, kind)
            A_per = asm.assemble_bilinear(mesh_per, order, kind)
            F = _fold_matrix(mesh_np, mesh_per, order)
            np.testing.assert_allclose(
                A_per.toarray(), (F @ A_np @ F.T).toarray(), atol=1e-12
            )


def test_periodic_q2_both_axes_constant_nullspace():
    mesh = CartesianMesh(
        (4, 4), (0.0, 1.0, 0.0, 1.0), periodic=(True, True)
    )
    A = asm.assemble_bilinear(mesh, 2, "stiffness")
    assert A.shape == (64, 64)  # 8x8 wrapped node grid
    np.testing.assert_allclose(A @ np.ones(64), 0.0, atol=1e-12)
    # symmetric
    np.testing.assert_allclose((A - A.T).toarray(), 0.0, atol=1e-13)


def test_periodic_boundary_mask_skips_periodic_axis():
    mesh = CartesianMesh(
        (4, 4), (0.0, 1.0, 0.0, 1.0), periodic=(True, False)
    )
    m = asm.boundary_node_mask(mesh, 2).reshape((8, 9))
    assert not m[0, 1:-1].any() and not m[-1, 1:-1].any()
    assert m[:, 0].all() and m[:, -1].all()


def test_periodic_q2_gmg():
    """Periodic-x Q2 Poisson GMG: Dirichlet on the y walls pins the
    constant; GMG-CG must converge mesh-independently and match the
    direct solve (the reference's isperiodic + order-2 configuration)."""
    h = cartesian_hierarchy((16, 16), 3, periodic=(True, False))
    sh = fe_space_hierarchy(h, order=2, dirichlet="boundary")
    mats = sh.compute_matrices("stiffness")
    P, R = sh.transfer_operators()
    gmg = GMGSolver(
        coarse_ops=tuple(mats[1:]),
        prolongations=tuple(P),
        restrictions=tuple(R),
        smoother=ChebyshevSmoother(degree=3),
    )
    solver = CGSolver(Pl=gmg, rtol=1e-8, maxiter=40)
    st = solver.setup(mats[0])

    # manufactured periodic rhs restricted to free dofs
    s0 = sh[0]
    xy = s0.node_coords()
    free = np.asarray(s0.free_mask(np.float64))
    b = (
        np.sin(2 * np.pi * xy[:, 0]) * np.sin(np.pi * xy[:, 1]) * free
    )
    import jax.numpy as jnp

    x, stats = solver.solve(st, jnp.asarray(b))
    assert stats.converged()
    assert int(stats.niter) <= 25

    from gridapsolvers_tpu.algebra.convert import to_scipy

    A = to_scipy(mats[0]).tocsr()
    x_ref = sp.linalg.spsolve(A.tocsc(), b)
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-6)


def test_periodic_q2_vector_laplace_gmg():
    """Vector Laplacian (2 components) on a periodic-x mesh through the
    fieldwise machinery — the VERDICT round-3 target configuration."""
    import jax.numpy as jnp

    from gridapsolvers_tpu.algebra.block import FieldwiseOperator
    from gridapsolvers_tpu.multilevel.multifield import MultiFieldTransfer

    h = cartesian_hierarchy((16, 16), 2, periodic=(True, False))
    sh = fe_space_hierarchy(h, order=2, dirichlet="boundary")
    mats = sh.compute_matrices("stiffness")
    P, R = sh.transfer_operators()
    vec = lambda op: FieldwiseOperator(ops=(op, op))
    gmg = GMGSolver(
        coarse_ops=tuple(vec(m) for m in mats[1:]),
        prolongations=tuple(MultiFieldTransfer((p, p)) for p in P),
        restrictions=tuple(MultiFieldTransfer((r, r)) for r in R),
        smoother=ChebyshevSmoother(degree=3),
    )
    solver = CGSolver(Pl=gmg, rtol=1e-8, maxiter=40)
    A0 = vec(mats[0])
    st = solver.setup(A0)
    s0 = sh[0]
    xy = s0.node_coords()
    free = np.asarray(s0.free_mask(np.float64))
    b0 = np.cos(2 * np.pi * xy[:, 0]) * np.sin(np.pi * xy[:, 1]) * free
    b1 = np.sin(4 * np.pi * xy[:, 0]) * xy[:, 1] * (1 - xy[:, 1]) * free
    b = (jnp.asarray(b0), jnp.asarray(b1))
    x, stats = solver.solve(st, b)
    assert stats.converged()
    assert int(stats.niter) <= 25
