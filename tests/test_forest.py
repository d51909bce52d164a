"""Scattered-marking (multi-patch forest) AMR — the per-cell-granularity
counterpart of the reference's p4est estimate/mark/adapt loop
(GridapP4estExt.jl:25-39): two disconnected features must each get their
own refined patch, and the composite forest operator must keep the
single-box version's exactness properties (symmetry, monotone energy
error, near-uniform-fine accuracy at a fraction of the dofs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gridapsolvers_tpu.fem.assembly import laplacian
from gridapsolvers_tpu.fem.mesh import CartesianMesh
from gridapsolvers_tpu.multilevel.forest import (
    adaptive_solve_scattered,
    forest_hierarchy,
    forest_on_finest,
    forest_solve,
    forest_composite_system,
    mark_boxes,
)
from gridapsolvers_tpu.utils import pytrees as pt

# two sharp Gaussian bumps in opposite corners
C = 200.0
B1, B2 = (0.25, 0.25), (0.75, 0.75)


def u_ex(p):
    r1 = (p[:, 0] - B1[0]) ** 2 + (p[:, 1] - B1[1]) ** 2
    r2 = (p[:, 0] - B2[0]) ** 2 + (p[:, 1] - B2[1]) ** 2
    return np.exp(-C * r1) + np.exp(-C * r2)


def f_rhs(p):
    out = 0.0
    for b in (B1, B2):
        r2 = (p[:, 0] - b[0]) ** 2 + (p[:, 1] - b[1]) ** 2
        out = out + (4 * C - 4 * C * C * r2) * np.exp(-C * r2)
    return out


BASE = CartesianMesh((16, 16), (0, 1, 0, 1))
FRAME = BASE.refine(2)  # 32^2 evaluation frame (one refinement round)
A_FRAME = laplacian(FRAME)
UEX_FRAME = u_ex(FRAME.vertex_coords())


def _energy_err(field):
    e = jnp.asarray(np.asarray(field).reshape(-1) - UEX_FRAME)
    return float(jnp.vdot(e, A_FRAME.matvec(e)))


def test_mark_boxes_separates_features():
    from gridapsolvers_tpu.multilevel.adaptive import estimate_cells

    u = jnp.asarray(u_ex(BASE.vertex_coords()))
    est = estimate_cells(u, BASE)
    boxes = mark_boxes(np.asarray(est), theta=0.25)
    assert len(boxes) == 2, boxes
    # one box around each bump (bumps at cells ~(4,4) and ~(12,12))
    centers = sorted(
        tuple((a + b) / 2 for a, b in zip(lo, hi)) for lo, hi in boxes
    )
    assert abs(centers[0][0] - 4) <= 2 and abs(centers[1][0] - 12) <= 2
    # disjoint with a gap
    (lo1, hi1), (lo2, hi2) = sorted(boxes)
    assert all(h <= l for h, l in zip(hi1, lo2)) or all(
        h <= l for h, l in zip(hi2, lo1)
    )


def test_forest_composite_symmetric():
    hier = forest_hierarchy(BASE).refine(
        [[((2, 2), (8, 8)), ((10, 10), (14, 14))]]
    )
    op, b = forest_composite_system(hier, f_rhs)
    key = jax.random.PRNGKey(0)
    xs, ys = [], []
    # symmetric on the invariant subspace (pinned entries zero) — the
    # subspace CG lives in (rhs masked, iteration preserves it)
    for k, s in enumerate(op.shapes):
        k1, k2, key = jax.random.split(key, 3)
        n = int(np.prod(s))
        xs.append(jax.random.normal(k1, (n,)) * op.active[k].reshape(-1))
        ys.append(jax.random.normal(k2, (n,)) * op.active[k].reshape(-1))
    x, y = tuple(xs), tuple(ys)
    lhs = pt.dot(op.matvec(x), y)
    rhs = pt.dot(x, op.matvec(y))
    assert abs(lhs - rhs) < 1e-8 * (abs(lhs) + 1)


def test_scattered_amr_two_bumps():
    """The driver refines BOTH bumps (two patches on the refined level)
    and reaches near-uniform-fine energy error at well under the uniform
    dof count."""
    hier, us = adaptive_solve_scattered(
        BASE, f_rhs, num_rounds=1, theta=0.25
    )
    assert hier.num_levels == 2
    assert len(hier.levels[1]) == 2, [
        (p.lo, p.hi) for p in hier.levels[1]
    ]
    field, mesh = forest_on_finest(hier, us)
    err_amr = _energy_err(field)

    # uniform-fine reference solve on the 32^2 frame
    from gridapsolvers_tpu.multilevel.adaptive import composite_solve
    from gridapsolvers_tpu.multilevel.adaptive import adaptive_hierarchy

    us_unif, _ = composite_solve(adaptive_hierarchy(FRAME), f_rhs)
    err_unif = _energy_err(us_unif[0])

    # coarse-only solve for scale
    us_coarse, _ = composite_solve(adaptive_hierarchy(BASE), f_rhs)
    coarse_field = np.asarray(
        jnp.asarray(
            __import__(
                "gridapsolvers_tpu.multilevel.transfer",
                fromlist=["prolong_slices"],
            ).prolong_slices(
                us_coarse[0].reshape(BASE.vertex_shape)
            )
        )
    )
    err_coarse = _energy_err(coarse_field)

    amr_dofs = sum(int(np.prod(s)) for s in
                   [p.mesh.vertex_shape for lv in hier.levels for p in lv])
    unif_dofs = int(np.prod(FRAME.vertex_shape))
    # AMR must close most of the coarse->uniform gap at fewer dofs
    assert err_amr < 0.35 * err_coarse, (err_amr, err_coarse, err_unif)
    assert amr_dofs < 0.85 * unif_dofs, (amr_dofs, unif_dofs)


def test_forest_fac_preconditioner():
    """FAC-style block preconditioner (per-patch GMG on each patch's own
    uniform grid — the multigrid treatment the reference gets from GMG
    over p4est hierarchies): substantially fewer CG iterations than
    point-Jacobi on the composite system, same solution."""
    hier = forest_hierarchy(BASE).refine(
        [[((2, 2), (8, 8)), ((10, 10), (14, 14))]]
    )
    us_j, s_j = forest_solve(hier, f_rhs, rtol=1e-8, gmg_base=False)
    us_f, s_f = forest_solve(hier, f_rhs, rtol=1e-8, gmg_base=True)
    assert int(s_f.niter) <= 0.7 * int(s_j.niter), (
        int(s_f.niter), int(s_j.niter),
    )
    for a, b in zip(us_j, us_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )


def test_scattered_amr_3d():
    """The forest machinery is dimension-general: 3D scattered marking
    with two disconnected features -> two refined patches, and the
    composite solve reduces the energy error vs the coarse-only solve."""
    C3 = 300.0
    P1, P2 = (0.25, 0.25, 0.25), (0.75, 0.75, 0.75)

    def u3(p):
        out = 0.0
        for c in (P1, P2):
            r2 = sum((p[:, d] - c[d]) ** 2 for d in range(3))
            out = out + np.exp(-C3 * r2)
        return out

    def f3(p):
        out = 0.0
        for c in (P1, P2):
            r2 = sum((p[:, d] - c[d]) ** 2 for d in range(3))
            out = out + (6 * C3 - 4 * C3 * C3 * r2) * np.exp(-C3 * r2)
        return out

    base = CartesianMesh((12, 12, 12), (0, 1, 0, 1, 0, 1))
    hier, us = adaptive_solve_scattered(base, f3, num_rounds=1, theta=0.3)
    assert hier.num_levels == 2
    assert len(hier.levels[1]) == 2, [
        (p.lo, p.hi) for p in hier.levels[1]
    ]
    field, mesh = forest_on_finest(hier, us)
    A3 = laplacian(mesh)
    e = jnp.asarray(np.asarray(field).reshape(-1) - u3(mesh.vertex_coords()))
    err_amr = float(jnp.vdot(e, A3.matvec(e)))

    from gridapsolvers_tpu.multilevel.adaptive import (
        adaptive_hierarchy,
        composite_solve,
    )
    from gridapsolvers_tpu.multilevel.transfer import prolong_slices

    us_c, _ = composite_solve(adaptive_hierarchy(base), f3)
    cf = prolong_slices(us_c[0].reshape(base.vertex_shape))
    ec = jnp.asarray(np.asarray(cf).reshape(-1) - u3(mesh.vertex_coords()))
    err_coarse = float(jnp.vdot(ec, A3.matvec(ec)))
    assert err_amr < 0.5 * err_coarse, (err_amr, err_coarse)


# ------------------------------------------------------- seam constraints


def test_seam_union_box_equivalence():
    """Two face-adjacent sibling boxes whose union is a box span EXACTLY
    the same composite fine space as the single merged box: the seam-glued
    solve must reproduce the merged-box solve (same fine field)."""
    hier2 = forest_hierarchy(BASE).refine(
        [[((2, 2), (8, 8)), ((8, 2), (12, 8))]]  # touching at x-cell 8
    )
    hier1 = forest_hierarchy(BASE).refine([[((2, 2), (12, 8))]])
    us2, s2 = forest_solve(hier2, f_rhs, rtol=1e-12)
    us1, s1 = forest_solve(hier1, f_rhs, rtol=1e-12)
    f2, _ = forest_on_finest(hier2, us2)
    f1, _ = forest_on_finest(hier1, us1)
    np.testing.assert_allclose(
        np.asarray(f2), np.asarray(f1), atol=1e-8
    )


def test_seam_operator_symmetric():
    """The glued composite operator stays symmetric on the invariant
    subspace, including with PARTIAL face overlap (rim stays hanging)."""
    from gridapsolvers_tpu.multilevel.forest import forest_composite_system

    hier = forest_hierarchy(BASE).refine(
        [[((2, 2), (8, 8)), ((8, 4), (12, 10))]]  # partial-overlap seam
    )
    op, b = forest_composite_system(hier, f_rhs)
    assert len(op.seams) == 1, op.seams
    key = jax.random.PRNGKey(3)
    xs, ys = [], []
    for k, s in enumerate(op.shapes):
        k1, k2, key = jax.random.split(key, 3)
        n = int(np.prod(s))
        xs.append(jax.random.normal(k1, (n,)) * op.active[k].reshape(-1))
        ys.append(jax.random.normal(k2, (n,)) * op.active[k].reshape(-1))
    x, y = tuple(xs), tuple(ys)
    lhs = pt.dot(op.matvec(x), y)
    rhs = pt.dot(x, op.matvec(y))
    assert abs(lhs - rhs) < 1e-8 * (abs(lhs) + 1)
    # diag matches the matvec diagonal EXACTLY at owner seam dofs (the
    # slave-side add); parent dofs under child rings keep the library's
    # Jacobi-grade injection approximation
    d = op.diag()
    ob = op.seams[0][2]
    own_sl = tuple(slice(a, b) for a, b in ob)
    k_own = op.seams[0][0]
    shape = op.shapes[k_own]
    mid = tuple((a + b) // 2 for a, b in ob)
    i = int(np.ravel_multi_index(mid, shape))
    e = tuple(
        jnp.zeros(int(np.prod(s))).at[i].set(1.0) if kk == k_own
        else jnp.zeros(int(np.prod(s)))
        for kk, s in enumerate(op.shapes)
    )
    np.testing.assert_allclose(
        float(op.matvec(e)[k_own][i]), float(d[k_own][i]), rtol=1e-10
    )


def test_seam_partial_overlap_solves():
    """Partial-overlap seam: the glued solve reduces the energy error of
    the region like the merged bounding box does (conforming + exact)."""
    hier = forest_hierarchy(BASE).refine(
        [[((2, 2), (8, 8)), ((8, 2), (12, 6))]]
    )
    us, stats = forest_solve(hier, f_rhs, rtol=1e-11)
    field, _ = forest_on_finest(hier, us)
    err = _energy_err(field)
    from gridapsolvers_tpu.multilevel.adaptive import (
        adaptive_hierarchy,
        composite_solve,
    )
    from gridapsolvers_tpu.multilevel.transfer import prolong_slices

    us_c, _ = composite_solve(adaptive_hierarchy(BASE), f_rhs)
    cf = prolong_slices(us_c[0].reshape(BASE.vertex_shape))
    err_c = _energy_err(cf)
    assert err < err_c, (err, err_c)


def test_seam_t_junction_rejected():
    """Three boxes meeting at a T cover a seam-rim parent vertex: the
    composite construction must detect and reject it."""
    from gridapsolvers_tpu.multilevel.forest import forest_composite_system

    hier = forest_hierarchy(BASE).refine(
        [[((2, 2), (8, 10)), ((8, 2), (14, 6)), ((8, 6), (14, 10))]]
    )
    with pytest.raises(ValueError, match="rim"):
        forest_composite_system(hier, f_rhs)


def test_seam_3d_union_box_equivalence():
    """Dimension-general seams: 3-D face-adjacent boxes == merged box."""
    base = CartesianMesh((8, 8, 8), (0, 1, 0, 1, 0, 1))

    def f3(p):
        return np.ones(p.shape[0])

    hier2 = forest_hierarchy(base).refine(
        [[((2, 2, 2), (4, 6, 6)), ((4, 2, 2), (6, 6, 6))]]
    )
    hier1 = forest_hierarchy(base).refine([[((2, 2, 2), (6, 6, 6))]])
    us2, _ = forest_solve(hier2, f3, rtol=1e-12)
    us1, _ = forest_solve(hier1, f3, rtol=1e-12)
    f2_, _ = forest_on_finest(hier2, us2)
    f1_, _ = forest_on_finest(hier1, us1)
    np.testing.assert_allclose(
        np.asarray(f2_), np.asarray(f1_), atol=1e-8
    )


def test_repair_junctions_merges_t():
    """gap=0 clustering support: a T of three touching boxes merges down
    to a seam-safe configuration that the composite system accepts."""
    from gridapsolvers_tpu.multilevel.forest import (
        forest_composite_system,
        repair_junctions,
    )

    t_boxes = [((2, 2), (8, 10)), ((8, 2), (14, 6)), ((8, 6), (14, 10))]
    fixed = repair_junctions(t_boxes, BASE.ncells)
    assert len(fixed) < 3
    hier = forest_hierarchy(BASE).refine([fixed])
    op, b = forest_composite_system(hier, f_rhs)  # must not raise
    # separated boxes pass through untouched
    sep = [((2, 2), (6, 6)), ((10, 10), (14, 14))]
    assert repair_junctions(sep, BASE.ncells) == sep
    # a simple touching pair (no T) also passes through
    pair = [((2, 2), (8, 10)), ((8, 2), (14, 10))]
    assert repair_junctions(pair, BASE.ncells) == pair


def test_distributed_forest_composite_matches_serial():
    """Scattered-forest AMR rides the general distribution stack: the
    two-patch forest composite operator materializes exactly (pinned
    rows identity) and its sharded Jacobi-CG over the 8-device mesh
    matches the serial solve (iterations + solution)."""
    import scipy.sparse as sp
    from jax.flatten_util import ravel_pytree

    from gridapsolvers_tpu.linear import CGSolver, JacobiSolver
    from gridapsolvers_tpu.parallel import device_mesh_nd
    from gridapsolvers_tpu.parallel.dist_ell_nd import (
        box_partition,
        shard_csr_nd,
        shard_vector_nd,
        unshard_vector_nd,
    )

    hier = forest_hierarchy(CartesianMesh((12, 12), (0, 1, 0, 1))).refine(
        [[((2, 2), (6, 6)), ((8, 8), (11, 11))]]
    )
    op, b = forest_composite_system(hier, f_rhs)

    bf, unflat = ravel_pytree(b)
    n = int(bf.size)
    dense = jax.vmap(
        lambda e: ravel_pytree(op.matvec(unflat(e)))[0]
    )(jnp.eye(n, dtype=bf.dtype))
    A = sp.csr_matrix(np.asarray(dense).T)

    solver = CGSolver(Pl=JacobiSolver(), rtol=1e-10, maxiter=600)
    xs, stats_s = solver.solve(solver.setup(op), b)
    xs_flat = np.asarray(ravel_pytree(xs)[0])

    mesh = device_mesh_nd((8,))
    part = box_partition((n,), (8,))
    Ad = shard_csr_nd(A, part, mesh, identity_pad=True)
    bd = shard_vector_nd(np.asarray(bf), part, mesh)
    xd, stats_d = jax.jit(solver.solve)(solver.setup(Ad), bd)
    assert abs(int(stats_s.niter) - int(stats_d.niter)) <= 1
    np.testing.assert_allclose(
        unshard_vector_nd(xd, part, n), xs_flat, atol=1e-8
    )
