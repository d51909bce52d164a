"""AMR efficiency on a (near-)singular source: box-clustered marking vs
uniform refinement (VERDICT r03 missing #3 / next #8b).

The reference refines arbitrary per-cell marked sets via p4est
(GridapP4estExt.jl:25-39); this repo clusters marks into boxes. This test
quantifies the box-granularity penalty on a problem where refinement
should stay LOCAL — a sharply peaked source whose features are ~1 fine
cell wide — by measuring (a) dofs vs energy error against uniform
refinement and (b) refined-cell overshoot vs the raw marked-cell set.
"""
import numpy as np

import jax.numpy as jnp

from gridapsolvers_tpu.fem.assembly import laplacian
from gridapsolvers_tpu.fem.mesh import CartesianMesh
from gridapsolvers_tpu.multilevel.adaptive import (
    adaptive_hierarchy,
    composite_solve,
    estimate_cells,
)
from gridapsolvers_tpu.multilevel.forest import (
    adaptive_solve_scattered,
    forest_hierarchy,
    forest_on_finest,
    forest_solve,
    mark_boxes,
)

# one sharply peaked bump: width ~1/sqrt(2C) ~ 0.016 — a single cell at
# the 64^2 target resolution, subgrid at the 16^2 base
C = 2000.0
B = (0.3125, 0.3125)  # on a base-grid vertex so the peak is representable


def u_ex(p):
    r2 = (p[:, 0] - B[0]) ** 2 + (p[:, 1] - B[1]) ** 2
    return np.exp(-C * r2)


def f_rhs(p):
    r2 = (p[:, 0] - B[0]) ** 2 + (p[:, 1] - B[1]) ** 2
    return (4 * C - 4 * C * C * r2) * np.exp(-C * r2)


BASE = CartesianMesh((16, 16), (0, 1, 0, 1))
FRAME = BASE.refine(2).refine(2)  # 64^2 evaluation frame
A_FRAME = laplacian(FRAME)
UEX = u_ex(FRAME.vertex_coords())


def _energy_err(field):
    e = jnp.asarray(np.asarray(field).reshape(-1) - UEX)
    return float(jnp.vdot(e, A_FRAME.matvec(e)))


def _dofs(hier):
    return sum(
        int(np.prod(p.mesh.vertex_shape)) for lv in hier.levels for p in lv
    )


def test_singular_source_amr_vs_uniform():
    """Two AMR rounds reach near-uniform-64^2 energy error at a fraction
    of the uniform dof count."""
    hier, us = adaptive_solve_scattered(
        BASE, f_rhs, num_rounds=2, theta=0.2
    )
    assert hier.num_levels == 3  # both rounds refined
    field, _ = forest_on_finest(hier, us)
    err_amr = _energy_err(field)

    us64, _ = composite_solve(adaptive_hierarchy(FRAME), f_rhs)
    err_unif64 = _energy_err(us64[0])

    from gridapsolvers_tpu.multilevel.transfer import prolong_slices

    us32, _ = composite_solve(adaptive_hierarchy(BASE.refine(2)), f_rhs)
    err_unif32 = _energy_err(
        prolong_slices(us32[0].reshape(BASE.refine(2).vertex_shape))
    )

    amr_dofs = _dofs(hier)
    unif_dofs = int(np.prod(FRAME.vertex_shape))
    # AMR at <40% of the uniform-64 dofs must beat uniform-32 and land
    # within 2x of the uniform-64 energy error (the peak dominates the
    # error, and the peak region IS refined to 64^2 resolution)
    assert amr_dofs < 0.40 * unif_dofs, (amr_dofs, unif_dofs)
    assert err_amr < 0.8 * err_unif32, (err_amr, err_unif32, err_unif64)
    assert err_amr < 2.0 * err_unif64, (err_amr, err_unif64)
    print(
        f"\nAMR dofs {amr_dofs} vs uniform {unif_dofs} "
        f"({amr_dofs/unif_dofs*100:.0f}%), energy err: amr {err_amr:.3e} "
        f"unif64 {err_unif64:.3e} unif32 {err_unif32:.3e}"
    )


def test_box_granularity_penalty():
    """Quantify the box-clustering overshoot vs per-cell marking: refined
    cells inside the clustered boxes / cells the estimator actually
    marked. The reference's per-cell octree refines exactly the marked
    set (penalty 1.0); box clustering pays a bounded constant on a
    compact singular feature."""
    hier = forest_hierarchy(BASE)
    us, _ = forest_solve(hier, f_rhs)
    est = np.asarray(
        estimate_cells(us[0].reshape(-1), BASE)
    )
    cut = 0.2 * est.max()
    marked = int((est >= cut).sum())
    boxes = mark_boxes(est, thresh=cut, max_boxes=8)
    box_cells = sum(
        int(np.prod([h - l for l, h in zip(lo, hi)])) for lo, hi in boxes
    )
    penalty = box_cells / max(marked, 1)
    print(f"\nmarked {marked} cells -> boxes cover {box_cells} "
          f"(penalty {penalty:.2f}x)")
    # compact feature: clustering must stay within a small constant of
    # per-cell marking (p4est equivalent = 1.0)
    assert penalty <= 4.0, (marked, box_cells, boxes)
