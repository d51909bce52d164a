"""Sorted-slot Pallas ELL SpMV kernel (interpret mode on CPU; the
compiled path is exercised and measured by bench.py on the real chip)."""
import numpy as np
import pytest

import jax.numpy as jnp

from gridapsolvers_tpu.algebra.ell import ell_from_scipy
from gridapsolvers_tpu.ops.ell_pallas import pallas_ell, pallas_rect


def _q2_stiffness(nc):
    from gridapsolvers_tpu.fem import assembly2 as asm
    from gridapsolvers_tpu.fem.mesh import CartesianMesh

    mesh = CartesianMesh((nc, nc), (0.0, 1.0, 0.0, 1.0))
    mask = asm.boundary_node_mask(mesh, 2)
    return asm.dirichlet_square(
        asm.assemble_bilinear(mesh, 2, "stiffness"), mask
    )


def test_pallas_ell_matches_scipy_q2():
    S = _q2_stiffness(12)
    A = ell_from_scipy(S, dtype=np.float64)
    P = pallas_ell(A, q=1, interpret=True)
    x = np.random.default_rng(0).normal(size=S.shape[0])
    np.testing.assert_allclose(
        np.asarray(P.matvec(jnp.asarray(x))), S @ x, rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(P.diag()), S.diagonal(), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(P.abs_row_sum()),
        np.abs(S).sum(axis=1).A1
        if hasattr(np.abs(S).sum(axis=1), "A1")
        else np.asarray(np.abs(S).sum(axis=1)).ravel(),
        rtol=1e-12,
    )


def test_pallas_ell_random_banded():
    rng = np.random.default_rng(1)
    import scipy.sparse as sp

    n = 2500
    rows, cols, vals = [], [], []
    for r in range(n):
        cs = np.unique(np.clip(r + rng.integers(-300, 300, 7), 0, n - 1))
        rows += [r] * len(cs)
        cols += list(cs)
        vals += list(rng.normal(size=len(cs)))
    S = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A = ell_from_scipy(S)
    P = pallas_ell(A, q=2, interpret=True)
    x = rng.normal(size=n)
    np.testing.assert_allclose(
        np.asarray(P.matvec(jnp.asarray(x))), S @ x, rtol=1e-11, atol=1e-11
    )


def test_pallas_ell_arrow_accepted_by_tile_anchors():
    """An arrow matrix (last column dense) drifts O(n) globally but only
    O(tile) within each 1024-row tile — the per-(tile, slot) anchors
    keep the static span small, so the kernel accepts it and is exact."""
    import scipy.sparse as sp

    n = 4096
    S = (
        sp.eye(n, format="csr")
        + sp.coo_matrix(
            (np.ones(n), (np.arange(n), np.full(n, n - 1))), shape=(n, n)
        ).tocsr()
    )
    A = ell_from_scipy(S, dtype=np.float64)
    P = pallas_ell(A, q=1, interpret=True)
    x = np.random.default_rng(3).normal(size=n)
    np.testing.assert_allclose(
        np.asarray(P.matvec(jnp.asarray(x))), S @ x, rtol=1e-12, atol=1e-12
    )


def test_pallas_ell_rejects_unstructured_scatter():
    """Random far columns spread WITHIN each tile too — no anchoring
    helps, so the build must reject (callers fall back to XLA ELL)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(4)
    n = 4096
    S = (
        sp.eye(n, format="csr")
        + sp.coo_matrix(
            (
                np.ones(n),
                (np.arange(n), rng.permutation(n)),
            ),
            shape=(n, n),
        ).tocsr()
    )
    A = ell_from_scipy(S)
    with pytest.raises(ValueError):
        pallas_ell(A, q=1, interpret=True)


def test_pallas_ell_as_smoother_operator():
    """Drops into the Richardson-Jacobi smoother as a level operator
    (diag + matvec contract)."""
    from gridapsolvers_tpu.linear import CGSolver, JacobiSolver
    from gridapsolvers_tpu.linear.smoothers import RichardsonSmoother

    S = _q2_stiffness(10)
    A = ell_from_scipy(S, dtype=np.float64)
    P = pallas_ell(A, q=1, interpret=True)
    b = np.random.default_rng(2).normal(size=S.shape[0])
    solver = CGSolver(
        Pl=RichardsonSmoother(JacobiSolver(), 2, 0.67),
        rtol=1e-10,
        maxiter=500,
    )
    st = solver.setup(P)
    x, stats = solver.solve(st, jnp.asarray(b))
    r = b - S @ np.asarray(x)
    assert np.linalg.norm(r) < 1e-8 * np.linalg.norm(b)


def _aggregate_pair(nf, nc, seed):
    """Prolongation-like sparse (nf, nc) matrix with col ~ row*nc/nf
    (the AMG smoothed-aggregation shape, non-integer ratio allowed)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    agg = np.minimum((np.arange(nf) * nc) // nf, nc - 1)
    rows, cols, vals = [], [], []
    for r in range(nf):
        cs = np.unique(np.clip(agg[r] + rng.integers(-2, 3, 3), 0, nc - 1))
        rows += [r] * len(cs)
        cols += list(cs)
        vals += list(rng.normal(size=len(cs)))
    P = sp.coo_matrix((vals, (rows, cols)), shape=(nf, nc)).tocsr()
    return P, P.T.tocsr()


@pytest.mark.parametrize("nf,nc", [(4400, 1100), (9000, 1054)])
def test_pallas_rect_prolongation_and_restriction(nf, nc):
    """Rectangular transfers ride the kernel via structured x remaps:
    repeat-x for prolongation (col ~ row/rho), residue-aligned slots +
    transpose-reshape-x for restriction (col ~ rho*row). Integer and
    non-integer coarsening ratios."""
    P, R = _aggregate_pair(nf, nc, seed=nf)
    rng = np.random.default_rng(7)
    KP = pallas_rect(ell_from_scipy(P, dtype=np.float64), q=1, interpret=True)
    assert KP.mode == "expand" and KP.shape == P.shape
    xc = rng.normal(size=nc)
    np.testing.assert_allclose(
        np.asarray(KP.matvec(jnp.asarray(xc))), P @ xc,
        rtol=1e-12, atol=1e-12,
    )
    KR = pallas_rect(ell_from_scipy(R, dtype=np.float64), q=1, interpret=True)
    assert KR.mode == "fold" and KR.shape == R.shape
    xf = rng.normal(size=nf)
    np.testing.assert_allclose(
        np.asarray(KR.matvec(jnp.asarray(xf))), R @ xf,
        rtol=1e-12, atol=1e-12,
    )
    # spans stay tiny: the whole point of the remap
    assert sum(KP.inner.bspans) <= 3 * KP.inner.K
    assert sum(KR.inner.bspans) <= 3 * KR.inner.K


def test_pallas_rect_square_passthrough():
    S = _q2_stiffness(8)
    A = ell_from_scipy(S, dtype=np.float64)
    K = pallas_rect(A, q=1, interpret=True)
    from gridapsolvers_tpu.ops.ell_pallas import PallasELL

    assert isinstance(K, PallasELL)
