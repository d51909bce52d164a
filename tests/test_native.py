"""Native (C++) host-kernel tests: build succeeds and results match the
NumPy fallbacks."""
import numpy as np
import pytest

from gridapsolvers_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of solvercore.so failed"


def test_greedy_color_valid():
    """Coloring is valid on symmetric adjacency (FEM sparsity is always
    symmetric; greedy coloring relies on it)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    n = 200
    S = sp.random(n, n, density=0.03, random_state=0, format="csr")
    S = (S + S.T + sp.identity(n)).tocsr()
    K = int(np.diff(S.indptr).max())
    cols = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, K))
    for i in range(n):
        cs = S.indices[S.indptr[i] : S.indptr[i + 1]]
        cols[i, : len(cs)] = cs
    colors = native.greedy_color(cols)
    assert colors.min() >= 0
    for i in range(n):
        for c in cols[i]:
            if c != i:
                assert colors[c] != colors[i]


def test_union_patches_matches_python():
    import scipy.sparse as sp

    rng = np.random.default_rng(1)
    n = 50
    S = sp.random(n, n, density=0.1, random_state=2, format="csr")
    S = (S + sp.identity(n)).tocsr()
    lo, hi = 10, 30
    table = native.union_patches(S.indptr, S.indices, lo, hi, n)
    for i, p in enumerate(range(lo, hi)):
        expect = np.unique(
            np.concatenate([S.indices[S.indptr[p] : S.indptr[p + 1]], [p]])
        )
        got = table[i][table[i] != n]
        np.testing.assert_array_equal(np.sort(got), expect)


def test_ell_from_sorted_coo_matches():
    rng = np.random.default_rng(3)
    n = 40
    nnz = 300
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.normal(size=nnz)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    v, c = native.ell_from_sorted_coo(n, n, rows, cols, vals)
    import scipy.sparse as sp

    S = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    x = rng.normal(size=n)
    y = (v * x[c]).sum(axis=1)
    np.testing.assert_allclose(y, S @ x, rtol=1e-12)


def test_rcm_reduces_bandwidth():
    import scipy.sparse as sp

    # a ring graph with random numbering has huge bandwidth; RCM restores ~2
    n = 64
    rng = np.random.default_rng(4)
    perm = rng.permutation(n)
    cols = np.stack(
        [perm[(np.argsort(perm) + 1) % n], perm[(np.argsort(perm) - 1) % n]],
        axis=1,
    ).astype(np.int32)
    # adjacency in ELL form: neighbors of node i
    inv = np.argsort(perm)
    adj = np.zeros((n, 2), np.int32)
    for i in range(n):
        k = inv[i]
        adj[i, 0] = perm[(k + 1) % n]
        adj[i, 1] = perm[(k - 1) % n]
    order = native.rcm_order(adj)
    pos = np.argsort(order)
    bw = max(abs(int(pos[i]) - int(pos[j])) for i in range(n) for j in adj[i])
    assert bw <= 3
