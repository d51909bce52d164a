"""Algebraic multigrid (smoothed aggregation) — AMG-lite.

Native replacement for the reference's PETSc GAMG usage (coarse solves in
the scalability study, elasticity AMG — SURVEY.md §2.9, ext/
ElasticitySolvers.jl): when no geometric hierarchy is available, build one
algebraically.

Setup (host, scipy): strength graph -> greedy aggregation -> tentative
piecewise-constant prolongation (optionally with near-nullspace candidate
vectors, the GAMG rigid-body-mode hook) -> Jacobi-smoothed P -> Galerkin
coarse operator P^T A P, recursing until the coarse system is small enough
to invert densely.

Solve (device): standard V-cycle with Jacobi/Chebyshev smoothing; all
level operators and transfers are ELL pytrees, so the whole apply jits
into one program like the geometric GMG.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ..algebra.convert import to_scipy
from ..algebra.ell import ell_from_scipy
from ..interfaces import LinearSolver
from ..utils import pytrees as pt
from .direct import DenseInverseSolver
from .smoothers import ChebyshevSmoother


def _strength_graph(S: sp.csr_matrix, theta: float) -> sp.csr_matrix:
    """Symmetric strength-of-connection: keep |a_ij| >= theta *
    sqrt(|a_ii a_jj|)."""
    d = np.abs(S.diagonal())
    d[d == 0] = 1.0
    C = S.tocoo()
    keep = np.abs(C.data) >= theta * np.sqrt(d[C.row] * d[C.col])
    keep &= C.row != C.col
    return sp.csr_matrix(
        (np.ones(keep.sum()), (C.row[keep], C.col[keep])), shape=S.shape
    )


def _aggregate(C: sp.csr_matrix) -> np.ndarray:
    """Greedy aggregation: pass 1 seeds aggregates from unaggregated nodes
    with fully unaggregated neighborhoods; pass 2 attaches leftovers."""
    n = C.shape[0]
    agg = -np.ones(n, dtype=np.int64)
    na = 0
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = C.indices[C.indptr[i] : C.indptr[i + 1]]
        if np.all(agg[nbrs] < 0):
            agg[i] = na
            agg[nbrs] = na
            na += 1
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = C.indices[C.indptr[i] : C.indptr[i + 1]]
        assigned = nbrs[agg[nbrs] >= 0]
        if len(assigned):
            agg[i] = agg[assigned[0]]
        else:
            agg[i] = na
            na += 1
    return agg


def _tentative_prolongation(
    agg: np.ndarray, candidates: Optional[np.ndarray]
) -> sp.csr_matrix:
    """P0 from aggregates; with k candidate vectors the coarse space gets k
    dofs per aggregate (orthonormalized per aggregate, GAMG-style)."""
    n = len(agg)
    na = int(agg.max()) + 1
    if candidates is None:
        return sp.csr_matrix(
            (np.ones(n), (np.arange(n), agg)), shape=(n, na)
        )
    k = candidates.shape[1]
    rows, cols, vals = [], [], []
    # variable coarse dofs per aggregate (small aggregates can support
    # fewer than k independent candidate restrictions)
    next_col = 0
    for a in range(na):
        idx = np.where(agg == a)[0]
        B = candidates[idx, :]
        Q, R = np.linalg.qr(B)
        # keep only numerically independent columns
        keep = np.abs(np.diagonal(R)) > 1e-10 * max(
            np.abs(np.diagonal(R)).max(), 1e-30
        )
        Q = Q[:, keep]
        for j in range(Q.shape[1]):
            rows.extend(idx)
            cols.extend([next_col] * len(idx))
            vals.extend(Q[:, j])
            next_col += 1
    return sp.csr_matrix((vals, (rows, cols)), shape=(n, next_col))


@dataclasses.dataclass(frozen=True)
class AMGSolver(LinearSolver):
    """Smoothed-aggregation AMG preconditioner/solver."""

    theta: float = 0.08
    omega: float = 0.57  # 4/7-ish Jacobi smoothing weight for P
    max_levels: int = 10
    coarse_size: int = 400
    smoother: object = None
    near_nullspace: Optional[object] = None  # (n, k) candidate vectors
    ncycles: int = 1

    def _build(self, A):
        S = to_scipy(A).tocsr()
        candidates = (
            np.asarray(self.near_nullspace)
            if self.near_nullspace is not None
            else None
        )
        mats_sp: List[sp.csr_matrix] = [S]
        Ps: List[sp.csr_matrix] = []
        while (
            mats_sp[-1].shape[0] > self.coarse_size
            and len(mats_sp) < self.max_levels
        ):
            Ac = mats_sp[-1]
            C = _strength_graph(Ac, self.theta)
            agg = _aggregate(C)
            P0 = _tentative_prolongation(agg, candidates)
            Dinv = sp.diags(1.0 / Ac.diagonal())
            P = (P0 - self.omega * (Dinv @ (Ac @ P0))).tocsr()
            Anew = (P.T @ Ac @ P).tocsr()
            if Anew.shape[0] >= Ac.shape[0]:
                break
            Ps.append(P)
            mats_sp.append(Anew)
            # candidate vectors steer only the finest aggregation (the
            # GAMG near-nullspace hook); coarser levels use constants
            candidates = None
        return mats_sp, Ps

    def setup(self, A, x=None):
        mats_sp, Ps = self._build(A)
        sm = self.smoother or ChebyshevSmoother(degree=3)
        # AMG levels operate on FLAT vectors: the finest operator is the
        # flattened (scipy->ELL) system even when A is a block operator;
        # apply()/solve() flatten/unflatten at the boundary
        mats = [ell_from_scipy(m) for m in mats_sp]
        P_ops = [ell_from_scipy(P) for P in Ps]
        R_ops = [ell_from_scipy(P.T.tocsr()) for P in Ps]
        sm_states = [sm.setup(m) for m in mats[:-1]]
        coarse = DenseInverseSolver()
        coarse_state = coarse.setup(mats[-1])
        return {
            "mats": mats,
            "P": P_ops,
            "R": R_ops,
            "sm": sm_states,
            "coarse": coarse_state,
        }

    def update(self, state, A, x=None):
        return self.setup(A, x)

    def _vcycle(self, state, lev, x, r):
        sm = self.smoother or ChebyshevSmoother(degree=3)
        mats = state["mats"]
        if lev == len(mats) - 1:
            dx = DenseInverseSolver().apply(state["coarse"], r)
            return pt.add(x, dx), pt.sub(r, mats[lev].matvec(dx))
        x, r = sm.smooth(state["sm"][lev], x, r)
        rH = state["R"][lev].matvec(r)
        dxH, _ = self._vcycle(
            state, lev + 1, jnp.zeros_like(rH), rH
        )
        dx = state["P"][lev].matvec(dxH)
        x = pt.add(x, dx)
        r = pt.sub(r, mats[lev].matvec(dx))
        x, r = sm.smooth(state["sm"][lev], x, r)
        return x, r

    @staticmethod
    def _flatten(r):
        from ..utils.pytrees import flatten_concat

        return flatten_concat(r)

    @staticmethod
    def _unflatten(flat, info):
        from ..utils.pytrees import unflatten_like

        return unflatten_like(flat, info)

    def apply(self, state, r):
        flat, info = self._flatten(r)
        x = jnp.zeros_like(flat)
        for _ in range(self.ncycles):
            x, flat = self._vcycle(state, 0, x, flat)
        return self._unflatten(x, info)

    def solve(self, state, b, x0=None):
        return self.apply(state, b), None
