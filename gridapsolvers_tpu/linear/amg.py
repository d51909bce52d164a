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


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True, eq=False)
class _HostPattern:
    """Host-side aggregation pattern (tentative-P matrices) carried INSIDE
    the state pytree as a static (no-leaf) node — the protocol demands all
    per-system state live in the pytree, not on the frozen solver instance
    (two systems sharing one AMGSolver must not cross-contaminate)."""

    P0s: tuple  # scipy tentative prolongations, finest -> coarsest


def _swap_by_identity(obj, old, new):
    """Replace every reference to `old` (by object identity) inside a
    state pytree of dicts/lists/tuples with `new` — used to point
    smoother states at the Pallas kernel operator after their setup ran
    against the XLA ELL one (same matrix, same spectrum)."""
    if obj is old:
        return new
    if isinstance(obj, dict):
        return {k: _swap_by_identity(v, old, new) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_swap_by_identity(v, old, new) for v in obj)
    return obj


def _row_max(C: sp.csr_matrix, vals: np.ndarray) -> np.ndarray:
    """Per-row max of vals over the column pattern (vectorized)."""
    counts = np.diff(C.indptr)
    out = np.full(C.shape[0], -np.inf)
    if C.nnz == 0:
        return out
    rows = np.repeat(np.arange(C.shape[0]), counts)
    np.maximum.at(out, rows, vals[C.indices])
    return out


def _match_pass(W: sp.csr_matrix, seed: int = 0) -> np.ndarray:
    """One round of mutual matching on a weighted graph (vectorized
    pairwise aggregation): each node proposes to its highest-priority
    neighbor among its STRONG edges (weight >= half the row max); mutual
    proposals merge. Priorities are random per node — proposing to the
    heaviest edge directly chains best-pointers along any smooth weight
    gradient and yields a single mutual pair per pass, whereas random
    priorities give an O(1) matched fraction. Returns the node->group map
    (compacted, contiguous ids)."""
    n = W.shape[0]
    counts = np.diff(W.indptr)
    rows = np.repeat(np.arange(n), counts)
    data = np.abs(W.data)
    row_max = np.zeros(n)
    np.maximum.at(row_max, rows, data)
    strong = data >= 0.5 * row_max[rows]
    prio = np.random.default_rng(seed).random(n)
    best = np.full(n, -1, dtype=np.int64)
    best_p = np.full(n, -1.0)
    cols = W.indices.astype(np.int64)
    np.maximum.at(best_p, rows[strong], prio[cols[strong]])
    # recover the argmax: entries whose neighbor priority equals row best
    sel = strong.copy()
    sel[strong] = prio[cols[strong]] >= best_p[rows[strong]]
    np.maximum.at(best, rows[sel], cols[sel])
    best[best < 0] = np.where(best < 0)[0]  # isolated -> self
    mutual = (best != np.arange(n)) & (best[best] == np.arange(n))
    canon = np.arange(n)
    canon[mutual] = np.minimum(np.arange(n)[mutual], best[mutual])
    # compact ids
    uniq, out = np.unique(canon, return_inverse=True)
    return out


def _aggregate_target(
    C: sp.csr_matrix, W: sp.csr_matrix, target: float
) -> np.ndarray:
    """Aggregation with a controlled coarsening ratio: a Luby MIS pass
    (distance-1 aggregates, ~3-5x) composed with pairwise matching passes
    on the contracted weighted graph until aggregates reach ~`target`
    nodes. Single-pass MIS coarsens slower than smoothed-aggregation
    fill-in grows, which densifies coarse operators catastrophically;
    ~8x per level keeps the Galerkin stencils bounded (the same reason
    PETSc GAMG squares its graph and AGMG composes pairwise passes)."""
    n = C.shape[0]
    agg = _aggregate(C)
    # Diagonal-only rows (Dirichlet identity rows kept in the system by
    # framework convention) have no graph edges: left as singletons they
    # FREEZE coarsening once they dominate a coarse level (e.g. 256 of
    # 293 dofs on a 64x64 Poisson L2). Bucket them into ~target-size
    # aggregates — A is diagonal there, so Galerkin stays diagonal and
    # any diagonal smoother solves them exactly; grouping is free.
    iso = np.diff(W.indptr) == 0
    if iso.any():
        ids = np.where(iso)[0]
        nbuckets = max(1, -(-len(ids) // int(max(target, 2))))
        agg = agg.copy()
        agg[ids] = int(agg.max()) + 1 + (np.arange(len(ids)) % nbuckets)
        _, agg = np.unique(agg, return_inverse=True)
    for it in range(6):
        na = int(agg.max()) + 1
        if na <= 1 or n / na >= target:
            break
        Q = sp.csr_matrix(
            (np.ones(n), (np.arange(n), agg)), shape=(n, na)
        )
        Wc = (Q.T @ W @ Q).tocsr()
        Wc.setdiag(0)
        Wc.eliminate_zeros()
        m = _match_pass(Wc, seed=it)
        if int(m.max()) + 1 == na:
            # matching found no mutual pairs — escalate to MIS over the
            # full contracted connectivity (coarser but guaranteed
            # progress on any graph with edges)
            m = _aggregate(Wc, seed=it + 1)
            if int(m.max()) + 1 >= na:
                break  # genuinely disconnected
        agg = m[agg]
    return agg


def _aggregate(C: sp.csr_matrix, seed: int = 0) -> np.ndarray:
    """Vectorized MIS-style aggregation (no Python row loops — usable at
    1e6+ dofs, unlike the reference's per-row PETSc-side loops we replace):

    rounds of Luby's maximal-independent-set over the strength graph pick
    seed nodes (locally-maximal random priority among unaggregated
    neighbors); each seed absorbs its unaggregated neighborhood. Leftovers
    attach to an adjacent aggregate; isolated nodes become singletons."""
    n = C.shape[0]
    rng = np.random.default_rng(seed)
    prio = rng.permutation(n).astype(np.float64) + 1.0  # > 0
    agg = -np.ones(n, dtype=np.int64)
    na = 0
    for _ in range(64):  # O(log n) rounds suffice; bound defensively
        un = agg < 0
        if not un.any():
            break
        # neighbor max priority among unaggregated nodes
        nb_prio = _row_max(C, np.where(un, prio, -np.inf))
        seeds = un & (prio > nb_prio)  # incl. isolated (nb = -inf)
        if not seeds.any():
            break
        ids = np.where(seeds)[0]
        agg[ids] = na + np.arange(len(ids))
        # absorb unaggregated neighbors: max (agg id + 1) over seed nbrs
        seed_tag = np.where(seeds, agg + 1.0, 0.0)
        grab = _row_max(C, seed_tag)
        take = (agg < 0) & (grab > 0)
        agg[take] = grab[take].astype(np.int64) - 1
        na += len(ids)
    # attach leftovers to any adjacent aggregate
    for _ in range(4):
        un = agg < 0
        if not un.any():
            break
        tag = _row_max(C, np.where(agg >= 0, agg + 1.0, 0.0))
        take = un & (tag > 0)
        agg[take] = tag[take].astype(np.int64) - 1
    # isolated leftovers become singletons
    un = np.where(agg < 0)[0]
    agg[un] = na + np.arange(len(un))
    return agg


def _tentative_prolongation(
    agg: np.ndarray, candidates: Optional[np.ndarray]
) -> sp.csr_matrix:
    """P0 from aggregates; with k candidate vectors the coarse space gets
    up to k dofs per aggregate (per-aggregate orthonormalization,
    GAMG-style). Fully vectorized: the per-aggregate Gram-Schmidt runs as
    k^2 segment reductions (bincount) instead of a Python QR loop."""
    n = len(agg)
    na = int(agg.max()) + 1
    if candidates is None:
        return sp.csr_matrix(
            (np.ones(n), (np.arange(n), agg)), shape=(n, na)
        )
    B = np.array(candidates, dtype=np.float64)
    k = B.shape[1]
    keep = np.ones((na, k), dtype=bool)
    for j in range(k):
        # project out previous (normalized) columns, segment-wise
        for i in range(j):
            dots = np.bincount(agg, weights=B[:, i] * B[:, j], minlength=na)
            B[:, j] -= dots[agg] * B[:, i]
        nrm2 = np.bincount(agg, weights=B[:, j] ** 2, minlength=na)
        ok = nrm2 > 1e-20
        keep[:, j] = ok
        inv = np.where(ok, 1.0 / np.sqrt(np.maximum(nrm2, 1e-300)), 0.0)
        B[:, j] *= inv[agg]
    # compact coarse columns: aggregate a, candidate j -> coarse dof
    col_of = -np.ones((na, k), dtype=np.int64)
    col_of[keep] = np.arange(int(keep.sum()))
    rows = np.repeat(np.arange(n), k)
    cols = col_of[agg].reshape(-1)
    vals = B.reshape(-1)
    m = cols >= 0
    return sp.csr_matrix(
        (vals[m], (rows[m], cols[m])), shape=(n, int(keep.sum()))
    )


@dataclasses.dataclass(frozen=True)
class AMGSolver(LinearSolver):
    """Smoothed-aggregation AMG preconditioner/solver."""

    theta: float = 0.08
    omega: float = 0.57  # 4/7-ish Jacobi smoothing weight for P
    max_levels: int = 10
    coarse_size: int = 400
    coarsen_ratio: float = 8.0  # target nodes per aggregate
    smoother: object = None
    near_nullspace: Optional[object] = None  # (n, k) candidate vectors
    ncycles: int = 1
    # SpMV engine for the square level operators: 'auto' = sorted-slot
    # Pallas ELL kernel (ops/ell_pallas.py) on accelerator backends, XLA
    # padded ELL on CPU; 'pallas'/'ell' force. Per-level fallback to ELL
    # when a level is not bandwidth-bounded (the mean-position aggregate
    # renumbering in _build keeps structured-problem levels banded) or
    # not f32/bf16. Transfers and the dense-factorized coarsest level
    # always stay ELL. interpret=True runs the kernel in Pallas
    # interpreter mode (CPU testing).
    engine: str = "auto"
    interpret: bool = False

    def _build(self, A):
        S = to_scipy(A).tocsr()
        candidates = (
            np.asarray(self.near_nullspace)
            if self.near_nullspace is not None
            else None
        )
        mats_sp: List[sp.csr_matrix] = [S]
        Ps: List[sp.csr_matrix] = []
        P0s: List[sp.csr_matrix] = []
        while (
            mats_sp[-1].shape[0] > self.coarse_size
            and len(mats_sp) < self.max_levels
        ):
            Ac = mats_sp[-1]
            # theta decays with depth (GAMG-style): coarse Galerkin
            # operators have genuinely weaker off-diagonals and a fixed
            # threshold disconnects them
            theta_l = self.theta * (0.5 ** (len(mats_sp) - 1))
            C = _strength_graph(Ac, theta_l)
            W = Ac.copy().tocsr()
            W.setdiag(0)
            W.eliminate_zeros()
            W.data = np.abs(W.data)  # mixed-sign entries cancel under
            # graph contraction (Q^T W Q) and fake disconnection
            agg = _aggregate_target(C, W, self.coarsen_ratio)
            # renumber aggregates by mean fine-node index: keeps Galerkin
            # coarse operators BANDED in a bandwidth-preserving dof order,
            # so DistAMGSolver can row-shard them with single-hop halos
            nagg = int(agg.max()) + 1
            mean_pos = np.bincount(
                agg, weights=np.arange(agg.shape[0]), minlength=nagg
            ) / np.maximum(np.bincount(agg, minlength=nagg), 1)
            perm = np.empty(nagg, dtype=agg.dtype)
            perm[np.argsort(mean_pos, kind="stable")] = np.arange(nagg)
            agg = perm[agg]
            P0 = _tentative_prolongation(agg, candidates)
            Dinv = sp.diags(1.0 / Ac.diagonal())
            P = (P0 - self.omega * (Dinv @ (Ac @ P0))).tocsr()
            Anew = (P.T @ Ac @ P).tocsr()
            if Anew.shape[0] >= 0.67 * Ac.shape[0]:
                break  # coarsening stalled (graph disconnecting) — stop
                # and let the dense coarse solver take what's left
            Ps.append(P)
            P0s.append(P0)
            mats_sp.append(Anew)
            # candidate vectors steer only the finest aggregation (the
            # GAMG near-nullspace hook); coarser levels use constants
            candidates = None
        return mats_sp, Ps, P0s

    def _pack_state(self, mats_sp, Ps):
        sm = self.smoother or ChebyshevSmoother(degree=3)
        # AMG levels operate on FLAT vectors: the finest operator is the
        # flattened (scipy->ELL) system even when A is a block operator;
        # apply()/solve() flatten/unflatten at the boundary
        # dtype-faithful: scipy Galerkin products promote to f64 (the
        # tentative P is built in f64), but the cycle must stay in the
        # system's dtype — an f32 system gets an f32 AMG state (on TPU
        # the global x64-off used to mask this; CPU/f64 tests exposed it)
        vdt = mats_sp[0].dtype
        mats = [ell_from_scipy(m, dtype=vdt) for m in mats_sp]
        P_ops = [ell_from_scipy(P, dtype=vdt) for P in Ps]
        R_ops = [ell_from_scipy(P.T.tocsr(), dtype=vdt) for P in Ps]
        # smoother states set up against the XLA ELL operators (eig
        # estimation may matvec, which must work on the host backend),
        # then the operator reference inside each state is swapped for
        # the kernel operator so the jitted cycle rides it
        sm_states = [sm.setup(m) for m in mats[:-1]]
        kmats = self._kernelize(mats)
        sm_states = [
            _swap_by_identity(st, m, k)
            for st, m, k in zip(sm_states, mats[:-1], kmats[:-1])
        ]
        coarse = DenseInverseSolver()
        coarse_state = coarse.setup(mats[-1])
        return {
            "mats": kmats,
            "P": self._kernelize_rect(P_ops),
            "R": self._kernelize_rect(R_ops),
            "sm": sm_states,
            "coarse": coarse_state,
        }

    def _kernelize_rect(self, ops):
        """Transfer operators on the kernel too (pallas_rect: repeat-x /
        residue-fold remaps make the aggregate P/R bounded-span); same
        engine policy and per-operator ELL fallback as the levels."""
        from ..algebra.ell import ELLMatrix
        from ..algebra.flat import resolve_engine

        if resolve_engine(self.engine) != "pallas":
            return ops
        from ..ops.ell_pallas import pallas_rect

        out = []
        for m in ops:
            # fallback contract: anything the kernel can't take (non-ELL
            # operator, non-f32 values, unbounded span) stays on XLA ELL
            if not isinstance(m, ELLMatrix) or m.values.dtype != jnp.float32:
                out.append(m)
                continue
            try:
                out.append(pallas_rect(m, interpret=self.interpret))
            except ValueError:
                out.append(m)
        return out

    def _kernelize(self, mats):
        """Per-level Pallas-kernel conversion of the square level
        operators (engine policy in the class docstring). The coarsest
        level stays ELL — it is densified by the coarse solver anyway."""
        from ..algebra.flat import resolve_engine

        if resolve_engine(self.engine) != "pallas":
            return mats
        from ..ops.ell_pallas import pallas_ell

        out = []
        for m in mats[:-1]:
            if m.values.dtype != jnp.float32:
                out.append(m)  # f64 levels: kernel is f32/bf16-only
                continue
            try:
                out.append(pallas_ell(m, interpret=self.interpret))
            except ValueError:
                out.append(m)  # not bandwidth-bounded: XLA ELL fallback
        return out + [mats[-1]]

    def setup(self, A, x=None):
        mats_sp, Ps, P0s = self._build(A)
        # the aggregation/tentative-P pattern rides in the state pytree
        # (static node) so update() can reuse it per numerical_setup! and
        # one solver instance can serve several systems without bleed
        state = self._pack_state(mats_sp, Ps)
        state["pattern"] = _HostPattern(tuple(P0s))
        return state

    def update(self, state, A, x=None):
        """numerical_setup!: reuse the aggregation/tentative-P pattern from
        setup; only the P smoothing and Galerkin triple products rerun
        (the reference's GAMG reuses its graph/aggregates the same way)."""
        pattern = state.get("pattern") if isinstance(state, dict) else None
        if pattern is None:
            return self.setup(A, x)
        mats_sp = [to_scipy(A).tocsr()]
        Ps = []
        for P0 in pattern.P0s:
            Ac = mats_sp[-1]
            Dinv = sp.diags(1.0 / Ac.diagonal())
            P = (P0 - self.omega * (Dinv @ (Ac @ P0))).tocsr()
            Ps.append(P)
            mats_sp.append((P.T @ Ac @ P).tocsr())
        new = self._pack_state(mats_sp, Ps)
        new["pattern"] = pattern
        return new

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


@dataclasses.dataclass(frozen=True)
class DistAMGSolver(AMGSolver):
    """Distributed smoothed-aggregation AMG: the reference's parallel
    PETSc GAMG (ext/GridapPETScExt/ElasticitySolvers.jl:30-44, the
    scalability study's coarse solver joss_paper/scalability/src/
    utils.jl:14-33) as row-sharded level operators.

    Fine/intermediate levels and transfers become row-sharded
    DistGraphELL operators over balanced contiguous partitions
    (`parallel/dist_ell_nd.contiguous_partition`): the table-driven
    neighbor exchange has NO bandwidth constraint, so arbitrary
    aggregate numberings shard (the mean-position renumbering in
    `_build` just keeps the neighbor-offset set small). Levels whose
    per-device row count drops below `min_sharded_rows` — always
    including the coarsest — are replicated (the reference's
    subcommunicator shrinkage), with transfers re-indexed between
    partition and global order (`scipy_in_part_order`) so the V-cycle
    stays one jittable program end to end.

    Use with a DistELLMatrix system operator: to_scipy gives the padded
    host view, its equal-block layout coincides with the finest
    contiguous partition, and identity-pad rows become singleton
    aggregates, so vectors pass through with no relayout.
    """

    mesh: object = None  # jax.sharding.Mesh (required)
    axis: str = "p"
    min_sharded_rows: int = 64

    def _pack_state(self, mats_sp, Ps):
        from ..parallel.dist_ell import pad_multiple
        from ..parallel.dist_ell_nd import (
            contiguous_partition,
            scipy_in_part_order,
            shard_csr_nd,
        )

        assert self.mesh is not None, "DistAMGSolver needs mesh="
        sm = self.smoother or ChebyshevSmoother(degree=3)
        nprocs = self.mesh.shape[self.axis]
        L = len(mats_sp)

        parts, sharded = [], []
        for lev, S in enumerate(mats_sp):
            # finest: equal blocks over the padded size = the layout of
            # shard_vector / DistELLMatrix vectors (zero relayout)
            n = pad_multiple(S.shape[0], nprocs) if lev == 0 else S.shape[0]
            parts.append(contiguous_partition(n, nprocs))
            sharded.append(
                lev < L - 1 and n // nprocs >= self.min_sharded_rows
            )
        mats = []
        for lev, S in enumerate(mats_sp):
            if sharded[lev]:
                mats.append(
                    shard_csr_nd(
                        S, parts[lev], self.mesh, axes=(self.axis,),
                        identity_pad=True,
                    )
                )
            else:
                mats.append(ell_from_scipy(S))

        P_ops, R_ops = [], []
        for lev, P in enumerate(Ps):
            R = P.T.tocsr()
            pf = parts[lev] if sharded[lev] else None
            pc = parts[lev + 1] if sharded[lev + 1] else None
            if pf is not None and pc is not None:
                P_ops.append(
                    shard_csr_nd(P, pf, self.mesh, part_cols=pc,
                                 axes=(self.axis,))
                )
                R_ops.append(
                    shard_csr_nd(R, pc, self.mesh, part_cols=pf,
                                 axes=(self.axis,))
                )
            else:  # boundary to (or within) the replicated tail:
                # plain ELL on re-indexed scipy (partition order on the
                # sharded side, global order on the replicated side)
                P_ops.append(
                    ell_from_scipy(scipy_in_part_order(P, pf, pc))
                )
                R_ops.append(
                    ell_from_scipy(scipy_in_part_order(R, pc, pf))
                )
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
