"""Pallas TPU kernel: general-sparsity (ELL) SpMV via 128-lane gathers.

The padded-ELL matvec `sum_k vals[:,k] * x[cols[:,k]]` is the framework's
general-sparsity path (AMG levels, extracted patch operators, anything
that cannot band). Its XLA lowering serializes the gather `x[cols]` to
~1 element/cycle on TPU — the measured "gather cliff" (DESIGN.md: Q2
velocity SpMV 13.6 ms ELL vs 1.6 ms banded at 75k dofs). This kernel
vectorizes the gather 128-wide using the one gather shape Mosaic lowers
on this hardware: `take_along_axis` on an exactly (8, 128) tile
(measured: any other shape is rejected or crashes the backend compiler).

Scheme ("sorted-slot relative-offset" ELL), for SQUARE operators whose
column offsets d = col - row are bounded (true for FEM/mesh matrices in
grid order and for RCM-ordered irregular matrices):

  - rows are laid out r = 1024 p + 128 s + l onto (8, 128) tiles
    (s = sublane, l = lane), q tiles per kernel program;
  - each row's entries are SORTED by d, so ELL slot k holds a narrow
    d-range; decompose l + d = 128 b + l2 with l2 in [0, 128): then
    x[col] = X[base + s + b, l2] where X is x viewed as (n/128, 128)
    and base the tile's sublane origin — a dynamic 8-sublane slice plus
    a 128-lane gather;
  - per slot, b spans a tiny STATIC range [bmin_k, bmax_k] (typically
    1-2 values after sorting), so the kernel loops span_k times over
    { slice X, take_along_axis, select } — ~5 vector ops per (slot,
    b-value) per 1024 rows, far below the bandwidth bound;
  - x stays RESIDENT in VMEM across all programs (read once from HBM);
    vals + encoded indices stream. Per-nnz HBM traffic ~ 8 bytes
    (f32 vals + int32 enc), the same as the roofline's ELL definition,
    with zero serialized gathers.

Scope: square ELLMatrix with bounded |d| (assert at build; callers fall
back to the XLA ELL path otherwise).

Rectangular transfer operators (prolongation col ~ row/rho, restriction
col ~ rho*row) break the bounded-d premise DIRECTLY, but a structured
remap of x restores it (`pallas_rect`):

  - prolongation (nrows > ncols, ratio rho): apply the kernel to the
    remapped columns c' = rho*c + rho//2 against x' = repeat(x, rho)
    (a broadcast+reshape, vectorized) — then d' = c' - r is bounded by
    rho*(stencil width + 1);
  - restriction (ncols > nrows, ratio rho): decompose c = rho*m + e and
    remap c' = e*n' + m (n' = ceil(ncols/rho)) against
    x' = x.reshape(n', rho).T.flatten() (one vectorized transpose) —
    then within a fixed residue class e, d' - e*n' = m - r is bounded.
    Slots are RESIDUE-ALIGNED (entries grouped by e into per-residue
    slot blocks, padded to the per-block max width) so no kernel slot
    mixes residue classes and every per-slot b-span stays small.

Reference counterpart: the local SpMV inside PartitionedArrays' mul!
(SURVEY.md §3.2 "THE hot kernel"); this is its TPU-native form.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q, K, top, bspans, acc_dtype, bmin_ref, vals_ref, enc_ref,
            xp2_ref, y_ref):
    p = pl.program_id(0)
    for t in range(q):
        base = 8 * (q * p + t)
        acc = jnp.zeros((8, 128), acc_dtype)
        for k in range(K):
            # enc streams as int16 when brel<<7|l2 fits (brel < 256 —
            # always, spans are single-digit): 6 B/nnz instead of 8
            # (measured: the f32+i32 kernel sat at 61% of roofline;
            # index traffic was the gap). Widen BEFORE bit ops.
            enc = enc_ref[t * K + k].astype(jnp.int32)
            # per-(tile, slot) anchor: re-anchoring every 1024 rows keeps
            # the static span tiny even when the absolute offset drifts
            # (rectangular transfers, non-integer coarsening ratios).
            # bmin is UNBLOCKED (full (nprog*q*K,) array in SMEM, indexed
            # by program id): a blocked SMEM spec (1, q*K) over
            # (nprog, q*K) violates Mosaic's block-divisibility rule for
            # every nprog > 1 (the BENCH_r03 crash, array (10, 100)).
            bmin = bmin_ref[p * q * K + t * K + k]
            if bspans[k] == 1:
                # span-1 fast path (the common case): brel is identically
                # 0, so enc == l2 — no shift/mask/compare/select. The
                # kernel is VPU-ISSUE-bound, not bandwidth-bound
                # (measured: bf16 values only ~7% faster than f32), so
                # dropping 3 of ~6 vector ops per slot is the big lever.
                Yb = xp2_ref[pl.ds(top + base + bmin, 8), :]
                g = jnp.take_along_axis(Yb.astype(acc_dtype), enc, axis=1)
            else:
                l2 = enc & 127
                brel = enc >> 7
                g = jnp.zeros((8, 128), acc_dtype)
                for j in range(bspans[k]):
                    Yb = xp2_ref[pl.ds(top + base + bmin + j, 8), :]
                    gj = jnp.take_along_axis(
                        Yb.astype(acc_dtype), l2, axis=1
                    )
                    g = jnp.where(brel == j, gj, g)
            acc = acc + vals_ref[t * K + k].astype(acc_dtype) * g
        y_ref[t] = acc


@functools.partial(
    jax.jit,
    static_argnames=("q", "K", "top", "bspans", "nprog", "interpret"),
)
def _ell_apply(vals, enc, bmin, xp2, q, K, top, bspans, nprog, interpret):
    kernel = functools.partial(_kernel, q, K, top, bspans, xp2.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nprog * q, 8, 128), xp2.dtype),
        grid=(nprog,),
        in_specs=[
            # whole bmin array resident in SMEM (nprog*q*K int32 — a few
            # KB); block shape == array shape, which is the one SMEM
            # layout Mosaic accepts for non-(8,128)-aligned shapes
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (q * K, 8, 128), lambda p: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (q * K, 8, 128), lambda p: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # x resident in VMEM for the whole sweep (read once from HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (q, 8, 128), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(bmin, vals, enc, xp2)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PallasELL:
    """Pallas-kernel SpMV over sorted-slot ELL data (flat f32 vectors).
    Build with `pallas_ell(A)`."""

    vals: jnp.ndarray   # (nprog*q*K, 8, 128), possibly bf16
    enc: jnp.ndarray    # (nprog*q*K, 8, 128) int32: (b - bmin[t,k])<<7 | l2
    bmin: jnp.ndarray   # (nprog*q*K,) int32 per-(tile,slot) anchors, flat
    diag_: jnp.ndarray  # (n,)
    absrow: jnp.ndarray  # (n,)
    n: int = dataclasses.field(metadata=dict(static=True))
    ncols: int = dataclasses.field(metadata=dict(static=True))
    K: int = dataclasses.field(metadata=dict(static=True))
    q: int = dataclasses.field(metadata=dict(static=True))
    nprog: int = dataclasses.field(metadata=dict(static=True))
    top: int = dataclasses.field(metadata=dict(static=True))
    bot: int = dataclasses.field(metadata=dict(static=True))
    lx_rows: int = dataclasses.field(metadata=dict(static=True))
    bspans: tuple = dataclasses.field(metadata=dict(static=True))
    interpret: bool = dataclasses.field(metadata=dict(static=True))
    # refresh plumbing (refreshable=True): src maps each tiled slot to a
    # flat index into the ORIGINAL (n*K,) ELL values (sentinel n*K for
    # pad slots), dmask marks the original diagonal slots — both
    # pattern-static, so `pallas_ell_refresh` is jit-traceable (the
    # nonlinear-GMG per-Newton level refresh)
    src: Optional[jnp.ndarray] = None
    dmask: Optional[jnp.ndarray] = None

    @property
    def shape(self):
        return (self.n, self.ncols)

    @property
    def dtype(self):
        return (
            jnp.float32 if self.vals.dtype == jnp.bfloat16
            else self.vals.dtype
        )

    @property
    def nnz(self) -> int:
        return self.n * self.K

    @property
    def stored_nnz(self) -> int:
        return self.n * self.K

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        xp = jnp.pad(x, (0, self.lx_rows * 128 - self.ncols))
        xp2 = jnp.pad(
            xp.reshape(self.lx_rows, 128), ((self.top, self.bot), (0, 0))
        )
        y = _ell_apply(
            self.vals, self.enc, self.bmin, xp2, self.q, self.K,
            self.top, self.bspans, self.nprog, self.interpret,
        )
        return y.reshape(-1)[: self.n]

    def diag(self) -> jnp.ndarray:
        return self.diag_

    def abs_row_sum(self) -> jnp.ndarray:
        return self.absrow


@dataclasses.dataclass(frozen=True)
class _HostELL:
    """Host-side ELL triple for kernel building: keeps the remapped
    intermediate operator in NumPy until the final PallasELL device
    upload (an ELLMatrix intermediate would device_put the arrays only
    for pallas_ell to immediately np.asarray them back — a pointless
    double transfer over the ~30 ms-RTT axon relay, ADVICE r03)."""

    values: np.ndarray
    cols: np.ndarray
    ncols: int

    @property
    def shape(self):
        return (self.values.shape[0], self.ncols)

    @property
    def row_width(self):
        return self.values.shape[1]


def pallas_ell(
    A,
    q: int = 4,
    band_dtype=None,
    max_total_span: Optional[int] = None,
    interpret: bool = False,
    refreshable: bool = False,
) -> PallasELL:
    """Factory: square ELLMatrix -> PallasELL.

    q: (8,128)-row-tiles per kernel program (q*1024 rows/program).
    band_dtype=jnp.bfloat16 halves the value traffic (indices stay i32).
    Raises ValueError when the matrix is not bandwidth-bounded enough
    (sum of per-slot b-spans exceeds `max_total_span`, default 6*K) —
    callers fall back to the XLA ELL path (or RCM-reorder first).
    """
    from ..algebra.ell import ELLMatrix

    assert isinstance(A, (ELLMatrix, _HostELL))
    n, ncols = A.shape
    K = A.row_width
    R = 1024 * q
    nprog = -(-n // R)
    n_pad = nprog * R

    vals = np.zeros((n_pad, K), dtype=np.asarray(A.values).dtype)
    cols = np.tile(np.arange(n_pad, dtype=np.int64)[:, None], (1, K))
    vals[:n] = np.asarray(A.values)
    cols[:n] = np.asarray(A.cols).astype(np.int64)

    # pad rows (n..n_pad) carry value 0; give them the LAST REAL ROW's
    # per-slot offsets so they follow the matrix's own d-pattern instead
    # of injecting d=0 (which would blow the per-tile span whenever a
    # slot's offsets sit far from 0, e.g. remapped restriction slots)
    d = cols - np.arange(n_pad, dtype=np.int64)[:, None]
    if n_pad > n:
        d[n:] = d[n - 1]
    order = np.argsort(d, axis=1, kind="stable")
    d = np.take_along_axis(d, order, axis=1)
    vals = np.take_along_axis(vals, order, axis=1)

    l = (np.arange(n_pad, dtype=np.int64) % 128)[:, None]
    e = l + d
    b = e >> 7
    l2 = (e & 127).astype(np.int32)
    # per-(tile, slot) anchors: tile = 1024 consecutive rows (one t of
    # one program). Re-anchoring bounds the STATIC span by the
    # intra-tile spread only, so globally drifting offsets (rectangular
    # transfers, non-integer coarsening ratios) stay cheap.
    ntiles = nprog * q
    bt = b.reshape(ntiles, 1024, K)
    bmin_tk = bt.min(axis=1)                      # (ntiles, K)
    bmax_tk = bt.max(axis=1)
    bspans = tuple(
        int((bmax_tk[:, k] - bmin_tk[:, k]).max()) + 1 for k in range(K)
    )
    limit = max_total_span if max_total_span is not None else 6 * K
    if sum(bspans) > limit:
        raise ValueError(
            f"pallas_ell: total b-span {sum(bspans)} > {limit} "
            "(matrix not bandwidth-bounded; RCM-reorder or use XLA ELL)"
        )
    brel = b - np.repeat(bmin_tk, 1024, axis=0)
    enc = (brel << 7) | l2
    # int16 encoded indices whenever brel fits in 8 bits (spans are
    # single-digit after per-tile anchoring): 25% less stream traffic
    enc = enc.astype(np.int16 if enc.max() < 2**15 else np.int32)

    # x layout: (lx_rows, 128) covering max(n_pad, ncols), plus `top`
    # zero sublane-rows so negative slice starts stay in range
    lx = max(n_pad, -(-ncols // 128) * 128)
    lx_rows = lx // 128
    tile_base = 8 * np.arange(ntiles, dtype=np.int64)[:, None]
    start_min = int((tile_base + bmin_tk).min())
    top = max(0, -start_min)
    # bottom guard: highest slice start + 8 must fit in top+lx_rows+bot
    start_max = int(
        max(
            (tile_base[:, 0] + bmin_tk[:, k]).max() + bspans[k] - 1
            for k in range(K)
        )
    )
    bot = max(8, start_max + 8 - lx_rows)

    def _tiles(a):
        # (n_pad, K) -> (nprog*q*K, 8, 128) in (p, t, k) major order
        a4 = a.reshape(nprog, q, 8, 128, K)
        return np.ascontiguousarray(
            np.moveaxis(a4, 4, 2)
        ).reshape(nprog * q * K, 8, 128)

    vdt = band_dtype or A.values.dtype
    ell_diag = (vals[:n] * (d[:n] == 0)).sum(axis=1)
    absrow = np.abs(vals[:n]).sum(axis=1)

    src = dmask = None
    if refreshable:
        # tiled-slot -> original-flat-values map (sentinel n*K for pad
        # slots); `order` already encodes the per-row d-sort
        rowv = np.arange(n_pad, dtype=np.int64)[:, None]
        src_full = np.where(rowv < n, rowv * K + order, n * K)
        src = jnp.asarray(_tiles(src_full).astype(np.int32))
        dmask = jnp.asarray(
            (
                np.asarray(A.cols).astype(np.int64)
                - np.arange(n, dtype=np.int64)[:, None]
                == 0
            ).astype(np.asarray(A.values).dtype)
        )

    return PallasELL(
        vals=jnp.asarray(_tiles(vals), dtype=vdt),
        enc=jnp.asarray(_tiles(enc)),
        bmin=jnp.asarray(bmin_tk.reshape(-1).astype(np.int32)),
        diag_=jnp.asarray(ell_diag),
        absrow=jnp.asarray(absrow),
        n=int(n),
        ncols=int(ncols),
        K=int(K),
        q=int(q),
        nprog=int(nprog),
        top=int(top),
        bot=int(bot),
        lx_rows=int(lx_rows),
        bspans=bspans,
        interpret=bool(interpret),
        src=src,
        dmask=dmask,
    )


def pallas_ell_refresh(op: PallasELL, new_values) -> PallasELL:
    """Jit-traceable values-only refresh of a `refreshable` PallasELL.

    `new_values`: (n, K) array in the wrapped operator's ORIGINAL ELL
    slot order (the assembler's layout — same static pattern). The
    tiled layout, per-slot sort, anchors and spans all depend only on
    the PATTERN, so the update is one gather through the stored `src`
    map (O(nnz), once per Newton step — matvecs stay gather-free). This
    is the kernel-side analog of the reference's numerical_setup! with
    reused symbolic setup."""
    if op.src is None:
        raise ValueError(
            "pallas_ell_refresh needs pallas_ell(..., refreshable=True)"
        )
    nv = new_values.reshape(-1)
    flat = jnp.concatenate([nv, jnp.zeros((1,), nv.dtype)])
    vals = flat[op.src].astype(op.vals.dtype)
    diag = (new_values * op.dmask).sum(axis=1)
    absrow = jnp.abs(new_values).sum(axis=1)
    return dataclasses.replace(op, vals=vals, diag_=diag, absrow=absrow)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PallasRect:
    """Rectangular (transfer) operator on the sorted-slot kernel: the
    inner PallasELL runs on remapped columns; matvec pre-transforms x
    with the matching structured remap (module docstring). Build with
    `pallas_rect(A)`."""

    inner: PallasELL
    nrows: int = dataclasses.field(metadata=dict(static=True))
    ncols_: int = dataclasses.field(metadata=dict(static=True))
    rho: int = dataclasses.field(metadata=dict(static=True))
    mode: str = dataclasses.field(metadata=dict(static=True))
    nprime: int = dataclasses.field(metadata=dict(static=True))
    nnz_: int = dataclasses.field(default=0, metadata=dict(static=True))
    # refresh plumbing (refreshable=True): for mode='fold' the
    # residue-aligned layout permutes (n, K) -> (n, K2); src2 maps each
    # (n, K2) slot to a flat index into the ORIGINAL (n*K,) values
    # (sentinel n*K for pad slots). mode='expand' keeps slots in place
    # (only columns are remapped), so src2 stays None.
    src2: Optional[jnp.ndarray] = None

    @property
    def shape(self):
        return (self.nrows, self.ncols_)

    @property
    def ncols(self):
        return self.ncols_

    @property
    def dtype(self):
        return self.inner.dtype

    @property
    def nnz(self) -> int:
        """Logical (wrapped-operator) stored entries n * row_width — NOT
        the residue-widened inner layout (ADVICE r03: inner.nnz counts
        padding slots and overstates cost reporting)."""
        return self.nnz_ or self.inner.nnz

    @property
    def stored_nnz(self) -> int:
        """Entries actually streamed by the kernel (widened layout) —
        the right count for HBM-traffic/roofline accounting."""
        return self.inner.nnz

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.mode == "expand":
            # prolongation: x' = repeat(x, rho) — broadcast + reshape
            xp = jnp.broadcast_to(
                x[:, None], (self.ncols_, self.rho)
            ).reshape(-1)
        else:
            # restriction: x' = pad(x).reshape(n', rho).T.flatten()
            pad = self.nprime * self.rho - self.ncols_
            xp = (
                jnp.pad(x, (0, pad))
                .reshape(self.nprime, self.rho)
                .T.reshape(-1)
            )
        return self.inner.matvec(xp)


def pallas_rect(
    A,
    q: int = 4,
    band_dtype=None,
    max_total_span: Optional[int] = None,
    interpret: bool = False,
    refreshable: bool = False,
):
    """Factory: rectangular ELLMatrix transfer -> PallasRect (or
    PallasELL when the operator is square already).

    Raises ValueError when no structured remap yields a bounded-span
    layout (callers fall back to the XLA ELL matvec) — the same
    contract as `pallas_ell`.

    refreshable=True enables `pallas_rect_refresh` (jit-traceable
    values-only update). Contract: the NONZERO pattern must be static —
    entries that were (structurally) zero at build time were moved to
    placeholder columns and must stay zero at refresh (the standard
    numerical_setup! pattern-reuse assumption).
    """
    from ..algebra.ell import ELLMatrix

    assert isinstance(A, ELLMatrix)
    n, ncols = A.shape
    if ncols == n:
        return pallas_ell(
            A, q=q, band_dtype=band_dtype,
            max_total_span=max_total_span, interpret=interpret,
            refreshable=refreshable,
        )
    vals = np.asarray(A.values)
    cols = np.asarray(A.cols).astype(np.int64)
    # zero-valued entries (ELL padding uses col=min(row, ncols-1), which
    # violates the col ~ ratio*row structure) contribute nothing — point
    # them at the structurally-expected column so they never widen spans
    rows_idx = np.arange(n, dtype=np.int64)
    ideal = np.clip(
        (rows_idx * ncols) // max(n, 1), 0, ncols - 1
    )[:, None]
    if ncols < n:
        # prolongation-like: c' = rho*c + rho//2, x' = repeat(x, rho)
        cols = np.where(vals == 0, ideal, cols)
        rho = max(1, int(round(n / ncols)))
        ell2 = _HostELL(
            values=vals,
            cols=(rho * cols + rho // 2).astype(np.int32),
            ncols=rho * ncols,
        )
        inner = pallas_ell(
            ell2, q=q, band_dtype=band_dtype,
            max_total_span=max_total_span, interpret=interpret,
            refreshable=refreshable,
        )
        return PallasRect(
            inner=inner, nrows=int(n), ncols_=int(ncols),
            rho=int(rho), mode="expand", nprime=0,
            nnz_=int(n * A.row_width),
        )
    # restriction-like: residue-align slots so each kernel slot holds one
    # residue class e = c mod rho (the remap c' = e*n' + m puts different
    # classes ~n' apart; mixing them in one slot would blow the b-span)
    rho = max(1, int(round(ncols / n)))
    # spread zero-entry columns across residue classes (slot % rho) so
    # padding doesn't pile onto one class and inflate its block width
    spread = np.clip(
        ideal + (np.arange(A.row_width, dtype=np.int64) % rho)[None, :],
        0, ncols - 1,
    )
    cols = np.where(vals == 0, spread, cols)
    nprime = -(-ncols // rho)
    e = cols % rho
    m = cols // rho
    # assembler padding entries (value 0) still carry a residue; treat
    # all stored entries uniformly — zeros are harmless wherever they land
    counts = np.zeros((n, rho), dtype=np.int64)
    for ee in range(rho):
        counts[:, ee] = (e == ee).sum(axis=1)
    kblocks = counts.max(axis=0)  # per-residue max width over rows
    K2 = int(kblocks.sum())
    if K2 > 4 * A.row_width:
        raise ValueError(
            f"pallas_rect: residue-aligned width {K2} > 4*K "
            "(residue classes too unbalanced; use XLA ELL)"
        )
    starts = np.concatenate([[0], np.cumsum(kblocks)])
    vals2 = np.zeros((n, K2), dtype=vals.dtype)
    # pad cols: d' = e*n' + (m - r) with m = clamp(r, 0, n'-1) stays
    # inside the block's span
    m_pad = np.clip(rows_idx, 0, nprime - 1)
    cols2 = np.zeros((n, K2), dtype=np.int64)
    K = A.row_width
    fold_src = np.full((n, K2), n * K, dtype=np.int64)
    for ee in range(rho):
        blk = slice(int(starts[ee]), int(starts[ee + 1]))
        cols2[:, blk] = (ee * nprime + m_pad)[:, None]
        sel = e == ee
        # scatter the class-ee entries of each row into its block,
        # packed left (order within the block is irrelevant).
        # nonzero() is row-major, so within a row kk is increasing.
        rr, kk = np.nonzero(sel)
        first = np.ones_like(rr, dtype=bool)
        first[1:] = rr[1:] != rr[:-1]
        runstart = np.where(first, np.arange(len(rr)), 0)
        runstart = np.maximum.accumulate(runstart)
        slot = np.arange(len(rr)) - runstart
        vals2[rr, int(starts[ee]) + slot] = vals[rr, kk]
        cols2[rr, int(starts[ee]) + slot] = ee * nprime + m[rr, kk]
        fold_src[rr, int(starts[ee]) + slot] = rr * K + kk
    ell2 = _HostELL(
        values=vals2,
        cols=cols2.astype(np.int32),
        ncols=rho * nprime,
    )
    inner = pallas_ell(
        ell2, q=q, band_dtype=band_dtype,
        max_total_span=max_total_span, interpret=interpret,
        refreshable=refreshable,
    )
    return PallasRect(
        inner=inner, nrows=int(n), ncols_=int(ncols),
        rho=int(rho), mode="fold", nprime=int(nprime),
        nnz_=int(n * A.row_width),
        src2=(
            jnp.asarray(fold_src.astype(np.int32)) if refreshable else None
        ),
    )


def pallas_rect_refresh(op: PallasRect, new_values) -> PallasRect:
    """Jit-traceable values-only refresh of a `refreshable` PallasRect.

    `new_values`: (n, K) in the wrapped operator's ORIGINAL ELL order.
    Pattern-static contract (see pallas_rect): build-time zero slots
    were re-pointed at placeholder columns and MUST stay zero."""
    if op.inner.src is None:
        raise ValueError(
            "pallas_rect_refresh needs pallas_rect(..., refreshable=True)"
        )
    if op.mode == "expand":
        # slots unchanged (only columns were remapped at build)
        return dataclasses.replace(
            op, inner=pallas_ell_refresh(op.inner, new_values)
        )
    # fold: permute (n, K) -> the residue-aligned (n, K2) layout first
    nv = new_values.reshape(-1)
    flat = jnp.concatenate([nv, jnp.zeros((1,), nv.dtype)])
    v2 = flat[op.src2]
    return dataclasses.replace(op, inner=pallas_ell_refresh(op.inner, v2))


def kernelize_system(A, old=None, *, interpret: bool = False):
    """Composite-operator kernelization with pattern-static refresh.

    Walks a (possibly nested) operator — BlockOperator / ColumnStack /
    RowStack / FieldwiseOperator over ELLMatrix leaves — and puts every
    f32 ELL leaf (square or rectangular) on the sorted-slot Pallas
    kernel, leaving anything the kernel rejects (or any other leaf
    class, e.g. the already-fast StencilMatrix) untouched.

    old=None: host-side build (setup time; per-leaf ValueError fallback
    to the XLA ELL path). old = a previous kernelized result with the
    SAME structure: jit-traceable values-only refresh — leaves paired
    with a PallasELL/PallasRect are refreshed through the stored
    pattern maps, leaves that fell back stay raw — so the refreshed
    state is pytree-structure-identical to the setup state (the device
    Newton loop's lax.while_loop carry requirement).

    The outer-Krylov analog of GMGSolver(kernelize_levels=): the
    reference's per-Newton numerical_setup! reuses its symbolic pattern
    the same way (src/SolverInterfaces/GridapExtras.jl:4-14)."""
    from ..algebra.block import (
        BlockOperator,
        ColumnStack,
        FieldwiseOperator,
        RowStack,
    )
    from ..algebra.ell import ELLMatrix

    def conv(m, o):
        if m is None:
            return None
        if isinstance(m, ELLMatrix):
            if o is not None:
                if isinstance(o, PallasELL):
                    return pallas_ell_refresh(o, m.values)
                if isinstance(o, PallasRect):
                    return pallas_rect_refresh(o, m.values)
                return m  # build-time fallback stays raw (structure)
            try:
                return pallas_rect(m, interpret=interpret, refreshable=True)
            except ValueError:
                return m
        for cls in (FieldwiseOperator, ColumnStack, RowStack):
            if isinstance(m, cls):
                ob = o.ops if isinstance(o, cls) else (None,) * len(m.ops)
                return dataclasses.replace(
                    m,
                    ops=tuple(
                        conv(mm, oo) for mm, oo in zip(m.ops, ob)
                    ),
                )
        if isinstance(m, BlockOperator):
            ob = (
                o.blocks
                if isinstance(o, BlockOperator)
                else tuple(
                    tuple(None for _ in row) for row in m.blocks
                )
            )
            return dataclasses.replace(
                m,
                blocks=tuple(
                    tuple(
                        conv(mm, oo) for mm, oo in zip(mrow, orow)
                    )
                    for mrow, orow in zip(m.blocks, ob)
                ),
            )
        return m  # unknown/fast leaf (StencilMatrix, Dist*, kernels)

    return conv(A, old)
