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
back to the XLA ELL path otherwise). Rectangular transfer operators are
out of scope (their col ~ 2*row relation breaks the bounded-d premise);
transfers ride the banded/slice lowerings (multilevel/transfer.py).

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


def _kernel(q, K, top, bmins, bspans, acc_dtype, vals_ref, enc_ref,
            xp2_ref, y_ref):
    p = pl.program_id(0)
    for t in range(q):
        base = 8 * (q * p + t)
        acc = jnp.zeros((8, 128), acc_dtype)
        for k in range(K):
            enc = enc_ref[t * K + k]          # (8,128) int32
            l2 = enc & 127
            brel = enc >> 7
            g = jnp.zeros((8, 128), acc_dtype)
            for j in range(bspans[k]):
                Yb = xp2_ref[pl.ds(top + base + bmins[k] + j, 8), :]
                gj = jnp.take_along_axis(Yb.astype(acc_dtype), l2, axis=1)
                g = jnp.where(brel == j, gj, g)
            acc = acc + vals_ref[t * K + k].astype(acc_dtype) * g
        y_ref[t] = acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "q", "K", "top", "bmins", "bspans", "nprog", "interpret"
    ),
)
def _ell_apply(vals, enc, xp2, q, K, top, bmins, bspans, nprog, interpret):
    kernel = functools.partial(
        _kernel, q, K, top, bmins, bspans, xp2.dtype
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nprog * q, 8, 128), xp2.dtype),
        grid=(nprog,),
        in_specs=[
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
    )(vals, enc, xp2)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PallasELL:
    """Pallas-kernel SpMV over sorted-slot ELL data (flat f32 vectors).
    Build with `pallas_ell(A)`."""

    vals: jnp.ndarray   # (nprog*q*K, 8, 128), possibly bf16
    enc: jnp.ndarray    # (nprog*q*K, 8, 128) int32: (b - bmin_k)<<7 | l2
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
    bmins: tuple = dataclasses.field(metadata=dict(static=True))
    bspans: tuple = dataclasses.field(metadata=dict(static=True))
    interpret: bool = dataclasses.field(metadata=dict(static=True))

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

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        xp = jnp.pad(x, (0, self.lx_rows * 128 - self.ncols))
        xp2 = jnp.pad(
            xp.reshape(self.lx_rows, 128), ((self.top, self.bot), (0, 0))
        )
        y = _ell_apply(
            self.vals, self.enc, xp2, self.q, self.K, self.top,
            self.bmins, self.bspans, self.nprog, self.interpret,
        )
        return y.reshape(-1)[: self.n]

    def diag(self) -> jnp.ndarray:
        return self.diag_

    def abs_row_sum(self) -> jnp.ndarray:
        return self.absrow


def pallas_ell(
    A,
    q: int = 4,
    band_dtype=None,
    max_total_span: Optional[int] = None,
    interpret: bool = False,
) -> PallasELL:
    """Factory: square ELLMatrix -> PallasELL.

    q: (8,128)-row-tiles per kernel program (q*1024 rows/program).
    band_dtype=jnp.bfloat16 halves the value traffic (indices stay i32).
    Raises ValueError when the matrix is not bandwidth-bounded enough
    (sum of per-slot b-spans exceeds `max_total_span`, default 6*K) —
    callers fall back to the XLA ELL path (or RCM-reorder first).
    """
    from ..algebra.ell import ELLMatrix

    assert isinstance(A, ELLMatrix)
    n, ncols = A.shape
    K = A.row_width
    R = 1024 * q
    nprog = -(-n // R)
    n_pad = nprog * R

    vals = np.zeros((n_pad, K), dtype=np.asarray(A.values).dtype)
    cols = np.tile(np.arange(n_pad, dtype=np.int64)[:, None], (1, K))
    vals[:n] = np.asarray(A.values)
    cols[:n] = np.asarray(A.cols).astype(np.int64)

    # pad rows reference themselves (d = 0) against a zero-extended x
    d = cols - np.arange(n_pad, dtype=np.int64)[:, None]
    order = np.argsort(d, axis=1, kind="stable")
    d = np.take_along_axis(d, order, axis=1)
    vals = np.take_along_axis(vals, order, axis=1)

    l = (np.arange(n_pad, dtype=np.int64) % 128)[:, None]
    e = l + d
    b = e >> 7
    l2 = (e & 127).astype(np.int32)
    bmins = tuple(int(b[:, k].min()) for k in range(K))
    bmaxs = tuple(int(b[:, k].max()) for k in range(K))
    bspans = tuple(mx - mn + 1 for mn, mx in zip(bmins, bmaxs))
    limit = max_total_span if max_total_span is not None else 6 * K
    if sum(bspans) > limit:
        raise ValueError(
            f"pallas_ell: total b-span {sum(bspans)} > {limit} "
            "(matrix not bandwidth-bounded; RCM-reorder or use XLA ELL)"
        )
    enc = (((b - np.array(bmins)[None, :]) << 7) | l2).astype(np.int32)

    # x layout: (lx_rows, 128) covering max(n_pad, ncols), plus `top`
    # zero sublane-rows so negative b slices stay in range
    lx = max(n_pad, -(-ncols // 128) * 128)
    lx_rows = lx // 128
    top = max(0, -min(bmins))
    # bottom guard: highest slice start (tile base + bmax) + 8 must fit
    max_start = (n_pad // 128 - 8) + max(max(bmaxs), 0)
    bot = max(8, max_start + 8 - lx_rows)

    def _tiles(a):
        # (n_pad, K) -> (nprog*q*K, 8, 128) in (p, t, k) major order
        a4 = a.reshape(nprog, q, 8, 128, K)
        return np.ascontiguousarray(
            np.moveaxis(a4, 4, 2)
        ).reshape(nprog * q * K, 8, 128)

    vdt = band_dtype or A.values.dtype
    ell_diag = (vals[:n] * (d[:n] == 0)).sum(axis=1)
    absrow = np.abs(vals[:n]).sum(axis=1)

    return PallasELL(
        vals=jnp.asarray(_tiles(vals), dtype=vdt),
        enc=jnp.asarray(_tiles(enc)),
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
        bmins=bmins,
        bspans=bspans,
        interpret=bool(interpret),
    )
