"""Explicit halo-exchange stencil matvec (shard_map + lax.ppermute).

The auto-partitioned StencilMatrix matvec (parallel/dist.py) lets XLA's
SPMD partitioner turn every per-band shifted slice into its own
collective-permute — measured 273 permutes per GMG-CG iteration at 8
devices (COMMS_r04). This wrapper performs ONE halo exchange per matvec
(2 ppermutes per sharded axis, halo width = the stencil's reach) and
applies all bands locally:

  y = y_interior(x_local)  +  corrections(halo_lo, halo_hi)

The interior term is data-independent of the permutes, so the latency-
hiding scheduler can overlap the halo exchange with the bulk of the
local SpMV — BASELINE's "halo exchange overlapped with local compute"
north star, expressed structurally in the dataflow rather than left to
the partitioner.

Reference counterpart: PartitionedArrays' consistent! neighbor exchange
(SURVEY §2.8.2, PAExtras.jl:84-97) — a neighbor-graph exchange, not
per-band traffic.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..algebra.stencil import StencilMatrix


def _halo_widths(offsets, k):
    lo = max(-min(o[k] for o in offsets), 0)
    hi = max(max(o[k] for o in offsets), 0)
    return lo, hi


def _perm_up(p):
    # values move to the next-higher rank: halo_lo of rank i+1 comes
    # from rank i. Missing pairs deliver zeros (exactly the open-BC pad).
    return [(i, i + 1) for i in range(p - 1)]


def _perm_down(p):
    return [(i + 1, i) for i in range(p - 1)]


def _conv(bands, xp, offsets, lo, out_shape):
    """All-bands multiply-add: output[r] = sum_s b_s[r] * xp[r + off + lo]
    (xp already padded so indices are in range)."""
    d = len(out_shape)
    y = None
    for s, off in enumerate(offsets):
        sl = tuple(
            slice(lo[k] + off[k], lo[k] + off[k] + out_shape[k])
            for k in range(d)
        )
        t = bands[s] * xp[sl]
        y = t if y is None else y + t
    return y


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HaloStencilMatrix:
    """StencilMatrix whose matvec runs inside shard_map with an explicit
    neighbor halo exchange. `inner` holds the (device-sharded) bands with
    grid_vectors=True; `axes` names the mesh axes mapped onto the leading
    grid dimensions (slab partition = one axis)."""

    inner: StencilMatrix
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    axes: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))

    # -- pass-throughs --------------------------------------------------
    @property
    def grid_shape(self):
        return self.inner.grid_shape

    @property
    def offsets(self):
        return self.inner.offsets

    @property
    def grid_vectors(self):
        return True

    @property
    def periodic(self):
        return self.inner.periodic

    @property
    def n(self):
        return self.inner.n

    @property
    def shape(self):
        return self.inner.shape

    @property
    def dtype(self):
        return self.inner.dtype

    @property
    def nnz(self):
        return self.inner.nnz

    @property
    def bands(self):
        return self.inner.bands

    def diag(self):
        return self.inner.diag()

    def abs_row_sum(self):
        return self.inner.abs_row_sum()

    def todense(self):
        return self.inner.todense()

    def astype(self, dtype):
        return HaloStencilMatrix(
            self.inner.astype(dtype), self.mesh, self.axes
        )

    # -- matvec ---------------------------------------------------------
    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        A = self.inner
        mesh, axes = self.mesh, self.axes
        d = len(A.grid_shape)
        per = A.periodic or tuple(False for _ in range(d))
        if any(per[k] for k in range(len(axes))):
            # periodic sharded axes would need wrap pairs in the permute;
            # fall back to the auto-partitioned path (correct, more comms)
            return A.matvec(x)
        offsets = A.offsets
        nshard = len(axes)
        xspec = P(*axes, *([None] * (d - nshard)))
        bspec = P(None, *axes, *([None] * (d - nshard)))
        psizes = tuple(mesh.shape[a] for a in axes)

        def _pad_unsharded(blk):
            """Zero/periodic pad every axis >= nshard of a local block."""
            xp = blk
            for k in range(nshard, d):
                lo_k, hi_k = _halo_widths(offsets, k)
                if lo_k == 0 and hi_k == 0:
                    continue
                parts = []
                nloc = xp.shape[k]
                if lo_k:
                    sl = [slice(None)] * d
                    sl[k] = slice(nloc - lo_k, nloc)
                    b = xp[tuple(sl)]
                    parts.append(b if per[k] else jnp.zeros_like(b))
                parts.append(xp)
                if hi_k:
                    sl = [slice(None)] * d
                    sl[k] = slice(0, hi_k)
                    b = xp[tuple(sl)]
                    parts.append(b if per[k] else jnp.zeros_like(b))
                xp = jnp.concatenate(parts, axis=k)
            return xp

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(bspec, xspec),
            out_specs=xspec,
        )
        def fn_slab(bl, xl):
            """1 sharded axis: interior/corrections split. y0 depends
            only on the local block — the two ppermutes and the O(halo)
            correction strips are the only halo-dependent work, so the
            scheduler can overlap the exchange with the bulk SpMV."""
            lo0, hi0 = _halo_widths(offsets, 0)
            p = psizes[0]
            n0 = xl.shape[0]
            name = axes[0]
            h_lo = h_hi = None
            if lo0 and p > 1:
                h_lo = jax.lax.ppermute(
                    xl[n0 - lo0:], name, _perm_up(p)
                )
            if hi0 and p > 1:
                h_hi = jax.lax.ppermute(xl[:hi0], name, _perm_down(p))

            # interior: all bands on the zero-haloed local block
            zlo = jnp.zeros_like(xl[:lo0])
            zhi = jnp.zeros_like(xl[:hi0])
            xp0 = jnp.concatenate([zlo, xl, zhi], axis=0) \
                if (lo0 or hi0) else xl
            lo = [lo0] + [_halo_widths(offsets, k)[0] for k in range(1, d)]
            y = _conv(bl, _pad_unsharded(xp0), offsets, lo, xl.shape)

            # corrections: only the first lo0 / last hi0 output rows
            if h_lo is not None:
                strip = jnp.concatenate(
                    [h_lo, jnp.zeros_like(xl[: lo0 + hi0])], axis=0
                )
                corr = _conv(
                    bl[:, :lo0], _pad_unsharded(strip), offsets, lo,
                    (lo0,) + xl.shape[1:],
                )
                y = y.at[:lo0].add(corr)
            if h_hi is not None:
                strip = jnp.concatenate(
                    [jnp.zeros_like(xl[: hi0 + lo0]), h_hi], axis=0
                )
                corr = _conv(
                    bl[:, n0 - hi0:], _pad_unsharded(strip), offsets, lo,
                    (hi0,) + xl.shape[1:],
                )
                y = y.at[n0 - hi0:].add(corr)
            return y

        if nshard == 1:
            return fn_slab(A.bands, x)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(bspec, xspec),
            out_specs=xspec,
        )
        def fn(bl, xl):
            # ---- halo exchange: 2 ppermutes per sharded axis ----
            halos = []  # (axis k, h_lo, h_hi)
            src = xl
            for j, name in enumerate(axes):
                lo_w, hi_w = _halo_widths(offsets, j)
                p = psizes[j]
                h_lo = h_hi = None
                if lo_w and p > 1:
                    sl = [slice(None)] * d
                    sl[j] = slice(src.shape[j] - lo_w, src.shape[j])
                    h_lo = jax.lax.ppermute(
                        src[tuple(sl)], name, _perm_up(p)
                    )
                if hi_w and p > 1:
                    sl = [slice(None)] * d
                    sl[j] = slice(0, hi_w)
                    h_hi = jax.lax.ppermute(
                        src[tuple(sl)], name, _perm_down(p)
                    )
                halos.append((j, lo_w, hi_w, h_lo, h_hi))
                # extend src along j so the NEXT axis' exchange carries
                # corner halos through the neighbor (sequential-axis
                # corner trick)
                parts = []
                if h_lo is not None:
                    parts.append(h_lo)
                elif lo_w:
                    sl = [slice(None)] * d
                    sl[j] = slice(0, lo_w)
                    parts.append(jnp.zeros_like(src[tuple(sl)]))
                parts.append(src)
                if h_hi is not None:
                    parts.append(h_hi)
                elif hi_w:
                    sl = [slice(None)] * d
                    sl[j] = slice(0, hi_w)
                    parts.append(jnp.zeros_like(src[tuple(sl)]))
                if len(parts) > 1:
                    src = jnp.concatenate(parts, axis=j)

            # ---- unsharded axes: plain zero pad (open BCs; periodic
            # unsharded axes wrap locally) ----
            lo = [0] * d
            hi = [0] * d
            for k in range(d):
                if k < nshard:
                    lo[k], hi[k] = _halo_widths(offsets, k)
                    continue
                lo[k], hi[k] = _halo_widths(offsets, k)
            xp = src
            for k in range(nshard, d):
                if lo[k] == 0 and hi[k] == 0:
                    continue
                parts = []
                nloc = xp.shape[k]
                if lo[k]:
                    sl = [slice(None)] * d
                    sl[k] = slice(nloc - lo[k], nloc)
                    blk = xp[tuple(sl)]
                    parts.append(
                        blk if per[k] else jnp.zeros_like(blk)
                    )
                parts.append(xp)
                if hi[k]:
                    sl = [slice(None)] * d
                    sl[k] = slice(0, hi[k])
                    blk = xp[tuple(sl)]
                    parts.append(
                        blk if per[k] else jnp.zeros_like(blk)
                    )
                xp = jnp.concatenate(parts, axis=k)

            return _conv(bl, xp, offsets, lo, xl.shape)

        return fn(A.bands, x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HaloProlongation:
    """Factor-2 Q1 interpolation between NESTED-padded sharded grids
    (fine shard = 2 x coarse shard along the slab axis): ONE ppermute
    (coarse high halo row) + local interleave, instead of the
    auto-partitioned lowering's full all-gather at the misaligned shard
    boundary (COMMS_r04: 14 all-gathers / 414 KB per GMG-CG iteration).

    fine[2t] = c[t]; fine[2t+1] = 0.5 (c[t] + c[t+1]) with c[m] = the
    neighbor's first row (edge shard receives ppermute zeros = the pad
    region, masked after)."""

    fine_shape: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    coarse_shape: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    axes: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    mask_fine: object = None
    periodic: Tuple[bool, ...] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    def matvec(self, xc: jnp.ndarray) -> jnp.ndarray:
        from ..multilevel.transfer import _expand_dim

        d = len(self.coarse_shape)
        per = self.periodic or tuple(False for _ in range(d))
        assert len(self.axes) == 1 and not per[0]
        name = self.axes[0]
        p = self.mesh.shape[name]
        xspec = P(name, *([None] * (d - 1)))

        @partial(
            jax.shard_map, mesh=self.mesh, in_specs=(xspec,),
            out_specs=xspec,
        )
        def fn(cl):
            m = cl.shape[0]
            c_next = jax.lax.ppermute(cl[:1], name, _perm_down(p)) \
                if p > 1 else jnp.zeros_like(cl[:1])
            nxt = jnp.concatenate([cl[1:], c_next], axis=0)
            odd = 0.5 * (cl + nxt)
            inter = jnp.stack([cl, odd], axis=1)
            out = inter.reshape((2 * m,) + cl.shape[1:])
            for k in range(1, d):
                out = _expand_dim(out, k, per[k])
            # unsharded axes expand to 2n-1 == the true fine size; the
            # sharded axis is exactly 2m by construction (nested pads)
            return out

        y = fn(xc)
        tgt = tuple(self.fine_shape)
        if y.shape != tgt:
            y = y[tuple(slice(0, n) for n in tgt)]
        if self.mask_fine is not None:
            y = y * self.mask_fine
        return y


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HaloRestriction:
    """Full-weighting restriction between NESTED-padded sharded grids:
    z[t] = f[2t] + 0.5 f[2t-1] + 0.5 f[2t+1], with f[-1] = the previous
    shard's last row via ONE ppermute. Transpose of HaloProlongation on
    the real region."""

    fine_shape: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    coarse_shape: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    axes: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    mask_coarse: object = None
    mask_fine: object = None
    periodic: Tuple[bool, ...] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    def matvec(self, xf: jnp.ndarray) -> jnp.ndarray:
        from ..multilevel.transfer import _reduce_dim

        d = len(self.fine_shape)
        per = self.periodic or tuple(False for _ in range(d))
        assert len(self.axes) == 1 and not per[0]
        name = self.axes[0]
        p = self.mesh.shape[name]
        xspec = P(name, *([None] * (d - 1)))
        if self.mask_fine is not None:
            xf = xf * self.mask_fine

        @partial(
            jax.shard_map, mesh=self.mesh, in_specs=(xspec,),
            out_specs=xspec,
        )
        def fn(fl):
            m2 = fl.shape[0]
            m = m2 // 2
            h_prev = jax.lax.ppermute(fl[m2 - 1:], name, _perm_up(p)) \
                if p > 1 else jnp.zeros_like(fl[:1])
            pairs = fl.reshape((m, 2) + fl.shape[1:])
            even = pairs[:, 0]
            odd = pairs[:, 1]
            odd_right = jnp.concatenate([h_prev, odd[:-1]], axis=0)
            out = even + 0.5 * odd + 0.5 * odd_right
            for k in range(1, d):
                out = _reduce_dim(out, k, per[k])
            return out

        y = fn(xf)
        tgt = tuple(self.coarse_shape)
        if y.shape != tgt:
            y = y[tuple(slice(0, n) for n in tgt)]
        if self.mask_coarse is not None:
            y = y * self.mask_coarse
        return y


def halo_wrap(A: StencilMatrix, mesh: Mesh, axes) -> "HaloStencilMatrix":
    """Wrap a sharded grid-vector StencilMatrix with the halo-exchange
    matvec. `axes` as in parallel.dist (one name, tuple, or None=all)."""
    from .dist import _axes_tuple

    return HaloStencilMatrix(A, mesh, tuple(_axes_tuple(mesh, axes)))


def halo_spmv(A: StencilMatrix, mesh: Mesh, axis: str = "p"):
    """Back-compat closure form of the round-2 explicit halo SpMV:
    returns a jittable matvec using the HaloStencilMatrix machinery."""
    H = halo_wrap(A, mesh, axis)
    return H.matvec
