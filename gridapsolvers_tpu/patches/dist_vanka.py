"""Distributed (sharded) Vanka smoother.

The reference's distributed BlockJacobiSolver needs a ghost-row fetch to
complete off-processor patch rows (src/SolverInterfaces/PAExtras.jl:9-110,
src/PatchBasedSmoothers/BlockJacobiSolvers.jl:111-117). Here the coupled
system is laid out in the INTERLEAVED sharded ordering (dist_block.py):
per shard, the local rows of all fields are contiguous, so every vertex
patch (pressure seed + its velocity couplings) lives within one halo hop
of its seed's shard. The smoother is then three shard-local batched ops
bracketed by the same two ppermutes as the SpMV:

    extend   r_loc -> [halo | own | halo]     (consistent!)
    gather / batched LU solve / scatter-add   (the patch solves)
    reduce   halo contributions back          (assemble!)

Patch matrices are EXTRACTED from the sharded leaf value arrays fully on
device (`update` is jittable — the per-Newton numerical_setup! analog),
with halo'd matrix rows for patches straddling shard boundaries.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..algebra.ell_view import iter_field_leaves
from ..interfaces import Smoother
from ..parallel.dist_block import FieldLayout
from ..parallel.dist_ell import halo_extend, halo_reduce
from ..utils import pytrees as pt
from .vanka import vanka_patches


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class DistVankaMeta:
    """Static structure of the interleaved patch solve."""

    layout: FieldLayout
    rows: Tuple[Tuple[int, ...], ...]   # leaf ids per field row
    leaf_widths: Tuple[int, ...]
    width: int                           # K of the interleaved ELL
    hl: int
    hr: int
    npp: int                             # patches per shard (padded)
    k: int                               # patch width

    @property
    def L(self) -> int:
        return self.hl + self.layout.M + self.hr


def build_dist_vanka_tables(A_serial, layout: FieldLayout, leaves_info,
                            seed_field: int = -1, topo=None):
    """Host-side, once: interleaved column table, per-shard patch tables,
    overlap weights. Returns (meta, arrays dict of host numpy).

    topo: optional explicit PatchTopology over the FIELD-MAJOR real dof
    space (e.g. vertex-star velocity patches for the grad-div augmented
    GMG smoother). Each patch is assigned to the shard owning its first
    valid dof; per-shard patch counts are padded to the max with fully
    invalid (identity-solve) patches. Default: pressure-seeded Vanka
    patches (vanka_patches)."""
    S = layout.nprocs
    m, soff, M = layout.m, layout.soff, layout.M
    nf = len(m)

    # leaf -> field row bookkeeping
    leaves = list(iter_field_leaves(A_serial))
    assert len(leaves) == len(leaves_info)
    rows: List[Tuple[int, ...]] = [tuple() for _ in range(nf)]
    widths = []
    for lid, (fi, fj, cols_pad) in enumerate(leaves_info):
        rows[fi] = rows[fi] + (lid,)
        widths.append(int(cols_pad.shape[1]))
    K = max(
        sum(widths[lid] for lid in rows[f]) if rows[f] else 1
        for f in range(nf)
    )

    m_arr = np.asarray(m)
    soff_arr = np.asarray(soff)

    def inter_of(f, idx):
        """Vectorized over both field ids and local indices."""
        mf = m_arr[f]
        return (idx // mf) * M + soff_arr[f] + idx % mf

    # ---- interleaved global column table (S*M, K), rel-coords later -----
    cols_inter = np.zeros((S * M, K), dtype=np.int64)
    for f in range(nf):
        # interleaved rows of field f on shard s: s*M + soff[f] + [0, m[f])
        parts = []
        for lid in rows[f]:
            fi, fj, cols_pad = leaves_info[lid]
            c = cols_pad.astype(np.int64)
            parts.append((c // m[fj]) * M + soff[fj] + c % m[fj])
        if parts:
            block = np.concatenate(parts, axis=1)  # (n_f_pad, sum widths)
        else:
            block = np.zeros((S * m[f], 0), dtype=np.int64)
        n_f_pad = S * m[f]
        rows_f = np.arange(n_f_pad)
        inter_rows = inter_of(f, rows_f)
        if block.shape[1] < K:
            # padding slots: own shard window start (rel = 0, value 0)
            pad = np.broadcast_to(
                ((rows_f // m[f]) * M)[:, None],
                (n_f_pad, K - block.shape[1]),
            )
            block = np.concatenate([block, pad], axis=1)
        cols_inter[inter_rows] = block

    # ---- patches ---------------------------------------------------------
    real_offs = np.cumsum([0] + list(layout.real_sizes))
    if topo is None:
        topo = vanka_patches(A_serial, seed_field)
        sf = seed_field if seed_field >= 0 else nf + seed_field
        n_seed = layout.real_sizes[sf]
        assert topo.n_patches == n_seed, "one patch per seed-field row expected"
        patch_shard = np.arange(n_seed) // m[sf]
        npp = m[sf]
    else:
        patch_shard = None  # derived from the first valid dof below
        npp = None

    # real field-major dof -> interleaved
    dofs = topo.dofs.astype(np.int64)
    valid = dofs != topo.dummy
    fld = np.clip(np.searchsorted(real_offs, dofs, side="right") - 1, 0, nf - 1)
    loc = dofs - real_offs[fld]
    dofs_inter = np.where(valid, inter_of(fld, loc), -1)

    if patch_shard is None:
        first = np.argmax(valid, axis=1)
        has = valid.any(axis=1)
        patch_shard = np.where(
            has, dofs_inter[np.arange(len(first)), first] // M, 0
        )
        npp = int(np.bincount(patch_shard[has], minlength=S).max())
        keep = np.nonzero(has)[0]
    else:
        keep = np.arange(topo.n_patches)
    k = topo.width
    table = np.full((S, npp, k), -1, dtype=np.int64)
    fill = np.zeros(S, dtype=np.int64)
    for p in keep:
        s = int(patch_shard[p])
        table[s, fill[s]] = dofs_inter[p]
        fill[s] += 1

    # ---- halo widths: sparsity window AND patch window -------------------
    shard_rows = (np.arange(S * M) // M)[:, None]
    rel_cols = cols_inter - shard_rows * M
    hl = max(0, int(-rel_cols.min()))
    hr = max(0, int(rel_cols.max()) - M + 1)
    tv = table >= 0
    if tv.any():
        rel_p = table - (np.arange(S) // 1)[:, None, None] * M
        hl = max(hl, int(-(rel_p[tv]).min()))
        hr = max(hr, int(rel_p[tv].max()) - M + 1)
    if hl > M or hr > M:
        raise ValueError(
            f"Vanka window ({hl},{hr}) exceeds shard size {M}: too few rows "
            "per shard for single-hop patches"
        )
    L = hl + M + hr

    cols_loc = (rel_cols + hl).astype(np.int32)
    dofs_loc = np.where(
        tv, table - np.arange(S)[:, None, None] * M + hl, L
    ).astype(np.int32).reshape(S * npp, k)

    # ---- weights / uncovered ---------------------------------------------
    counts = np.zeros(S * M)
    np.add.at(counts, dofs_inter[valid].reshape(-1), 1.0)
    w = 1.0 / np.maximum(counts, 1.0)
    uncov = counts == 0

    meta = DistVankaMeta(
        layout=layout,
        rows=tuple(rows),
        leaf_widths=tuple(widths),
        width=K,
        hl=hl,
        hr=hr,
        npp=npp,
        k=k,
    )
    arrays = {
        "cols": cols_loc,            # (S*M, K) window coords
        "dofs": dofs_loc,            # (S*npp, k) window coords, dummy == L
        "w": w,                      # (S*M,)
        "uncov": uncov,              # (S*M,)
    }
    return meta, arrays


@dataclasses.dataclass(frozen=True, eq=False)
class DistVankaSolver(Smoother):
    """Sharded batched overlapping Vanka over a distributed block system.

    Construct via `make_dist_vanka`. setup() moves the host tables into
    (sharded) state; update() re-extracts + re-factorizes on device.
    """

    meta: DistVankaMeta = None
    host_arrays: dict = None
    omega: float = 1.0
    weighting: str = "overlap"
    # point-Jacobi fallback on dofs no patch covers; disable when used as
    # a patch CORRECTION (patch prolongations) that must leave non-patch
    # dofs untouched
    jacobi_uncovered: bool = True

    # -- setup / refresh -----------------------------------------------

    def setup(self, A, x=None):
        lay = self.meta.layout
        sh1 = NamedSharding(lay.mesh, P(lay.axis))
        sh2 = NamedSharding(lay.mesh, P(lay.axis, None))
        ha = self.host_arrays
        state = {
            "cols": jax.device_put(jnp.asarray(ha["cols"]), sh2),
            "dofs": jax.device_put(jnp.asarray(ha["dofs"]), sh2),
            "w": jax.device_put(jnp.asarray(ha["w"]), sh1),
            "uncov": jax.device_put(jnp.asarray(ha["uncov"]), sh1),
        }
        return self._refresh(state, A)

    def _local_values(self, leaf_vals):
        """Per-shard (M, K) interleaved values from leaf local blocks."""
        meta = self.meta
        blocks = []
        for f, lids in enumerate(meta.rows):
            parts = [leaf_vals[lid] for lid in lids]
            blk = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 1)
            if blk.shape[1] < meta.width:
                blk = jnp.pad(blk, ((0, 0), (0, meta.width - blk.shape[1])))
            blocks.append(blk)
        return jnp.concatenate(blocks, axis=0)

    def update(self, state, A, x=None):
        """Jittable re-extraction + re-factorization (numerical_setup!)."""
        return self._refresh(state, A)

    def _refresh(self, state, A):
        meta = self.meta
        lay = meta.layout
        hl, hr, M, axis = meta.hl, meta.hr, lay.M, lay.axis
        L = meta.L
        leaf_vals = [leaf.values for _, _, leaf in iter_field_leaves(A)]

        def local(cols, dofs, *lv):
            vals_loc = self._local_values(lv)          # (M, K)
            vals_ext = halo_extend(vals_loc, hl, hr, axis)
            cols_ext = halo_extend(cols, hl, hr, axis)
            # received halo rows carry the OWNER's window coords; shift
            # into mine (left neighbor's window sits M rows earlier)
            if hl:
                cols_ext = cols_ext.at[:hl].add(-M)
            if hr:
                cols_ext = cols_ext.at[-hr:].add(M)
            safe = jnp.minimum(dofs, L - 1)
            row_vals = vals_ext[safe]                   # (npp, k, K)
            row_cols = cols_ext[safe]
            match = row_cols[:, :, None, :] == dofs[:, None, :, None]
            Ap = jnp.sum(
                jnp.where(match, row_vals[:, :, None, :], 0.0), axis=-1
            )
            valid = dofs != L
            vi = valid[:, :, None] & valid[:, None, :]
            eye = jnp.eye(meta.k, dtype=vals_loc.dtype)[None]
            Ap = jnp.where(vi, Ap, eye)
            # explicit batched inverse: apply-time solve = one MXU matmul
            inv = jnp.linalg.inv(Ap)
            # own-row diagonal (for uncovered point-Jacobi)
            rid = hl + jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
            dloc = jnp.sum(jnp.where(cols == rid, vals_loc, 0.0), axis=1)
            return inv, dloc

        inv, diag = jax.shard_map(
            local,
            mesh=lay.mesh,
            in_specs=(P(axis, None), P(axis, None))
            + tuple(P(axis, None) for _ in leaf_vals),
            out_specs=(P(axis, None, None), P(axis)),
        )(state["cols"], state["dofs"], *leaf_vals)

        new = dict(state)
        new.update(
            {
                "A": A,
                "inv": inv,
                "uncovered_inv_diag": jnp.where(
                    state["uncov"] & self.jacobi_uncovered,
                    1.0 / jnp.where(diag == 0, 1.0, diag),
                    0.0,
                ),
            }
        )
        return new

    # -- application -----------------------------------------------------

    def apply(self, state, r):
        meta = self.meta
        lay = meta.layout
        hl, hr, M, axis = meta.hl, meta.hr, lay.M, lay.axis
        L = meta.L
        m, soff = lay.m, lay.soff
        overlap = self.weighting == "overlap"
        r_leaves = jax.tree_util.tree_leaves(r)

        def local(dofs, inv, w, inv_diag, *rl):
            r_loc = jnp.concatenate(rl, axis=0)        # (M,) interleaved
            re = halo_extend(r_loc, hl, hr, axis)
            re1 = jnp.concatenate([re, jnp.zeros((1,), re.dtype)])
            rp = re1[jnp.minimum(dofs, L)]             # dummy -> 0 slot
            valid = dofs != L
            rp = jnp.where(valid, rp, 0.0)
            dxp = jnp.einsum(
                "pij,pj->pi", inv, rp, preferred_element_type=rp.dtype
            )
            dxp = jnp.where(valid, dxp, 0.0)
            ze = jnp.zeros((L + 1,), re.dtype).at[dofs.reshape(-1)].add(
                dxp.reshape(-1)
            )
            z = halo_reduce(ze[:L], hl, hr, axis)      # assemble!
            if overlap:
                z = z * w
            z = z + inv_diag * r_loc
            return tuple(z[soff[i]:soff[i] + m[i]] for i in range(len(m)))

        parts = jax.shard_map(
            local,
            mesh=lay.mesh,
            in_specs=(
                P(axis, None),
                P(axis, None, None),
                P(axis),
                P(axis),
            )
            + tuple(P(axis) for _ in r_leaves),
            out_specs=tuple(P(axis) for _ in m),
        )(
            state["dofs"], state["inv"], state["w"],
            state["uncovered_inv_diag"], *r_leaves,
        )
        z = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(r),
            [self.omega * p for p in parts],
        )
        return z

    def smooth(self, state, x, r):
        dx = self.apply(state, r)
        x = pt.add(x, dx)
        r = pt.sub(r, state["A"].matvec(dx))
        return x, r

    def solve(self, state, b, x0=None):
        x = pt.zeros_like(b) if x0 is None else x0
        r = pt.sub(b, state["A"].matvec(x))
        x, _ = self.smooth(state, x, r)
        return x, None


def make_dist_vanka(
    A_serial,
    layout: FieldLayout,
    leaves_info,
    seed_field: int = -1,
    omega: float = 1.0,
    weighting: str = "overlap",
    topo=None,
) -> DistVankaSolver:
    """Build a distributed Vanka smoother for a system sharded with
    shard_block_system (pass its layout + leaves_info and the serial
    operator used to derive the patch topology). `topo` overrides the
    pressure-seeded patches with an explicit field-major PatchTopology
    (e.g. vertex-star velocity patches)."""
    meta, arrays = build_dist_vanka_tables(
        A_serial, layout, leaves_info, seed_field, topo=topo
    )
    return DistVankaSolver(
        meta=meta, host_arrays=arrays, omega=omega, weighting=weighting
    )
