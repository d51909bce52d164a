"""Blocked-kernel view of composite block operators.

`flat_kernel_operator(A)` rebuilds a square composite (BlockOperator /
FieldwiseOperator of ELL/Stencil leaves) as a field-blocked operator
whose every square field block runs through the sorted-slot Pallas ELL
SpMV kernel (ops/ell_pallas.py) on TPU — one near-roofline kernel per
block instead of a pile of per-band XLA ops (measured killer for the
augmented Stokes cycle: 25-band blocks at GMG level sizes are
overhead-bound).

Why per-BLOCK kernels rather than one kernel over the flattened system:
the kernel's bounded-offset premise is d = col - row small, which holds
within a field block (grid-local coupling) but NOT across fields — a
cross block's offsets sit near ±n_field, and per-row slot sorting mixes
row groups with d ~ +n and d ~ -n into the same slot, blowing the
per-slot span. Each square field block, taken alone, is perfectly
banded (cross blocks too: they couple the same grid to itself).

The original composite stays reachable as `.inner` for machinery that
reads block structure (Vanka patch extraction via ell_view, coarse
densification, field sizes).
"""
from __future__ import annotations

import dataclasses
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from .ell import ELLMatrix, ell_from_scipy


def _default_engine() -> str:
    """Pallas on any accelerator backend (incl. the axon TPU relay,
    whose platform name is not 'tpu'), padded ELL on CPU."""
    try:
        return "ell" if jax.default_backend() == "cpu" else "pallas"
    except Exception:
        return "ell"


def resolve_engine(engine: str) -> str:
    """THE SpMV-engine auto-resolution policy (single source: AMG level
    operators, AMG transfers, flat blocks and materialized Vanka all
    resolve 'auto' through here so the policies cannot drift)."""
    return _default_engine() if engine == "auto" else engine


def _kernel_from_scipy(S, engine: str, q: int, dtype, band_dtype=None,
                       interpret: bool = False, refreshable: bool = False):
    ell = ell_from_scipy(S.tocsr(), dtype=dtype)
    if engine == "pallas":
        # pallas_rect == pallas_ell on square blocks and adds the
        # structured-remap path for rectangular cross-field blocks
        from ..ops.ell_pallas import pallas_rect

        try:
            return pallas_rect(
                ell, q=q, band_dtype=band_dtype, interpret=interpret,
                refreshable=refreshable,
            )
        except ValueError as e:
            warnings.warn(
                f"flat_kernel_operator: pallas rejected a block ({e}); "
                "falling back to XLA ELL"
            )
    return ell


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BlockedKernelOperator:
    """Square composite operator with per-field-block fast-SpMV kernels.

    Operates on the same block-pytree vectors as the wrapped composite
    (leaves in tree-flatten order == field order)."""

    kblocks: tuple        # nf x nf tuple-of-tuples of kernels or None
    inner: object         # the original composite operator (pytree)
    sizes: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        n = sum(self.sizes)
        return (n, n)

    @property
    def dtype(self):
        if self.inner is not None and hasattr(self.inner, "dtype"):
            return self.inner.dtype
        for row in self.kblocks:
            for blk in row:
                if blk is not None:
                    return blk.dtype
        raise ValueError("empty BlockedKernelOperator")

    def matvec(self, x):
        leaves, treedef = jax.tree_util.tree_flatten(x)
        out = []
        for i, row in enumerate(self.kblocks):
            acc = None
            for j, blk in enumerate(row):
                if blk is None:
                    continue
                c = blk.matvec(jnp.ravel(leaves[j]))
                acc = c if acc is None else acc + c
            if acc is None:
                acc = jnp.zeros_like(jnp.ravel(leaves[i]))
            out.append(acc.reshape(leaves[i].shape))
        return jax.tree_util.tree_unflatten(treedef, out)

    def diag(self):
        return self.inner.diag() if hasattr(self.inner, "diag") else None

    def block(self, i, j):
        return self.inner.block(i, j)

    def todense(self):
        return self.inner.todense()


def blocked_kernel_from_scipy(
    S, sizes, inner=None, engine: str = "auto", q: int = 4, dtype=None,
    band_dtype=None, interpret: bool = False, refreshable: bool = False,
) -> BlockedKernelOperator:
    """Cut a square scipy matrix into field blocks (row/col offsets from
    `sizes`) and wrap every nonzero block in the fast-SpMV kernel.

    refreshable=True keeps explicit zeros in the block patterns (the
    pattern-static refresh contract: every stored entry of S must keep
    its slot so later values can land there) and builds the Pallas
    blocks with refresh plumbing."""
    engine = resolve_engine(engine)
    offs = np.cumsum([0] + list(sizes))
    nf = len(sizes)
    S = S.tocsr()
    rows = []
    for i in range(nf):
        row = []
        for j in range(nf):
            blk = S[offs[i]:offs[i + 1], offs[j]:offs[j + 1]].tocsr()
            if not refreshable:
                blk.eliminate_zeros()
            if blk.nnz == 0:
                row.append(None)
            else:
                row.append(
                    _kernel_from_scipy(
                        blk, engine, q, dtype, band_dtype, interpret,
                        refreshable,
                    )
                )
        rows.append(tuple(row))
    return BlockedKernelOperator(
        kblocks=tuple(rows), inner=inner, sizes=tuple(int(s) for s in sizes)
    )


def flat_kernel_operator(
    A, engine: str = "auto", q: int = 4, band_dtype=None,
    interpret: bool = False,
) -> BlockedKernelOperator:
    """Build a BlockedKernelOperator from a square composite operator."""
    from .convert import to_scipy
    from .ell_view import ell_pattern

    meta, _, _ = ell_pattern(A)
    assert meta.n_rows == meta.n_cols, "square composites only"
    S = to_scipy(A)
    dtype = np.dtype(
        jnp.float32 if A.dtype == jnp.float32 else A.dtype
    )
    return blocked_kernel_from_scipy(
        S, meta.row_sizes, inner=A, engine=engine, q=q, dtype=dtype,
        band_dtype=band_dtype, interpret=interpret,
    )


# backwards-compatible alias (earlier name during round 3 development)
FlatKernelOperator = BlockedKernelOperator
