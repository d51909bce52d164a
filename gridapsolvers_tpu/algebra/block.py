"""Block operators for multiphysics (saddle-point) systems.

TPU-native replacement for the reference's BlockPRange / block PSparseMatrix
(BlockMultiFieldStyle assembly): a block operator is just an N x N grid of
per-field operators, and a block *vector* is a tuple of per-field arrays
(a pytree — so the Krylov drivers in linear/ work on it unchanged; see
utils/pytrees.py).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BlockOperator:
    """N x N block matrix; entries are operators with .matvec or None."""

    blocks: Tuple[Tuple[Optional[object], ...], ...]

    @property
    def nblocks(self) -> int:
        return len(self.blocks)

    def matvec(self, x: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        out = []
        for i, row in enumerate(self.blocks):
            acc = None
            for j, blk in enumerate(row):
                if blk is None:
                    continue
                contrib = blk.matvec(x[j])
                acc = contrib if acc is None else acc + contrib
            if acc is None:
                acc = jnp.zeros_like(x[i])
            out.append(acc)
        return tuple(out)

    def diag(self) -> Tuple[jnp.ndarray, ...]:
        return tuple(row[i].diag() for i, row in enumerate(self.blocks))

    def block(self, i: int, j: int):
        return self.blocks[i][j]

    @property
    def dtype(self):
        for row in self.blocks:
            for blk in row:
                if blk is not None:
                    return blk.dtype
        raise ValueError("empty BlockOperator")

    def todense(self) -> jnp.ndarray:
        """Debug-only densification."""
        rows = []
        sizes = self._block_sizes()
        for i, row in enumerate(self.blocks):
            cols = []
            for j, blk in enumerate(row):
                if blk is None:
                    cols.append(jnp.zeros((sizes[i], sizes[j])))
                else:
                    cols.append(blk.todense())
            rows.append(jnp.concatenate(cols, axis=1))
        return jnp.concatenate(rows, axis=0)

    def _block_sizes(self):
        n = self.nblocks
        sizes = [None] * n
        for i, row in enumerate(self.blocks):
            for j, blk in enumerate(row):
                if blk is not None:
                    sizes[i] = blk.shape[0]
        return sizes
