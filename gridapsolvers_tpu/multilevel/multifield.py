"""Multi-field transfer operators.

Analog of the reference's MultiFieldTransferOperators
(src/MultilevelTools/MultiFieldTransferOperators.jl:4-29,45-100): one
transfer operator per field of a tuple (block) vector, applied fieldwise.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MultiFieldTransfer:
    ops: Tuple[object, ...]

    def matvec(self, x):
        return tuple(op.matvec(xi) for op, xi in zip(self.ops, x))
