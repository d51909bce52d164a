"""One-level additive Schwarz.

Analog of the reference's SchwarzLinearSolver
(src/LinearSolvers/SchwarzLinearSolvers.jl:6-17,24-32,44-49): local solves
on overlapping subdomains followed by an additive combine. The reference's
subdomains are MPI-rank locals; on TPU we take contiguous overlapping
row-slabs of the structured grid (one per "virtual rank"), factorize each
slab operator densely, and apply all slab solves batched — the combine is a
weighted scatter-add (the reference's assemble!+consistent!).

(multiplicative variant: reference leaves it as TODO; same here.)
"""
from __future__ import annotations

import dataclasses
import numpy as np

from ..interfaces import LinearSolver
from ..patches.smoothers import PatchSolver
from ..patches.topology import PatchTopology


def slab_patches(
    grid_shape, n_subdomains: int, overlap: int = 1
) -> PatchTopology:
    """Overlapping slabs of the leading grid axis as subdomains."""
    n0 = grid_shape[0]
    rest = int(np.prod(grid_shape[1:])) if len(grid_shape) > 1 else 1
    n = n0 * rest
    dummy = n
    bounds = np.linspace(0, n0, n_subdomains + 1).astype(int)
    rows = []
    width = 0
    for s in range(n_subdomains):
        lo = max(bounds[s] - overlap, 0)
        hi = min(bounds[s + 1] + overlap, n0)
        dofs = (
            np.arange(lo * rest, hi * rest)
        )
        rows.append(dofs)
        width = max(width, len(dofs))
    table = np.full((n_subdomains, width), dummy, dtype=np.int32)
    for i, dofs in enumerate(rows):
        table[i, : len(dofs)] = dofs
    return PatchTopology(dofs=table, dummy=dummy, n_dofs=n)


@dataclasses.dataclass(frozen=True)
class SchwarzLinearSolver(LinearSolver):
    """Additive Schwarz over overlapping row-slab subdomains."""

    n_subdomains: int = 4
    overlap: int = 2
    omega: float = 1.0

    def setup(self, A, x=None):
        topo = slab_patches(A.grid_shape, self.n_subdomains, self.overlap)
        inner = PatchSolver(topo, omega=self.omega, weighting="overlap",
                            spd=False)
        return {"inner": inner, "state": inner.setup(A, x)}

    def update(self, state, A, x=None):
        inner = state["inner"]
        return {"inner": inner, "state": inner.update(state["state"], A, x)}

    def apply(self, state, r):
        return state["inner"].apply(state["state"], r)

    def solve(self, state, b, x0=None):
        return self.apply(state, b), None
