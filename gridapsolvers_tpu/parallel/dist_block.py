"""Sharded block (multiphysics) systems over a 1-D device axis.

Distributes the reference's BlockMultiFieldStyle systems (block PVectors /
PSparseMatrices, SURVEY.md §2.8 item 6): every scalar FIELD of the block
system is row-partitioned with the SAME number of shards, each leaf
coupling block becomes a DistELLMatrix, and block vectors stay pytrees of
sharded flat arrays — so all Krylov/block/GMG drivers work unchanged.

The module also defines the INTERLEAVED layout used by the distributed
Vanka smoother: per-shard concatenation of the fields' local rows,

    global interleaved index of (field f, row i) =
        (i // m_f) * M  +  soff_f  +  i % m_f,      M = sum_f m_f

which makes the full coupled system a single locally-contiguous sharded
ELL whose patch solves (seed dof + couplings) stay within one halo hop —
the reference needs an explicit ghost-row fetch for this
(src/SolverInterfaces/PAExtras.jl:9-110); here it is the same two
ppermutes as the SpMV.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..algebra.ell import ELLMatrix, ell_to_scipy
from ..algebra.stencil import StencilMatrix
from ..algebra.ell_view import iter_field_leaves, rebuild_with_leaves
from .dist_ell import DistELLMatrix, pad_multiple, shard_vector


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class FieldLayout:
    """Static description of a sharded multi-field dof space."""

    mesh: Mesh
    axis: str
    real_sizes: Tuple[int, ...]    # real (unpadded) dofs per field
    pad_sizes: Tuple[int, ...]     # padded (divisible) dofs per field
    m: Tuple[int, ...]             # per-shard rows per field

    @property
    def nprocs(self) -> int:
        return self.mesh.shape[self.axis]

    @property
    def M(self) -> int:
        return sum(self.m)

    @property
    def soff(self) -> Tuple[int, ...]:
        return tuple(int(x) for x in np.cumsum([0] + list(self.m))[:-1])

    def inter_index(self, f: int, idx: np.ndarray) -> np.ndarray:
        """Field-local (padded) row index -> global interleaved index."""
        return (idx // self.m[f]) * self.M + self.soff[f] + idx % self.m[f]

    def interleave(self, xs) -> jnp.ndarray:
        """Tuple of per-field sharded vectors -> one interleaved sharded
        vector (a per-shard concat; zero communication)."""
        leaves = jax.tree_util.tree_leaves(xs)
        axis = self.axis

        def f(*xl):
            return jnp.concatenate(xl, axis=0)

        return jax.shard_map(
            f,
            mesh=self.mesh,
            in_specs=tuple(P(axis) for _ in leaves),
            out_specs=P(axis),
        )(*leaves)

    def deinterleave(self, x: jnp.ndarray, like) -> tuple:
        """Inverse of interleave, reshaped into the pytree structure of
        `like`."""
        axis = self.axis
        soff, m = self.soff, self.m

        def f(xl):
            return tuple(xl[soff[i]:soff[i] + m[i]] for i in range(len(m)))

        parts = jax.shard_map(
            f,
            mesh=self.mesh,
            in_specs=(P(axis),),
            out_specs=tuple(P(axis) for _ in m),
        )(x)
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, list(parts))


def shard_block_system(
    A,
    mesh: Mesh,
    axis: str = "p",
    field_pads: Optional[Sequence[int]] = None,
):
    """Serial block operator (ELL leaves) -> (A_dist, layout, leaves_info).

    field_pads: optional padded size per field (e.g. grid-aligned padding
    so velocity vectors reshape to sharded node grids for GMG transfers).
    leaves_info: list of (fi, fj, cols_pad) host arrays in leaf order with
    cols in field-j PADDED numbering, slot-for-slot aligned with the
    sharded leaf's values — consumed by the distributed Vanka builder.
    """
    from .dist_ell import padded_ell_from_csr, shard_ell_arrays

    leaves = list(iter_field_leaves(A))
    nf = max(max(fi for fi, _, _ in leaves), max(fj for _, fj, _ in leaves)) + 1
    real = [0] * nf
    for fi, fj, leaf in leaves:
        real[fi] = int(leaf.shape[0])
        real[fj] = max(real[fj], int(leaf.shape[1]))
    S = mesh.shape[axis]
    if field_pads is None:
        pads = [pad_multiple(n, S) for n in real]
    else:
        pads = list(field_pads)
        assert all(p % S == 0 and p >= n for p, n in zip(pads, real))
    layout = FieldLayout(
        mesh=mesh,
        axis=axis,
        real_sizes=tuple(real),
        pad_sizes=tuple(pads),
        m=tuple(p // S for p in pads),
    )

    dist_leaves = []
    leaves_info = []
    for fi, fj, leaf in leaves:
        if isinstance(leaf, StencilMatrix):
            # serial problems store grid-local blocks banded (gather-free
            # SpMV); the row-sharded exchange path needs explicit columns
            leaf = leaf.to_ell()
        assert isinstance(leaf, ELLMatrix), (
            "shard_block_system expects ELL leaves (use to_ell first)"
        )
        Ssp = ell_to_scipy(leaf)
        # drop explicit zeros: ELL padding slots point at the row index,
        # which for rectangular blocks lies far outside the halo window
        Ssp.eliminate_zeros()
        vals_pad, cols_pad = padded_ell_from_csr(
            Ssp,
            pads[fi],
            pads[fj],
            layout.m[fi],
            layout.m[fj],
            identity_pad=(fi == fj),
        )
        leaves_info.append((fi, fj, cols_pad))
        dist_leaves.append(
            shard_ell_arrays(
                vals_pad, cols_pad, mesh, axis, n_cols_pad=pads[fj]
            )
        )
    A_dist = rebuild_with_leaves(A, iter(dist_leaves))
    return A_dist, layout, leaves_info


def shard_block_vector(b, layout: FieldLayout):
    """Pytree of per-field host vectors -> pytree of padded sharded ones."""
    leaves, treedef = jax.tree_util.tree_flatten(b)
    out = [
        shard_vector(x, layout.mesh, layout.axis, n_pad=layout.pad_sizes[i])
        for i, x in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def unshard_block_vector(x, layout: FieldLayout):
    """Sharded padded pytree -> host pytree (unpadded)."""
    leaves, treedef = jax.tree_util.tree_flatten(x)
    out = [
        np.asarray(jax.device_get(v))[: layout.real_sizes[i]]
        for i, v in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)
