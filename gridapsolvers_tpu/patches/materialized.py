"""Materialized (assembled) Vanka smoother.

The batched Vanka apply — gather r over patch dofs, per-patch dense
solve, scatter-add — is a LINEAR map in r. For linear problems its patch
inverses are fixed after setup, so the whole smoother can be assembled
ONCE into one sparse matrix

    M_vanka = omega * ( W  Σ_p  S_p A_p^{-1} R_p  +  diag(uncovered) )

and each application becomes ONE SpMV instead of a serialized TPU
gather + scatter per patch dof (measured: the gather/scatter pair and
the per-block residual matvecs dominate the augmented Stokes smoother).
On TPU the SpMV runs through the sorted-slot Pallas ELL kernel
(ops/ell_pallas.py) at near-roofline; M_vanka's bandwidth equals the
patch span, so the kernel's bounded-offset premise holds by construction.

Reference counterpart: BlockJacobiSolvers.jl's matrix-extracted patch
solves (src/PatchBasedSmoothers/BlockJacobiSolvers.jl:111-170) —
algebraically identical, with the patch loop folded into the matrix at
numerical-setup time. The nonlinear (per-Newton) refresh re-runs this
host-side assembly; the batched VankaSolver remains the choice for
jitted in-loop refresh (fem/dist_navier_stokes.py).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..algebra.ell import ell_from_scipy
from ..interfaces import Smoother
from ..utils import pytrees as pt
from ..utils.pytrees import flatten_concat, unflatten_like
from .topology import PatchTopology
from .vanka import VankaSolver


def materialize_vanka(
    vanka: VankaSolver, state: dict, n: int
) -> sp.csr_matrix:
    """Assemble the additive-Schwarz patch-solve map of a set-up
    VankaSolver into one scipy CSR (host-side)."""
    dofs = np.asarray(state["dofs"])
    inv = np.asarray(state["inv"])                    # (np, k, k)
    valid = dofs != n  # VankaSolver's dummy slot is always n (vanka.py)
    rows = np.broadcast_to(dofs[:, :, None], inv.shape)
    cols = np.broadcast_to(dofs[:, None, :], inv.shape)
    m = valid[:, :, None] & valid[:, None, :]
    M = sp.coo_matrix(
        (inv[m], (rows[m], cols[m])), shape=(n, n)
    ).tocsr()                                          # overlaps ADD
    if vanka.weighting == "overlap":
        M = sp.diags(np.asarray(state["wdof"])[:n]) @ M
    M = M + sp.diags(np.asarray(state["uncovered_inv_diag"])[:n])
    return (vanka.omega * M).tocsr()


@dataclasses.dataclass(frozen=True, eq=False)
class MaterializedVankaSmoother(Smoother):
    """VankaSolver-equivalent smoother whose apply is one SpMV.

    Same constructor surface as VankaSolver (topo/omega/weighting/
    jacobi_uncovered); `engine` picks the SpMV implementation for the
    assembled matrix ('auto' = Pallas kernel on TPU, padded ELL
    elsewhere). setup/update are host-side (linear problems; for jitted
    nonlinear refresh keep VankaSolver)."""

    topo: PatchTopology = None
    omega: float = 1.0
    weighting: str = "unit"
    seed_field: int = -1
    jacobi_uncovered: bool = True
    engine: str = "auto"
    q: int = 4
    band_dtype: object = None  # e.g. jnp.bfloat16: halve M_vanka traffic

    def _vanka(self) -> VankaSolver:
        return VankaSolver(
            topo=self.topo,
            omega=self.omega,
            weighting=self.weighting,
            seed_field=self.seed_field,
            jacobi_uncovered=self.jacobi_uncovered,
        )

    def setup(self, A, x=None):
        from ..algebra.flat import blocked_kernel_from_scipy

        inner = getattr(A, "inner", A)
        vanka = self._vanka()
        vst = vanka.setup(inner)
        n = int(np.asarray(vst["uncovered_inv_diag"]).shape[0])
        M_sp = materialize_vanka(vanka, vst, n)
        dt = np.asarray(vst["uncovered_inv_diag"]).dtype
        # per-field blocks: each square block is bandwidth-bounded (the
        # kernel premise), unlike the flattened whole (see algebra/flat.py)
        Mop = blocked_kernel_from_scipy(
            M_sp, vst["meta"].row_sizes, engine=self.engine, q=self.q,
            dtype=dt, band_dtype=self.band_dtype,
        )
        return {"A": A, "Mv": Mop}

    def update(self, state, A, x=None):
        new = self.setup(A, x)
        return new

    def apply(self, state, r):
        return state["Mv"].matvec(r)

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
