"""H(div) machinery: RT0 grid transfers and H(div) GMG (2D).

Mirrors the reference's hdiv GMG suite (test/LinearSolvers/GMGTests.jl hdiv
tests; test/_dev/GMG/GMG_debug_hdiv.jl) — the H(div) model operator

    a(u, v) = ∫ u·v + ∫ div u div v

on lowest-order Raviart-Thomas (RT0) face elements, preconditioned by GMG
with vertex-patch smoothers (the Arnold-Falk-Winther smoothing that makes
multigrid robust in H(div); plain Jacobi is NOT robust here).

TPU-native pieces:
- RT0 prolongation on structured quads factorizes per component into a 1D
  linear interpolation along the component's normal direction (dilated conv)
  and nearest duplication transverse (jnp.repeat); restriction is its exact
  transpose (strided conv + pair-sum).
- vertex patches (the 4 faces meeting each interior vertex) become one
  padded index table over the concatenated (ux | uy) vector and run as the
  batched Vanka solver.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ..algebra import BlockOperator
from ..algebra.ell import ell_from_scipy
from ..patches.topology import PatchTopology
from .darcy import darcy_system


def _interp_1d(x2d: jnp.ndarray) -> jnp.ndarray:
    """(n, m) -> (2n-1, m): 1D linear interpolation along axis 0."""
    n = x2d.shape[0]
    g = x2d[None, None]
    k = jnp.asarray([0.5, 1.0, 0.5], x2d.dtype).reshape(1, 1, 3, 1)
    out = jax.lax.conv_general_dilated(
        g,
        k,
        window_strides=(1, 1),
        padding=[(1, 1), (0, 0)],
        lhs_dilation=(2, 1),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            (1, 1, n, x2d.shape[1]), (1, 1, 3, 1), ("NCHW", "OIHW", "NCHW")
        ),
    )
    return out[0, 0]


def _interp_1d_T(x2d: jnp.ndarray) -> jnp.ndarray:
    """Transpose of _interp_1d: (2n-1, m) -> (n, m) full weighting."""
    n2 = x2d.shape[0]
    g = x2d[None, None]
    k = jnp.asarray([0.5, 1.0, 0.5], x2d.dtype).reshape(1, 1, 3, 1)
    out = jax.lax.conv_general_dilated(
        g,
        k,
        window_strides=(2, 1),
        padding=[(1, 1), (0, 0)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            (1, 1, n2, x2d.shape[1]), (1, 1, 3, 1), ("NCHW", "OIHW", "NCHW")
        ),
    )
    return out[0, 0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RTProlongation:
    """RT0 prolongation (coarse -> fine) for ((ux, uy)) face vectors."""

    coarse_cells: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    mask_fine: tuple = None  # optional ((mx, my)) free masks (flat)

    def matvec(self, u):
        nxc, nyc = self.coarse_cells
        cx = u[0].reshape(nxc + 1, nyc)
        cy = u[1].reshape(nxc, nyc + 1)
        # ux: interp in x (nodes), duplicate in y (cells)
        fx = jnp.repeat(_interp_1d(cx), 2, axis=1)
        # uy: duplicate in x (cells), interp in y (nodes)
        fy = jnp.repeat(_interp_1d(cy.T), 2, axis=1).T
        out = (fx.reshape(-1), fy.reshape(-1))
        if self.mask_fine is not None:
            out = tuple(o * m for o, m in zip(out, self.mask_fine))
        return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RTRestriction:
    """Transpose of RTProlongation (residual restriction)."""

    coarse_cells: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    mask_coarse: tuple = None
    mask_fine: tuple = None

    def matvec(self, r):
        nxc, nyc = self.coarse_cells
        nxf, nyf = 2 * nxc, 2 * nyc
        rx = r[0]
        ry = r[1]
        if self.mask_fine is not None:
            rx = rx * self.mask_fine[0]
            ry = ry * self.mask_fine[1]
        rx = rx.reshape(nxf + 1, nyf)
        ry = ry.reshape(nxf, nyf + 1)
        # transpose of repeat(2, axis=1) = sum adjacent pairs
        cx = _interp_1d_T(rx.reshape(nxf + 1, nyc, 2).sum(-1))
        cy = _interp_1d_T(ry.T.reshape(nyf + 1, nxc, 2).sum(-1)).T
        out = (cx.reshape(-1), cy.reshape(-1))
        if self.mask_coarse is not None:
            out = tuple(o * m for o, m in zip(out, self.mask_coarse))
        return out


def hdiv_operator(ncells: Tuple[int, int], alpha: float = 1.0):
    """A = M + alpha * Bᵀ D^{-1} B (mass + div-div) on RT0 with essential
    (normal-flux) BCs eliminated. Returns (BlockOperator, free_masks)."""
    S = darcy_system(ncells)
    nx, ny, hx, hy = S["nx"], S["ny"], S["hx"], S["hy"]
    mask_x = np.zeros((nx + 1, ny), bool)
    mask_x[0, :] = mask_x[-1, :] = True
    mask_y = np.zeros((nx, ny + 1), bool)
    mask_y[:, 0] = mask_y[:, -1] = True

    Dinv = sp.diags(np.full(nx * ny, 1.0 / (hx * hy)))
    blocks = {}
    Bs = {0: S["Bx"], 1: S["By"]}
    Ms = {0: S["Mx"], 1: S["My"]}
    masks = {0: mask_x.reshape(-1), 1: mask_y.reshape(-1)}
    from . import assembly2 as asm2

    rows = []
    for a in range(2):
        row = []
        for b in range(2):
            Sab = alpha * (Bs[a].T @ Dinv @ Bs[b]).tocsr()
            if a == b:
                Sab = Sab + Ms[a]
            Sab = asm2.zero_rows(Sab, masks[a])
            Sab = asm2.zero_columns(Sab, masks[b])
            if a == b:
                Sab = (Sab + sp.diags(masks[a].astype(float))).tocsr()
            row.append(ell_from_scipy(Sab.tocsr()))
        rows.append(tuple(row))
    free = (
        jnp.asarray((~masks[0]).astype(float)),
        jnp.asarray((~masks[1]).astype(float)),
    )
    return BlockOperator((tuple(rows[0]), tuple(rows[1]))), free


def hdiv_vertex_patches(ncells: Tuple[int, int]) -> PatchTopology:
    """One patch per interior vertex: the 4 faces meeting it, indexed into
    the concatenated (ux | uy) vector."""
    nx, ny = ncells
    n_ux = (nx + 1) * ny
    n_uy = nx * (ny + 1)
    n_total = n_ux + n_uy
    dummy = n_total

    rows = []
    for i in range(1, nx):
        for j in range(1, ny):
            fx = [i * ny + (j - 1), i * ny + j]
            fy = [n_ux + (i - 1) * (ny + 1) + j, n_ux + i * (ny + 1) + j]
            rows.append(fx + fy)
    table = np.asarray(rows, dtype=np.int32)
    return PatchTopology(dofs=table, dummy=dummy, n_dofs=n_total)


def hdiv_gmg(ncells: Tuple[int, int], num_levels: int, alpha: float = 1.0,
             omega: float = 0.4, **kw):
    """GMG for the H(div) operator with vertex-patch (Vanka) smoothers and
    RT0 transfers."""
    from ..linear.gmg import GMGSolver
    from ..linear.smoothers import RichardsonSmoother
    from ..patches.vanka import VankaSolver

    levels = [
        (ncells[0] // (2 ** l), ncells[1] // (2 ** l))
        for l in range(num_levels)
    ]
    ops, frees = [], []
    for lc in levels:
        A, free = hdiv_operator(lc, alpha)
        ops.append(A)
        frees.append(free)

    prolongs, restricts, smoothers = [], [], []
    for l in range(num_levels - 1):
        lc = levels[l + 1]
        prolongs.append(RTProlongation(lc, mask_fine=frees[l]))
        restricts.append(
            RTRestriction(lc, mask_coarse=frees[l + 1], mask_fine=frees[l])
        )
    for l in range(num_levels - 1):
        topo = hdiv_vertex_patches(levels[l])
        # weighting='unit' keeps the additive-Schwarz smoother SYMMETRIC
        # (the overlap-averaged variant left-multiplies by a diagonal and
        # would break CG); overlap <= 2 per face, so omega <= 1/2 damps it
        smoothers.append(
            RichardsonSmoother(
                VankaSolver(topo=topo, omega=1.0, weighting="unit"),
                niter=2,
                omega=omega,
            )
        )

    return GMGSolver(
        coarse_ops=tuple(ops[1:]),
        prolongations=tuple(prolongs),
        restrictions=tuple(restricts),
        smoother=smoothers,
        **kw,
    ), ops[0], frees[0]
