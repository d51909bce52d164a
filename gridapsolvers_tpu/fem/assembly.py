"""Q1 FEM assembly on structured grids -> stencil operators.

Replaces the reference's reliance on Gridap.jl assembly for its test systems
(SURVEY.md §7 stage 3). Assembly is band-wise and fully vectorized: for each
pair of element-corner indices (a, b) the element matrix entry Ke[a,b] is
accumulated onto the band at offset b - a over a slab of the vertex grid —
no element loop, no COO, O(4^d) numpy slab adds. Element matrices come from
tensor products of 1D stiffness/mass matrices.
"""
from __future__ import annotations

import itertools
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..algebra.stencil import StencilMatrix
from .mesh import CartesianMesh


def _k1(h: float) -> np.ndarray:
    """1D P1 element stiffness on [0,h]."""
    return np.array([[1.0, -1.0], [-1.0, 1.0]]) / h


def _m1(h: float) -> np.ndarray:
    """1D P1 element mass on [0,h]."""
    return np.array([[2.0, 1.0], [1.0, 2.0]]) * (h / 6.0)


def q1_element_matrices(h: Sequence[float]):
    """(Ke, Me): Q1 element stiffness/mass, shape (2,)*d + (2,)*d tensors
    flattened to (2^d, 2^d) with corner index = C-order over dims."""
    d = len(h)
    Ke = np.zeros((2 ** d, 2 ** d))
    Me = np.ones((1, 1))
    for dim in range(d):
        Me = np.kron(Me, _m1(h[dim]))
    for deriv_dim in range(d):
        term = np.ones((1, 1))
        for dim in range(d):
            term = np.kron(term, _k1(h[dim]) if dim == deriv_dim else _m1(h[dim]))
        Ke += term
    return Ke, Me


def _corner_offsets(d: int):
    """C-order corners of the unit cube: corner index -> offset tuple."""
    return list(itertools.product((0, 1), repeat=d))


def assemble_q1_stencil(
    mesh: CartesianMesh,
    element_matrix: np.ndarray,
    dtype=np.float64,
) -> StencilMatrix:
    """Assemble a Q1 operator band-wise from a (2^d, 2^d) element matrix."""
    d = mesh.dim
    shape = mesh.vertex_shape
    corners = _corner_offsets(d)
    offsets = sorted(itertools.product((-1, 0, 1), repeat=d))
    off_index = {o: i for i, o in enumerate(offsets)}
    bands = np.zeros((len(offsets),) + shape, dtype=dtype)
    for ia, a in enumerate(corners):
        for ib, b in enumerate(corners):
            o = tuple(b[k] - a[k] for k in range(d))
            # element at cell c contributes Ke[a,b] to A[c+a, c+b];
            # vertices v = c + a span [a_k, ncells_k + a_k) per dim.
            # Periodic axes: cell indices wrap, so (c + a_k) mod n covers
            # every vertex exactly once -> whole-axis slab.
            sl = tuple(
                slice(None)
                if mesh.periodic[k]
                else slice(a[k], mesh.ncells[k] + a[k])
                for k in range(d)
            )
            bands[off_index[o]][sl] += element_matrix[ia, ib]
    # bands stay as host numpy: assembly is a setup-time host path; the
    # arrays move to device lazily (first jit) or explicitly via
    # parallel.dist.shard_stencil / device_put.
    return StencilMatrix(
        bands, tuple(offsets), shape, periodic=tuple(mesh.periodic)
    )


def assemble_poisson_stencil(
    grid_shape: Tuple[int, ...],
    h: Sequence[float],
    dtype=np.float64,
    dirichlet_mask: Optional[np.ndarray] = None,
) -> StencilMatrix:
    """Q1 Laplacian bands; see algebra/stencil.py:poisson_stencil."""
    ncells = tuple(n - 1 for n in grid_shape)
    domain = tuple(
        x for d_ in range(len(ncells)) for x in (0.0, h[d_] * ncells[d_])
    )
    mesh = CartesianMesh(ncells, domain)
    Ke, _ = q1_element_matrices(h)
    A = assemble_q1_stencil(mesh, Ke, dtype)
    if dirichlet_mask is not None:
        A = eliminate_dirichlet(A, np.asarray(dirichlet_mask))
    return A


def laplacian(mesh: CartesianMesh, dtype=np.float64) -> StencilMatrix:
    Ke, _ = q1_element_matrices(mesh.h)
    return assemble_q1_stencil(mesh, Ke, dtype)


def assemble_q1_stencil_var(
    mesh: CartesianMesh,
    element_matrix: np.ndarray,
    cell_values: np.ndarray,
    dtype=np.float64,
) -> StencilMatrix:
    """Assemble a Q1 operator with a PER-CELL scalar coefficient: the
    element matrix of cell c is cell_values[c] * element_matrix (exact for
    piecewise-constant coefficients; the reference assembles arbitrary
    weak-form coefficients cellwise through Gridap). Vectorized band-wise:
    each (corner a, corner b) pair adds Ke[a,b] * kappa over a whole slab —
    no per-cell loop, so setup stays O(4^d) numpy slab adds."""
    d = mesh.dim
    shape = mesh.vertex_shape
    kappa = np.asarray(cell_values, dtype=dtype).reshape(mesh.ncells)
    corners = _corner_offsets(d)
    offsets = sorted(itertools.product((-1, 0, 1), repeat=d))
    off_index = {o: i for i, o in enumerate(offsets)}
    bands = np.zeros((len(offsets),) + shape, dtype=dtype)
    for ia, a in enumerate(corners):
        for ib, b in enumerate(corners):
            o = tuple(b[k] - a[k] for k in range(d))
            # vertex v = c + a receives Ke[a,b] * kappa[c]; per axis the
            # target rows are [a_k, ncells_k + a_k) (open) or all rows with
            # kappa rolled by +a_k (periodic wrap)
            kap = kappa
            sl = []
            for k in range(d):
                if mesh.periodic[k]:
                    kap = np.roll(kap, a[k], axis=k)
                    sl.append(slice(None))
                else:
                    sl.append(slice(a[k], mesh.ncells[k] + a[k]))
            bands[off_index[o]][tuple(sl)] += element_matrix[ia, ib] * kap
    return StencilMatrix(
        bands, tuple(offsets), shape, periodic=tuple(mesh.periodic)
    )


def laplacian_var(
    mesh: CartesianMesh, kappa: np.ndarray, dtype=np.float64
) -> StencilMatrix:
    """-div(kappa grad u) with piecewise-constant (per-cell) kappa."""
    Ke, _ = q1_element_matrices(mesh.h)
    return assemble_q1_stencil_var(mesh, Ke, kappa, dtype)


def laplacian_const(mesh: CartesianMesh, dtype=np.float64):
    """Dirichlet-eliminated Q1 Laplacian as a matrix-free constant stencil
    (exact for full-boundary Dirichlet on a uniform mesh; see
    algebra.stencil.ConstStencilMatrix)."""
    import jax.numpy as jnp

    from ..algebra.stencil import ConstStencilMatrix

    d = mesh.dim
    Ke, _ = q1_element_matrices(mesh.h)
    corners = _corner_offsets(d)
    offsets = sorted(itertools.product((-1, 0, 1), repeat=d))
    off_index = {o: i for i, o in enumerate(offsets)}
    weights = np.zeros(len(offsets), dtype=dtype)
    # interior row: every corner pair contributes once per shared cell
    for ia, a in enumerate(corners):
        for ib, b in enumerate(corners):
            o = tuple(b[k] - a[k] for k in range(d))
            weights[off_index[o]] += Ke[ia, ib]
    free = (~mesh.boundary_vertex_mask()).astype(dtype)
    return ConstStencilMatrix(
        jnp.asarray(weights),
        jnp.asarray(free.reshape(mesh.vertex_shape)),
        tuple(offsets),
        mesh.vertex_shape,
    )


def mass(mesh: CartesianMesh, dtype=np.float64) -> StencilMatrix:
    _, Me = q1_element_matrices(mesh.h)
    return assemble_q1_stencil(mesh, Me, dtype)


def eliminate_dirichlet(A: StencilMatrix, mask: np.ndarray) -> StencilMatrix:
    """Constrain dofs in `mask`: identity rows, zeroed columns.

    This is the standard symmetric elimination (the reference does it inside
    Gridap assembly by restricting to free dofs); keeping constrained dofs in
    the grid preserves the stencil structure for conv-based transfers.
    RHS lifting is handled by `dirichlet_rhs`.
    """
    bands = np.array(A.bands)
    mask = mask.reshape(A.grid_shape)
    center = A.offsets.index(tuple(0 for _ in A.grid_shape))

    periodic = A.periodic or tuple(False for _ in A.grid_shape)

    def np_shift(m: np.ndarray, off) -> np.ndarray:
        out = m
        for d, o in enumerate(off):
            if o == 0:
                continue
            if periodic[d]:
                out = np.roll(out, -o, axis=d)
                continue
            n = out.shape[d]
            idx = [slice(None)] * out.ndim
            pad = [(0, 0)] * out.ndim
            if o > 0:
                idx[d] = slice(o, n)
                pad[d] = (0, o)
            else:
                idx[d] = slice(0, n + o)
                pad[d] = (-o, 0)
            out = np.pad(out[tuple(idx)], pad)
        return out

    for s, off in enumerate(A.offsets):
        if s == center:
            # identity on constrained rows
            bands[s] = np.where(mask, 1.0, bands[s])
            continue
        # zero constrained rows
        bands[s] = np.where(mask, 0.0, bands[s])
        # zero columns pointing at constrained dofs: band_s[v] multiplies
        # x[v + off], so kill it where mask[v + off]
        bands[s] = np.where(np_shift(mask, off), 0.0, bands[s])
    return StencilMatrix(
        bands, A.offsets, A.grid_shape, A.grid_vectors, A.periodic
    )


def dirichlet_rhs(
    A_full: StencilMatrix, b: jnp.ndarray, mask: np.ndarray, g: jnp.ndarray
) -> jnp.ndarray:
    """Lift Dirichlet data into the RHS: b := b - A @ x_g off the boundary,
    b := g on the boundary (pairs with eliminate_dirichlet)."""
    maskf = jnp.asarray(mask.reshape(-1))
    xg = jnp.where(maskf, g, 0.0)
    b = b - A_full.matvec(xg)
    return jnp.where(maskf, g, b)
