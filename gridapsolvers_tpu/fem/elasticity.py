"""Linear elasticity (vector Q1 on structured grids).

Mirrors the reference's elasticity application
(test/Applications/Elasticity.jl + ext PETScElasticitySolver,
ElasticitySolvers.jl:15-44): a(u,v) = ∫ 2μ ε(u):ε(v) + λ div u div v with
clamped-face Dirichlet BCs, solved by GMG-preconditioned CG; the floating
(pure-Neumann) case exposes the rigid-body near-nullspace
(interfaces.rigid_body_modes — the reference feeds these to PETSc GAMG via
MatNullSpaceCreateRigidBody).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from ..algebra import BlockOperator
from . import assembly2 as asm
from .elements import TensorElement
from .mesh import CartesianMesh


def elastic_element_blocks(mesh: CartesianMesh, mu: float, lam: float):
    """Per-component-pair element matrices B_ab (n_nodes, n_nodes):
    B_ab[i,j] = mu δ_ab Σ_c ∫∂_c φ_i ∂_c φ_j + mu ∫ ∂_b φ_i ∂_a φ_j
                + lam ∫ ∂_a φ_i ∂_b φ_j ."""
    d = mesh.dim
    elem = TensorElement(1, mesh.h, nquad=2)
    W = elem.quad_weights()
    G = [elem._phi_table(c) for c in range(d)]
    Kcd = {}
    for a in range(d):
        for b in range(d):
            Kcd[(a, b)] = np.einsum("iq,jq,q->ij", G[a], G[b], W)
    blocks = {}
    for a in range(d):
        for b in range(d):
            B = mu * Kcd[(b, a)] + lam * Kcd[(a, b)]
            if a == b:
                B = B + mu * sum(Kcd[(c, c)] for c in range(d))
            blocks[(a, b)] = B
    return blocks


@dataclasses.dataclass
class ElasticityProblem:
    mesh: CartesianMesh
    A: BlockOperator            # d x d vector-elasticity operator
    b: Tuple[jnp.ndarray, ...]
    dirichlet_mask: np.ndarray  # per-node (scalar grid) clamped mask
    mu: float
    lam: float

    def residual_norm(self, u) -> float:
        r = [bi - ri for bi, ri in zip(self.b, self.A.matvec(u))]
        return float(np.sqrt(sum(float(jnp.vdot(x, x)) for x in r)))


def elasticity_operator(
    mesh: CartesianMesh,
    mu: float,
    lam: float,
    dirichlet_mask: Optional[np.ndarray] = None,
) -> BlockOperator:
    """Assemble the d x d block operator; if dirichlet_mask given (scalar
    node mask, applied to every component), rows/cols are eliminated
    symmetrically (identity on diagonal blocks)."""
    d = mesh.dim
    conn = asm.connectivity(mesh, 1)
    n = asm.num_nodes(mesh, 1)
    eb = elastic_element_blocks(mesh, mu, lam)
    rows = []
    for a in range(d):
        row = []
        for b in range(d):
            S = asm.scatter_coo(conn, conn, eb[(a, b)], (n, n))
            if dirichlet_mask is not None:
                S = asm.zero_rows(S, dirichlet_mask)
                S = asm.zero_columns(S, dirichlet_mask)
                if a == b:
                    S = S + sp.diags(dirichlet_mask.astype(S.dtype))
            # banded on the Q1 node grid (3^d envelope): gather-free SpMV
            # (see DESIGN.md "Banded Q2 operators")
            from ..algebra.stencil import stencil_from_scipy

            row.append(
                stencil_from_scipy(S.tocsr(), asm.node_grid_shape(mesh, 1))
            )
        rows.append(tuple(row))
    return BlockOperator(tuple(rows))


def elasticity_problem(
    ncells: Tuple[int, ...],
    mu: float = 1.0,
    lam: float = 1.0,
    body_force: Optional[Tuple[float, ...]] = None,
    clamp: str = "x0",
) -> ElasticityProblem:
    """Cantilever-style problem: clamped on the `clamp` face, loaded by a
    constant body force (default: unit downward load)."""
    dim = len(ncells)
    domain = tuple(x for _ in range(dim) for x in (0.0, 1.0))
    mesh = CartesianMesh(tuple(ncells), domain)
    mask = asm.boundary_node_mask(mesh, 1, tags=(clamp,))
    A = elasticity_operator(mesh, mu, lam, mask)

    if body_force is None:
        body_force = tuple([0.0] * (dim - 1) + [-1.0])
    from .assembly import mass

    M = mass(mesh)
    n = asm.num_nodes(mesh, 1)
    b = []
    for c in range(dim):
        f = np.full(n, body_force[c])
        bc = M.matvec_host(f)
        b.append(jnp.asarray(np.where(mask, 0.0, bc)))
    return ElasticityProblem(
        mesh=mesh, A=A, b=tuple(b), dirichlet_mask=mask, mu=mu, lam=lam
    )


def elasticity_gmg(
    ncells: Tuple[int, ...],
    num_levels: int,
    mu: float = 1.0,
    lam: float = 1.0,
    clamp: str = "x0",
    smoother=None,
    **kw,
):
    """GMG preconditioner with per-level reassembled elasticity operators
    and fieldwise conv transfers — our native replacement for the
    reference's PETSc GAMG elasticity solve."""
    from ..linear.gmg import GMGSolver
    from ..linear.smoothers import ChebyshevSmoother
    from ..multilevel.hierarchy import cartesian_hierarchy
    from ..multilevel.multifield import MultiFieldTransfer
    from ..multilevel.transfer import (
        StructuredProlongation,
        StructuredRestriction,
    )

    dim = len(ncells)
    hierarchy = cartesian_hierarchy(ncells, num_levels)

    def level_op(mesh):
        mask = asm.boundary_node_mask(mesh, 1, tags=(clamp,))
        return elasticity_operator(mesh, mu, lam, mask)

    prolongs, restricts = [], []
    for l in range(num_levels - 1):
        fine, coarse = hierarchy[l], hierarchy[l + 1]
        mf = jnp.asarray(
            (~asm.boundary_node_mask(fine, 1, tags=(clamp,))).astype(float)
        )
        mc = jnp.asarray(
            (~asm.boundary_node_mask(coarse, 1, tags=(clamp,))).astype(float)
        )
        P = StructuredProlongation(fine.vertex_shape, coarse.vertex_shape, mf)
        R = StructuredRestriction(
            fine.vertex_shape, coarse.vertex_shape, "residual", mc, mf
        )
        prolongs.append(MultiFieldTransfer(tuple(P for _ in range(dim))))
        restricts.append(MultiFieldTransfer(tuple(R for _ in range(dim))))

    coarse_ops = tuple(level_op(m) for m in hierarchy.meshes[1:])
    return GMGSolver(
        coarse_ops=coarse_ops,
        prolongations=tuple(prolongs),
        restrictions=tuple(restricts),
        smoother=smoother or ChebyshevSmoother(degree=4, ratio=40.0),
        **kw,
    )
