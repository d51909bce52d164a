"""Stokes saddle-point systems (Taylor-Hood Q2/Q1 on structured grids).

Mirrors the reference's Stokes application
(test/Applications/Stokes.jl:60-112, StokesGMG.jl:79-166): velocity in
[Q2]^d with full Dirichlet BCs, pressure in Q1 (zero-mean), block system

    [ K   Bᵀ ] [u]   [f]
    [ B   0  ] [p] = [0]

assembled into a 2x2 BlockOperator whose (0,0) entry is a FieldwiseOperator
of per-component ELL stiffness matrices, with a manufactured divergence-free
polynomial solution for L2-error validation.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from ..algebra import BlockOperator, ELLMatrix
from ..algebra.block import ColumnStack, FieldwiseOperator, RowStack
from ..fem import assembly2 as asm
from .mesh import CartesianMesh

# -- manufactured solution (2D): u = curl psi, psi = x^2(1-x)^2 y^2(1-y)^2 ---

_A_POLY = np.polynomial.Polynomial([0.0, 0.0, 1.0, -2.0, 1.0])  # x^2(1-x)^2


def _poly_eval(p, x, deriv=0):
    return p.deriv(deriv)(x) if deriv else p(x)


def exact_velocity(xy: np.ndarray) -> np.ndarray:
    """2D: u = (a(x) b'(y), -a'(x) b(y)); 3D: the same rotational field
    modulated by w(z) = a(z): u = (a b' w, -a' b w, 0). Divergence-free and
    zero on the unit-box boundary in both cases."""
    a = _A_POLY
    x, y = xy[:, 0], xy[:, 1]
    if xy.shape[1] == 2:
        ux = _poly_eval(a, x) * _poly_eval(a, y, 1)
        uy = -_poly_eval(a, x, 1) * _poly_eval(a, y)
        return np.stack([ux, uy], axis=1)
    z = xy[:, 2]
    w = _poly_eval(a, z)
    ux = _poly_eval(a, x) * _poly_eval(a, y, 1) * w
    uy = -_poly_eval(a, x, 1) * _poly_eval(a, y) * w
    return np.stack([ux, uy, np.zeros_like(ux)], axis=1)


def exact_pressure(xy: np.ndarray) -> np.ndarray:
    """p = sum(x_d) - dim/2 (zero mean on the unit box)."""
    return xy.sum(axis=1) - 0.5 * xy.shape[1]


def forcing(xy: np.ndarray, nu: float) -> np.ndarray:
    """f = -nu * lap(u) + grad(p)."""
    a = _A_POLY
    x, y = xy[:, 0], xy[:, 1]
    if xy.shape[1] == 2:
        lap_ux = _poly_eval(a, x, 2) * _poly_eval(a, y, 1) + _poly_eval(
            a, x
        ) * _poly_eval(a, y, 3)
        lap_uy = -(
            _poly_eval(a, x, 3) * _poly_eval(a, y)
            + _poly_eval(a, x, 1) * _poly_eval(a, y, 2)
        )
        fx = -nu * lap_ux + 1.0
        fy = -nu * lap_uy + 1.0
        return np.stack([fx, fy], axis=1)
    z = xy[:, 2]
    w, w2 = _poly_eval(a, z), _poly_eval(a, z, 2)
    lap_ux = (
        _poly_eval(a, x, 2) * _poly_eval(a, y, 1) * w
        + _poly_eval(a, x) * _poly_eval(a, y, 3) * w
        + _poly_eval(a, x) * _poly_eval(a, y, 1) * w2
    )
    lap_uy = -(
        _poly_eval(a, x, 3) * _poly_eval(a, y) * w
        + _poly_eval(a, x, 1) * _poly_eval(a, y, 2) * w
        + _poly_eval(a, x, 1) * _poly_eval(a, y) * w2
    )
    fx = -nu * lap_ux + 1.0
    fy = -nu * lap_uy + 1.0
    fz = np.full_like(fx, 1.0)
    return np.stack([fx, fy, fz], axis=1)


@dataclasses.dataclass
class StokesProblem:
    mesh: CartesianMesh
    A: BlockOperator            # [[K, B^T], [B, None]] (constrained)
    b: tuple                    # ((b_ux, b_uy), b_p)
    Mu: ELLMatrix               # Q2 mass (velocity components, unconstrained)
    Mp: ELLMatrix               # Q1 mass (pressure)
    u_exact: tuple
    p_exact: jnp.ndarray
    dirichlet_mask_u: np.ndarray
    nu: float

    @property
    def K(self) -> FieldwiseOperator:
        return self.A.block(0, 0)

    def velocity_error(self, u) -> float:
        err = 0.0
        for ui, uei in zip(u, self.u_exact):
            e = ui - uei
            err += float(jnp.vdot(e, self.Mu.matvec(e)))
        return float(np.sqrt(err))

    def pressure_error(self, p) -> float:
        ones = jnp.ones_like(p)
        vol = jnp.vdot(ones, self.Mp.matvec(ones))
        # compare up to the constant nullspace (zero-mean both)
        def demean(q):
            return q - jnp.vdot(ones, self.Mp.matvec(q)) / vol

        e = demean(p) - demean(self.p_exact)
        return float(jnp.sqrt(jnp.vdot(e, self.Mp.matvec(e))))

    def residual_norm(self, x) -> float:
        r = jnp.concatenate(
            [jnp.ravel(l) for l in _leaves(_sub(self.b, self.A.matvec(x)))]
        )
        return float(jnp.linalg.norm(r))


def _leaves(x):
    import jax

    return jax.tree_util.tree_leaves(x)


def _sub(a, b):
    import jax

    return jax.tree_util.tree_map(jnp.subtract, a, b)


def stokes_problem(
    ncells: Tuple[int, ...],
    nu: float = 1.0,
    dtype=np.float64,
) -> StokesProblem:
    dim = len(ncells)
    assert dim in (2, 3)
    domain = tuple(x for _ in range(dim) for x in (0.0, 1.0))
    mesh = CartesianMesh(tuple(ncells), domain)

    mask_u = asm.boundary_node_mask(mesh, 2)
    K_csr = asm.assemble_bilinear(mesh, 2, "stiffness", scale=nu)
    K_csr = asm.dirichlet_square(K_csr, mask_u)
    Mu_csr = asm.assemble_bilinear(mesh, 2, "mass")
    Mp_csr = asm.assemble_bilinear(mesh, 1, "mass")

    Bs, BTs = [], []
    for c in range(dim):
        B_csr = asm.assemble_divergence(mesh, 2, 1, c)
        B_csr = asm.zero_columns(B_csr, mask_u)       # velocity BCs (u=0)
        Bs.append(asm.to_ell(B_csr))
        BTs.append(asm.to_ell(B_csr.T.tocsr()))

    K = asm.to_ell(K_csr)
    Kv = FieldwiseOperator(tuple(K for _ in range(dim)))
    A = BlockOperator(
        (
            (Kv, ColumnStack(tuple(BTs))),
            (RowStack(tuple(Bs)), None),
        )
    )

    coords_u = asm.node_coords(mesh, 2)
    coords_p = asm.node_coords(mesh, 1)
    u_ex = exact_velocity(coords_u)
    p_ex = exact_pressure(coords_p)
    f = forcing(coords_u, nu)

    Mu = asm.to_ell(Mu_csr)
    b_u = tuple(
        jnp.where(
            jnp.asarray(mask_u), 0.0, Mu.matvec(jnp.asarray(f[:, c]))
        )
        for c in range(dim)
    )
    b_p = jnp.zeros(asm.num_nodes(mesh, 1), dtype)

    return StokesProblem(
        mesh=mesh,
        A=A,
        b=(b_u, b_p),
        Mu=Mu,
        Mp=asm.to_ell(Mp_csr),
        u_exact=tuple(jnp.asarray(u_ex[:, c]) for c in range(dim)),
        p_exact=jnp.asarray(p_ex),
        dirichlet_mask_u=mask_u,
        nu=nu,
    )


def velocity_gmg(
    ncells: Tuple[int, int],
    num_levels: int,
    nu: float = 1.0,
    smoother=None,
    **kw,
):
    """GMG preconditioner for the Stokes velocity block: per-level Q2 vector
    stiffness with fieldwise conv transfers on the Q2 node grids (the Q2 dof
    grid of mesh n IS the vertex grid of mesh 2n, so the structured factor-2
    transfer applies directly). Mirrors StokesGMG.jl:129-154 where GMG is
    built on the velocity FE-space hierarchy."""
    from ..linear.gmg import GMGSolver
    from ..linear.smoothers import ChebyshevSmoother
    from ..multilevel.hierarchy import cartesian_hierarchy
    from ..multilevel.transfer import (
        StructuredProlongation,
        StructuredRestriction,
    )
    from ..multilevel.multifield import MultiFieldTransfer

    dim = len(ncells)
    hierarchy = cartesian_hierarchy(ncells, num_levels)

    def assemble_K(mesh):
        m = asm.boundary_node_mask(mesh, 2)
        Kc = asm.dirichlet_square(
            asm.assemble_bilinear(mesh, 2, "stiffness", scale=nu), m
        )
        K1 = asm.to_ell(Kc)
        return FieldwiseOperator(tuple(K1 for _ in range(dim)))

    prolongs, restricts = [], []
    for l in range(num_levels - 1):
        fine, coarse = hierarchy[l], hierarchy[l + 1]
        fshape = asm.node_grid_shape(fine, 2)
        cshape = asm.node_grid_shape(coarse, 2)
        mf = jnp.asarray(
            (~asm.boundary_node_mask(fine, 2)).astype(np.float64)
        )
        mc = jnp.asarray(
            (~asm.boundary_node_mask(coarse, 2)).astype(np.float64)
        )
        P = StructuredProlongation(fshape, cshape, mf)
        R = StructuredRestriction(fshape, cshape, "residual", mc, mf)
        prolongs.append(MultiFieldTransfer(tuple(P for _ in range(dim))))
        restricts.append(MultiFieldTransfer(tuple(R for _ in range(dim))))

    coarse_ops = tuple(assemble_K(m) for m in hierarchy.meshes[1:])
    return GMGSolver(
        coarse_ops=coarse_ops,
        prolongations=tuple(prolongs),
        restrictions=tuple(restricts),
        smoother=smoother or ChebyshevSmoother(degree=3),
        **kw,
    )
