"""Shared Krylov machinery.

Analog of the reference's Krylov/KrylovUtils.jl:17-54 (krylov_mul!/
krylov_residual! dispatching on nothing-preconditioners) plus pytree "basis"
helpers: a Krylov basis over pytree vectors is stored leaf-wise with one
extra leading axis of size m+1, so fixed-restart GMRES compiles to static
shapes (the reference grows its basis dynamically,
Krylov/GMRESSolvers.jl:76-92 — dynamic shapes would defeat XLA, so we use
fixed restart + iteration masking instead, as SURVEY.md §7 prescribes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import pytrees as pt

tree_map = jax.tree_util.tree_map


def krylov_mul(A, Pr_apply, Pl_apply, x):
    """y = Pl⁻¹ · A · Pr⁻¹ · x (reference KrylovUtils.jl:17-32)."""
    z = Pr_apply(x) if Pr_apply is not None else x
    w = A.matvec(z)
    return Pl_apply(w) if Pl_apply is not None else w


def krylov_residual(A, Pl_apply, x, b):
    """r = Pl⁻¹ (b - A x) (reference KrylovUtils.jl:46-54)."""
    r = pt.sub(b, A.matvec(x))
    return Pl_apply(r) if Pl_apply is not None else r


def basis_zeros(template, m: int):
    """Allocate a basis of m pytree vectors (leafwise leading axis)."""
    return tree_map(
        lambda leaf: jnp.zeros((m,) + leaf.shape, leaf.dtype), template
    )


def basis_get(basis, j):
    """V[j] as a pytree vector (j may be traced)."""
    return tree_map(lambda leaf: jax.lax.dynamic_index_in_dim(
        leaf, j, axis=0, keepdims=False), basis)


def basis_set(basis, j, v):
    """Functional V[j] = v (j may be traced)."""
    return tree_map(
        lambda leaf, vleaf: jax.lax.dynamic_update_index_in_dim(
            leaf, vleaf, j, axis=0
        ),
        basis,
        v,
    )


def basis_combine(basis, coefs, nvec=None):
    """sum_j coefs[j] * V[j]; coefs (m,). If nvec given (traced), only the
    first nvec coefficients contribute (rest masked)."""
    m = jax.tree_util.tree_leaves(basis)[0].shape[0]
    if nvec is not None:
        mask = jnp.arange(m) < nvec
        coefs = jnp.where(mask, coefs, 0.0)

    def comb(leaf):
        c = coefs.reshape((m,) + (1,) * (leaf.ndim - 1)).astype(leaf.dtype)
        return jnp.sum(c * leaf, axis=0)

    return tree_map(comb, basis)


def givens(a, b):
    """Givens rotation (c, s) with c*a + s*b = r, -s*a + c*b = 0."""
    denom = jnp.sqrt(a * a + b * b)
    safe = jnp.where(denom > 0, denom, 1.0)
    c = jnp.where(denom > 0, a / safe, 1.0)
    s = jnp.where(denom > 0, b / safe, 0.0)
    return c, s
