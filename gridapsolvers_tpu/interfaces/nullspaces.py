"""Nullspace representation and orthogonalization utilities.

Analog of the reference's NullSpaces
(src/SolverInterfaces/NullSpaces.jl:1-26,67-139): a span-of-vectors kernel
representation with classical/modified Gram-Schmidt orthonormalization and
projection/orthogonalization kernels. Vectors may be arbitrary pytrees
(block vectors work transparently).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..utils.pytrees import axpy, dot, scale


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NullSpace:
    """Kernel of an operator, spanned by `vectors` (a list of pytrees).

    Reference: NullSpaces.jl:17-26.
    """

    vectors: list

    @property
    def num_vectors(self) -> int:
        return len(self.vectors)


def constant_nullspace(template) -> NullSpace:
    """Nullspace of operators defined up to a constant (e.g. pure-Neumann
    Poisson, Darcy pressure). Template gives shape/dtype/sharding."""
    ones = jax.tree_util.tree_map(jnp.ones_like, template)
    return NullSpace(vectors=[ones])


def make_orthonormal(ns: NullSpace, method: str = "modified") -> NullSpace:
    """Gram-Schmidt orthonormalization of the spanning set.

    method: 'classical' | 'modified' (reference NullSpaces.jl:67-100).
    """
    vecs = [jax.tree_util.tree_map(jnp.asarray, v) for v in ns.vectors]
    out = []
    for i, v in enumerate(vecs):
        w = v
        if method == "classical":
            coefs = [dot(u, v) for u in out]
            for u, c in zip(out, coefs):
                w = axpy(-c, u, w)
        else:  # modified
            for u in out:
                c = dot(u, w)
                w = axpy(-c, u, w)
        nrm = jnp.sqrt(dot(w, w))
        out.append(scale(1.0 / nrm, w))
    return NullSpace(vectors=out)


def make_orthogonal(ns: NullSpace, x):
    """Remove the nullspace components from x: x -= sum_i <q_i,x> q_i.

    Assumes `ns` orthonormal (reference NullSpaces.jl:121-139).
    Returns (x_orth, coefficients).
    """
    coefs = []
    for q in ns.vectors:
        c = dot(q, x)
        x = axpy(-c, q, x)
        coefs.append(c)
    return x, jnp.stack(coefs) if coefs else jnp.zeros((0,))


def project(ns: NullSpace, x):
    """Project x onto span(ns): returns sum_i <q_i,x> q_i
    (reference NullSpaces.jl:102-112)."""
    coefs = [dot(q, x) for q in ns.vectors]
    out = jax.tree_util.tree_map(jnp.zeros_like, x)
    for q, c in zip(ns.vectors, coefs):
        out = axpy(c, q, out)
    return out, jnp.stack(coefs) if coefs else jnp.zeros((0,))


def reconstruct(ns: NullSpace, x, coefs):
    """Add back previously removed components: x + sum_i c_i q_i
    (reference NullSpaces.jl:114-119)."""
    for i, q in enumerate(ns.vectors):
        x = axpy(coefs[i], q, x)
    return x


def rigid_body_modes(coords: jnp.ndarray) -> NullSpace:
    """Near-nullspace for elasticity: translations + rotations from dof
    coordinates, as used by the reference's PETScElasticitySolver
    (ext/GridapPETScExt/ElasticitySolvers.jl:83-108, via
    MatNullSpaceCreateRigidBody).

    coords: (n_nodes, dim) nodal coordinates; dofs assumed ordered
    node-major with `dim` components per node. Returns an orthonormalized
    NullSpace of 3 (2D) or 6 (3D) flat vectors of length n_nodes*dim.
    """
    n, dim = coords.shape
    modes = []
    for d in range(dim):  # translations
        m = jnp.zeros((n, dim)).at[:, d].set(1.0)
        modes.append(m.reshape(-1))
    if dim == 2:
        rot = jnp.stack([-coords[:, 1], coords[:, 0]], axis=1)
        modes.append(rot.reshape(-1))
    elif dim == 3:
        x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
        zero = jnp.zeros_like(x)
        for rx, ry, rz in (
            (zero, -z, y),
            (z, zero, -x),
            (-y, x, zero),
        ):
            modes.append(jnp.stack([rx, ry, rz], axis=1).reshape(-1))
    return make_orthonormal(NullSpace(vectors=modes))
