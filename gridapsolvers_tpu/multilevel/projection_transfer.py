"""L2-projection grid transfer (the reference's :projection /
:dual_projection transfer methods).

The conv transfers in transfer.py implement :interpolation (prolongation)
and its adjoint (residual restriction). The reference additionally offers
mass-weighted L2 projection (GridTransferOperators.jl:242-314):

  solution restriction (projection):  u_H = M_H^{-1} P^T M_h u_h
  residual restriction (dual):        r_H = R (M_h^{-1} r_h weighted ...)

Both compose from pieces we already have: mass stencils per level, the
adjoint conv transfer, and a CG mass solve (mass matrices are spectrally
uniform, so a handful of CG iterations is exact to fp accuracy).
"""
from __future__ import annotations

import dataclasses

import jax

from ..fem.assembly import mass
from ..linear.cg import CGSolver
from ..linear.smoothers import JacobiSolver


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class L2ProjectionRestriction:
    """u_H = M_H^{-1} (P^T (M_h u_h)): true L2 projection of a solution
    field to the coarse space (reference :projection mode)."""

    Mh: object          # fine mass operator
    MH_state: dict      # CG state for the coarse mass solve
    adjoint: object     # P^T conv transfer (StructuredRestriction residual)
    solver: CGSolver = dataclasses.field(metadata=dict(static=True))

    def matvec(self, u_h):
        w = self.adjoint.matvec(self.Mh.matvec(u_h))
        u_H, _ = self.solver.solve(self.MH_state, w)
        return u_H


def setup_projection_restrictions(hierarchy, dtype=None):
    """Per-level-pair L2 projection restrictions (solution mode)."""
    from .transfer import StructuredRestriction

    out = []
    solver = CGSolver(Pl=JacobiSolver(), rtol=1e-12, maxiter=60)
    for l in range(hierarchy.num_levels - 1):
        fine, coarse = hierarchy[l], hierarchy[l + 1]
        Mh = mass(fine)
        MH = mass(coarse)
        adj = StructuredRestriction(
            fine.vertex_shape, coarse.vertex_shape, "residual", None, None
        )
        out.append(
            L2ProjectionRestriction(
                Mh=Mh,
                MH_state=solver.setup(MH),
                adjoint=adj,
                solver=solver,
            )
        )
    return out
