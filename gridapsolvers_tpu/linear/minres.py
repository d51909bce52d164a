"""MINRES with left SPD preconditioning.

Analog of the reference's MINRESSolver
(src/LinearSolvers/Krylov/MINRESSolvers.jl:11-20,75-149): 3-term
preconditioned Lanczos recurrence + Givens QR, ring-buffered direction
vectors. Implemented as the classic Paige-Saunders recurrence inside a
lax.while_loop (the reference's triple ring buffers V/W/Z become rotating
carry slots — no indexing, just carry shuffling, which XLA turns into
register renaming).

The convergence quantity phibar is the M^{-1/2}-preconditioned residual
norm, as standard for PMINRES.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..interfaces import (
    LinearSolver,
    SolverTolerances,
    init_history,
    make_stats,
)
from ..utils import pytrees as pt


@dataclasses.dataclass(frozen=True)
class MINRESSolver(LinearSolver):
    Pl: Optional[LinearSolver] = None
    maxiter: int = 1000
    atol: float = 1e-12
    rtol: float = 1e-8
    # live per-iteration residual printing (reference ConvergenceLog
    # verbose=HIGH); trace-time gate, zero cost when False
    verbose: bool = False
    name: str = "MINRES"
    depth: int = 0

    @property
    def tols(self) -> SolverTolerances:
        return SolverTolerances(self.maxiter, self.atol, self.rtol)

    def setup(self, A, x=None):
        pl = self.Pl.setup(A, x) if self.Pl is not None else None
        return {"A": A, "Pl": pl}

    def update(self, state, A, x=None):
        pl = self.Pl.update(state["Pl"], A, x) if self.Pl is not None else None
        return {"A": A, "Pl": pl}

    def solve(self, state, b, x0=None):
        A = state["A"]
        tols = self.tols

        def M_apply(v):
            return self.Pl.apply(state["Pl"], v) if self.Pl else v

        x = pt.zeros_like(b) if x0 is None else x0
        r1 = pt.sub(b, A.matvec(x))
        y = M_apply(r1)
        beta1 = jnp.sqrt(pt.dot(r1, y))
        dt = beta1.dtype

        hist = init_history(tols.maxiter, beta1)
        zero = pt.zeros_like(b)

        carry = dict(
            it=jnp.asarray(0),
            x=x,
            r1=r1,
            r2=r1,
            y=y,
            w=zero,
            w2=zero,
            oldb=jnp.asarray(0.0, dt),
            beta=beta1,
            dbar=jnp.asarray(0.0, dt),
            epsln=jnp.asarray(0.0, dt),
            phibar=beta1,
            cs=jnp.asarray(-1.0, dt),
            sn=jnp.asarray(0.0, dt),
            hist=hist,
        )

        def cond_fn(c):
            return ~tols.finished(c["it"], c["phibar"], beta1)

        def body_fn(c):
            it = c["it"]
            s = 1.0 / c["beta"]
            v = pt.scale(s, c["y"])
            y = A.matvec(v)
            coef = jnp.where(it >= 1, c["beta"] / jnp.where(c["oldb"] == 0, 1.0, c["oldb"]), 0.0)
            y = pt.axpy(-coef, c["r1"], y)
            alfa = pt.dot(v, y)
            y = pt.axpy(-alfa / c["beta"], c["r2"], y)
            r1, r2 = c["r2"], y
            y = M_apply(r2)
            oldb = c["beta"]
            beta = jnp.sqrt(pt.dot(r2, y))

            oldeps = c["epsln"]
            delta = c["cs"] * c["dbar"] + c["sn"] * alfa
            gbar = c["sn"] * c["dbar"] - c["cs"] * alfa
            epsln = c["sn"] * beta
            dbar = -c["cs"] * beta
            gamma = jnp.sqrt(gbar ** 2 + beta ** 2)
            gamma = jnp.maximum(gamma, jnp.finfo(dt).tiny)
            cs = gbar / gamma
            sn = beta / gamma
            phi = cs * c["phibar"]
            phibar = sn * c["phibar"]

            w1, w2 = c["w2"], c["w"]
            w = pt.scale(
                1.0 / gamma,
                pt.sub(pt.sub(v, pt.scale(oldeps, w1)), pt.scale(delta, w2)),
            )
            x = pt.axpy(phi, w, c["x"])
            hist = c["hist"].at[it + 1].set(phibar)
            if self.verbose:
                from ..interfaces.logs import live_print

                live_print(self.name, self.depth)(it + 1, phibar)
            return dict(
                it=it + 1, x=x, r1=r1, r2=r2, y=y, w=w, w2=w2, oldb=oldb,
                beta=beta, dbar=dbar, epsln=epsln, phibar=phibar, cs=cs,
                sn=sn, hist=hist,
            )

        out = jax.lax.while_loop(cond_fn, body_fn, carry)
        return out["x"], make_stats(
            tols, out["it"], out["phibar"], beta1, out["hist"]
        )
