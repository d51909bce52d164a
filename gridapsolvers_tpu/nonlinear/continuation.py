"""Continuation between nonlinear operators (e.g. Picard -> Newton).

Analog of the reference's ContinuationFEOperator
(src/NonlinearSolvers/ContinuationFEOperators.jl:26-60,79-160): a nonlinear
operator wrapping two operators and a callback-driven switch; residuals are
shared, Jacobians come from op1 until the switch fires, then from op2.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

from .newton import NonlinearOperator


@dataclasses.dataclass
class ContinuationSwitch:
    """Switch after `niter` jacobian evaluations (the reference's canonical
    usage, ContinuationFEOperators.jl:55-60), or via a custom callback
    (x, count) -> bool."""

    niter: int = 1
    callback: Callable = None
    _count: int = dataclasses.field(default=0, repr=False)
    _switched: bool = dataclasses.field(default=False, repr=False)

    def should_switch(self, x) -> bool:
        if self._switched:
            return True
        self._count += 1
        if self.callback is not None:
            fire = bool(self.callback(x, self._count))
        else:
            fire = self._count > self.niter
        if fire:
            self._switched = True
        return fire


@dataclasses.dataclass
class ContinuationOperator(NonlinearOperator):
    """Presents op1's Jacobian until the switch fires, then op2's.
    Residuals always come from op2 (the true problem)."""

    op1: NonlinearOperator
    op2: NonlinearOperator
    switch: ContinuationSwitch

    def residual(self, x):
        return self.op2.residual(x)

    def jacobian(self, x):
        if self.switch.should_switch(x):
            return self.op2.jacobian(x)
        return self.op1.jacobian(x)
