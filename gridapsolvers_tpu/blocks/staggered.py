"""Staggered (one-directional-coupling) multiphysics operators.

Analog of the reference's StaggeredFEOperators
(src/BlockSolvers/StaggeredFEOperators.jl:20,64-100,123-303): variable k is
solved using the already-solved variables u_1..u_{k-1}; affine and
nonlinear variants; the solver caches per-stage setups for re-solves
(reference :89-100).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

from ..nonlinear.newton import NonlinearOperator
from ..utils import pytrees as pt


@dataclasses.dataclass
class StaggeredAffineOperator:
    """Stage k: A_k(u_prev) x_k = b_k(u_prev) with u_prev = (x_1..x_{k-1}).

    operators[k] : callable u_prev -> linear operator
    rhs[k]       : callable u_prev -> rhs vector
    (reference StaggeredAffineFEOperator, StaggeredFEOperators.jl:123-204)
    """

    operators: Sequence[Callable]
    rhs: Sequence[Callable]

    @property
    def num_stages(self) -> int:
        return len(self.operators)


@dataclasses.dataclass
class StaggeredNonlinearOperator:
    """Stage k: nonlinear operator factory u_prev -> NonlinearOperator
    (reference StaggeredNonlinearFEOperator, StaggeredFEOperators.jl:223-303)."""

    stages: Sequence[Callable]  # u_prev -> NonlinearOperator
    initial_guesses: Optional[Sequence] = None

    @property
    def num_stages(self) -> int:
        return len(self.stages)


@dataclasses.dataclass
class StaggeredSolver:
    """One linear (or nonlinear) solver per stage
    (reference StaggeredFESolver, StaggeredFEOperators.jl:64-70)."""

    solvers: Sequence

    def solve(self, op, x0: Optional[Tuple] = None, cache=None):
        """Returns (tuple of per-stage solutions, cache). Passing the cache
        back re-uses stage setups via numerical_setup!-style updates
        (reference StaggeredFEOperators.jl:89-100)."""
        xs: List = []
        new_cache = []
        if isinstance(op, StaggeredAffineOperator):
            for k in range(op.num_stages):
                u_prev = tuple(xs)
                A = op.operators[k](u_prev)
                b = op.rhs[k](u_prev)
                solver = self.solvers[k]
                if cache is not None:
                    state = solver.update(cache[k], A)
                else:
                    state = solver.setup(A)
                xk, _ = solver.solve(
                    state, b, None if x0 is None else x0[k]
                )
                xs.append(xk)
                new_cache.append(state)
            return tuple(xs), new_cache

        assert isinstance(op, StaggeredNonlinearOperator)
        for k in range(op.num_stages):
            u_prev = tuple(xs)
            nlop = op.stages[k](u_prev)
            solver = self.solvers[k]
            guess = (
                x0[k]
                if x0 is not None
                else op.initial_guesses[k]
                if op.initial_guesses is not None
                else None
            )
            assert guess is not None, "nonlinear stages need an initial guess"
            xk, _ = solver.solve(nlop, guess)
            xs.append(xk)
            new_cache.append(None)
        return tuple(xs), new_cache


@dataclasses.dataclass
class BlockFEOperator(NonlinearOperator):
    """Nonlinear operator assembled blockwise with per-block linearity
    flags: linear blocks are assembled once and cached, nonlinear blocks
    are re-assembled at the current iterate
    (reference BlockFEOperators.jl:2-7,44-60,92-128).

    blocks[i][j]: None | operator (linear) | callable x -> operator
                  (nonlinear, called with the FULL block iterate)
    rhs: tuple of per-field rhs vectors (residual = A(x) x - rhs).
    """

    blocks: Sequence[Sequence]
    rhs: Tuple

    def __post_init__(self):
        self._cache = [
            [b if not callable(b) else None for b in row] for row in self.blocks
        ]

    def _assemble(self, x):
        from ..algebra import BlockOperator

        out = []
        for i, row in enumerate(self.blocks):
            r = []
            for j, b in enumerate(row):
                if b is None:
                    r.append(None)
                elif callable(b):
                    r.append(b(x))
                else:
                    r.append(self._cache[i][j])
            out.append(tuple(r))
        return BlockOperator(tuple(out))

    def jacobian(self, x):
        return self._assemble(x)

    def residual(self, x):
        A = self._assemble(x)
        return pt.sub(A.matvec(x), self.rhs)
