"""Outer-operator kernelization (`kernelize_system` + the Krylov
`kernelize=` knob): every f32 ELL leaf of a composite system operator —
square velocity blocks AND rectangular B/Bt stacks — rides the
sorted-slot Pallas kernel, with jit-traceable pattern-static refresh
(the outer-matvec analog of GMGSolver.kernelize_levels; reference
numerical_setup! pattern reuse, src/SolverInterfaces/GridapExtras.jl:4-14).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gridapsolvers_tpu.fem.navier_stokes import navier_stokes_problem
from gridapsolvers_tpu.linear import FGMRESSolver
from gridapsolvers_tpu.ops.ell_pallas import (
    PallasELL,
    PallasRect,
    kernelize_system,
    pallas_rect,
    pallas_rect_refresh,
)
from gridapsolvers_tpu.utils import pytrees as pt


def _tmap(f, *t):
    return jax.tree_util.tree_map(f, *t)


def test_pallas_rect_refresh_fold_and_expand():
    """Values-only refresh == rebuild for BOTH rect modes (fold =
    restriction-like needs the src2 slot permutation)."""
    prob = navier_stokes_problem((8, 8), nu=1.0, dtype=np.float32)
    A = prob.jacobian(prob.zero_guess())
    Bt = A.blocks[0][1].ops[0]   # (n_u, n_p): expand mode
    B = A.blocks[1][0].ops[0]    # (n_p, n_u): fold mode
    rng = np.random.RandomState(0)
    for m in (Bt, B):
        k = pallas_rect(m, interpret=True, refreshable=True)
        assert isinstance(k, PallasRect)
        x = jnp.asarray(rng.randn(m.shape[1]).astype(np.float32))
        newv = m.values * 1.7
        k2 = jax.jit(pallas_rect_refresh)(k, newv)
        y = np.asarray(k2.matvec(x))
        y_ref = 1.7 * np.asarray(m.matvec(x))
        scale = np.abs(y_ref).max()
        assert np.abs(y - y_ref).max() / scale < 1e-5, m.shape
    with pytest.raises(ValueError):
        pallas_rect_refresh(pallas_rect(B, interpret=True), B.values)


def test_kernelize_system_ns_jacobian():
    """Full NS saddle-point Jacobian: all 8 ELL leaves convert, matvec
    parity, traceable refresh at a new iterate, pytree structure
    invariance (device-Newton-loop carry requirement)."""
    prob = navier_stokes_problem((8, 8), nu=1.0, dtype=np.float32)
    x0 = prob.zero_guess()
    A = prob.jacobian(x0)
    k = kernelize_system(A, interpret=True)

    def _leaves(o):
        if o is None:
            return []
        if isinstance(o, (PallasELL, PallasRect)):
            return [o]
        if hasattr(o, "blocks"):
            return [x for r in o.blocks for b in r for x in _leaves(b)]
        if hasattr(o, "ops"):
            return [x for b in o.ops for x in _leaves(b)]
        return [o]

    leaves = _leaves(k)
    assert len(leaves) == 8
    assert all(isinstance(b, (PallasELL, PallasRect)) for b in leaves)
    v = _tmap(jnp.ones_like, prob.residual(x0))
    err = float(pt.norm(pt.sub(A.matvec(v), k.matvec(v))) / pt.norm(A.matvec(v)))
    assert err < 1e-6

    x1 = _tmap(lambda a: a + 0.05, x0)
    A1 = prob.jacobian(x1)
    k1 = jax.jit(lambda a: kernelize_system(a, k, interpret=True))(A1)
    err = float(
        pt.norm(pt.sub(A1.matvec(v), k1.matvec(v))) / pt.norm(A1.matvec(v))
    )
    assert err < 1e-6
    tm = lambda t: jax.tree_util.tree_structure(_tmap(lambda _: 0, t))
    assert tm(k) == tm(k1)


def test_fgmres_kernelize_update_protocol():
    """FGMRES(kernelize=) keeps the kernelized operator through
    setup/update; preconditioner state still receives the RAW operator
    (extraction contract); solve trajectories match the raw path."""
    from gridapsolvers_tpu.linear import CGSolver, JacobiSolver

    prob = navier_stokes_problem((8, 8), nu=1.0, dtype=np.float32)
    x0 = prob.zero_guess()
    A = prob.jacobian(x0)
    b = prob.residual(x0)
    f_off = FGMRESSolver(m=15, rtol=1e-6, maxiter=15)
    f_on = FGMRESSolver(
        m=15, rtol=1e-6, maxiter=15,
        kernelize="pallas", kernel_interpret=True,
    )
    st_on = f_on.setup(A, x0)
    assert isinstance(st_on["A"], type(A))  # composite wrapper kept
    x_off, s_off = f_off.solve(f_off.setup(A, x0), b)
    x_on, s_on = f_on.solve(st_on, b)
    assert int(s_on.niter) == int(s_off.niter)
    assert float(pt.norm(pt.sub(x_on, x_off)) / pt.norm(x_off)) < 1e-4

    # jitted update (the device-Newton path) refreshes in place
    x1 = _tmap(lambda a: a + 0.05, x0)
    A1 = prob.jacobian(x1)
    st1 = jax.jit(f_on.update)(st_on, A1, x1)
    v = _tmap(jnp.ones_like, b)
    err = float(
        pt.norm(pt.sub(st1["A"].matvec(v), A1.matvec(v)))
        / pt.norm(A1.matvec(v))
    )
    assert err < 1e-6
    tm = lambda t: jax.tree_util.tree_structure(_tmap(lambda _: 0, t))
    assert tm(st1["A"]) == tm(st_on["A"])  # while_loop carry invariance
