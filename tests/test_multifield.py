"""3D multifield (MHD-like) GMG suite — the reference's hardest GMG test
(test/LinearSolvers/GMGTests.jl:325-359 gmg_multifield_driver): coupled
(u, j) system, [Q1]^3 x RT0, vertex-patch Vanka smoothing."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gridapsolvers_tpu.fem.mhd import mhd_gmg, mhd_system, mhd_vertex_patches
from gridapsolvers_tpu.linear import FGMRESSolver


def test_mhd_system_structure():
    prob = mhd_system((4, 4, 4))
    assert len(prob.b) == 6
    # skew coupling: A + A^T == blockdiag(beta K, M) (symmetric part SPD)
    import jax

    x = tuple(jnp.asarray(np.random.default_rng(0).normal(size=b.shape[0]))
              for b in prob.b)
    Ax = prob.A.matvec(x)
    # <x, Ax> = <x, sym(A) x> > 0 for x in the free space
    x_free = tuple(xi * f for xi, f in zip(x, prob.free))
    Axf = prob.A.matvec(x_free)
    quad = sum(float(jnp.vdot(a, b)) for a, b in zip(x_free, Axf))
    assert quad > 0


def test_mhd_vertex_patches():
    topo = mhd_vertex_patches((4, 4, 4))
    assert topo.n_patches == 27         # 3^3 interior vertices
    assert topo.width == 3 + 12         # 3 nodal u-dofs + 12 faces


def test_mhd_gmg_converges():
    """GMG-preconditioned FGMRES on the 3D multifield system: <= 20 iters
    to rtol 1e-6 (reference tolerance)."""
    gmg, prob = mhd_gmg((8, 8, 8), 2, maxiter=1)
    solver = FGMRESSolver(m=30, Pr=gmg, rtol=1e-6, maxiter=40)
    st = solver.setup(prob.A)
    x, stats = jax.jit(solver.solve)(st, prob.b)
    assert stats.converged()
    assert int(stats.niter) <= 20
    assert prob.residual_norm(x) < 1e-5


def test_mhd_gmg_gamma_robust():
    """Convergence holds as the coupling strength gamma grows."""
    for gamma in (1.0, 10.0):
        gmg, prob = mhd_gmg((8, 8, 8), 2, gamma=gamma, maxiter=1)
        solver = FGMRESSolver(m=30, Pr=gmg, rtol=1e-6, maxiter=60)
        st = solver.setup(prob.A)
        x, stats = solver.solve(st, prob.b)
        assert stats.converged(), gamma
        assert int(stats.niter) <= 30, (gamma, int(stats.niter))
