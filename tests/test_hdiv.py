"""H(div) GMG tests — mirrors the reference's hdiv GMG suite
(test/LinearSolvers/GMGTests.jl hdiv; GMG budget <=20 iters at rtol 1e-6)
with RT0 transfers and vertex-patch smoothers."""
import numpy as np
import pytest

import jax.numpy as jnp

from gridapsolvers_tpu.fem.hdiv import (
    RTProlongation,
    RTRestriction,
    hdiv_gmg,
    hdiv_operator,
    hdiv_vertex_patches,
)
from gridapsolvers_tpu.linear import CGSolver
from gridapsolvers_tpu.utils import pytrees as pt


def test_hdiv_operator_spd():
    A, free = hdiv_operator((6, 6), alpha=1.0)
    D = np.asarray(A.todense())
    np.testing.assert_allclose(D, D.T, atol=1e-12)
    ev = np.linalg.eigvalsh(D)
    assert ev.min() > 1e-12


def test_rt_transfer_adjoint():
    nc = (4, 4)
    P = RTProlongation(nc)
    R = RTRestriction(nc)
    rng = np.random.default_rng(0)
    uc = (
        jnp.asarray(rng.normal(size=5 * 4)),
        jnp.asarray(rng.normal(size=4 * 5)),
    )
    uf = (
        jnp.asarray(rng.normal(size=9 * 8)),
        jnp.asarray(rng.normal(size=8 * 9)),
    )
    lhs = float(pt.dot(P.matvec(uc), uf))
    rhs = float(pt.dot(uc, R.matvec(uf)))
    assert abs(lhs - rhs) < 1e-10


def test_rt_prolongation_preserves_constants():
    """A constant normal field (uniform flow) is in every RT0 space; the
    prolongation must reproduce it exactly on interior faces."""
    nc = (4, 4)
    P = RTProlongation(nc)
    uc = (jnp.ones(5 * 4), jnp.zeros(4 * 5))
    fx, fy = P.matvec(uc)
    np.testing.assert_allclose(np.asarray(fx), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fy), 0.0, atol=1e-12)


@pytest.mark.parametrize("alpha", [1.0, 10.0])
def test_hdiv_gmg_cg(alpha):
    """GMG-CG on the H(div) operator within the reference budget."""
    gmg, A, free = hdiv_gmg((16, 16), num_levels=3, alpha=alpha)
    solver = CGSolver(Pl=gmg, rtol=1e-6, maxiter=20)
    rng = np.random.default_rng(1)
    x_true = (
        jnp.asarray(rng.normal(size=17 * 16)) * free[0],
        jnp.asarray(rng.normal(size=16 * 17)) * free[1],
    )
    b = A.matvec(x_true)
    state = solver.setup(A)
    x, stats = solver.solve(state, b)
    assert stats.converged(), int(stats.niter)
    assert int(stats.niter) <= 20
    err = float(pt.norm(pt.sub(x, x_true))) / float(pt.norm(x_true))
    # residual rtol 1e-6 gives solution error up to kappa(A)*1e-6; the
    # div-div-dominated operator at alpha=10 is the ill-conditioned case
    assert err < (1e-5 if alpha <= 1.0 else 1e-3)


def test_hdiv_gmg_mesh_independent():
    iters = []
    for n, L in ((8, 2), (16, 3)):
        gmg, A, free = hdiv_gmg((n, n), num_levels=L, alpha=1.0)
        solver = CGSolver(Pl=gmg, rtol=1e-8, maxiter=30)
        rng = np.random.default_rng(2)
        b = (
            jnp.asarray(rng.normal(size=(n + 1) * n)) * free[0],
            jnp.asarray(rng.normal(size=n * (n + 1))) * free[1],
        )
        state = solver.setup(A)
        _, stats = solver.solve(state, b)
        assert stats.converged()
        iters.append(int(stats.niter))
    assert max(iters) - min(iters) <= 4, iters


def test_rt_transfer_transpose_3d():
    """<P xc, xf> == <xc, R xf> in 3D (unmasked transfers are exact
    transposes)."""
    import numpy as np
    import jax.numpy as jnp

    from gridapsolvers_tpu.fem.hdiv import (
        RTProlongation,
        RTRestriction,
        _face_shape,
    )

    rng = np.random.default_rng(0)
    cc = (2, 3, 2)
    fc = tuple(2 * c for c in cc)
    uc = tuple(
        jnp.asarray(rng.normal(size=int(np.prod(_face_shape(cc, d)))))
        for d in range(3)
    )
    uf = tuple(
        jnp.asarray(rng.normal(size=int(np.prod(_face_shape(fc, d)))))
        for d in range(3)
    )
    Pu = RTProlongation(cc).matvec(uc)
    Ru = RTRestriction(cc).matvec(uf)
    lhs = sum(float(jnp.vdot(a, b)) for a, b in zip(Pu, uf))
    rhs = sum(float(jnp.vdot(a, b)) for a, b in zip(uc, Ru))
    assert abs(lhs - rhs) < 1e-10


def test_hdiv_gmg_3d_alpha_robust():
    """3D H(div) GMG with AFW vertex-patch (12-face) smoothing converges
    alpha-robustly (reference GMGTests.jl hdiv 3D sweep: <= 20 iters to
    rtol 1e-6)."""
    import numpy as np
    import jax.numpy as jnp

    from gridapsolvers_tpu.fem.hdiv import hdiv_gmg
    from gridapsolvers_tpu.linear import CGSolver

    rng = np.random.default_rng(0)
    for alpha in (1.0, 100.0):
        gmg, A, free = hdiv_gmg((8, 8, 8), 2, alpha=alpha, maxiter=1)
        solver = CGSolver(Pl=gmg, rtol=1e-6, maxiter=40)
        st = solver.setup(A)
        b = tuple(f * jnp.asarray(rng.normal(size=f.shape[0])) for f in free)
        x, stats = solver.solve(st, b)
        assert stats.converged() and int(stats.niter) <= 20, (
            alpha,
            int(stats.niter),
        )


# -- RT1 (the reference's actual Darcy order, DarcyGMG.jl:52-56) -------------


def test_rt1_exact_pair_consistency():
    """u = (x+y, -y), p = 2x-1 are exactly representable in RT1 x P1disc;
    the constructed RHS is consistent to machine precision."""
    from gridapsolvers_tpu.fem.rt1 import darcy_rt1_problem

    prob = darcy_rt1_problem((6, 6))
    assert prob.residual_norm(prob.x_exact) < 1e-12


def test_rt1_transfer_nested_embedding():
    """The RT1 coarse->fine embedding is exact on representable fields:
    prolongating the coarse interpolant of u = (x+y, -y) gives the fine
    interpolant (nested spaces), and R = P^T (adjoint identity)."""
    import numpy as np
    import jax.numpy as jnp

    from gridapsolvers_tpu.fem.rt1 import (
        darcy_rt1_problem,
        rt1_transfer_pair,
    )

    cc = (4, 4)
    probc = darcy_rt1_problem(cc)
    probf = darcy_rt1_problem((8, 8))
    P, R = rt1_transfer_pair(cc)
    uf = P.matvec(probc.x_exact[0])
    for a, b in zip(uf, probf.x_exact[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    rng = np.random.default_rng(0)
    xc = tuple(jnp.asarray(rng.normal(size=np.asarray(u).shape)) for u in probc.x_exact[0])
    xf = tuple(jnp.asarray(rng.normal(size=np.asarray(u).shape)) for u in probf.x_exact[0])
    lhs = sum(float(jnp.vdot(a, b)) for a, b in zip(P.matvec(xc), xf))
    rhs = sum(float(jnp.vdot(a, b)) for a, b in zip(xc, R.matvec(xf)))
    assert abs(lhs - rhs) < 1e-10


def test_rt1_darcy_gmg_2d():
    """RT1 x P1disc Darcy at the reference configuration (alpha=1e2,
    vertex-star patch smoothers, FGMRES + block-tri): h-independent,
    <= 20 iterations at rtol 1e-6 (DarcyGMG.jl:96-124)."""
    import jax

    from gridapsolvers_tpu.fem.rt1 import darcy_rt1_problem, darcy_rt1_solver

    iters = []
    for nc in ((8, 8), (16, 16)):
        prob = darcy_rt1_problem(nc)
        solver = darcy_rt1_solver(nc, 2, rtol=1e-10)
        st = solver.setup(prob.A)
        x, stats = jax.jit(solver.solve)(st, prob.b)
        assert prob.residual_norm(x) < 1e-5   # reference's final check
        assert prob.velocity_error(x[0]) < 1e-5
        iters.append(int(stats.niter))
    assert all(i <= 20 for i in iters), iters
    assert abs(iters[1] - iters[0]) <= 2, iters  # h-independence


def test_rt1_darcy_gmg_3d():
    import jax

    from gridapsolvers_tpu.fem.rt1 import darcy_rt1_problem, darcy_rt1_solver

    nc = (4, 4, 4)
    prob = darcy_rt1_problem(nc)
    solver = darcy_rt1_solver(nc, 2, rtol=1e-10)
    st = solver.setup(prob.A)
    x, stats = jax.jit(solver.solve)(st, prob.b)
    assert int(stats.niter) <= 20, int(stats.niter)
    assert prob.residual_norm(x) < 1e-5
    assert prob.velocity_error(x[0]) < 1e-5


def test_rt1_model_driver():
    """models.solve_darcy(order=2) runs the reference's actual DarcyGMG."""
    from gridapsolvers_tpu.models.darcy import solve_darcy

    x, stats, info = solve_darcy((8, 8), order=2, rtol=1e-10)
    assert info["residual"] < 1e-5
    assert int(stats.niter) <= 20
