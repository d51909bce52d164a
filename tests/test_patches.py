"""Patch smoother tests — mirrors the reference's PatchBasedSmoothers usage:
patch smoothers inside Richardson/GMG for Poisson (GMGTests patch suite) and
Vanka on the Stokes saddle-point system (Vanka/BlockJacobi MHD experiments,
test/_dev/GMG)."""
import numpy as np
import pytest

import jax.numpy as jnp

from gridapsolvers_tpu.fem import poisson_problem
from gridapsolvers_tpu.fem.stokes import stokes_problem
from gridapsolvers_tpu.linear import CGSolver, RichardsonSmoother
from gridapsolvers_tpu.linear.gmg import gmg_from_hierarchy
from gridapsolvers_tpu.fem.assembly import eliminate_dirichlet, laplacian
from gridapsolvers_tpu.multilevel import cartesian_hierarchy
from gridapsolvers_tpu.patches import (
    PatchSolver,
    VankaSolver,
    vertex_star_patches,
)
from gridapsolvers_tpu.linear import FGMRESSolver


def test_vertex_star_topology():
    topo = vertex_star_patches((5, 5))
    assert topo.n_patches == 25
    assert topo.width == 9
    # corner patch has 4 valid dofs
    assert int(topo.valid_mask()[0].sum()) == 4


def test_patch_smoother_reduces_error():
    prob = poisson_problem((12, 12))
    free = ~prob.dirichlet_mask
    topo = vertex_star_patches(prob.A.grid_shape, free)
    sm = PatchSolver(topo, omega=0.6, weighting="overlap")
    st = sm.setup(prob.A)
    x = jnp.zeros_like(prob.b)
    r = prob.b - prob.A.matvec(x)
    r0 = float(jnp.linalg.norm(r))
    for _ in range(10):
        x, r = sm.smooth(st, x, r)
    assert float(jnp.linalg.norm(r)) < 0.3 * r0
    # contract: r stays consistent
    np.testing.assert_allclose(
        np.asarray(prob.b - prob.A.matvec(x)), np.asarray(r), atol=1e-10
    )


def test_cg_patch_preconditioner():
    """CG preconditioned by a patch smoother (reference SmoothersTests
    pattern, L2 < 1e-8 equivalent)."""
    prob = poisson_problem((8, 8))
    free = ~prob.dirichlet_mask
    topo = vertex_star_patches(prob.A.grid_shape, free)
    sm = RichardsonSmoother(
        PatchSolver(topo, weighting="overlap"), niter=2, omega=0.8
    )
    solver = CGSolver(Pl=sm, rtol=1e-8, maxiter=100)
    st = solver.setup(prob.A)
    x, stats = solver.solve(st, prob.b)
    assert float(prob.l2_error(x)) < 1e-6


def test_gmg_with_patch_smoother():
    """GMG with patch pre/post smoothing (GMGTests patch suite)."""
    prob = poisson_problem((16, 16))
    hierarchy = cartesian_hierarchy((16, 16), 2)

    def assemble(mesh):
        return eliminate_dirichlet(laplacian(mesh), mesh.boundary_vertex_mask())

    def smoother_for(lev_mesh):
        free = ~lev_mesh.boundary_vertex_mask()
        topo = vertex_star_patches(lev_mesh.vertex_shape, free)
        return RichardsonSmoother(
            PatchSolver(topo, weighting="overlap"), niter=1, omega=0.8
        )

    gmg = gmg_from_hierarchy(
        hierarchy,
        assemble,
        smoother=[smoother_for(m) for m in hierarchy.meshes[:-1]],
    )
    solver = CGSolver(Pl=gmg, rtol=1e-8, maxiter=25)
    st = solver.setup(prob.A)
    x, stats = solver.solve(st, prob.b)
    assert stats.converged()
    assert float(prob.l2_error(x)) < 1e-6


def test_vanka_stokes_smoother():
    """Vanka on Stokes: FGMRES preconditioned by Vanka converges
    (the reference's Vanka use case for saddle-point smoothing)."""
    prob = stokes_problem((8, 8))
    vanka = VankaSolver(omega=0.7)
    solver = FGMRESSolver(m=40, Pr=RichardsonSmoother(vanka, niter=2, omega=1.0),
                          rtol=1e-8, maxiter=150)
    st = solver.setup(prob.A)
    x, stats = solver.solve(st, prob.b)
    assert prob.residual_norm(x) < 1e-6
    u, p = x
    assert prob.velocity_error(u) < 5e-3


def test_patch_transfer_gmg():
    """GMG with patch-corrected transfer operators (reference
    PatchProlongationOperator / PatchRestrictionOperator usage in the GMG
    test sweep, GMGTests.jl transfer={patch})."""
    import jax

    from gridapsolvers_tpu.linear.gmg import GMGSolver
    from gridapsolvers_tpu.multilevel import (
        cartesian_hierarchy,
        setup_transfer_operators,
    )
    from gridapsolvers_tpu.patches import coarse_cell_patches
    from gridapsolvers_tpu.patches.transfer import setup_patch_transfers
    from gridapsolvers_tpu.linear import ChebyshevSmoother, DenseLUSolver

    prob = poisson_problem((16, 16))
    hierarchy = cartesian_hierarchy((16, 16), 2)

    def assemble(mesh):
        return eliminate_dirichlet(laplacian(mesh), mesh.boundary_vertex_mask())

    ops = [assemble(m) for m in hierarchy.meshes]
    P0, R0 = setup_transfer_operators(hierarchy)
    topos = [
        coarse_cell_patches(
            hierarchy[l + 1].ncells,
            order=1,
            free_mask=~hierarchy[l].boundary_vertex_mask(),
        )
        for l in range(hierarchy.num_levels - 1)
    ]
    Pp, Rp = setup_patch_transfers(P0, R0, ops, topos, omega=1.0)
    gmg = GMGSolver(
        coarse_ops=tuple(ops[1:]),
        prolongations=tuple(Pp),
        restrictions=tuple(Rp),
        smoother=ChebyshevSmoother(degree=3),
        coarsest_solver=DenseLUSolver(),
    )
    solver = CGSolver(Pl=gmg, rtol=1e-8, maxiter=25)
    st = solver.setup(prob.A)
    solve = jax.jit(lambda s, b: solver.solve(s, b))
    x, stats = solve(st, prob.b)
    assert stats.converged()
    assert float(prob.l2_error(x)) < 1e-6


def test_update_is_jittable_on_device():
    """The numerical_setup! analog must be a single device program (VERDICT
    round-1 item 5): Vanka and PatchSolver `update` jit cleanly — no scipy/
    host detour — and reproduce a fresh `setup` factorization."""
    import jax

    # Vanka on a Stokes block system, re-extracted at scaled values
    prob = stokes_problem((6, 6))
    vanka = VankaSolver(omega=0.7)
    st = vanka.setup(prob.A)

    def scale_A(A, s):
        # scale float leaves only (ELL cols index arrays must not change)
        return jax.tree_util.tree_map(
            lambda x: x * s if jnp.issubdtype(x.dtype, jnp.floating) else x, A
        )

    A2 = scale_A(prob.A, 2.0)
    upd = jax.jit(vanka.update)
    st2 = upd(st, A2)
    st2_ref = vanka.setup(A2)
    np.testing.assert_allclose(
        np.asarray(st2["inv"]), np.asarray(st2_ref["inv"]), rtol=1e-12
    )
    # applying with the refreshed state matches fresh setup
    r = prob.b
    z_upd = vanka.apply(st2, r)
    z_ref = vanka.apply(st2_ref, r)
    for a, b in zip(jax.tree_util.tree_leaves(z_upd), jax.tree_util.tree_leaves(z_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)

    # PatchSolver on a stencil operator
    pprob = poisson_problem((8, 8))
    topo = vertex_star_patches(pprob.A.grid_shape, ~pprob.dirichlet_mask)
    sm = PatchSolver(topo, weighting="overlap")
    pst = sm.setup(pprob.A)
    A2p = scale_A(pprob.A, 3.0)
    pst2 = jax.jit(sm.update)(pst, A2p)
    pst2_ref = sm.setup(A2p)
    np.testing.assert_allclose(
        np.asarray(pst2["inv"]), np.asarray(pst2_ref["inv"]), rtol=1e-12
    )


def test_patch_solver_nonoverlapping():
    """The nonoverlapping variant (reference PatchSolvers.jl
    solve_patch_nonoverlapping!:302-320): each dof is written by exactly
    one patch (last wins). On disjoint patches it coincides with the
    overlapping solve; on overlapping vertex stars it is a valid
    smoother (CG-preconditioned solve converges)."""
    import jax.numpy as jnp
    import numpy as np

    from gridapsolvers_tpu.fem import poisson_problem
    from gridapsolvers_tpu.linear import CGSolver
    from gridapsolvers_tpu.patches.smoothers import PatchSolver
    from gridapsolvers_tpu.patches.topology import vertex_star_patches

    prob = poisson_problem((16, 16))
    gs = prob.A.grid_shape
    topo = vertex_star_patches(gs)
    # owner weights select exactly one writer per dof
    w = topo.owner_slot_mask()
    counts = np.zeros(topo.n_dofs + 1)
    np.add.at(counts, topo.dofs.reshape(-1), w.reshape(-1))
    assert (counts[: topo.n_dofs] == 1.0).all()

    sm = PatchSolver(topo, weighting="nonoverlapping", spd=True)
    solver = CGSolver(Pl=sm, rtol=1e-9, maxiter=200, flexible=True)
    st = solver.setup(prob.A)
    x, stats = solver.solve(st, prob.b)
    assert stats.converged()
    assert float(prob.l2_error(x)) < 1e-6
