"""Kernelized GMG levels (kernelize_levels=): NS level Jacobians on the
Pallas sorted-slot kernel with PATTERN-STATIC values-only refresh.

The per-Newton nonlinear reassembly (reference numerical_setup! /
GMGLinearSolvers.jl:260-297) must stay jit-traceable inside the device
Newton loop: `pallas_ell_refresh` maps new assembler values through the
stored tiled-layout permutation (one gather per update, matvecs stay
gather-free)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gridapsolvers_tpu.fem.navier_stokes import (
    navier_stokes_problem,
    ns_velocity_gmg,
)
from gridapsolvers_tpu.linear import RichardsonSmoother
from gridapsolvers_tpu.ops.ell_pallas import (
    PallasELL,
    pallas_ell,
    pallas_ell_refresh,
)
from gridapsolvers_tpu.patches import VankaSolver
from gridapsolvers_tpu.utils import pytrees as pt


def test_pallas_ell_refresh_matches_rebuild():
    """Values-only refresh == full rebuild, and it traces under jit."""
    import scipy.sparse as sp

    from gridapsolvers_tpu.algebra.ell import ell_from_scipy
    from gridapsolvers_tpu.fem import assembly2 as asm2
    from gridapsolvers_tpu.fem.mesh import CartesianMesh

    m = CartesianMesh((16, 16), (0.0, 1.0, 0.0, 1.0))
    mask = asm2.boundary_node_mask(m, 2)
    K = asm2.dirichlet_square(
        asm2.assemble_bilinear(m, 2, "stiffness"), mask
    )
    A = ell_from_scipy(K, dtype=np.float32)
    k = pallas_ell(A, q=2, interpret=True, refreshable=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(A.shape[1]).astype(np.float32))
    newv = jnp.asarray(np.asarray(A.values) * 1.7)
    k2 = jax.jit(pallas_ell_refresh)(k, newv)
    y = np.asarray(k2.matvec(x))
    y_ref = 1.7 * (K @ np.asarray(x))
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-5
    np.testing.assert_allclose(
        np.asarray(k2.diag()), 1.7 * np.asarray(k.diag()), rtol=1e-6
    )
    with pytest.raises(ValueError):
        pallas_ell_refresh(pallas_ell(A, q=2, interpret=True), newv)


def test_ns_gmg_kernelized_augmented_update():
    """The augmented config (grad-div patch transfers, Vanka smoothers) +
    kernelized levels: GMG.update must refresh the patch TRANSFER
    operators against the raw ELL operators (ell_view extraction), not
    the PallasELL wrappers — the BENCH_r04 ns-graddiv crash
    (TypeError: ell_view: unsupported operator PallasELL)."""
    nc = 8
    alpha = 100.0
    prob = navier_stokes_problem(
        (nc, nc), nu=1.0, graddiv_alpha=alpha, dtype=np.float32
    )

    def mk(**kw):
        return ns_velocity_gmg(
            (nc, nc), 2, nu=1.0, graddiv_alpha=alpha, ncycles=1,
            dtype=np.float32, **kw,
        )

    g_ref = mk()
    g_ker = mk(kernelize_levels="pallas", kernel_interpret=True)
    x0 = prob.zero_guess()
    A = prob.jacobian(x0).blocks[0][0]
    st_r = g_ref.setup(A, x0[0])
    st_k = g_ker.setup(A, x0[0])
    assert any(
        isinstance(b, PallasELL)
        for m in st_k["mats"][:-1]
        for row in getattr(m, "blocks", ())
        for b in row
    )
    x1 = jax.tree_util.tree_map(lambda a: a + 0.03, x0)
    A1 = prob.jacobian(x1).blocks[0][0]
    st_k1 = jax.jit(g_ker.update)(st_k, A1, x1[0])  # crashed pre-fix
    st_r1 = g_ref.update(st_r, A1, x1[0])
    # transfer states keep the RAW-ELL operator class: update() runs
    # inside the device Newton loop, so the state pytree structure must
    # be invariant between setup and update
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda _: 0, st_k1["P"])
    ) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda _: 0, st_k["P"])
    )
    r = jax.tree_util.tree_map(jnp.ones_like, prob.residual(x0)[0])
    z_r1 = g_ref.apply(st_r1, r)
    z_k1 = g_ker.apply(st_k1, r)
    assert float(pt.norm(pt.sub(z_r1, z_k1)) / pt.norm(z_r1)) < 1e-5


def test_ns_gmg_kernelized_levels_parity():
    """All NS velocity-level blocks convert; apply parity vs the XLA-ELL
    GMG, and update() TRACES (lax-compatible) at a new iterate."""
    nc = 8
    prob = navier_stokes_problem((nc, nc), nu=1.0, dtype=np.float32)

    def mk(**kw):
        return ns_velocity_gmg(
            (nc, nc), 2, nu=1.0,
            smoother=RichardsonSmoother(
                VankaSolver(omega=1.0, seed_field=-1), niter=1, omega=0.8
            ),
            ncycles=2, dtype=np.float32, **kw,
        )

    g_ref = mk()
    g_ker = mk(kernelize_levels="pallas", kernel_interpret=True)
    x0 = prob.zero_guess()
    A = prob.jacobian(x0).blocks[0][0]
    xu = x0[0]
    st_r = g_ref.setup(A, xu)
    st_k = g_ker.setup(A, xu)
    blocks = [
        b
        for m in st_k["mats"][:-1]
        for row in getattr(m, "blocks", ())
        for b in row
    ]
    assert blocks and all(isinstance(b, PallasELL) for b in blocks)
    r = jax.tree_util.tree_map(jnp.ones_like, prob.residual(x0)[0])
    z_r = g_ref.apply(st_r, r)
    z_k = g_ker.apply(st_k, r)
    assert float(pt.norm(pt.sub(z_r, z_k)) / pt.norm(z_r)) < 1e-5

    x1 = jax.tree_util.tree_map(lambda a: a + 0.05, x0)
    A1 = prob.jacobian(x1).blocks[0][0]
    st_k1 = jax.jit(g_ker.update)(st_k, A1, x1[0])  # must trace
    st_r1 = g_ref.update(st_r, A1, x1[0])
    z_r1 = g_ref.apply(st_r1, r)
    z_k1 = g_ker.apply(st_k1, r)
    assert float(pt.norm(pt.sub(z_r1, z_k1)) / pt.norm(z_r1)) < 1e-5
