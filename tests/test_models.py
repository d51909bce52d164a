"""Application-driver smoke tests (models/ mirrors test/Applications)."""
import numpy as np
import pytest

from gridapsolvers_tpu.models import (
    solve_darcy,
    solve_elasticity,
    solve_navier_stokes,
    solve_poisson,
    solve_stokes,
)
from gridapsolvers_tpu.multilevel.projection_transfer import (
    setup_projection_restrictions,
)


def test_model_poisson():
    x, stats, info = solve_poisson((16, 16), num_levels=3)
    assert stats.converged()
    assert info["l2_error"] < 1e-6


def test_model_stokes():
    x, stats, info = solve_stokes((8, 8), num_levels=2)
    assert info["residual"] < 1e-7


def test_model_navier_stokes():
    x, stats, info = solve_navier_stokes((6, 6), picard_first=1)
    assert stats.converged()


def test_model_darcy():
    x, stats, info = solve_darcy((8, 8))
    assert info["residual"] < 1e-6


def test_model_elasticity():
    x, stats, info = solve_elasticity((8, 8), num_levels=2)
    assert stats.converged()
    assert info["residual"] < 1e-6


def test_l2_projection_restriction():
    """:projection-mode transfer: L2 projection reproduces coarse-space
    functions exactly (reference
    DistributedGridTransferOperatorsTests semantics)."""
    import jax.numpy as jnp

    from gridapsolvers_tpu.multilevel import (
        cartesian_hierarchy,
        setup_transfer_operators,
    )

    hierarchy = cartesian_hierarchy((8, 8), 2)
    Rs = setup_projection_restrictions(hierarchy)
    Ps, _ = setup_transfer_operators(hierarchy, with_masks=False)
    coords = hierarchy[1].vertex_coords()
    uc = jnp.asarray(coords[:, 0] + 0.5 * coords[:, 1])
    uf = Ps[0].matvec(uc)  # interpolate to fine
    back = Rs[0].matvec(uf)  # L2-project down
    np.testing.assert_allclose(np.asarray(back), np.asarray(uc), atol=1e-9)


def test_model_stokes_cavity_graddiv():
    """The reference's actual StokesGMG problem through the model driver:
    lid-driven cavity + augmented-Lagrangian grad-div configuration."""
    x, stats, info = solve_stokes(
        (8, 8), num_levels=2, graddiv_alpha=100.0, bc="cavity"
    )
    assert stats.converged()
    assert info["residual"] < 1e-7
    assert "velocity_error" not in info  # no manufactured solution
