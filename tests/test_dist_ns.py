"""Distributed Navier-Stokes: sharded convection reassembly + nonlinear
GMG (reference test/Applications/NavierStokesGMG.jl:80-176 run on
PSparseMatrix; here the per-Newton Jacobian refresh is one shard_map
program over the 8-device CPU mesh)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gridapsolvers_tpu.fem.dist_navier_stokes import (
    distributed_ns_problem,
    distributed_ns_solver,
)
from gridapsolvers_tpu.fem.navier_stokes import navier_stokes_problem
from gridapsolvers_tpu.parallel import device_mesh
from gridapsolvers_tpu.parallel.dist_ell import shard_vector, unshard_vector
from gridapsolvers_tpu.utils import pytrees as pt


NP = 8


@pytest.fixture(scope="module")
def mesh():
    return device_mesh(NP)


@pytest.fixture(scope="module")
def dist16(mesh):
    return distributed_ns_problem((16, 16), mesh)


def _shard_state(prob, u_host, p_host, mesh):
    n_u_pad = prob.assembler.n_pad
    n_p_pad = prob.Mp.shape[0]
    u = tuple(shard_vector(ui, mesh, "p", n_pad=n_u_pad) for ui in u_host)
    p = shard_vector(p_host, mesh, "p", n_pad=n_p_pad)
    return (u, p)


def test_dist_residual_matches_serial(dist16, mesh):
    prob = dist16
    serial = prob.serial
    rng = np.random.default_rng(3)
    u_h = tuple(rng.normal(size=prob.n_u) * 0.1 for _ in range(2))
    p_h = rng.normal(size=prob.n_p) * 0.1

    r_ser = serial.residual(
        (tuple(jnp.asarray(ui) for ui in u_h), jnp.asarray(p_h))
    )
    r_dist = prob.residual(_shard_state(prob, u_h, p_h, mesh))
    (ru_d, rp_d) = r_dist
    for c in range(2):
        np.testing.assert_allclose(
            unshard_vector(ru_d[c], prob.n_u),
            np.asarray(r_ser[0][c]),
            atol=1e-11,
        )
    np.testing.assert_allclose(
        unshard_vector(rp_d, prob.n_p), np.asarray(r_ser[1]), atol=1e-11
    )


def test_dist_jacobian_matches_serial(dist16, mesh):
    """J(x) v identical between the sharded and serial assemblies — the
    strongest structural check on the shard_map scatter/halo path."""
    prob = dist16
    serial = prob.serial
    rng = np.random.default_rng(4)
    u_h = tuple(rng.normal(size=prob.n_u) * 0.1 for _ in range(2))
    p_h = rng.normal(size=prob.n_p) * 0.1
    v_u = tuple(rng.normal(size=prob.n_u) for _ in range(2))
    v_p = rng.normal(size=prob.n_p)

    J_ser = serial.jacobian(
        (tuple(jnp.asarray(ui) for ui in u_h), jnp.asarray(p_h))
    )
    y_ser = J_ser.matvec(
        (tuple(jnp.asarray(vi) for vi in v_u), jnp.asarray(v_p))
    )

    J_dist = prob.jacobian(_shard_state(prob, u_h, p_h, mesh))
    y_dist = J_dist.matvec(_shard_state(prob, v_u, v_p, mesh))

    for c in range(2):
        np.testing.assert_allclose(
            unshard_vector(y_dist[0][c], prob.n_u),
            np.asarray(y_ser[0][c]),
            atol=1e-10,
        )
    np.testing.assert_allclose(
        unshard_vector(y_dist[1], prob.n_p), np.asarray(y_ser[1]), atol=1e-10
    )


def test_dist_newton_gmg_converges(dist16, mesh):
    """Full sharded Newton: FGMRES + block-tri(nonlinear dist GMG, mass CG)
    matches the serial solve's quality."""
    prob = dist16
    solver = distributed_ns_solver(prob, (16, 16), 2, mesh)
    x, stats = solver.solve(prob, prob.zero_guess())
    assert stats.converged(), np.asarray(stats.residuals)
    assert int(stats.niter) <= 8
    u, p = x
    assert prob.velocity_error(u) < 5e-4


def test_dist_refresh_stays_on_device(dist16, mesh):
    """The Jacobian refresh jits as one program over sharded arguments
    (no host round-trip per Newton step)."""
    prob = dist16
    x = prob.zero_guess()

    @jax.jit
    def refresh_and_apply(x, v):
        J = prob.jacobian(x)
        return J.matvec(v)

    rng = np.random.default_rng(0)
    v = _shard_state(
        prob,
        tuple(rng.normal(size=prob.n_u) for _ in range(2)),
        rng.normal(size=prob.n_p),
        mesh,
    )
    y = refresh_and_apply(x, v)
    jax.block_until_ready(y)
