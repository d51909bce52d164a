"""Pallas kernel tests (interpret mode on CPU; compiled path exercised by
bench.py on the real chip)."""
import numpy as np
import pytest

import jax.numpy as jnp

from gridapsolvers_tpu.fem import poisson_problem
from gridapsolvers_tpu.fem.assembly import laplacian_const
from gridapsolvers_tpu.ops import pallas_const_stencil


@pytest.mark.parametrize("ncells", [(8, 8, 8), (16, 8, 4)])
def test_pallas_const_stencil_matches(ncells):
    prob = poisson_problem(ncells)
    Ac = laplacian_const(prob.mesh)
    K = pallas_const_stencil(Ac, tile=3, interpret=True)
    # tile must divide nx: nx = ncells[0]+1 = 9 or 17 -> tile 3 or 1
    x = np.random.default_rng(0).normal(size=Ac.n)
    y_ref = np.asarray(Ac.matvec(jnp.asarray(x)))
    y = np.asarray(K.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-10, atol=1e-12)


def test_pallas_const_stencil_2d():
    prob = poisson_problem((12, 12))
    Ac = laplacian_const(prob.mesh)
    K = pallas_const_stencil(Ac, tile=13, interpret=True)
    x = np.random.default_rng(1).normal(size=Ac.n)
    np.testing.assert_allclose(
        np.asarray(K.matvec(jnp.asarray(x))),
        np.asarray(Ac.matvec(jnp.asarray(x))),
        rtol=1e-10,
        atol=1e-12,
    )


def test_pallas_stencil_as_gmg_level_operator():
    """The pallas operator drops into GMG as a level operator (diag /
    abs_row_sum for the smoother, matvec for the cycle)."""
    import jax

    from gridapsolvers_tpu.linear import CGSolver, ChebyshevSmoother
    from gridapsolvers_tpu.linear.gmg import gmg_from_hierarchy
    from gridapsolvers_tpu.multilevel import cartesian_hierarchy

    prob = poisson_problem((16, 16, 16))
    hierarchy = cartesian_hierarchy((16, 16, 16), 2)

    def assemble(mesh):
        return pallas_const_stencil(
            laplacian_const(mesh), tile=4, interpret=True
        )

    gmg = gmg_from_hierarchy(
        hierarchy,
        assemble,
        smoother=ChebyshevSmoother(degree=3, eig_method="gershgorin"),
    )
    solver = CGSolver(Pl=gmg, rtol=1e-6, maxiter=20)
    state = solver.setup(assemble(prob.mesh))
    x, stats = solver.solve(state, jnp.asarray(prob.b))
    assert stats.converged()
    assert float(prob.l2_error(x)) < 1e-5


def test_pallas_banded_stencil_interpret():
    """Variable-coefficient banded kernel == StencilMatrix.matvec
    (interpret mode; compiled-mode exactness verified on the real chip:
    f32 rel err 0.0, bf16 4.4e-5)."""
    import numpy as np
    import jax.numpy as jnp

    from gridapsolvers_tpu.fem.assembly import eliminate_dirichlet, laplacian
    from gridapsolvers_tpu.fem.mesh import CartesianMesh
    from gridapsolvers_tpu.ops.banded_pallas import pallas_banded_stencil

    for ncells in [(7, 15, 15), (7, 12, 10), (15, 15)]:
        mesh = CartesianMesh(ncells, tuple(x for _ in ncells for x in (0, 1)))
        A = eliminate_dirichlet(
            laplacian(mesh, np.float32), mesh.boundary_vertex_mask()
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=A.n).astype(np.float32))
        y_ref = A.matvec(x)
        K = pallas_banded_stencil(A, tile=8, interpret=True)
        y = K.matvec(x)
        err = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
        assert err < 1e-5, (ncells, err)
        # diag/abs_row_sum parity (smoother hooks)
        np.testing.assert_allclose(
            np.asarray(K.diag()), np.asarray(A.diag()), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(K.abs_row_sum()), np.asarray(A.abs_row_sum()), rtol=1e-6
        )
