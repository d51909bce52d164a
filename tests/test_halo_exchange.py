"""Explicit halo-exchange stencil matvec + nested-pad transfers
(parallel/halo.py): parity against the auto-partitioned lowering on the
8-device mesh. The halo path is the comms-lean form of the distributed
SpMV: ONE neighbor exchange per matvec (COMMS: 273 -> ~27 loop-body
permutes per GMG-CG iteration) with the interior contribution
data-independent of the permutes (overlappable)."""
import jax
import numpy as np, jax.numpy as jnp
from gridapsolvers_tpu.fem.assembly import laplacian, eliminate_dirichlet, laplacian_const
from gridapsolvers_tpu.fem.mesh import CartesianMesh
from gridapsolvers_tpu.parallel.mesh import device_mesh, device_mesh_nd
from gridapsolvers_tpu.parallel.dist import (pad_stencil,
    shard_grid_vector, _grid_pspec, _axes_tuple, padded_shape_nd)
from gridapsolvers_tpu.parallel.halo import halo_wrap
from gridapsolvers_tpu.algebra.stencil import StencilMatrix
from jax.sharding import NamedSharding, PartitionSpec as P

def check(ncells, mesh, axis):
    m = CartesianMesh(ncells, tuple(x for _ in ncells for x in (0.0, 1.0)))
    A = eliminate_dirichlet(laplacian(m, np.float64), m.boundary_vertex_mask())
    axes = _axes_tuple(mesh, axis)
    procs = tuple(mesh.shape[a] for a in axes)
    Ap = pad_stencil(A, procs)
    sh = NamedSharding(mesh, P(None, *_grid_pspec(mesh, len(Ap.grid_shape), axes)))
    bands = jax.device_put(Ap.bands, sh)
    Ad = StencilMatrix(bands, Ap.offsets, Ap.grid_shape, grid_vectors=True, periodic=Ap.periodic)
    H = halo_wrap(Ad, mesh, axis)
    rng = np.random.default_rng(0)
    x = rng.normal(size=Ap.grid_shape)
    xd = shard_grid_vector(jnp.asarray(x), mesh, Ap.grid_shape, axis=axis, pad=False)
    y_auto = np.asarray(jax.jit(Ad.matvec)(xd))
    y_halo = np.asarray(jax.jit(H.matvec)(xd))
    err = np.abs(y_halo - y_auto).max()
    print(f"ncells={ncells} axes={axes} offsets={len(Ap.offsets)}: err {err:.2e}")
    assert err < 1e-12

def test_halo_matvec_slab_3d():
    check((32, 32, 32), device_mesh(8), "p")  # 3D 27-pt slab


def test_halo_matvec_slab_odd_2d():
    check((33, 17), device_mesh(8), "p")


def test_halo_matvec_box_2d():
    check((32, 32), device_mesh_nd((2, 4)), None)  # corners


def test_halo_matvec_box_3d():
    check((16, 16, 16), device_mesh_nd((2, 2, 2)), None)


def test_halo_gmg_cg_parity():
    """Full GMG-CG with halo matvecs + nested-pad halo transfers ==
    the auto-partitioned build: same iterations and solution."""
    import jax.numpy as jnp
    from gridapsolvers_tpu.fem import poisson_problem
    from gridapsolvers_tpu.linear import CGSolver, ChebyshevSmoother
    from gridapsolvers_tpu.multilevel import cartesian_hierarchy
    from gridapsolvers_tpu.parallel import (
        distributed_poisson_gmg,
        shard_grid_vector,
    )

    mesh = device_mesh(8)
    prob = poisson_problem((32,) * 3, dtype=np.float64)
    h = cartesian_hierarchy((32,) * 3, 3)
    res = {}
    for halo in (False, True):
        gmg, Ad = distributed_poisson_gmg(
            h, mesh, smoother=ChebyshevSmoother(degree=3),
            dtype=jnp.float64, halo_exchange=halo,
        )
        solver = CGSolver(Pl=gmg, rtol=1e-8, maxiter=20)
        bd = shard_grid_vector(
            jnp.asarray(np.asarray(prob.b)), mesh, prob.A.grid_shape,
            target_shape=Ad.grid_shape,
        )
        st = solver.setup(Ad)
        x, stats = jax.jit(lambda s, A, b: solver.solve(s, b))(
            st, Ad, bd
        )
        rn = jnp.linalg.norm((Ad.matvec(x) - bd).ravel())
        rn = float(rn / jnp.linalg.norm(bd.ravel()))
        res[halo] = (int(stats.niter), rn, float(jnp.sum(x)))
    assert res[False][0] == res[True][0]
    assert res[True][1] < 1e-8
    assert abs(res[False][2] - res[True][2]) <= 1e-8 * abs(res[False][2])


def test_ca_chebyshev_matches_per_matvec_exchange():
    """Communication-avoiding Chebyshev (one depth-W exchange per sweep,
    extended-domain recurrence) == the per-matvec-exchange sweep: same
    GMG-CG iteration count and solution (the core values are the same
    numbers in the same order)."""
    import jax.numpy as jnp
    from gridapsolvers_tpu.fem import poisson_problem
    from gridapsolvers_tpu.linear import CGSolver, ChebyshevSmoother
    from gridapsolvers_tpu.multilevel import cartesian_hierarchy
    from gridapsolvers_tpu.parallel import (
        distributed_poisson_gmg,
        shard_grid_vector,
    )

    mesh = device_mesh(8)
    prob = poisson_problem((32,) * 3, dtype=np.float64)
    h = cartesian_hierarchy((32,) * 3, 3)
    res = {}
    for ca in (False, True):
        gmg, Ad = distributed_poisson_gmg(
            h, mesh, smoother=ChebyshevSmoother(degree=3),
            dtype=jnp.float64, ca_smoother=ca,
        )
        solver = CGSolver(Pl=gmg, rtol=1e-8, maxiter=20)
        bd = shard_grid_vector(
            jnp.asarray(np.asarray(prob.b)), mesh, prob.A.grid_shape,
            target_shape=Ad.grid_shape,
        )
        st = solver.setup(Ad)
        x, stats = jax.jit(lambda s, A, b: solver.solve(s, b))(
            st, Ad, bd
        )
        res[ca] = (int(stats.niter), float(jnp.sum(x)))
    assert res[False][0] == res[True][0]
    assert abs(res[False][1] - res[True][1]) < 1e-9 * abs(res[False][1])
