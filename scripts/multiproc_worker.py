"""Multi-process distributed solve worker (one real process per "rank").

The reference CI runs every distributed driver under actual
`mpiexec -n 4` (test/LinearSolvers/mpi/runtests.jl:5-20) — separate
processes, real message transport. This is the JAX analog: N processes
x 2 local CPU devices each, joined via jax.distributed.initialize with
gloo CPU collectives, running the SAME flagship programs as the
single-process 8-device mesh (dryrun_multichip):

  - GMG(Chebyshev)-preconditioned CG on 3D Poisson, row-sharded levels
  - Stokes FGMRES + block-tri(velocity GMG, pressure mass CG), sharded

Every process executes the same SPMD program on global jax.Arrays whose
shards live in different OS processes; collectives (psum dots, halo
collective-permutes, coarse-level all-gathers) cross a real process
boundary. Rank 0 prints one JSON line with iteration counts and
residuals for the launcher/test to compare against the single-process
run (iteration parity = the reference's seq-vs-mpi test axis).

Usage: python multiproc_worker.py <pid> <nprocs> <port>
"""
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

PID, NPROCS, PORT = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(
    f"localhost:{PORT}", num_processes=NPROCS, process_id=PID
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    n_devices = len(jax.devices())
    assert n_devices == 2 * NPROCS, (n_devices, NPROCS)
    assert jax.process_count() == NPROCS

    from gridapsolvers_tpu.fem import poisson_problem
    from gridapsolvers_tpu.linear import CGSolver, ChebyshevSmoother
    from gridapsolvers_tpu.multilevel import cartesian_hierarchy
    from gridapsolvers_tpu.parallel import (
        device_mesh,
        distributed_poisson_gmg,
        shard_grid_vector,
    )

    out = {"pid": PID, "nprocs": NPROCS, "n_devices": n_devices}

    # ---- GMG-CG flagship (BASELINE config 2, multi-process) ----
    dtype = np.float32
    ncells = (16, 16, 16)
    mesh = device_mesh(n_devices)
    prob = poisson_problem(ncells, dtype=dtype)
    hierarchy = cartesian_hierarchy(ncells, 3)
    gmg, Ad = distributed_poisson_gmg(
        hierarchy, mesh, smoother=ChebyshevSmoother(degree=3),
        dtype=jnp.float32,
    )
    solver = CGSolver(Pl=gmg, rtol=1e-6, maxiter=20)
    bd = shard_grid_vector(
        jnp.asarray(np.asarray(prob.b, dtype=dtype)), mesh,
        prob.A.grid_shape, target_shape=Ad.grid_shape,
    )
    state = solver.setup(Ad)

    @jax.jit
    def step(st, A, b):
        # A rides as an ARGUMENT: closing over a global array spanning
        # non-addressable devices is rejected by multi-process JAX
        x, stats = solver.solve(st, b)
        # replicated scalars are device_get-able on every process
        rnorm = jnp.linalg.norm(
            (A.matvec(x) - b).ravel()
        ) / jnp.linalg.norm(b.ravel())
        return stats.niter, rnorm, jnp.sum(x)

    niter, rnorm, ck = step(state, Ad, bd)
    out["gmg_cg_iters"] = int(niter)
    out["gmg_cg_rel_resid"] = float(rnorm)
    out["gmg_cg_checksum"] = float(ck)

    # ---- Stokes FGMRES + block-triangular flagship ----
    from gridapsolvers_tpu.fem.dist_stokes import (
        distributed_stokes_solver,
        distributed_stokes_system,
    )

    sprob, A_dist, b_dist, pv, pq = distributed_stokes_system(
        (16, 16), mesh, dtype=dtype
    )
    ssolver, _ = distributed_stokes_solver(
        (16, 16), 2, mesh, rtol=1e-6, maxiter=40, dtype=dtype
    )
    sstate = ssolver.setup(A_dist)

    @jax.jit
    def sstep(st, b):
        x, stats = ssolver.solve(st, b)
        ck = sum(
            jnp.sum(l) for l in jax.tree_util.tree_leaves(x)
        )
        return stats.niter, ck

    sniter, sck = sstep(sstate, b_dist)
    out["stokes_iters"] = int(sniter)
    out["stokes_checksum"] = float(sck)

    # ---- AUGMENTED grad-div flagship (alpha=1e3, Q2/P1disc,
    # distributed Vanka + Chebyshev) across real processes; host-side
    # patch/window tables fetch through the process-safe
    # _host_fetch/process_allgather path (parallel/dist_ell_nd.py) ----
    from gridapsolvers_tpu.fem.dist_stokes import (
        distributed_stokes_graddiv_solver,
        distributed_stokes_graddiv_system,
    )

    gprob, Ag, bg, gpv, gpp = distributed_stokes_graddiv_system(
        (16, 16), mesh, num_levels=2, dtype=dtype
    )
    gsolver, _ = distributed_stokes_graddiv_solver(
        (16, 16), 2, mesh, rtol=1e-8, maxiter=30, dtype=dtype,
        gmg_kw={"cheby_degree": 4},
    )
    gstate = gsolver.setup(Ag)

    @jax.jit
    def gstep(st, b):
        x, stats = gsolver.solve(st, b)
        ck = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(x))
        return stats.niter, ck

    gniter, gck = gstep(gstate, bg)
    out["graddiv_iters"] = int(gniter)
    out["graddiv_checksum"] = float(gck)

    if PID == 0:
        print("MULTIPROC_RESULT " + json.dumps(out), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
