"""Benchmark harness — runs on the real TPU chip.

Headline metric (BASELINE.json): SpMV nnz/s per chip on the 3D Poisson
stencil operator, against the HBM speed-of-light roofline, plus the
GMG-preconditioned CG solve (time + iterations). vs_baseline is the
achieved fraction of the >=70%-of-roofline target (1.0 == target met).

Everything hot runs inside single jit programs (the axon tunnel makes
per-op dispatch a network roundtrip).
"""
from __future__ import annotations

import json
import time

import numpy as np


# HBM bandwidth (bytes/s) per chip by generation; v5e (lite) = 819 GB/s.
HBM_BW = {
    "v5e": 819e9,
    "v5p": 2765e9,
    "v4": 1228e9,
    "v6e": 1640e9,
}


def _log(msg, t0=[None]):
    import sys

    now = time.perf_counter()
    dt = 0.0 if t0[0] is None else now - t0[0]
    t0[0] = now
    print(f"[bench +{dt:6.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    import os

    import jax
    import jax.numpy as jnp

    from gridapsolvers_tpu.fem import poisson_problem
    from gridapsolvers_tpu.fem.assembly import eliminate_dirichlet, laplacian
    from gridapsolvers_tpu.linear import CGSolver, ChebyshevSmoother
    from gridapsolvers_tpu.linear.gmg import gmg_from_hierarchy
    from gridapsolvers_tpu.multilevel import cartesian_hierarchy

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    bw = HBM_BW.get(gen, HBM_BW["v5e"])
    dtype = np.float32

    # --- problem: 3D Poisson (129^3 = 2.1M dofs by default) ---------------
    nc = int(os.environ.get("BENCH_NCELLS", "128"))
    ncells = (nc, nc, nc)
    nlevels = int(os.environ.get("BENCH_NLEVELS", "4"))
    _log(f"start: ncells={ncells} nlevels={nlevels}")
    prob = poisson_problem(ncells, dtype=dtype)
    _log("problem assembled")
    A = prob.A
    n = A.n
    nbands = A.bands.shape[0]
    # true nonzeros (excluding stored zeros at boundaries/padding)
    nnz = int(np.count_nonzero(np.asarray(A.bands)))
    _log("nnz counted")

    A_dev = jax.device_put(A)
    jax.block_until_ready(A_dev.bands)
    _log("A on device")
    b_dev = jax.device_put(jnp.asarray(prob.b))
    jax.block_until_ready(b_dev)
    _log("b on device")

    # --- SpMV throughput --------------------------------------------------
    K = 30
    scale = np.float32(0.1)  # keep iterates bounded without a reduction

    @jax.jit
    def spmv_loop(x):
        def body(i, v):
            return A_dev.matvec(v) * scale

        return jax.lax.fori_loop(0, K, body, x)

    x0 = b_dev
    _log("spmv: compiling")
    spmv_loop(x0).block_until_ready()  # compile + warm
    _log("spmv: compiled+warm")
    t0 = time.perf_counter()
    spmv_loop(x0).block_until_ready()
    dt = (time.perf_counter() - t0) / K
    nnz_per_s = nnz / dt
    # roofline: minimal HBM traffic = bands + x + y (+normalization reread)
    bytes_per_apply = (nbands * n + 2 * n) * np.dtype(dtype).itemsize
    gbps = bytes_per_apply / dt / 1e9
    roofline_nnz_s = bw * nnz / bytes_per_apply
    frac = nnz_per_s / roofline_nnz_s

    # --- GMG-CG solve -----------------------------------------------------
    hierarchy = cartesian_hierarchy(ncells, nlevels)

    def assemble(mesh):
        return eliminate_dirichlet(
            laplacian(mesh, dtype), mesh.boundary_vertex_mask()
        )

    _log("spmv: measured")
    # gershgorin bound: no Lanczos programs during setup (device is remote)
    gmg = gmg_from_hierarchy(
        hierarchy,
        assemble,
        smoother=ChebyshevSmoother(degree=3, eig_method="gershgorin"),
        dtype=jnp.float32,
    )
    _log("gmg: hierarchy assembled")
    solver = CGSolver(Pl=gmg, rtol=1e-5, maxiter=30)
    state = jax.device_put(solver.setup(A_dev))
    jax.block_until_ready(state)
    _log("gmg: setup done")
    solve = jax.jit(lambda st, b: solver.solve(st, b))
    xw, stats = solve(state, b_dev)
    jax.block_until_ready(xw)  # compile + warm
    _log("gmg: compiled+warm")
    t0 = time.perf_counter()
    x, stats = solve(state, b_dev)
    jax.block_until_ready(x)
    t_solve = time.perf_counter() - t0
    iters = int(stats.niter)

    out = {
        "metric": "spmv_nnz_per_s_3d_poisson_128",
        "value": nnz_per_s,
        "unit": "nnz/s",
        "vs_baseline": frac / 0.70,
        "spmv_gbps": gbps,
        "roofline_frac": frac,
        "gmg_cg_iters": iters,
        "gmg_cg_time_s": t_solve,
        "gmg_cg_dofs": n,
        "gmg_cg_dofs_per_s": n * max(iters, 1) / t_solve,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
