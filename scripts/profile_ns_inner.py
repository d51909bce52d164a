"""On-chip breakdown of the NS Newton inner iteration (bench config).

The r04 bench measured ~2.7 s per Newton step at nc=32 = ~92 ms per
inner FGMRES iteration (29 inner iters) — far above the stokes
flagship's 39 ms/iter at nc=96. This script times the pieces of the
block-triangular preconditioner apply on the real chip to locate the
cost: velocity-GMG apply, pressure mass-CG, full preconditioner apply,
one bare convection-Jacobian SpMV, and one full inner iteration.

Run under the retry loop:
  timeout 900 python scripts/profile_ns_inner.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import contextlib

    import jax

    if os.environ.get("NS_PROFILE_CPU"):  # CPU smoke of the script logic
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gridapsolvers_tpu.blocks import (
        BlockTriangularSolver,
        MatrixBlock,
        NonlinearSystemBlock,
    )
    from gridapsolvers_tpu.fem.navier_stokes import (
        navier_stokes_problem,
        ns_velocity_gmg,
    )
    from gridapsolvers_tpu.linear import (
        CGSolver,
        FGMRESSolver,
        JacobiSolver,
        RichardsonSmoother,
    )
    from gridapsolvers_tpu.patches import VankaSolver
    from gridapsolvers_tpu.utils import pytrees as pt

    nc = int(os.environ.get("NS_NC", "32"))
    ctx = contextlib.nullcontext()
    try:
        ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
    except Exception:
        pass
    with ctx:
        prob = navier_stokes_problem((nc, nc), nu=1.0, dtype=np.float32)
        sm = RichardsonSmoother(
            VankaSolver(omega=1.0, seed_field=-1), niter=1, omega=0.8
        )
        gmg = ns_velocity_gmg(
            (nc, nc), num_levels=3, nu=1.0, smoother=sm, ncycles=2,
            dtype=np.float32,
            kernelize_levels=os.environ.get("NS_KERNELIZE", "auto"),
        )
        pcg = CGSolver(Pl=JacobiSolver(), rtol=1e-6, maxiter=30)
        P = BlockTriangularSolver(
            solvers=(gmg, pcg),
            blocks=(
                (NonlinearSystemBlock(), None),
                (None, MatrixBlock(prob.Mp)),
            ),
            half="upper",
        )
        fgmres = FGMRESSolver(m=40, Pr=P, rtol=1e-8, maxiter=100)
        x0 = prob.zero_guess()
        A = prob.jacobian(x0)
        st = fgmres.setup(A, x0)
        r0 = pt.scale(-1.0, prob.residual(x0))
    dev = jax.devices()[0]
    st, r0, A = jax.device_put((st, r0, A), dev)

    def fence(fn, *args, trials=5):
        """min single-call time with a device_get barrier (relay: see
        bench.py fenced)."""
        f1 = jax.jit(lambda *a: jnp.sum(
            jax.tree_util.tree_leaves(fn(*a))[0].ravel()[:4]))
        float(f1(*args))
        best1 = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            float(f1(*args))
            best1 = min(best1, time.perf_counter() - t0)
        return best1

    # component: pressure CG on the p-block
    with ctx:
        pst = pcg.setup(prob.Mp)
    pst = jax.device_put(pst, dev)
    t_pcg = fence(lambda s, r: pcg.solve(s, r)[0], pst, r0[1])
    print(f"pressure CG solve: {t_pcg*1e3:.2f} ms", flush=True)

    # component: whole preconditioner apply
    t_prec = fence(lambda s, r: P.apply(s, r), st["Pr"], r0)
    print(f"block-tri prec apply: {t_prec*1e3:.2f} ms", flush=True)

    # component: one convection-Jacobian SpMV
    t_mv = fence(lambda a, r: a.matvec(r), A, r0)
    print(f"jacobian SpMV: {t_mv*1e3:.2f} ms", flush=True)

    # whole solve for reference (+ inner iteration count: per-iter cost)
    t0 = time.perf_counter()

    @jax.jit
    def ck(s, b):
        x, stats = fgmres.solve(s, b)
        return (
            jnp.sum(jax.tree_util.tree_leaves(x)[0].ravel()[:4]),
            stats.niter,
        )

    _, nit = ck(st, r0)
    float(_)
    t_compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    c, nit = ck(st, r0)
    float(c)
    t_solve = time.perf_counter() - t0
    print(f"full inner FGMRES solve: {t_solve*1e3:.1f} ms, "
          f"{int(nit)} iters = {t_solve/max(int(nit),1)*1e3:.1f} ms/iter "
          f"(first {t_compile_and_run:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
