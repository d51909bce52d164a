"""On-chip A/B of the NS Newton flagship knobs (bench config 4):
outer-operator kernelization (FGMRES kernelize=) x Vanka engine
(batched gather/solve/scatter vs materialized one-SpMV).

Run under the retry loop: timeout 1200 python scripts/ab_ns.py
"""
from __future__ import annotations

import contextlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if os.environ.get("NS_PROFILE_CPU"):
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
    from gridapsolvers_tpu.nonlinear import NewtonSolver
    from gridapsolvers_tpu.patches import VankaSolver
    from gridapsolvers_tpu.patches.materialized import (
        MaterializedVankaSmoother,
    )

    nc = int(os.environ.get("NS_NC", "32"))
    dev = jax.devices()[0]
    interp = bool(os.environ.get("NS_PROFILE_CPU"))
    ctx = contextlib.nullcontext()
    try:
        ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
    except Exception:
        pass

    for vanka_kind in ("batched", "materialized"):
        for outer in ("off", "pallas"):
            with ctx:
                prob = navier_stokes_problem(
                    (nc, nc), nu=1.0, dtype=np.float32
                )
                if vanka_kind == "batched":
                    v = VankaSolver(omega=1.0, seed_field=-1)
                else:
                    v = MaterializedVankaSmoother(
                        omega=1.0, seed_field=-1,
                        engine="ell" if interp else "pallas",
                        q=4,
                    )
                sm = RichardsonSmoother(v, niter=1, omega=0.8)
                gmg = ns_velocity_gmg(
                    (nc, nc), num_levels=3, nu=1.0, smoother=sm,
                    ncycles=2, dtype=np.float32,
                    kernelize_levels="off" if interp else "auto",
                )
                P = BlockTriangularSolver(
                    solvers=(
                        gmg,
                        CGSolver(Pl=JacobiSolver(), rtol=1e-6, maxiter=30),
                    ),
                    blocks=(
                        (NonlinearSystemBlock(), None),
                        (None, MatrixBlock(prob.Mp)),
                    ),
                    half="upper",
                )
                f = FGMRESSolver(
                    m=40, Pr=P, rtol=1e-8, maxiter=100,
                    kernelize=outer, kernel_interpret=interp,
                )
                newton = NewtonSolver(
                    f, maxiter=12, rtol=1e-6, atol=5e-7, loop="device"
                )
                fn, dyn, ls, x0 = newton.prepare(prob, prob.zero_guess())
            dyn, ls, x0 = jax.device_put((dyn, ls, x0), dev)

            @jax.jit
            def run(dyn, ls, x0):
                x, it, flag, hist = fn(dyn, ls, x0)
                leaves = jax.tree_util.tree_leaves(x)
                return sum(jnp.sum(l.ravel()[:4]) for l in leaves), it, flag

            ck, it, flag = run(dyn, ls, x0)
            float(ck)  # compile+first
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                ck, it, flag = run(dyn, ls, x0)
                float(ck)
                best = min(best, time.perf_counter() - t0)
            ni = max(int(it), 1)
            print(
                f"vanka={vanka_kind:12s} outer={outer:6s}: "
                f"{best:.3f}s, {int(it)} Newton (flag {int(flag)}) = "
                f"{best/ni*1e3:.1f} ms/Newton",
                flush=True,
            )


if __name__ == "__main__":
    main()
