"""On-chip wall-time of the augmented grad-div Stokes flagship (flat engine).

Builds on host (CPU backend), ships state once, times the full jitted
FGMRES solve on the TPU. NC env var sets cells/side (default 64).
Numbers recorded in DESIGN.md "Round 3: the flat engine".
"""
import contextlib, os, time, dataclasses as dc
import numpy as np, jax, jax.numpy as jnp

from gridapsolvers_tpu.blocks import BlockTriangularSolver, MatrixBlock
from gridapsolvers_tpu.fem.stokes import stokes_problem, velocity_gmg
from gridapsolvers_tpu.linear import CGSolver, FGMRESSolver, JacobiSolver

alpha = 1e3
gnc = int(os.environ.get("NC", "64"))
ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
with ctx:
    gprob = stokes_problem((gnc, gnc), dtype=np.float32, graddiv_alpha=alpha, engine="flat")
    ggmg = velocity_gmg((gnc, gnc), 3, graddiv_alpha=alpha, engine="flat")
    gMp = dc.replace(gprob.Mp, values=gprob.Mp.values * (-1.0 / alpha))
    gprec = BlockTriangularSolver(
        solvers=(ggmg, CGSolver(Pl=JacobiSolver(), rtol=1e-6, maxiter=30)),
        blocks=((None, None), (None, MatrixBlock(gMp))),
        coeffs=((1.0, 1.0), (0.0, 1.0)),
        half="upper",
    )
    gsolver = FGMRESSolver(m=20, Pr=gprec, rtol=1e-8, maxiter=30)
    gstate_host = gsolver.setup(gprob.A)
gstate = jax.device_put(gstate_host, jax.devices()[0])
gb = jax.device_put(gprob.b, jax.devices()[0])
print("setup done", flush=True)

@jax.jit
def gd_ck(st, b):
    x, stats = gsolver.solve(st, b)
    leaves = jax.tree_util.tree_leaves(x)
    return sum(jnp.sum(l.ravel()[:4]) for l in leaves), stats.niter

ck, niter = gd_ck(gstate, gb); float(ck)  # warm
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    float(gd_ck(gstate, gb)[0])
    best = min(best, time.perf_counter() - t0)
print(f"nc={gnc}: {int(niter)} iters, {best:.3f}s -> {best/max(int(niter),1)*1e3:.1f} ms/iter", flush=True)
