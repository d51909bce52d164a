"""End-to-end verify: flat-engine augmented Stokes + periodic Q2 GMG."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import dataclasses as dc

import numpy as np
import jax.numpy as jnp

from gridapsolvers_tpu.blocks import BlockTriangularSolver, MatrixBlock
from gridapsolvers_tpu.fem.stokes import stokes_problem, velocity_gmg
from gridapsolvers_tpu.linear import CGSolver, FGMRESSolver, JacobiSolver

alpha = 1e3
prob = stokes_problem((16, 16), graddiv_alpha=alpha, engine="flat")
gmg = velocity_gmg((16, 16), 3, graddiv_alpha=alpha, engine="flat")
Mp = dc.replace(prob.Mp, values=prob.Mp.values * (-1.0 / alpha))
prec = BlockTriangularSolver(
    solvers=(gmg, CGSolver(Pl=JacobiSolver(), rtol=1e-8, maxiter=40)),
    blocks=((None, None), (None, MatrixBlock(Mp))),
    coeffs=((1.0, 1.0), (0.0, 1.0)),
    half="upper",
)
solver = FGMRESSolver(m=20, Pr=prec, rtol=1e-9, maxiter=30)
st = solver.setup(prob.A)
x, stats = jax.jit(solver.solve)(st, prob.b)
res = float(prob.residual_norm(x))
err = float(prob.velocity_error(x[0]))
print(f"flat-engine augmented Stokes: iters={int(stats.niter)} "
      f"residual={res:.3e} u_l2err={err:.3e}")
assert stats.converged() and res < 1e-7
assert err < 1e-3

# periodic-x Q2 Poisson through the space-hierarchy public API
from gridapsolvers_tpu.linear import ChebyshevSmoother
from gridapsolvers_tpu.linear.gmg import GMGSolver
from gridapsolvers_tpu.multilevel import (
    cartesian_hierarchy,
    fe_space_hierarchy,
)

h = cartesian_hierarchy((32, 32), 3, periodic=(True, False))
sh = fe_space_hierarchy(h, order=2)
mats = sh.compute_matrices("stiffness")
P, R = sh.transfer_operators()
pgmg = GMGSolver(
    coarse_ops=tuple(mats[1:]),
    prolongations=tuple(P),
    restrictions=tuple(R),
    smoother=ChebyshevSmoother(degree=3),
)
psolver = CGSolver(Pl=pgmg, rtol=1e-10, maxiter=40)
pst = psolver.setup(mats[0])
s0 = sh[0]
xy = s0.node_coords()
free = np.asarray(s0.free_mask(np.float64))
# manufactured: u = sin(2 pi x) sin(pi y), f = 5 pi^2 u; rhs via mass
u_exact = np.sin(2 * np.pi * xy[:, 0]) * np.sin(np.pi * xy[:, 1])
from gridapsolvers_tpu.fem import assembly2 as asm2

M = asm2.assemble_bilinear(s0.mesh, 2, "mass")
b = (M @ (5 * np.pi**2 * u_exact)) * free
xp, pstats = psolver.solve(pst, jnp.asarray(b))
l2 = float(np.sqrt((np.asarray(xp) - u_exact) @ (M @ (np.asarray(xp) - u_exact))))
print(f"periodic Q2 GMG-CG: iters={int(pstats.niter)} l2err={l2:.3e}")
assert pstats.converged() and int(pstats.niter) <= 25
assert l2 < 2e-4
print("VERIFY OK")
