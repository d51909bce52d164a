"""On-chip AMG V-cycle: XLA-ELL levels vs Pallas-kernel levels
(AMGSolver engine='ell' vs 'pallas') on the Q2-stiffness gather-cliff
case (DESIGN.md). Host setup on the CPU backend, one device_put."""
import os, time
import numpy as np, jax, jax.numpy as jnp

from gridapsolvers_tpu.algebra.ell import ell_from_scipy
from gridapsolvers_tpu.fem import assembly2 as asm2
from gridapsolvers_tpu.fem.mesh import CartesianMesh
from gridapsolvers_tpu.linear import CGSolver
from gridapsolvers_tpu.linear.amg import AMGSolver

nc = int(os.environ.get("NC", "96"))
mesh = CartesianMesh((nc, nc), (0.0, 1.0, 0.0, 1.0))
mask = asm2.boundary_node_mask(mesh, 2)
K = asm2.dirichlet_square(asm2.assemble_bilinear(mesh, 2, "stiffness"), mask)
A = ell_from_scipy(K, dtype=np.float32)
rng = np.random.default_rng(0)
b_h = (rng.normal(size=A.shape[0]).astype(np.float32) * ~np.asarray(mask))

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]

results = {}
for engine in ("ell", "pallas"):
    amg = AMGSolver(coarse_size=200, engine=engine)
    with jax.default_device(cpu):
        st_h = amg.setup(A)
    st = jax.device_put(st_h, dev)
    b = jax.device_put(jnp.asarray(b_h), dev)

    @jax.jit
    def apply_ck(s, r):
        z = amg.apply(s, r)
        return jnp.sum(z.ravel()[:4])

    float(apply_ck(st, b))  # compile+warm
    K2 = 101

    @jax.jit
    def applyK(s, r):
        def body(i, v):
            return amg.apply(s, v) * np.float32(0.5)
        return jnp.sum(jax.lax.fori_loop(0, K2, body, r).ravel()[:4])

    float(applyK(st, b))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); float(applyK(st, b))
        best = min(best, (time.perf_counter() - t0) / K2)
    print(f"{engine}: V-cycle {best*1e3:.3f} ms "
          f"(levels: {[m.shape[0] for m in st_h['mats']]})", flush=True)
    results[engine] = best

    solver = CGSolver(Pl=amg, rtol=1e-8, maxiter=60)
    with jax.default_device(cpu):
        sst_h = solver.setup(A)
    sst = jax.device_put(sst_h, dev)

    @jax.jit
    def solve_ck(s, r):
        x, stats = solver.solve(s, r)
        return jnp.sum(x.ravel()[:4]), stats.niter

    float(solve_ck(sst, b)[0])
    t0 = time.perf_counter(); ck, it = solve_ck(sst, b); float(ck)
    print(f"{engine}: CG solve {(time.perf_counter()-t0):.3f}s, "
          f"{int(it)} iters", flush=True)

print(f"pallas speedup: {results['ell']/results['pallas']:.2f}x", flush=True)
