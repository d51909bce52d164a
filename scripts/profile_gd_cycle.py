"""Component breakdown of one augmented grad-div GMG V-cycle on chip:
smoother / Vanka apply / matvec / transfer timings (DESIGN.md round-3
section). NC env var sets cells/side (default 64)."""
import os, time
import numpy as np, jax, jax.numpy as jnp
from gridapsolvers_tpu.fem.stokes import stokes_problem, velocity_gmg

gnc = int(os.environ.get("NC", "64"))
alpha = 1e3
ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
with ctx:
    ggmg = velocity_gmg((gnc, gnc), 3, graddiv_alpha=alpha)
    gprob = stokes_problem((gnc, gnc), dtype=np.float32, graddiv_alpha=alpha)
    K0 = gprob.A.block(0, 0)
    gst_host = ggmg.setup(K0)
dev = jax.devices()[0]
gst = jax.device_put(gst_host, dev)
r0 = jax.device_put(tuple(jnp.ones_like(x) for x in gprob.b[0]), dev)

def fence(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(jnp.sum(jnp.ravel(l)[:2].astype(jnp.float32)) for l in leaves))

def timeit(fn, *args, K=20):
    f = jax.jit(fn)
    fence(f(*args))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        y = None
        for _ in range(K):
            y = f(*args)
        fence(y)
        best = min(best, (time.perf_counter()-t0)/K)
    return best

pre = ggmg._smoothers()[0]
t = timeit(lambda st, r: ggmg.apply(st, r), gst, r0, K=5)
print(f"V-cycle: {t*1e3:.2f} ms", flush=True)
x0 = tuple(jnp.zeros_like(x) for x in r0)
t = timeit(lambda st, x, r: pre[0].smooth(st, x, r), gst["pre"][0], x0, r0)
print(f"fine smoother (Richardson 10x Vanka): {t*1e3:.2f} ms", flush=True)
vanka = pre[0].M
vst = gst["pre"][0]["M"]
t = timeit(lambda st, r: vanka.apply(st, r), vst, r0)
print(f"one Vanka apply: {t*1e3:.3f} ms", flush=True)
t = timeit(lambda m, r: m.matvec(r), gst["mats"][0], r0)
print(f"one augmented matvec: {t*1e3:.3f} ms", flush=True)
t = timeit(lambda P, x: P.matvec(x), gst["R"][0], r0)
print(f"restriction L0: {t*1e3:.3f} ms", flush=True)
rH = jax.jit(lambda R, r: R.matvec(r))(gst["R"][0], r0)  # on-device
t = timeit(lambda P, x: P.matvec(x), gst["P"][0], rH)
print(f"patch prolongation L0: {t*1e3:.3f} ms", flush=True)
