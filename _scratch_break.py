"""Component breakdown of the augmented grad-div GMG cycle on chip."""
import os, time, dataclasses as dc
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
r0 = jax.device_put(jax.tree_util.tree_map(lambda x: jnp.ones_like(x), gprob.b[0]), dev)

def fence(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(jnp.sum(l.ravel()[:2]) for l in leaves))

def timeit(fn, *args, K=10):
    f1 = jax.jit(lambda *a: fn(*a))
    fence(f1(*args))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(K):
            y = f1(*args)
        fence(y)
        best = min(best, (time.perf_counter()-t0)/K)
    return best

# full V-cycle (preconditioner apply)
t_cycle = timeit(lambda st, r: ggmg.apply(st, r), gst, r0)
print(f"V-cycle apply: {t_cycle*1e3:.2f} ms", flush=True)

# fine-level smoother (Richardson(Vanka,10))
sm = ggmg.smoother[0] if isinstance(ggmg.smoother, (list, tuple)) else ggmg.smoother
sm_st = gst["smoothers"][0] if "smoothers" in gst else None
print("state keys:", list(gst.keys())[:12], flush=True)
if sm_st is not None:
    x0 = jax.tree_util.tree_map(jnp.zeros_like, r0)
    t_sm = timeit(lambda st, x, r: sm.smooth(st, x, r), sm_st, x0, r0)
    print(f"fine smoother (10 Richardson): {t_sm*1e3:.2f} ms", flush=True)
    # one Vanka apply + one block matvec
    inner = sm.solver if hasattr(sm, "solver") else None
    if inner is not None:
        vst = sm_st["inner"] if "inner" in sm_st else sm_st
        try:
            t_va = timeit(lambda st, r: inner.apply(st, r), vst, r0)
            print(f"one Vanka apply: {t_va*1e3:.3f} ms", flush=True)
        except Exception as e:
            print("vanka apply skip:", e, flush=True)
    K0d = jax.device_put(K0, dev)
    t_mv = timeit(lambda A, r: A.matvec(r), K0d, r0)
    print(f"one augmented block matvec: {t_mv*1e3:.3f} ms", flush=True)

# transfers
P0 = ggmg.prolongations[0]
R0 = ggmg.restrictions[0]
pst = gst.get("prolong", None)
print("gst keys:", list(gst.keys()), flush=True)
