"""On-chip Mosaic conformance sweep for the Pallas kernels.

Runs the sorted-slot ELL kernel (ops/ell_pallas.py), its rectangular
transfer remap, the banded stencil kernel, and the materialized Vanka
smoother over a matrix of shapes ON THE REAL TPU (no interpret mode),
asserting numerical parity against host NumPy references.

Motivation (VERDICT r03 weak #2): interpret-mode tests never exercise
Mosaic's lowering constraints — the exact class of bug (SMEM BlockSpec
divisibility, (nprog, q*K) = (10, 100)) that killed the r03 driver
bench. This sweep covers:
  - nprog in {1, 2, 10, 16} (multi-program SMEM indexing),
  - q in {1, 2, 4} (tile counts / block shapes),
  - tiny coarse-level operators (n ~ 100, heavy padding),
  - rectangular ratios rho in {2, 3, 8}, both expand and fold,
  - f32 and bf16 value storage,
  - the banded stencil kernel and the materialized Vanka apply.

Every constraint it finds must be encoded as a build-time check in the
corresponding factory (interpret-mode tests then stay on CPU).

Usage:
  timeout 1800 python scripts/tpu_conformance.py          # full sweep
  timeout 600  python scripts/tpu_conformance.py --quick  # smoke subset

Relay discipline (CLAUDE.md): one jit apply per case with the operator
passed as an ARGUMENT (no closure capture), fenced by pulling the tiny
output checksum. Wrap in the retry loop for bad relay windows.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(msg):
    print(f"[conf] {msg}", file=sys.stderr, flush=True)


def _ell_reference(A, x):
    """Host NumPy reference for an ELLMatrix matvec."""
    vals = np.asarray(A.values, dtype=np.float64)
    cols = np.asarray(A.cols)
    return (vals * x.astype(np.float64)[cols]).sum(axis=1)


def _banded_synthetic(n, half_width, rng):
    """Square banded CSR with random values on offsets [-hw, hw]."""
    import scipy.sparse as sp

    offs = range(-half_width, half_width + 1)
    diags = [rng.normal(size=n - abs(o)) for o in offs]
    return sp.diags(diags, list(offs), shape=(n, n)).tocsr()


def _interp_1d(nc, rho, rng):
    """(nf, nc) prolongation-like CSR: each fine row couples to the
    bracketing coarse dofs (linear interpolation pattern, random vals
    so parity checks are non-trivial)."""
    import scipy.sparse as sp

    nf = rho * nc
    rows, cols, vals = [], [], []
    for r in range(nf):
        c0 = min(r // rho, nc - 1)
        for c in {c0, min(c0 + 1, nc - 1)}:
            rows.append(r)
            cols.append(c)
            vals.append(rng.normal())
    return sp.coo_matrix((vals, (rows, cols)), shape=(nf, nc)).tocsr()


def main():
    quick = "--quick" in sys.argv
    # --interpret: run the kernels in Pallas interpreter mode (numerics
    # logic check, no Mosaic lowering — the default mode is the real test)
    interp = "--interpret" in sys.argv
    import jax
    import jax.numpy as jnp

    from gridapsolvers_tpu.algebra.ell import ell_from_scipy
    from gridapsolvers_tpu.ops.ell_pallas import pallas_ell, pallas_rect

    dev = jax.devices()[0]
    _log(f"device: {dev}")
    rng = np.random.default_rng(0)
    import contextlib

    ctx = contextlib.nullcontext()
    try:
        ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
    except Exception:
        pass

    @jax.jit
    def apply_ck(op, x):
        y = op.matvec(x)
        return y, jnp.sum(y[:8])

    results = []
    t_start = time.perf_counter()

    def run_case(name, build, ref_fn, nin, tol):
        t0 = time.perf_counter()
        try:
            op = build()
            op = jax.device_put(op, dev)
            x = rng.normal(size=nin).astype(np.float32)
            y_dev, ck = apply_ck(op, jax.device_put(jnp.asarray(x), dev))
            float(ck)  # fence
            y = np.asarray(y_dev)
            y_ref = ref_fn(x)
            err = np.abs(y[: len(y_ref)] - y_ref).max()
            scale = np.abs(y_ref).max() + 1.0
            ok = bool(err <= tol * scale)
            dt = time.perf_counter() - t0
            results.append(
                dict(case=name, ok=ok, err=float(err / scale), t_s=dt)
            )
            _log(f"{'PASS' if ok else 'FAIL'} {name} "
                 f"(rel_err {err/scale:.2e}, {dt:.1f}s)")
        except Exception as e:
            dt = time.perf_counter() - t0
            results.append(
                dict(case=name, ok=False,
                     error=f"{type(e).__name__}: {e}", t_s=dt)
            )
            _log(f"FAIL {name} ({dt:.1f}s): {type(e).__name__}: {e}")

    # --- square sorted-slot kernel: nprog x q x dtype sweep ------------
    # nprog = ceil(n / (1024 q)); pick n for target nprogs at each q
    square_cases = [
        # (n, half_width, q, band_dtype) — nprog at q=4: 1, 1, 2, 10, 16
        (100, 2, 4, None),            # tiny coarse-level op, heavy pad
        (1000, 4, 4, None),
        (8200, 4, 4, None),           # nprog=3 (crossing 2-program SMEM)
        (40000, 4, 4, None),          # nprog=10 — the r03 crash class
        (65536, 4, 4, None),          # nprog=16
        (40000, 4, 4, "bf16"),
        (10000, 4, 1, None),          # q=1 -> nprog=10
        (10000, 4, 2, None),          # q=2 -> nprog=5
    ]
    if quick:
        square_cases = [square_cases[0], square_cases[3],
                        square_cases[5], square_cases[6]]
    for n, hw, q, bdt in square_cases:
        S = _banded_synthetic(n, hw, rng)
        A = ell_from_scipy(S, dtype=np.float32)
        tol = 2e-2 if bdt else 1e-5
        band_dtype = jnp.bfloat16 if bdt else None
        name = f"ell n={n} q={q} {'bf16' if bdt else 'f32'}"
        run_case(
            name,
            lambda A=A, q=q, band_dtype=band_dtype: pallas_ell(
                A, q=q, band_dtype=band_dtype, interpret=interp
            ),
            lambda x, A=A: _ell_reference(A, x),
            n, tol,
        )

    # --- rectangular transfers: expand + fold, rho sweep ----------------
    rect_cases = [(512, 2), (512, 3), (256, 8)]
    if quick:
        rect_cases = [(512, 3)]
    for nc_, rho in rect_cases:
        P = _interp_1d(nc_, rho, rng)   # (rho*nc, nc) prolongation
        A_p = ell_from_scipy(P, dtype=np.float32)
        A_r = ell_from_scipy(P.T.tocsr(), dtype=np.float32)
        run_case(
            f"rect expand rho={rho}",
            lambda A=A_p: pallas_rect(A, q=1, interpret=interp),
            lambda x, A=A_p: _ell_reference(A, x),
            nc_, 1e-5,
        )
        run_case(
            f"rect fold rho={rho}",
            lambda A=A_r: pallas_rect(A, q=1, interpret=interp),
            lambda x, A=A_r: _ell_reference(A, x),
            rho * nc_, 1e-5,
        )
    # multi-program rectangular (nprog > 1 inside the remapped inner)
    if not quick:
        P = _interp_1d(4096, 2, rng)     # fine n = 8192 -> nprog=2 at q=4
        A_p = ell_from_scipy(P, dtype=np.float32)
        run_case(
            "rect expand rho=2 nprog=2",
            lambda A=A_p: pallas_rect(A, q=4, interpret=interp),
            lambda x, A=A_p: _ell_reference(A, x),
            4096, 1e-5,
        )

    # --- AMG state on the kernel: wide-span levels (K~130, total spans
    # ~400-600), 20x-span rect transfers, int16 enc, span-1 fast path —
    # one real smoothed-aggregation hierarchy, full V-cycle parity vs
    # the XLA-ELL state (round-4: the AMG bench section rides exactly
    # this configuration; validate the lowering BEFORE the driver bench)
    if not quick:
        t0 = time.perf_counter()
        try:
            from gridapsolvers_tpu.fem import poisson_problem
            from gridapsolvers_tpu.linear.amg import AMGSolver

            aprob = poisson_problem((16, 16, 16), dtype=np.float32)
            amg_k = AMGSolver(coarse_size=200, engine="pallas",
                              interpret=interp)
            amg_e = AMGSolver(coarse_size=200, engine="ell")
            st_k = jax.device_put(amg_k.setup(aprob.A), dev)
            st_e = jax.device_put(amg_e.setup(aprob.A), dev)
            r = jax.device_put(jnp.asarray(aprob.b), dev)

            @jax.jit
            def amg_apply_k(st, r):
                y = amg_k.apply(st, r)
                return y, jnp.sum(y[:8])

            @jax.jit
            def amg_apply_e(st, r):
                y = amg_e.apply(st, r)
                return y, jnp.sum(y[:8])

            yk, ck = amg_apply_k(st_k, r)
            float(ck)
            ye, ce = amg_apply_e(st_e, r)
            float(ce)
            yk, ye = np.asarray(yk), np.asarray(ye)
            err = np.abs(yk - ye).max() / (np.abs(ye).max() + 1e-30)
            ok = bool(err <= 1e-4)
            dt = time.perf_counter() - t0
            nk = sum(
                type(m).__name__.startswith("Pallas")
                for m in st_k["mats"] + st_k["P"] + st_k["R"]
            )
            results.append(dict(
                case=f"amg vcycle 16^3 ({nk} kernel ops)", ok=ok,
                err=float(err), t_s=dt,
            ))
            _log(f"{'PASS' if ok else 'FAIL'} amg vcycle "
                 f"({nk} kernel ops, rel_err {err:.2e}, {dt:.1f}s)")
        except Exception as e:
            dt = time.perf_counter() - t0
            results.append(dict(
                case="amg vcycle 16^3", ok=False,
                error=f"{type(e).__name__}: {e}", t_s=dt,
            ))
            _log(f"FAIL amg vcycle ({dt:.1f}s): {type(e).__name__}: {e}")

    # --- banded stencil kernel (3D Poisson) ------------------------------
    try:
        from gridapsolvers_tpu.fem import poisson_problem
        from gridapsolvers_tpu.ops import pallas_banded_stencil

        ncp = 24 if quick else 48
        prob = poisson_problem((ncp, ncp, ncp), dtype=np.float32)
        A = prob.A
        nb = A.shape[0]

        def banded_ref(x):
            return np.asarray(A.matvec_host(x)).reshape(-1)

        for bdt in ([None] if quick else [None, "bf16"]):
            band_dtype = jnp.bfloat16 if bdt else None
            run_case(
                f"banded_stencil nc={ncp} {'bf16' if bdt else 'f32'}",
                lambda band_dtype=band_dtype: pallas_banded_stencil(
                    A, band_dtype=band_dtype, interpret=interp
                ),
                banded_ref,
                nb, 2e-2 if bdt else 1e-5,
            )
    except Exception as e:
        _log(f"banded section skipped: {type(e).__name__}: {e}")
        results.append(dict(case="banded_stencil", ok=False,
                            error=str(e)))

    # --- materialized Vanka (flagship smoother) on the Pallas engine ----
    try:
        from gridapsolvers_tpu.fem.mesh import CartesianMesh
        from gridapsolvers_tpu.fem.stokes import (
            graddiv_velocity_block,
            velocity_vanka_smoother,
        )
        from gridapsolvers_tpu.patches.materialized import (
            MaterializedVankaSmoother,
            materialize_vanka,
        )
        from gridapsolvers_tpu.utils.pytrees import flatten_concat

        ncv = 16
        mesh = CartesianMesh((ncv, ncv), (0.0, 1.0, 0.0, 1.0))
        K = graddiv_velocity_block(mesh, 1.0, 1e3, banded=True)
        vanka = velocity_vanka_smoother(mesh, omega=0.7)
        mat = MaterializedVankaSmoother(
            topo=vanka.topo, omega=0.7, weighting=vanka.weighting,
            engine="ell" if interp else "pallas",
        )
        nfield = K.block(0, 0).shape[0]
        vst = vanka.setup(K)
        M_host = materialize_vanka(
            mat._vanka(), vst, 2 * nfield
        )  # scipy CSR reference

        t0 = time.perf_counter()
        mst = mat.setup(K)
        mst = jax.device_put(mst, dev)
        r = tuple(
            rng.normal(size=nfield).astype(np.float32) for _ in range(2)
        )
        r_dev = jax.device_put(
            tuple(jnp.asarray(v) for v in r), dev
        )

        @jax.jit
        def vanka_ck(st, r):
            z = mat.apply(st, r)
            return z, sum(jnp.sum(l[:4]) for l in z)

        z_dev, ck = vanka_ck(mst, r_dev)
        float(ck)
        z = np.concatenate([np.asarray(l) for l in z_dev])
        z_ref = M_host @ np.concatenate(r)
        err = np.abs(z - z_ref).max() / (np.abs(z_ref).max() + 1.0)
        ok = bool(err <= 1e-4)
        dt = time.perf_counter() - t0
        results.append(dict(case="materialized_vanka", ok=ok,
                            err=float(err), t_s=dt))
        _log(f"{'PASS' if ok else 'FAIL'} materialized_vanka "
             f"(rel_err {err:.2e}, {dt:.1f}s)")
    except Exception as e:
        results.append(dict(case="materialized_vanka", ok=False,
                            error=f"{type(e).__name__}: {e}"))
        _log(f"FAIL materialized_vanka: {type(e).__name__}: {e}")

    # --- traceable refreshes on real Mosaic: materialized-Vanka update
    # and composite-system kernelize refresh (the device-Newton paths) --
    try:
        K2 = graddiv_velocity_block(mesh, 2.5, 1e3, banded=True)
        t0 = time.perf_counter()
        mst2 = jax.jit(mat.update)(mst, jax.device_put(K2, dev))
        z_dev, ck = vanka_ck(mst2, r_dev)
        float(ck)
        vst2 = vanka.update(vst, K2)
        M2_host = materialize_vanka(mat._vanka(), vst2, 2 * nfield)
        z = np.concatenate([np.asarray(l) for l in z_dev])
        z_ref = M2_host @ np.concatenate(r)
        err = np.abs(z - z_ref).max() / (np.abs(z_ref).max() + 1.0)
        ok = bool(err <= 1e-4)
        dt = time.perf_counter() - t0
        results.append(dict(case="materialized_vanka_refresh", ok=ok,
                            err=float(err), t_s=dt))
        _log(f"{'PASS' if ok else 'FAIL'} materialized_vanka_refresh "
             f"(rel_err {err:.2e}, {dt:.1f}s)")
    except Exception as e:
        results.append(dict(case="materialized_vanka_refresh", ok=False,
                            error=f"{type(e).__name__}: {e}"))
        _log(f"FAIL materialized_vanka_refresh: {type(e).__name__}: {e}")

    try:
        from gridapsolvers_tpu.fem.navier_stokes import (
            navier_stokes_problem,
        )
        from gridapsolvers_tpu.ops.ell_pallas import kernelize_system
        from gridapsolvers_tpu.utils import pytrees as pt

        t0 = time.perf_counter()
        with ctx:
            kprob = navier_stokes_problem((16, 16), nu=1.0,
                                          dtype=np.float32)
            kx0 = kprob.zero_guess()
            kA = kprob.jacobian(kx0)
            kop = kernelize_system(kA, interpret=interp)
            kx1 = jax.tree_util.tree_map(lambda a: a + 0.05, kx0)
            kA1 = kprob.jacobian(kx1)
            kv = jax.tree_util.tree_map(
                jnp.ones_like, kprob.residual(kx0)
            )
        kop, kA1d, kv = jax.device_put((kop, kA1, kv), dev)

        @jax.jit
        def kern_ck(o, a, v):
            o2 = kernelize_system(a, o, interpret=interp)
            y = o2.matvec(v)
            yr = a.matvec(v)
            leaves_y = jax.tree_util.tree_leaves(y)
            leaves_r = jax.tree_util.tree_leaves(yr)
            num = sum(
                jnp.sum(jnp.abs(b - c))
                for b, c in zip(leaves_y, leaves_r)
            )
            den = sum(jnp.sum(jnp.abs(c)) for c in leaves_r)
            return num / den

        err = float(kern_ck(kop, kA1d, kv))
        ok = bool(err <= 1e-5)
        dt = time.perf_counter() - t0
        results.append(dict(case="kernelize_system_refresh", ok=ok,
                            err=err, t_s=dt))
        _log(f"{'PASS' if ok else 'FAIL'} kernelize_system_refresh "
             f"(rel_err {err:.2e}, {dt:.1f}s)")
    except Exception as e:
        results.append(dict(case="kernelize_system_refresh", ok=False,
                            error=f"{type(e).__name__}: {e}"))
        _log(f"FAIL kernelize_system_refresh: {type(e).__name__}: {e}")

    n_ok = sum(1 for r in results if r.get("ok"))
    summary = dict(
        passed=n_ok, total=len(results),
        all_ok=n_ok == len(results),
        wall_s=time.perf_counter() - t_start,
        device=str(dev),
        cases=results,
    )
    print(json.dumps(summary))
    return 0 if summary["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
