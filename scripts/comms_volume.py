"""Comms-volume instrumentation for the multi-chip path (VERDICT r03 #6).

Counts collective ops and their payload bytes in the OPTIMIZED 8-device
HLO of (a) the distributed GMG-CG flagship and (b) the distributed Stokes
FGMRES flagship — the only addressable proxy for the >=80% host->4-hosts
weak-scaling target on a single-chip rig (BASELINE.md; the reference's
analog is its PTimer-barriered scaling study,
joss_paper/scalability/src/stokes_gmg.jl:2-36,87-95).

Method: jit + lower + compile each step over an 8-device CPU mesh (the
same path dryrun_multichip validates), walk every computation in the HLO
module text (while-loop bodies are separate computations, so per-outer-
iteration costs are attributed by computation), and sum output-shape
bytes of all-reduce / all-gather / reduce-scatter / collective-permute.

Outputs COMMS_r{N}.json at the repo root and a human-readable table to
stdout; DESIGN.md records the derived host->4-hosts efficiency estimate.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/repo:/root/.axon_site python scripts/comms_volume.py
"""
from __future__ import annotations

import json
import os
import re
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}
_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)\[([\d,]*)\]")
_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def _shape_bytes(text: str) -> int:
    """Sum bytes over every shape literal in `text` (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def analyze_hlo(hlo: str):
    """Per-computation collective counts/bytes/payload-lists from
    optimized HLO text. Values are [count, bytes, [payload, ...]]."""
    comps = {}
    cur = None
    for line in hlo.splitlines():
        stripped = line.strip()
        # computation headers look like: `%name (param...) -> ... {`
        # (ENTRY computations start with `ENTRY`)
        if stripped.endswith("{") and ("(" in stripped):
            head = stripped.split("(")[0].replace("ENTRY", "").strip()
            cur = head.lstrip("%").strip()
            comps.setdefault(cur, {})
            continue
        if cur is None or "=" not in stripped:
            continue
        rhs = stripped.split("=", 1)[1]
        for op in _COLLECTIVES:
            # match the op name as the instruction (shape then `op(`)
            if re.search(rf"\b{op}(?:-start|-done)?\(", rhs):
                if op == "all-reduce" and "all-reduce-done" in rhs:
                    continue  # bytes counted at -start
                # output shape sits between `=` and the op name (the LHS
                # variable NAME usually contains the op name too — split
                # the RHS, not the whole line)
                b = _shape_bytes(rhs.split(op)[0])
                d = comps[cur].setdefault(op, [0, 0, []])
                d[0] += 1
                d[1] += b
                d[2].append(b)
                break
    return {k: v for k, v in comps.items() if v}


# alpha-beta model parameters: per-collective launch+sync latency and
# link bandwidth. ICI alpha ~1 us (on-chip fabric, v5e); DCN alpha
# ~10-25 us (NIC + host stack). VERDICT r04 #2: the old bytes/bw-only
# model was latency-blind in a ~4 KB-average-payload regime.
ALPHA_BETA = {
    "ici_180GBs": {"alpha_s": 1e-6, "beta_Bps": 180e9},
    "dcn_25GBs": {"alpha_s": 15e-6, "beta_Bps": 25e9},
}


def _summarize(tag, compiled):
    hlo = compiled.as_text()
    comps = analyze_hlo(hlo)
    total_n = sum(v[0] for c in comps.values() for v in c.values())
    total_b = sum(v[1] for c in comps.values() for v in c.values())
    # while-loop BODY computations execute once per iteration of their
    # loop; everything else executes once per call. Report both raw and
    # the body-computation subtotal (the per-iteration recurring cost).
    body = {
        k: v for k, v in comps.items()
        if "while" in k or "body" in k or "region" in k
    }
    body_n = sum(v[0] for c in body.values() for v in c.values())
    body_b = sum(v[1] for c in body.values() for v in c.values())
    body_payloads = sorted(
        p for c in body.values() for v in c.values() for p in v[2]
    )
    body_by_op = {}
    for c in body.values():
        for op, (n, b, _s) in c.items():
            agg = body_by_op.setdefault(op, [0, 0])
            agg[0] += n
            agg[1] += b
    by_op = {}
    for c in comps.values():
        for op, (n, b, _sizes) in c.items():
            agg = by_op.setdefault(op, [0, 0])
            agg[0] += n
            agg[1] += b
    # async overlap evidence: start/done pairs with instructions between
    n_async = len(re.findall(r"-start(?:\.\d+)? = ", hlo))
    print(f"\n== {tag} ==")
    print(f" total collectives (static): {total_n}  bytes: {total_b:,}")
    print(f" inside loop bodies (recur per iter): {body_n}  "
          f"bytes: {body_b:,}")
    if body_payloads:
        import statistics

        print(f"   payloads: p50={statistics.median(body_payloads):,.0f}B"
              f" max={body_payloads[-1]:,}B")
    for op, (n, b) in sorted(by_op.items()):
        print(f"   {op:20s} n={n:4d}  bytes={b:,}")
    return {
        "total_collectives": total_n,
        "total_bytes": total_b,
        "loop_body_collectives": body_n,
        "loop_body_bytes": body_b,
        "loop_body_payloads": body_payloads,
        "loop_body_by_op": {
            k: {"n": v[0], "bytes": v[1]} for k, v in body_by_op.items()
        },
        "async_start_instructions": n_async,
        "by_op": {k: {"n": v[0], "bytes": v[1]} for k, v in by_op.items()},
        "n_computations_with_collectives": len(comps),
    }


def main():
    from gridapsolvers_tpu.fem import poisson_problem
    from gridapsolvers_tpu.linear import CGSolver, ChebyshevSmoother
    from gridapsolvers_tpu.multilevel import cartesian_hierarchy
    from gridapsolvers_tpu.parallel import (
        device_mesh,
        distributed_poisson_gmg,
        shard_grid_vector,
    )

    out = {"n_devices": 8}
    dtype = np.float32
    ncells = (32, 32, 32)
    mesh = device_mesh(8)
    prob = poisson_problem(ncells, dtype=dtype)
    hierarchy = cartesian_hierarchy(ncells, 3)
    # A/B: explicit shard_map halo exchange (parallel/halo.py) vs the
    # auto-partitioned per-band-shift lowering (VERDICT r04 #2c)
    for halo, tag in ((True, "gmg_cg"), (False, "gmg_cg_autopart")):
        gmg, Ad = distributed_poisson_gmg(
            hierarchy, mesh, smoother=ChebyshevSmoother(degree=3),
            dtype=jnp.float32, halo_exchange=halo,
        )
        solver = CGSolver(Pl=gmg, rtol=1e-5, maxiter=20)
        bd = shard_grid_vector(
            jnp.asarray(np.asarray(prob.b, dtype=dtype)), mesh,
            prob.A.grid_shape, target_shape=Ad.grid_shape,
        )
        state = solver.setup(Ad)
        step = jax.jit(lambda st, A, b: solver.solve(st, b))
        compiled = step.lower(state, Ad, bd).compile()
        out[tag] = _summarize(
            f"GMG-CG 32^3, 8-way row-sharded "
            f"({'halo-exchange' if halo else 'auto-partitioned'})",
            compiled,
        )
        out[tag]["dofs"] = int(np.asarray(prob.b).size)
    out["halo_collective_reduction"] = (
        out["gmg_cg_autopart"]["loop_body_collectives"]
        / max(out["gmg_cg"]["loop_body_collectives"], 1)
    )

    # the distributed Stokes flagship (same build as dryrun_multichip)
    from gridapsolvers_tpu.fem.dist_stokes import (
        distributed_stokes_solver,
        distributed_stokes_system,
    )

    sprob, A_dist, b_dist, pv, pq = distributed_stokes_system(
        (32, 32), mesh, dtype=dtype
    )
    ssolver, _ = distributed_stokes_solver(
        (32, 32), 2, mesh, rtol=1e-6, maxiter=40, dtype=dtype
    )
    sstate = ssolver.setup(A_dist)
    sstep = jax.jit(lambda st, b: ssolver.solve(st, b))
    scompiled = sstep.lower(sstate, b_dist).compile()
    out["stokes"] = _summarize("Stokes FGMRES 32^2, 8-way sharded",
                               scompiled)

    # host->4-hosts efficiency model: per-CG-iteration loop-body comm
    # bytes ride DCN between hosts (worst case: every collective crosses
    # the host boundary once). eff = t_compute / (t_compute + t_comm).
    # t_compute from the measured single-chip per-iteration time
    # (BENCH gmg_cg_time_s / iters); DCN ~ 25 GB/s per host pair,
    # ICI ~ 180 GB/s per chip (v5e 4x 45GB/s links).
    # measured per-iter compute budget from the newest bench artifact
    # (BENCH_FULL_r*.json full dicts preferred; skip null `parsed`)
    t_iter = None
    root_ = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for pat, get in (
        (r"BENCH_FULL_r\d+\.json$", lambda d: d),
        (r"BENCH_r\d+\.json$", lambda d: d.get("parsed")),
    ):
        for cand in sorted(
            (f for f in os.listdir(root_) if re.match(pat, f)),
            reverse=True,
        ):
            try:
                with open(os.path.join(root_, cand)) as fh:
                    parsed = get(json.load(fh)) or {}
                t_iter = parsed["gmg_cg_time_s"] / max(
                    parsed["gmg_cg_iters"], 1
                )
                break
            except Exception:
                t_iter = None
        if t_iter is not None:
            break
    # alpha-beta model (VERDICT r04 #2a): t_comm = sum_i (alpha +
    # payload_i / beta) over the loop-body collectives — the latency
    # term dominates in this ~KB-payload regime and the old bytes/bw
    # model hid it. Serialization worst case: no overlap credit.
    payloads = out["gmg_cg"]["loop_body_payloads"]
    n_coll = out["gmg_cg"]["loop_body_collectives"]
    # overlap credit: collective-permutes issued by the halo matvec /
    # CA smoother are bracketed by data-INDEPENDENT interior compute
    # (parallel/halo.py structures the dataflow that way), so a
    # latency-hiding scheduler can absorb their alpha under the local
    # SpMV. Conservative twin counts every alpha.
    body_permutes = (
        out["gmg_cg"]["loop_body_by_op"]
        .get("collective-permute", {"n": 0})["n"]
    )
    for bw_name, ab in ALPHA_BETA.items():
        t_comm = sum(
            ab["alpha_s"] + p / ab["beta_Bps"] for p in payloads
        )
        t_comm_ov = t_comm - body_permutes * ab["alpha_s"]
        eff = t_iter / (t_iter + t_comm) if t_iter else None
        eff_ov = t_iter / (t_iter + t_comm_ov) if t_iter else None
        out.setdefault("scaling_model", {})[bw_name] = {
            "alpha_s": ab["alpha_s"],
            "beta_Bps": ab["beta_Bps"],
            "n_collectives_per_iter": n_coll,
            "t_comm_s": t_comm,
            "t_comm_overlapped_s": t_comm_ov,
            "t_latency_share": (
                n_coll * ab["alpha_s"] / t_comm if t_comm else None
            ),
            "t_iter_measured_s": t_iter,
            "predicted_weak_scaling_eff": eff,
            "predicted_weak_scaling_eff_overlapped": eff_ov,
        }
        if eff is not None:
            print(f" predicted weak-scaling eff over {bw_name}: "
                  f"{eff*100:.1f}% no-overlap / {eff_ov*100:.1f}% with "
                  f"permute-alpha overlapped  (t_comm {t_comm*1e6:.1f} us"
                  f" = {n_coll}x{ab['alpha_s']*1e6:.0f}us alpha + "
                  f"payload/beta vs t_iter {t_iter*1e3:.3f} ms)")

    # same alpha-beta model for the Stokes flagship (per-iteration
    # compute budget from the bench's stokes_fgmres_time_per_iter)
    try:
        s_titer = parsed["stokes_fgmres_time_s"] / max(
            parsed["stokes_fgmres_iters"], 1
        )
    except Exception:
        s_titer = None
    s_payloads = out["stokes"]["loop_body_payloads"]
    s_ncoll = out["stokes"]["loop_body_collectives"]
    for bw_name, ab in ALPHA_BETA.items():
        t_comm = sum(
            ab["alpha_s"] + p / ab["beta_Bps"] for p in s_payloads
        )
        eff = s_titer / (s_titer + t_comm) if s_titer else None
        out.setdefault("stokes_scaling_model", {})[bw_name] = {
            "n_collectives_per_iter": s_ncoll,
            "t_comm_s": t_comm,
            "t_iter_measured_s": s_titer,
            "predicted_weak_scaling_eff": eff,
        }
        if eff is not None:
            print(f" stokes weak-scaling eff over {bw_name}: "
                  f"{eff*100:.1f}%  (t_comm {t_comm*1e6:.1f} us vs "
                  f"t_iter {s_titer*1e3:.3f} ms)")

    # artifact round number = next BENCH round (count existing artifacts)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(m.group(1))
        for f in os.listdir(root)
        for m in [re.match(r"BENCH_r(\d+)\.json$", f)]
        if m
    ]
    n = (max(rounds) + 1) if rounds else 1
    dest = os.path.join(root, f"COMMS_r{n:02d}.json")
    # payload lists are long; histogram them for the artifact
    for k in ("gmg_cg", "gmg_cg_autopart", "stokes"):
        if k in out and "loop_body_payloads" in out[k]:
            ps = out[k].pop("loop_body_payloads")
            if ps:
                out[k]["payload_p50"] = float(np.median(ps))
                out[k]["payload_p90"] = float(np.percentile(ps, 90))
                out[k]["payload_max"] = int(max(ps))
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\nwrote {dest}")


if __name__ == "__main__":
    main()
