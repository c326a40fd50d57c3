"""Probe: does reduced-rank extrapolation pay on the 400^2 FINE phases?

VERDICT r4 #3: the coarse phase's RRE (1.8x fewer iterations) was never
attempted where the demo wall-clock actually lives - the cold fine run
(23.1 of 25.6 s in docs/demo_results_r4.json). STATUS recorded a NEGATIVE
result for rre_every=1000 on the BFS fine flow ("jumps re-excite its slow
transient"); this probe retunes for the 400^2 march - wider cadences
(the coarse sweep found wider windows resolve slow modes better) and a
delayed first snapshot (rre_min_count past the strongly nonlinear
transient) - on BOTH demo flows' cold fine configs, and records every
variant (wins AND losses) to docs/rre_fine_probe.json.

Each variant runs the exact north-star / strict-demo cold-fine solver
config (fused whole-step + in-kernel V-cycle, field-Cauchy stopping) with
a nudged Re so the relay result cache cannot fake a rerun. The quantities
that matter:
  * iterations to the SAME Cauchy criterion (the honest economics:
    fewer iterations at equal stopping = real win),
  * wall seconds,
  * centerline max|dU| vs this probe's own rre=0 baseline field (a jump
    must not move the answer - same acceptance logic as the demos' 0.0457
    reference-semantics bound).

Run on the real TPU from the repo root:
    python scripts/rre_fine_probe.py [--case bfs|cavity|both]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def nudge(re, salt):
    return re * (1.0 + salt * 2e-5)


# (label, overrides) - chunk_size must hold a full RRE cycle
# (rre_every*(rre_depth+1)) AND be a multiple of cauchy_check_every=5000
VARIANTS = [
    ("rre0_baseline", {}),
    ("rre2000_d6_min20k", {"rre_every": 2000, "rre_depth": 6,
                           "rre_min_count": 20000, "chunk_size": 20000}),
    ("rre5000_d3_min20k", {"rre_every": 5000, "rre_depth": 3,
                           "rre_min_count": 20000, "chunk_size": 20000}),
    ("rre2000_d9_min30k", {"rre_every": 2000, "rre_depth": 9,
                           "rre_min_count": 30000, "chunk_size": 20000}),
]

CASES = {
    # the north-star cold fine phase (scripts/run_demos.py bfs_north_star)
    "bfs": dict(case="bfs", Re=400.0, dt=2e-3, scheme="UPWIND",
                cauchy_tol=1.2e-2, cauchy_check_every=5000),
    # the strict-convergence cavity demo's cold fine phase
    "cavity": dict(case="double_lid", Re=1000.0, dt=1e-3, scheme="QUICK",
                   cauchy_tol=3e-3, cauchy_check_every=5000),
}

FINE = dict(nx=400, ny=400, max_iterations=100000, chunk_size=10000,
            pressure_solver="multigrid", fused_step=True,
            plateau_patience=5, steps_per_kernel=10, dtype="float32")


def centerline_u(solver):
    # mid-x vertical centerline of u, matching workflow.hybrid's
    # extract_centerlines axis convention closely enough for a drift gate
    var = solver.Var
    u = var[0]
    return np.asarray(u[u.shape[0] // 2, :])


def run_case(case_key, out):
    from sr_for_cfd_tpu.workflow.hybrid import run_normal_simulation

    cfg = CASES[case_key]
    rows = []
    base_cl = None
    for i, (label, ov) in enumerate(VARIANTS):
        kw = dict(FINE)
        kw.update({k: v for k, v in cfg.items() if k != "case" and k != "Re"})
        kw.update(ov)
        t0 = time.time()
        try:
            solver, iters, secs = run_normal_simulation(
                nudge(cfg["Re"], i + 1), kw.pop("nx"), kw.pop("ny"),
                case=cfg["case"], output_name=f"outputs/rre_probe_{case_key}_{label}",
                verbose=False, save_results=False, **kw,
            )
        except Exception as e:  # record divergence/config errors honestly
            rows.append({"variant": label, "error": repr(e)})
            print(f"{case_key}/{label}: ERROR {e}", flush=True)
            continue
        cl = centerline_u(solver)
        if base_cl is None:
            base_cl = cl
            dmax = 0.0
        else:
            dmax = float(np.max(np.abs(cl - base_cl)))
        row = {
            "variant": label,
            "iterations": int(iters),
            "wall_s": round(secs, 2),
            "ms_per_iter": round(1e3 * secs / max(iters, 1), 4),
            "centerline_dU_max_vs_rre0": round(dmax, 5),
            "total_s_incl_compile": round(time.time() - t0, 1),
        }
        rows.append(row)
        print(f"{case_key}/{label}: {json.dumps(row)}", flush=True)
    out[case_key] = rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", choices=["bfs", "cavity", "both"],
                    default="both")
    args = ap.parse_args()
    out = {}
    for key in (["bfs", "cavity"] if args.case == "both" else [args.case]):
        run_case(key, out)
    path = os.path.join("docs", "rre_fine_probe.json")
    existing = json.load(open(path)) if os.path.exists(path) else {}
    existing.update(out)
    json.dump(existing, open(path, "w"), indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
