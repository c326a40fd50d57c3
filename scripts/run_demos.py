"""Run the full demo/benchmark suite sequentially and write
outputs/demo_results.json:

  1. cavity hybrid, reference config (ML budget 200) - the reference's
     marquee experiment (`PyCFD_ML_accelerated.py:1355-1501`)
  2. cavity hybrid, strict (ML and NORMAL both run to plateau ->
     converged centerlines)
  3. BFS hybrid (north star, BASELINE.json)
  4. BFS at the reference's own marquee budgets (ML 30000 vs NORMAL
     35000, `outputs/01-12-2025-07-10-57 (BFS)` artifact names) with the
     fused kernel's reference inner-loop semantics - this measures the
     ACCEPTANCE BOUND for the north star's centerline agreement
     (VERDICT r1 next-step #9). The reference itself cannot execute here
     (no numba in the image), so the bound is measured with our
     golden-validated solver (tests/test_solver_golden.py pins it to the
     reference's own BFS centerline artifact at ~1e-6) using the same SR
     model both runs share.

Each run nudges Re by a per-run epsilon large enough to change nu in f32
(nu is a traced input), so identical-input result caching in the remote
runtime can never fake a timing.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent executable cache: reruns of any demo config skip XLA
# compilation entirely (phase timings already exclude compile via
# CFDSolver.precompile; this removes it from total wall-clock too)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_CPU = 84347 / 3567.5  # 23.64 outer-iters/sec (BASELINE.md)
STATS = "artifacts/standardization_stats_10to400_swish_tpu_multiBC.txt"
MODEL = "artifacts/vanilla_superres_10to400_swish_tpu_multiBC.msgpack"
# BFS-specific SR pair (scripts/train_bfs_sr.py) - the reference reused
# its cavity-trained model for BFS via aspect-ratio correction, which
# saves only ~10-15% of the fine iterations; a BFS-trained model makes
# the warm start actually bite
BFS_STATS = "artifacts/standardization_stats_10to400_swish_tpu_bfs.txt"
BFS_MODEL = "artifacts/vanilla_superres_10to400_swish_tpu_bfs.msgpack"
# 20->400 BFS pair (LR_DIM=20 in scripts/train_bfs_sr.py): 4x richer SR
# input, slightly better held-out eval (avg MAE 0.000894 vs 0.000920) -
# probed as a north-star variant (VERDICT r4 #5; the reference
# parameterizes lr_dim the same way, bfs_ml_accelerated.py:1384-1408)
BFS_STATS_20 = "artifacts/standardization_stats_20to400_swish_tpu_bfs.txt"
BFS_MODEL_20 = "artifacts/vanilla_superres_20to400_swish_tpu_bfs.msgpack"


def nudge(re):
    # ~0.002% Reynolds perturbation: changes nu in f32, physically nil
    return re * (1.0 + (time.time() % 1.0) * 2e-5)


def run(name, coarse_overrides=None, stats=STATS, model=MODEL, **kw):
    from sr_for_cfd_tpu.workflow.hybrid import run_hybrid_experiment

    # the tiny coarse grid is cheapest on the fused point-iteration
    # kernel (multigrid's per-level overhead only pays off on fine grids)
    # and runs its whole budget as ONE dispatch with device-side plateau
    co = {"pressure_solver": "sweeps", "fused_step": True,
          "pressure_sor": 1.9, "chunk_size": 100000,
          # 10x10 floor is ~8 sweeps; at f64 convergence a cap of 8 shifts
          # the field by 7e-12, so 16 is pure margin. The old 128 cap made
          # per-iteration cost a LOTTERY: the f32 pressure floor sits
          # knife-edge at the 1e-6 inner tolerance, and nu draws that land
          # on the stall/cap exit path ran 20x slower (0.48 vs 0.022
          # ms/iter between two recorded demo runs of this same config).
          "inner_max_iter": 16,
          # RRE steady-state extrapolation (ops/extrapolate.py): cuts the
          # pseudo-time march ~2x (measured 68k -> 38k at every=1000;
          # a 9-variant cadence/depth sweep found every=2000/depth=6
          # exits at 32k - wider windows resolve the slow modes better -
          # while 500/250 cadences are WORSE (50k/48k: snapshots too
          # correlated), fields all within 4e-4 of the same fixed point).
          # Safe for the cavity SR input distribution: the 10x10 cavity
          # training fields converged BY CRITERIA (not capped), so the
          # extrapolated fixed point IS the training distribution.
          "rre_every": 2000,
          # the coarse grid never converges by criteria (the reference's
          # 10x10 hit its 100k cap, BASELINE.md) - stop when the FIELDS
          # are stationary (drift < 3e-5 per 2000 iters, i.e. f32
          # working precision): the resulting fields match the
          # cap-trained SR input distribution, without running 90k
          # no-op iterations. Loose fine-phase criteria must not leak in.
          "cauchy_tol": 3e-5, "cauchy_check_every": 2000,
          "convergence_hold": 1,
          # 500 outer iterations per kernel LAUNCH: the 10x10 step's
          # device work is tiny next to the ~16 us per-launch overhead
          # that dominated the coarse phase (0.0164 ms/iter recorded)
          "steps_per_kernel": 500}
    co.update(coarse_overrides or {})
    if not co.get("fused_step", True):
        co.pop("steps_per_kernel", None)  # multi-step is fused-only
    t0 = time.time()
    # >= 3 reps per experiment, MEDIAN-quoted (VERDICT r2 #5): the remote
    # relay intermittently stalls a dispatch in ~60s-quantum retries
    # (measured 48.1s wall for a coarse solve whose device time is 0.84s,
    # immediately reproducible at 0.9s) - a median over >= 3 reps cannot
    # be moved by one stall, and the per-phase best rates double as a
    # device-time cross-check (below). Each rep re-nudges Re, so the
    # relay's (executable, inputs) result cache cannot fake the rerun;
    # iterations/fields are physics-identical across reps to ~1e-5.
    base_re = kw.pop("Re")
    n_reps = int(os.environ.get("DEMO_REPS", 3))
    reps = []
    for _ in range(n_reps):
        r = run_hybrid_experiment(
            Re=nudge(base_re),
            stats_file=stats if os.path.exists(stats) else None,
            model_file=model if os.path.exists(model) else None,
            verbose=False, dtype="float32",
            coarse_overrides=co,
            **kw,
        )
        reps.append(r)
    hyb_times = [r["coarse_time"] + r["ml_time"] for r in reps]
    # the median REP (an actual run, odd n_reps), so every quoted phase
    # number and centerline stat comes from one coherent run
    hyb = reps[hyb_times.index(statistics.median_low(hyb_times))]
    nrm_times = [r["normal_time"] for r in reps]
    hybrid = statistics.median(hyb_times)
    normal = statistics.median(nrm_times)
    ref_s = hyb["normal_iterations"] / REF_CPU

    # device-time cross-check: per-phase best ms/iter across the (warm)
    # reps x the median rep's iteration counts. A relay stall inflates a
    # phase's wall time but not its best rate; if the median wall exceeds
    # this estimate by >1.5x, a stall leaked into the median itself and
    # the number should not be quoted as device performance.
    best_rate = {
        ph: min(r[f"{ph}_time"] / max(r[f"{ph}_iterations"], 1)
                for r in reps)
        for ph in ("coarse", "ml", "normal")
    }
    dev_hybrid = (best_rate["coarse"] * hyb["coarse_iterations"]
                  + best_rate["ml"] * hyb["ml_iterations"])
    dev_normal = best_rate["normal"] * hyb["normal_iterations"]

    out = {
        "hybrid_wall_s": round(hybrid, 1),
        "hybrid_wall_s_min": round(min(hyb_times), 1),
        "normal_wall_s": round(normal, 1),
        "normal_wall_s_min": round(min(nrm_times), 1),
        "coarse_wall_s": round(hyb["coarse_time"], 1),
        "ml_wall_s": round(hyb["ml_time"], 1),
        "device_s_est": {"hybrid": round(dev_hybrid, 1),
                         "normal": round(dev_normal, 1)},
        "stall_in_median": bool(hybrid > 1.5 * dev_hybrid + 1.0
                                or normal > 1.5 * dev_normal + 1.0),
        "iterations": {
            "coarse": hyb["coarse_iterations"],
            "ml": hyb["ml_iterations"],
            "normal": hyb["normal_iterations"],
        },
        "ms_per_iteration": hyb.get("ms_per_iteration"),
        "wall_s_all_reps": {
            "hybrid": [round(t, 1) for t in hyb_times],
            "normal": [round(t, 1) for t in nrm_times],
        },
        "speedup_vs_own_cold": round(normal / hybrid, 2),
        "ref_cpu_normal_est_s": round(ref_s, 1),
        "speedup_vs_ref_cpu": round(ref_s / hybrid, 1),
        "centerline_diff_U_max": hyb["centerline_diff"]["U"]["max"],
        "centerline_diff_V_max": hyb["centerline_diff"]["V"]["max"],
        "total_s": round(time.time() - t0, 1),
    }
    print(f"{name}: {json.dumps(out)}", flush=True)
    return out


def main():
    os.makedirs("outputs", exist_ok=True)
    # chunk_size MUST be a multiple of (and >= ) cauchy_check_every or the
    # device-side Cauchy check can never complete a full window (the
    # chunk-local full-window guard) and the plateau backstop rules
    # instead, padding BOTH fine runs with its detection lag - the r1/r2.0
    # recordings show the warm start reaching steady state in ~5k fine
    # iterations yet "running" 32k-72k for exactly this reason.
    # fused_step + multigrid = the flagship whole-step kernel with the
    # in-kernel V-cycle (bench fused_mg mode, ~0.26 ms/step at 400^2);
    # 10 outer steps per launch shaves the ~13 us/step launch overhead
    # (bit-exact; bench fused_mg_k10, +5%) on BOTH fine runs - detector
    # cadences (>= 2000) are far above K so exits are unaffected
    fine = dict(chunk_size=10000, pressure_solver="multigrid",
                fused_step=True, plateau_patience=5, steps_per_kernel=10)
    results = {}
    # reduced-rank extrapolation on BOTH BFS fine phases (warm AND cold -
    # honest economics: both sides of the speedup ratio run the best
    # solver, VERDICT r4 #3). Tuned by scripts/rre_fine_probe.py
    # (docs/rre_fine_probe.json): every=2000/depth=6 with the first
    # snapshot delayed past the strongly nonlinear transient
    # (min_count=20000) cuts the BFS cold fine march 90k -> 70k
    # iterations at the SAME Cauchy stop, centerline dU 0.0019; the
    # r3-recorded negative result (every=1000, no delay: jumps re-excite
    # the slow transient) reproduces without the delay. On the CAVITY
    # fine flows the probe measured no win (35k -> 35-40k), so the
    # cavity demos stay extrapolation-free. chunk 20000 holds the
    # 2000*(6+1)=14000-iteration cycle and remains a multiple of the
    # 5000-iteration Cauchy cadence.
    BFS_FINE_RRE = dict(rre_every=2000, rre_depth=6, rre_min_count=20000,
                        chunk_size=20000)
    results["cavity_reference_config"] = run(
        "cavity_reference_config",
        Re=1000, lr_dim=10, hr_dim=400, dt=1e-3, scheme="QUICK",
        case="double_lid", max_iterations_coarse=100000,
        max_iterations_ml=200, max_iterations_normal=100000,
        output_dir="outputs/demo_cavity_ref", **fine,
    )
    # strict: BOTH fine runs stop on the same field-Cauchy criterion
    # (max velocity change < 3e-3 over a 5000-iteration window - the
    # "converged centerline" test made executable; rms criteria flap on
    # this flow's oscillating f32 residuals), plateau as backstop
    results["cavity_strict_convergence"] = run(
        "cavity_strict_convergence",
        Re=1000, lr_dim=10, hr_dim=400, dt=1e-3, scheme="QUICK",
        case="double_lid", max_iterations_coarse=30000,
        max_iterations_ml=100000, max_iterations_normal=100000,
        cauchy_tol=3e-3, cauchy_check_every=5000,
        output_dir="outputs/demo_cavity_strict", **fine,
    )
    # BFS-trained model: fed raw (un-resampled, training-stats-normalized)
    # fields, so the cavity-model crutches (aspect correction, adaptive
    # normalization) are off. Both fine runs stop on the same field-Cauchy
    # criterion; plateau as backstop.
    have_bfs_model = os.path.exists(BFS_MODEL)
    results["bfs_north_star"] = run(
        "bfs_north_star",
        Re=400, lr_dim=10, hr_dim=400, dt=2e-3, scheme="UPWIND",
        case="bfs", max_iterations_coarse=30000,
        max_iterations_ml=100000, max_iterations_normal=100000,
        stats=BFS_STATS if have_bfs_model else STATS,
        model=BFS_MODEL if have_bfs_model else MODEL,
        use_aspect_ratio_correction=not have_bfs_model,
        use_adaptive_normalization=not have_bfs_model,
        blend_factor=0.3, output_dir="outputs/demo_bfs",
        # stopping tolerance at the flow's own asymptotic drift scale:
        # the BFS 400^2 approaches steady state with a ~70k-iteration
        # e-folding (measured drift/5k: 0.125 @ 35k - the REFERENCE'S own
        # marquee budget stops there, at 12% drift - 0.011 @ 95k, still
        # decaying ~7%/window at the 100k cap). 1.2e-2 stops the cold run
        # at ~95k, 10x stricter than the reference's effective stopping
        # point; 5e-3 is unreachable within any 100k budget. (RRE is NOT
        # used on this flow: extrapolation jumps re-excite its slow
        # transient instead of cancelling it - measured drift wandering
        # 0.001<->0.06 for 150k iterations with rre_every=1000.)
        cauchy_tol=1.2e-2, cauchy_check_every=5000,
        # mirror the training data's coarse solver settings exactly
        # (scripts/train_bfs_sr.py): fused kernel, inner cap 64, sor 1.5,
        # no extrapolation (the BFS 10x10 never converges - its training
        # inputs are 30k-budget fields ~5e-2 from the asymptote, so an
        # RRE-converged input would be OUT of distribution). The fused
        # capped fields match the jnp path to 1e-5 (field scale 1.5).
        coarse_overrides={"pressure_sor": 1.5, "inner_max_iter": 64,
                          "rre_every": 0, "cauchy_tol": 0.0},
        **dict(fine, **BFS_FINE_RRE),
    )
    # 20->400 variant of the north star (VERDICT r4 #5): the 20^2 coarse
    # solve costs ~nothing next to the fine phases; a 4x more informative
    # SR input should cut the warm fine march. Same fine settings and
    # stopping criteria as bfs_north_star so the comparison is apples to
    # apples; coarse settings mirror the 20->400 pair's training data
    # generation (train_bfs_sr.py LR_DIM=20: sor 1.5, inner cap 64, no
    # extrapolation, 30k budget).
    if os.path.exists(BFS_MODEL_20):
        results["bfs_north_star_20to400"] = run(
            "bfs_north_star_20to400",
            Re=400, lr_dim=20, hr_dim=400, dt=2e-3, scheme="UPWIND",
            case="bfs", max_iterations_coarse=30000,
            max_iterations_ml=100000, max_iterations_normal=100000,
            stats=BFS_STATS_20, model=BFS_MODEL_20,
            use_aspect_ratio_correction=False,
            use_adaptive_normalization=False,
            blend_factor=0.3, output_dir="outputs/demo_bfs_20",
            cauchy_tol=1.2e-2, cauchy_check_every=5000,
            coarse_overrides={"pressure_sor": 1.5, "inner_max_iter": 64,
                              "rre_every": 0, "cauchy_tol": 0.0},
            **dict(fine, **BFS_FINE_RRE),
        )

    # acceptance bound: the reference's own marquee BFS budgets (ML 30000
    # vs NORMAL 35000) under reference inner-loop semantics (fused kernel,
    # capped point-iteration pressure); no plateau - budgets rule, exactly
    # as in the reference's experiment
    results["bfs_reference_semantics_bound"] = run(
        "bfs_reference_semantics_bound",
        Re=400, lr_dim=10, hr_dim=400, dt=2e-3, scheme="UPWIND",
        case="bfs", max_iterations_coarse=100000,
        max_iterations_ml=30000, max_iterations_normal=35000,
        use_aspect_ratio_correction=True, use_adaptive_normalization=True,
        blend_factor=0.3, output_dir="outputs/demo_bfs_refsem",
        chunk_size=5000, pressure_solver="sweeps", fused_step=True,
        pressure_sor=1.0,
        # no extrapolation anywhere in this run: it reproduces the
        # reference's own experiment shape to measure the acceptance bound
        coarse_overrides={"rre_every": 0},
    )
    bound = results["bfs_reference_semantics_bound"]["centerline_diff_U_max"]
    ours = results["bfs_north_star"]["centerline_diff_U_max"]
    results["bfs_centerline_acceptance"] = {
        "north_star_U_max": ours,
        "reference_semantics_bound_U_max": bound,
        "within_bound": bool(ours <= bound),
    }
    print(f"BFS acceptance: ours={ours:.4g} bound={bound:.4g} "
          f"ok={ours <= bound}", flush=True)
    with open("outputs/demo_results.json", "w") as f:
        json.dump(results, f, indent=2)
    print("ALL_DEMOS_DONE", flush=True)


if __name__ == "__main__":
    main()
