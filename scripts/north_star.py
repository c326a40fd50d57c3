"""North-star benchmark (BASELINE.json): hybrid fine-grid BFS Re=400 to a
converged centerline, wall-clock vs the CPU reference.

Runs the full hybrid pipeline on TPU - coarse 10x10 BFS solve -> 10->400
super-resolution (trained model if available, bicubic fallback otherwise,
with the reference's aspect-ratio correction + adaptive normalization) ->
warm-started 400x400 fine solve - plus the cold-start baseline, and reports:

  * wall-clock of each stage
  * centerline agreement between hybrid and cold-start solutions
  * speedup vs (a) our own cold start and (b) the reference CPU throughput
    (23.64 outer-iters/sec from its published cavity 400x400 run - the only
    400x400 wall-clock the reference publishes; see BASELINE.md)

Usage: python scripts/north_star.py [--ml-iterations N] [--normal-iterations N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_CPU_ITERS_PER_SEC = 84347 / 3567.5  # 23.64 (BASELINE.md)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ml-iterations", type=int, default=100000)
    ap.add_argument("--normal-iterations", type=int, default=100000)
    ap.add_argument("--coarse-iterations", type=int, default=30000)
    ap.add_argument("--stats-file",
                    default="artifacts/standardization_stats_10to400_swish_tpu_bfs.txt")
    ap.add_argument("--model-file",
                    default="artifacts/vanilla_superres_10to400_swish_tpu_bfs.msgpack")
    ap.add_argument("--sor", type=float, default=1.9)
    ap.add_argument("--out", default="outputs/north_star")
    args = ap.parse_args()

    from sr_for_cfd_tpu.workflow.hybrid import run_hybrid_experiment

    stats_file = args.stats_file if os.path.exists(args.stats_file) else None
    model_file = args.model_file if os.path.exists(args.model_file) else None
    if stats_file is None:
        print("NOTE: no trained stats/model found - reference stats + "
              "bicubic fallback", flush=True)
        stats_file = (
            "/root/reference/standardization_stats_10to400_swish_trained_"
            "upto_700_multiBC.txt"
        )

    t0 = time.time()
    results = run_hybrid_experiment(
        # nudge Re by a per-run epsilon: nu is a traced input, so this
        # defeats the relay's (executable, inputs) result cache without
        # recompiling - essential for honest wall-clock numbers
        Re=400 + (time.time() % 1) * 1e-6, lr_dim=10, hr_dim=400, dt=2e-3, scheme="UPWIND", case="bfs",
        max_iterations_coarse=args.coarse_iterations,
        max_iterations_ml=args.ml_iterations,
        max_iterations_normal=args.normal_iterations,
        stats_file=stats_file, model_file=model_file,
        # with the BFS-trained model the cavity-model crutches (aspect
        # correction + adaptive normalization) are off; they remain
        # available for the reference's cavity-model setup
        use_aspect_ratio_correction="bfs" not in (model_file or ""),
        use_adaptive_normalization="bfs" not in (model_file or ""),
        blend_factor=0.3,
        output_dir=args.out, verbose=True,
        # chunk_size must be >= cauchy_check_every or the device-side
        # Cauchy check never completes a full window (chunk-local
        # full-window guard) and the plateau backstop pads both runs
        dtype="float32", chunk_size=10000, pressure_solver="multigrid",
        plateau_patience=5,
        # both fine runs stop on the same field-Cauchy criterion (the
        # "converged centerline" test made executable; see run_demos.py)
        cauchy_tol=5e-3, cauchy_check_every=5000,
        coarse_overrides={"chunk_size": 100000, "fused_step": False,
                          "pressure_solver": "sweeps", "pressure_sor": 1.5,
                          "cauchy_tol": 0.0},
    )
    total = time.time() - t0

    # reference CPU wall-clock estimate for the same iteration counts
    ref_normal_s = results["normal_iterations"] / REFERENCE_CPU_ITERS_PER_SEC
    ref_hybrid_equiv_s = (
        results["coarse_iterations"] / 16000  # 10x10 coarse: ~16k iters/sec CPU (34.7s / 100k iters scaled)
        + results["ml_iterations"] / REFERENCE_CPU_ITERS_PER_SEC
    )
    hybrid_wall = results["coarse_time"] + results["ml_time"]

    summary = {
        "hybrid_wall_clock_s": round(hybrid_wall, 2),
        "normal_wall_clock_s": round(results["normal_time"], 2),
        "speedup_vs_own_cold_start": round(
            results["normal_time"] / hybrid_wall, 2
        ),
        "reference_cpu_normal_estimate_s": round(ref_normal_s, 1),
        "speedup_vs_reference_cpu_normal": round(ref_normal_s / hybrid_wall, 1),
        "centerline_diff": results["centerline_diff"],
        "iterations": {
            "coarse": results["coarse_iterations"],
            "ml_fine": results["ml_iterations"],
            "normal_fine": results["normal_iterations"],
        },
        "total_experiment_s": round(total, 1),
        "model": "trained" if model_file else "bicubic_fallback",
    }
    print("NORTH_STAR " + json.dumps(summary))
    with open(os.path.join(args.out, "north_star.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
