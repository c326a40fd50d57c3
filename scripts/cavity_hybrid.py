"""The reference's marquee experiment: ML-accelerated cavity at Re=1000,
400x400 (double-lid BC) - fine-solve budget 200 iterations vs the 100,000
cold-start budget (`PyCFD_ML_accelerated.py:1355-1501`,
`outputs/07-11-2025-02-10-42` artifact names).

Usage: python scripts/cavity_hybrid.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_CPU_ITERS_PER_SEC = 84347 / 3567.5


def main():
    from sr_for_cfd_tpu.workflow.hybrid import run_hybrid_experiment

    stats = "artifacts/standardization_stats_10to400_swish_tpu_multiBC.txt"
    model = "artifacts/vanilla_superres_10to400_swish_tpu_multiBC.msgpack"
    t0 = time.time()
    results = run_hybrid_experiment(
        Re=1000 + (time.time() % 1) * 1e-6, lr_dim=10, hr_dim=400, dt=1e-3, scheme="QUICK",
        case="double_lid",
        max_iterations_coarse=100000,
        max_iterations_ml=200,          # the reference's headline budget
        max_iterations_normal=100000,
        stats_file=stats if os.path.exists(stats) else None,
        model_file=model if os.path.exists(model) else None,
        output_dir="outputs/cavity_hybrid", verbose=True,
        dtype="float32", chunk_size=10000, fused_step=True,
        pressure_sor=1.9, plateau_patience=5,
        coarse_overrides={"chunk_size": 100000},
    )
    total = time.time() - t0
    hybrid_wall = results["coarse_time"] + results["ml_time"]
    ref_normal_s = results["normal_iterations"] / REFERENCE_CPU_ITERS_PER_SEC
    summary = {
        "hybrid_wall_clock_s": round(hybrid_wall, 2),
        "normal_wall_clock_s": round(results["normal_time"], 2),
        "speedup_vs_own_cold_start": round(results["normal_time"] / hybrid_wall, 2),
        "reference_cpu_normal_estimate_s": round(ref_normal_s, 1),
        "speedup_vs_reference_cpu_normal": round(ref_normal_s / hybrid_wall, 1),
        "centerline_diff": results["centerline_diff"],
        "iterations": {k: results[f"{k}_iterations"] for k in ("coarse", "ml", "normal")},
        "total_experiment_s": round(total, 1),
    }
    print("CAVITY_HYBRID " + json.dumps(summary))
    with open("outputs/cavity_hybrid/summary.json", "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
