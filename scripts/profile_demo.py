"""Capture jax.profiler traces of the hybrid workflow's phases and
record the per-phase device-time breakdown (VERDICT r3 #8; SURVEY 5.1:
"report device time, not host wall-clock").

Protocol (the device trace collection covers only ~52 s of wall, and the
relay's intermittent ~25-60 s dispatch stalls land nondeterministically,
so one trace around the whole experiment loses whichever phase a stall
pushes past the horizon):

  python scripts/profile_demo.py warm    # untraced: compiles cached
  python scripts/profile_demo.py         # one trace PER PHASE + report

The traced pass runs coarse -> SR -> warm fine / cold fine with tiny
budgets (representative per-iteration device cost, not converged
physics), capturing each phase into its own trace under
outputs/trace_r4/{coarse,ml,normal}. Per-phase device busy time = sum of
/device:TPU:0 "XLA Ops" event durations in that phase's trace, parsed
from the xplane protobuf (the trace.json converter truncates large event
streams). Writes docs/demo_phase_trace_r4.json.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TRACE_DIR = "outputs/trace_r4"
OUT = "docs/demo_phase_trace_r4.json"

STATS = "artifacts/standardization_stats_10to400_swish_tpu_bfs.txt"
MODEL = "artifacts/vanilla_superres_10to400_swish_tpu_bfs.msgpack"

# tiny budgets: device tracing records every executed op - a
# 3000-iteration fine phase produced a 924 MB xplane.pb and stop_trace
# never finished serializing it
COARSE_ITERS = 500
FINE_ITERS = 50
# no RRE (needs rre_every*(depth+1)-iteration chunks at this budget)
COARSE_KW = {"pressure_solver": "sweeps", "fused_step": True,
             "pressure_sor": 1.9, "chunk_size": 500, "inner_max_iter": 16,
             "plateau_patience": 0, "steps_per_kernel": 500}
FINE_KW = {"dtype": "float32", "chunk_size": 50,
           "pressure_solver": "multigrid"}


def device_busy_s(trace_dir: str):
    """(device_busy_s, coverage_s, path) from the newest vm.xplane.pb
    under `trace_dir`: total /device:TPU:0 'XLA Ops' busy time."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    dev = next(pl for pl in xs.planes if pl.name == "/device:TPU:0")
    busy = 0
    t_min, t_max = None, 0
    for line in dev.lines:
        if line.name != "XLA Ops":
            continue
        base = line.timestamp_ns * 1000  # ps
        for ev in line.events:
            busy += ev.duration_ps
            t0 = base + ev.offset_ps
            t_min = t0 if t_min is None else min(t_min, t0)
            t_max = max(t_max, t0 + ev.duration_ps)
    span = 0 if t_min is None else (t_max - t_min)
    return round(busy / 1e12, 4), round(span / 1e12, 3), paths[-1]


def main():
    from sr_for_cfd_tpu.utils.timing import profile_trace
    from sr_for_cfd_tpu.workflow.hybrid import (
        run_coarse_simulation,
        run_hybrid_experiment,
        run_ml_accelerated_fine_simulation,
        run_normal_simulation,
    )

    if len(sys.argv) > 1 and sys.argv[1] == "warm":
        # untraced pass through the SAME code path: populates the
        # persistent compile cache + the relay's executable cache so the
        # traced phases' wall time is execution, not compilation
        run_hybrid_experiment(
            Re=400.0, lr_dim=10, hr_dim=400, case="bfs",
            max_iterations_coarse=COARSE_ITERS,
            max_iterations_ml=FINE_ITERS, max_iterations_normal=FINE_ITERS,
            stats_file=STATS if os.path.exists(STATS) else None,
            model_file=MODEL if os.path.exists(MODEL) else None,
            verbose=False, save_results=False, coarse_overrides=COARSE_KW,
            **FINE_KW,
        )
        print("WARM_DONE")
        return

    stats = STATS if os.path.exists(STATS) else None
    model = MODEL if os.path.exists(MODEL) else None
    record = {"method": (
        "hybrid BFS phases each traced separately with jax.profiler "
        "(one ~52 s device-collection window per phase, so a relay "
        "stall cannot evict another phase); device time = total "
        "/device:TPU:0 'XLA Ops' busy time in that phase's trace, "
        "parsed from the xplane protobuf. Each phase's precompile() "
        "executes one sacrificial full-budget warm chunk inside the "
        "trace, so per-iteration device cost divides by 2x the solve "
        "iterations"), "phases": {}}

    with profile_trace(f"{TRACE_DIR}/coarse"):
        coarse_fields, _, c_iters, c_time = run_coarse_simulation(
            400.0000001, lr_dim=10, dt=2e-3, scheme="UPWIND",
            max_iterations=COARSE_ITERS, output_dir=TRACE_DIR, case="bfs",
            verbose=False, save_results=False, spmd_devices=1, **COARSE_KW,
        )
    with profile_trace(f"{TRACE_DIR}/ml"):
        _, m_iters, m_time, _ = run_ml_accelerated_fine_simulation(
            400.0000001, 400, 400, coarse_fields, lr_dim=10, hr_dim=400,
            stats_file=stats, model_file=model, lx=10.0, ly=3.0,
            dt=2e-3, scheme="UPWIND", max_iterations=FINE_ITERS,
            output_name=f"{TRACE_DIR}/ml_run", case="bfs", verbose=False,
            save_results=False, **FINE_KW,
        )
    with profile_trace(f"{TRACE_DIR}/normal"):
        _, n_iters, n_time = run_normal_simulation(
            400.0000001, 400, 400, dt=2e-3, scheme="UPWIND",
            max_iterations=FINE_ITERS, output_name=f"{TRACE_DIR}/n_run",
            case="bfs", verbose=False, save_results=False, **FINE_KW,
        )

    for phase, iters, wall in (("coarse", c_iters, c_time),
                               ("ml", m_iters, m_time),
                               ("normal", n_iters, n_time)):
        busy, span, path = device_busy_s(f"{TRACE_DIR}/{phase}")
        record["phases"][phase] = {
            "iterations": iters,
            "wall_s_reported": round(wall, 3),
            "device_busy_s": busy,
            "device_span_s": span,
            "device_ms_per_iter": round(1e3 * busy / (2 * iters), 4),
            "trace": path,
        }
    os.makedirs("docs", exist_ok=True)
    json.dump(record, open(OUT, "w"), indent=1)
    print(json.dumps(record))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
