"""Multi-chip ICI scaling budget for the decomposed SIMPLE step.

One real chip is available in this environment, so multi-chip wall time
cannot be measured - but the collective traffic CAN be known exactly
(the jaxpr census, `parallel/comm_budget.py`) and the inner-loop trip
counts CAN be measured (single-device `with_counts`; the SPMD loop
exits are count-identical, tests/test_parallel.py). This script
combines both with explicit v5e link parameters into the predicted
scaling table and writes `docs/ici_budget.json`.

Single-chip ms/step inputs are the recorded flagship numbers:
`docs/scaling_bench.json` (mg_pallas rows, Re=1000 QUICK f32 cavity,
scripts/scaling_bench.py) and the bench's 400^2 modes (BENCH at HEAD).

Run on the 8-device virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/ici_budget.py
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from sr_for_cfd_tpu.parallel.comm_budget import (  # noqa: E402
    IciParams,
    ca_compute_inflation,
    measured_inner_trips,
    predict_scaling,
    spmd_chunk_census,
    step_traffic,
)
from sr_for_cfd_tpu.solver.cases import make_cavity_solver  # noqa: E402

# (nx, pressure_solver, ms/step source, trip-count window). ms/step is
# read at RUN TIME from the recorded bench artifacts so re-running the
# benches cannot silently de-sync this script (ADVICE r3):
#   * "bench:<mode>"   -> BENCH json at the repo root (400^2 modes)
#   * "scaling:<key>"  -> docs/scaling_bench.json row for this size
# Each source names the COMPUTE PATH the timing came from, recorded in
# the output. The 400^2 multigrid row pairs the jnp-chunk census/trips
# with the jnp "multigrid" bench mode (not mg_pallas) - same program.
EXPERIMENTS = [
    (400, "sweeps", "bench:parity", 6),
    (400, "multigrid", "bench:multigrid", 6),
    (1024, "multigrid", "scaling:multigrid_ms_per_step", 3),
    (2048, "multigrid", "scaling:multigrid_ms_per_step", 2),
]
DEVICE_COUNTS = (2, 4, 8)

ROOT = Path(__file__).resolve().parent.parent


def resolve_ms_per_step(nx: int, source: str):
    """Read the recorded single-chip ms/step named by `source`, failing
    loudly if the row is missing. Returns (ms_per_step, provenance).
    BENCH files are scanned newest-first, skipping any whose `parsed`
    is null (the r4 line outgrew the driver's capture window) or whose
    modes moved to the side file (`docs/bench_full_r*.json`, r5+)."""
    kind, _, key = source.partition(":")
    if kind == "bench":
        import re

        cands = list(ROOT.glob("BENCH_r*.json"))
        cands += list(ROOT.glob("docs/bench_full_r*.json"))
        if not cands:
            raise FileNotFoundError("no BENCH_r*.json at the repo root")

        def round_of(p: Path) -> int:
            m = re.search(r"r(\d+)", p.name)
            return int(m.group(1)) if m else -1

        for path in sorted(cands, key=round_of, reverse=True):
            data = json.loads(path.read_text())
            data = data.get("parsed", data)  # driver wraps the JSON line
            if not isinstance(data, dict):
                continue
            modes = data.get("modes", {})
            mode = modes.get(key)
            if isinstance(mode, dict) and "device_ms_per_step" in mode:
                return (float(mode["device_ms_per_step"]),
                        f"{path.name}:modes.{key}.device_ms_per_step")
        raise KeyError(f"mode {key!r} missing from every BENCH_r*.json")
    if kind == "scaling":
        path = ROOT / "docs" / "scaling_bench.json"
        data = json.loads(path.read_text())
        row = data.get(f"{nx}x{nx}", {})
        if row.get(key) is None:
            raise KeyError(
                f"{nx}x{nx}.{key} missing/null in docs/scaling_bench.json")
        return float(row[key]), f"docs/scaling_bench.json:{nx}x{nx}.{key}"
    raise ValueError(f"unknown ms/step source {source!r}")


def main() -> None:
    out = {
        "ici_params": IciParams()._asdict(),
        "method": (
            "per-rank collective bytes/calls from a jaxpr census of the "
            "shard_map'd chunk (exact), inner trips measured via "
            "simple_step(with_counts=True) from fresh fields (flow-"
            "dependent; window recorded), link bandwidth/latency are "
            "parameters (public v5e spec) - recalibrate IciParams on a "
            "real mesh"
        ),
        "experiments": {},
    }
    for nx, psolver, ms_source, window in EXPERIMENTS:
        ms_single, provenance = resolve_ms_per_step(nx, ms_source)
        case = make_cavity_solver(
            Re=1000.0, nx=nx, ny=nx, dt=1e-3, scheme="QUICK",
            dtype="float32", pressure_solver=psolver,
        ).case
        print(f"== {nx}x{nx} {psolver} ({ms_single} ms/step from "
              f"{provenance}): measuring {window}-step trip window...",
              flush=True)
        trips = measured_inner_trips(case, n_steps=window)
        row = {
            "single_chip_ms_per_step": ms_single,
            "ms_per_step_source": provenance,
            "trips_per_step": trips,
            "trip_window_steps": window,
            "meshes": {},
        }
        for n_dev in DEVICE_COUNTS:
            mesh = Mesh(np.array(jax.devices()[:n_dev]), ("x",))
            chunk = spmd_chunk_census(case, mesh)
            traffic = step_traffic(chunk, trips, case)
            # redundant halo-row recompute of the communication-avoiding
            # schedule, charged against the compute term (VERDICT r4 #7)
            inflation = ca_compute_inflation(case, n_dev, trips)
            pred = predict_scaling(ms_single, traffic, n_dev,
                                   compute_inflation=inflation)
            row["meshes"][str(n_dev)] = {
                "per_rank_bytes_per_step": traffic["bytes_per_step"],
                "per_rank_halo_bytes_per_step": traffic["halo_bytes_per_step"],
                "per_rank_reduce_bytes_per_step": traffic["reduce_bytes_per_step"],
                "collective_calls_per_step": traffic["calls_per_step"],
                # full split so downstream consumers (bench.py's
                # ici_budget block) can re-run predict_scaling with a
                # freshly measured ms/step without re-doing the census
                "halo_calls_per_step": traffic["halo_calls_per_step"],
                "reduce_calls_per_step": traffic["reduce_calls_per_step"],
                "ca_compute_inflation": round(inflation, 4),
                **pred,
            }
            print(
                f"  {n_dev} dev: {traffic['bytes_per_step'] / 1e6:.3f} "
                f"MB/step/rank, {traffic['calls_per_step']:.0f} "
                f"collectives/step -> {pred['predicted_ms_per_step']:.3f} "
                f"ms/step, eff {pred['parallel_efficiency'] * 100:.1f}%",
                flush=True,
            )
        out["experiments"][f"{nx}x{nx}_{psolver}"] = row

    path = Path(__file__).resolve().parent.parent / "docs" / "ici_budget.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
