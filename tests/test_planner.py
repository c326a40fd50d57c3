"""Decomposition planner (parallel/planner.py): the census + ICI model
turned into a user-facing recommendation. The reference never needs
this - its workers are Numba threads in shared memory (`LDV PyCFD given
by sir.py:517-583`); over ICI the device count is a real decision and
the planner makes it from the same model docs/ici_budget.json records.
"""

import json

import pytest

from sr_for_cfd_tpu.parallel import planner
from sr_for_cfd_tpu.parallel.comm_budget import (
    IciParams,
    predict_scaling,
)
from sr_for_cfd_tpu.solver.cases import make_cavity_solver


def _small_case(**kw):
    kw.setdefault("pressure_solver", "multigrid")
    return make_cavity_solver(
        Re=100.0, nx=32, ny=16, dt=2e-3, scheme="QUICK", dtype="float32",
        inner_max_iter=8, **kw,
    ).case


TRIPS = {"u": 4.0, "v": 4.0, "p": 2.0}


@pytest.fixture(scope="module")
def plan():
    # 0.05 ms/step on a 32x16 grid: the ICI latency floor (~0.07 ms at
    # 2 devices) plus the narrow-band redundant recompute (inflation
    # >2x at 16-row bands) make every decomposition a predicted
    # slowdown - the planner must say "stay single-chip"
    return planner.plan_case(
        _small_case(), ms_single=0.05, device_counts=(1, 2, 4),
        trips=TRIPS,
    )


def test_plan_rows_and_fields(plan):
    assert [r["n_devices"] for r in plan["rows"]] == [1, 2, 4]
    assert all(r["feasible"] for r in plan["rows"])
    one = plan["rows"][0]
    assert one["predicted_ms_per_step"] == 0.05
    assert one["speedup_vs_single"] == 1.0
    for r in plan["rows"][1:]:
        assert r["collective_calls_per_step"] > 0
        assert r["ca_compute_inflation"] >= 1.0
        assert r["bound_by"] in (
            "compute", "recompute", "ici_bandwidth", "ici_latency")
        # prediction identity: the row must equal predict_scaling run
        # directly on the row's own census numbers
        redo = predict_scaling(
            0.05,
            {
                "bytes_per_step": r["per_rank_bytes_per_step"],
                "halo_bytes_per_step": r["halo_bytes_per_step"],
                "reduce_bytes_per_step": r["reduce_bytes_per_step"],
                "calls_per_step": r["collective_calls_per_step"],
                "halo_calls_per_step": r["halo_calls_per_step"],
                "reduce_calls_per_step": r["reduce_calls_per_step"],
            },
            r["n_devices"],
            compute_inflation=r["ca_compute_inflation"],
        )
        for key in ("predicted_ms_per_step", "compute_ms",
                    "ici_bandwidth_ms", "ici_latency_ms",
                    "speedup_vs_single", "parallel_efficiency"):
            # inflation is rounded to 4 decimals in the row, so the
            # compute term agrees to that rounding, not bit-exactly
            assert redo[key] == pytest.approx(r[key], rel=1e-3), key


def test_recommendation_is_argmin(plan):
    feas = [r for r in plan["rows"] if r["feasible"]]
    best = min(feas, key=lambda r: r["predicted_ms_per_step"])
    assert plan["recommended_devices"] == best["n_devices"]
    assert plan["recommendation"]
    # tiny grid + fast chip: the latency floor + narrow-band recompute
    # dominate, single chip must win
    assert plan["recommended_devices"] == 1
    assert plan["recommendation"].startswith("stay single-chip")


def test_slow_single_chip_prefers_decomposition():
    """At a fixed census, comm is a fixed floor: a FAST single chip
    stays single (the fixture), while a very SLOW one amortizes the
    floor and decomposition pays. At 2 devices the 16-row-band
    redundant recompute (inflation >2x) means 2 never pays even at
    500 ms/step - the model distinguishes the two regimes."""
    slow = planner.plan_case(
        _small_case(), ms_single=500.0, device_counts=(1, 2, 4),
        trips=TRIPS,
    )
    by_n = {r["n_devices"]: r for r in slow["rows"]}
    assert slow["recommended_devices"] == 4
    assert by_n[4]["speedup_vs_single"] > 1.0
    assert by_n[2]["speedup_vs_single"] < 1.0  # inflation 2.1x at 2 dev
    assert by_n[2]["ca_compute_inflation"] > 2.0


def test_indivisible_and_oversized_counts_are_flagged():
    plan = planner.plan_case(
        _small_case(), ms_single=1.0, device_counts=(1, 3, 16),
        trips=TRIPS,
    )
    by_n = {r["n_devices"]: r for r in plan["rows"]}
    assert not by_n[3]["feasible"] and "divisible" in by_n[3]["reason"]
    assert not by_n[16]["feasible"] and "devices" in by_n[16]["reason"]
    assert plan["recommended_devices"] == 1


def test_census_strips_fused_step():
    """A fused-step case must plan (the decomposed path replaces the
    fused kernel; SpmdSolver rejects fused configs)."""
    case = _small_case(fused_step=False)
    import dataclasses

    fused = dataclasses.replace(
        case, settings=dataclasses.replace(case.settings, fused_step=True)
    )
    ccase = planner._census_case(fused)
    assert not ccase.settings.fused_step
    assert ccase.settings.steps_per_kernel == 1


def test_ici_params_scale_latency():
    """Slower links must never improve a multi-chip row."""
    base = planner.plan_case(
        _small_case(), ms_single=1.0, device_counts=(1, 2), trips=TRIPS,
    )
    worse = planner.plan_case(
        _small_case(), ms_single=1.0, device_counts=(1, 2), trips=TRIPS,
        params=IciParams(link_bytes_per_s=5e9, hop_latency_s=1e-5),
    )
    assert (worse["rows"][1]["predicted_ms_per_step"]
            > base["rows"][1]["predicted_ms_per_step"])


def test_format_plan_renders(plan):
    text = planner.format_plan(plan)
    assert "decomposition plan: 32x16" in text
    assert "-> stay single-chip" in text
    for r in plan["rows"]:
        assert f"\n{r['n_devices']:>4} " in "\n" + text


def test_cli_plan_writes_json(tmp_path):
    from sr_for_cfd_tpu.cli import main

    out = tmp_path / "plan.json"
    main([
        "plan", "--nx", "32", "--ny", "16", "--dt", "2e-3",
        "--re", "100", "--devices", "1", "2", "--ms-per-step", "1.0",
        "--trip-window", "2", "--json", str(out), "--no-subprocess",
    ])
    plan = json.loads(out.read_text())
    assert plan["recommended_devices"] in (1, 2)
    assert plan["ms_per_step_source"] == "caller-provided"
    assert len(plan["rows"]) == 2


def test_plan_argv_round_trip():
    """The subprocess argv reconstruction must parse back to the same
    plan parameters (the single-TPU-host fallback path)."""
    from sr_for_cfd_tpu.cli import _plan_argv, build_parser

    ap = build_parser()
    args = ap.parse_args([
        "plan", "--case", "bfs", "--re", "400", "--nx", "400",
        "--ny", "194", "--dt", "2e-3", "--scheme", "UPWIND",
        "--devices", "1", "2", "4", "--use-pallas",
        "--pressure-solver", "multigrid",
    ])
    argv = _plan_argv(args, ms=0.861)
    back = ap.parse_args(argv)
    for field in ("case", "re", "nx", "ny", "dt", "scheme", "dtype",
                  "pressure_solver", "use_pallas", "fused",
                  "steps_per_kernel", "devices", "trip_window"):
        assert getattr(back, field) == getattr(args, field), field
    assert back.ms_per_step == pytest.approx(0.861)
    assert back.no_subprocess


def test_cli_plan_subprocess_census(tmp_path):
    """The single-TPU-host fallback end-to-end: asking for more devices
    than the backend has (16 > 8 virtual) must re-exec the census leg
    in a subprocess on a 16-device virtual CPU mesh (config-update
    forced - env vars alone are overridden by TPU-plugin sitecustomize
    hooks) and still produce the full plan."""
    import subprocess
    import sys

    out = tmp_path / "plan_sub.json"
    res = subprocess.run(
        [sys.executable, "-m", "sr_for_cfd_tpu.cli", "plan",
         "--nx", "32", "--ny", "16", "--dt", "2e-3", "--re", "100",
         "--devices", "1", "16", "--ms-per-step", "1.0",
         "--trip-window", "2", "--json", str(out)],
        capture_output=True, text=True, timeout=600,
        cwd=str(__import__("pathlib").Path(__file__).resolve().parent.parent),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    plan = json.loads(out.read_text())
    by_n = {r["n_devices"]: r for r in plan["rows"]}
    assert by_n[16]["feasible"], by_n[16]
    assert by_n[16]["collective_calls_per_step"] > 0
    assert "recommendation" in plan
