"""Decomposition planner: should this case run decomposed, and over how
many chips?

The reference scales by Numba threads inside one host, where neighbor
reads are shared-memory and free (`LDV PyCFD given by sir.py:517-583`),
so "more workers" is always the right answer there. On a TPU mesh the
same question has a non-trivial answer: halo exchanges and reductions
ride ICI with real latency, and the communication-avoiding halo
schedule (spmd_step.ca_sweep_solve) buys fewer collectives with
redundant halo-row recompute that grows as per-rank bands narrow. The
planner answers it WITHOUT multi-chip hardware, from the same
first-principles model the bench records (docs/ici_budget.json):

  * an exact jaxpr census of the decomposed chunk's collectives
    (`comm_budget.spmd_chunk_census` - trace-only, needs only virtual
    devices),
  * measured inner-loop trip counts from a short single-device window
    (`comm_budget.measured_inner_trips` - the SPMD loop exits are
    count-identical, tests/test_parallel.py),
  * the analytic redundant-recompute factor of the k-deep halo schedule
    (`comm_budget.ca_compute_inflation`),
  * the ring-aware ICI link model (`comm_budget.IciParams` /
    `predict_scaling`).

`plan_case` returns one row per candidate device count plus a
recommendation (which may be "stay single-chip" - at 400^2 the model
says 2-4 chips pay and 8 do not). The CLI front end is
`python -m sr_for_cfd_tpu.cli plan`.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional, Sequence

import numpy as np

from .comm_budget import (
    IciParams,
    ca_compute_inflation,
    measured_inner_trips,
    predict_scaling,
    spmd_chunk_census,
    step_traffic,
)


def measure_single_chip_ms(case, iters: int = 50, reps: int = 3) -> float:
    """Best-of-`reps` single-device ms per outer step on the CURRENT
    backend: one compiled `iters`-step chunk per rep from a freshly
    perturbed state (so a remote result cache cannot short-circuit),
    scalar readback as the sync (bench.py `_time_mode` semantics)."""
    from functools import partial

    import jax.numpy as jnp

    from ..solver.simple import jitted_run_chunk
    from ..solver.state import init_state, inlet_profile

    bench_case = dataclasses.replace(
        case,
        settings=dataclasses.replace(
            case.settings, max_iterations=iters, chunk_size=iters,
            spmd_devices=1,
        ),
    )
    profile = inlet_profile(bench_case)
    nu = jnp.asarray(bench_case.fluid.nu,
                     jnp.dtype(bench_case.settings.dtype))
    chunk = partial(jitted_run_chunk, case=bench_case, n_steps=iters, nu=nu)

    def force(x):
        return float(jnp.sum(x))

    state = chunk(init_state(bench_case), profile)  # compile + warm
    force(state.u)
    best = float("inf")
    nx, ny = case.mesh.nx, case.mesh.ny
    for rep in range(reps):
        fresh = init_state(bench_case)
        fresh = fresh._replace(
            u=fresh.u.at[nx // 2, ny // 2].add(1e-7 * (rep + 1))
        )
        force(fresh.u)
        t0 = time.time()
        state = chunk(fresh, profile)
        force(state.u)
        best = min(best, (time.time() - t0) / iters * 1e3)
    return best


def _census_case(case):
    """The SpmdSolver-compatible twin of `case`: the fused whole-step
    kernel does not decompose (SpmdSolver rejects it - the decomposed
    path runs per-shard kernels instead), and the config-time VMEM gate
    must not assume a decomposition factor the census mesh won't have."""
    return dataclasses.replace(
        case,
        settings=dataclasses.replace(
            case.settings, fused_step=False, steps_per_kernel=1,
            spmd_devices=1,
        ),
    )


def _dominant_cost(pred: Dict[str, float], n_dev: int) -> str:
    """Which term keeps this row from ideal scaling: the excess compute
    (redundant halo-row recompute + any non-decomposed fraction), ICI
    bandwidth, or ICI latency."""
    ideal = pred["predicted_ms_per_step"] * pred["parallel_efficiency"]
    terms = {
        "recompute": pred["compute_ms"] - ideal,
        "ici_bandwidth": pred["ici_bandwidth_ms"],
        "ici_latency": pred["ici_latency_ms"],
    }
    return max(terms, key=lambda k: terms[k])


def plan_case(
    case,
    ms_single: Optional[float] = None,
    device_counts: Sequence[int] = (1, 2, 4, 8),
    params: IciParams = IciParams(),
    trip_window: int = 6,
    trips: Optional[Dict[str, float]] = None,
) -> dict:
    """Predict decomposed step time for each candidate device count and
    recommend the fastest.

    `ms_single` is the single-chip ms per outer step; None measures it
    live on the current backend (`measure_single_chip_ms` - on real TPU
    this is the honest input; on CPU it is a CPU number and the
    *ratios* are still census-exact). Device counts that do not divide
    the interior rows, or exceed the visible devices, come back as
    infeasible rows with the reason instead of raising - the CLI can
    then re-run the census leg on a virtual mesh."""
    import jax
    from jax.sharding import Mesh

    if trips is None:
        trips = measured_inner_trips(case, n_steps=trip_window)
    measured_live = ms_single is None
    if measured_live:
        ms_single = measure_single_chip_ms(case)

    ccase = _census_case(case)
    devices = jax.devices()
    rows = []
    for n_dev in sorted(set(int(n) for n in device_counts)):
        if n_dev <= 1:
            rows.append({
                "n_devices": 1,
                "feasible": True,
                "predicted_ms_per_step": ms_single,
                "compute_ms": ms_single,
                "ici_bandwidth_ms": 0.0,
                "ici_latency_ms": 0.0,
                "speedup_vs_single": 1.0,
                "parallel_efficiency": 1.0,
                "collective_calls_per_step": 0.0,
                "ca_compute_inflation": 1.0,
                "bound_by": "compute",
            })
            continue
        if case.mesh.nx % n_dev != 0:
            rows.append({
                "n_devices": n_dev, "feasible": False,
                "reason": f"nx={case.mesh.nx} not divisible by {n_dev} "
                          "(interior-row decomposition)",
            })
            continue
        if len(devices) < n_dev:
            rows.append({
                "n_devices": n_dev, "feasible": False,
                "reason": f"census needs {n_dev} devices, backend has "
                          f"{len(devices)} (re-run with JAX_PLATFORMS=cpu "
                          "XLA_FLAGS=--xla_force_host_platform_device_"
                          f"count={n_dev}; the cli does this for you)",
            })
            continue
        mesh = Mesh(np.array(devices[:n_dev]), ("x",))
        chunk = spmd_chunk_census(ccase, mesh)
        traffic = step_traffic(chunk, trips, ccase)
        inflation = ca_compute_inflation(ccase, n_dev, trips)
        pred = predict_scaling(ms_single, traffic, n_dev, params=params,
                               compute_inflation=inflation)
        rows.append({
            "feasible": True,
            "collective_calls_per_step": traffic["calls_per_step"],
            "halo_calls_per_step": traffic["halo_calls_per_step"],
            "reduce_calls_per_step": traffic["reduce_calls_per_step"],
            "per_rank_bytes_per_step": traffic["bytes_per_step"],
            "halo_bytes_per_step": traffic["halo_bytes_per_step"],
            "reduce_bytes_per_step": traffic["reduce_bytes_per_step"],
            "ca_compute_inflation": round(inflation, 4),
            "bound_by": _dominant_cost(pred, n_dev),
            **pred,
        })

    feasible = [r for r in rows if r.get("feasible")]
    best = min(feasible, key=lambda r: r["predicted_ms_per_step"])
    n_best = best["n_devices"]
    if n_best == 1:
        slow = [r for r in feasible if r["n_devices"] > 1]
        why = (
            "decomposition is predicted to be a net slowdown at this "
            "size" + (
                f" (best multi-chip row: {min(s['n_devices'] for s in slow)}"
                f"+ dev, bound by {slow[0]['bound_by']})" if slow else ""
            )
        )
    else:
        why = (
            f"predicted {best['speedup_vs_single']:.2f}x vs single chip "
            f"at parallel efficiency "
            f"{best['parallel_efficiency'] * 100:.0f}%, bound by "
            f"{best['bound_by']}"
        )
    return {
        "case": {
            "nx": case.mesh.nx, "ny": case.mesh.ny,
            "scheme": case.settings.scheme,
            "pressure_solver": case.settings.pressure_solver,
            "dtype": case.settings.dtype,
        },
        "single_chip_ms_per_step": ms_single,
        "ms_per_step_source": (
            f"measured live on {jax.default_backend()}" if measured_live
            else "caller-provided"
        ),
        "trips_per_step": {k: float(v) for k, v in trips.items()},
        "ici_params": params._asdict(),
        "rows": rows,
        "recommended_devices": n_best,
        "recommendation": (
            ("stay single-chip: " if n_best == 1
             else f"decompose over {n_best} devices (--spmd {n_best}): ")
            + why
        ),
    }


def format_plan(plan: dict) -> str:
    """Human-readable table of a `plan_case` result."""
    c = plan["case"]
    lines = [
        f"decomposition plan: {c['nx']}x{c['ny']} {c['scheme']} "
        f"{c['pressure_solver']} {c['dtype']}",
        f"single-chip {plan['single_chip_ms_per_step']:.3f} ms/step "
        f"({plan['ms_per_step_source']})",
        f"{'dev':>4} {'ms/step':>9} {'speedup':>8} {'eff':>6} "
        f"{'coll/step':>10} {'recompute':>10} bound by",
    ]
    for r in plan["rows"]:
        if not r.get("feasible"):
            lines.append(f"{r['n_devices']:>4} infeasible: {r['reason']}")
            continue
        lines.append(
            f"{r['n_devices']:>4} {r['predicted_ms_per_step']:>9.3f} "
            f"{r['speedup_vs_single']:>7.2f}x "
            f"{r['parallel_efficiency'] * 100:>5.0f}% "
            f"{r['collective_calls_per_step']:>10.0f} "
            f"{r['ca_compute_inflation']:>9.2f}x {r['bound_by']}"
        )
    lines.append("-> " + plan["recommendation"])
    return "\n".join(lines)
