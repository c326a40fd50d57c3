"""Collective-traffic census + ICI scaling model for the SPMD solver.

Multi-chip ICI is not measurable in this single-chip environment (the
known gap in docs/STATUS.md) - but the traffic that WOULD ride it is
exactly determined by the compiled program. This module walks the jaxpr
of the shard_map'd SIMPLE-step chunk, censuses every collective
(`ppermute` halo rows, `psum`/`pmax` reductions, `all_gather` level
hand-offs) with its payload size and loop position, and combines the
per-trip byte counts with MEASURED inner-sweep counts
(`solver.simple.simple_step(with_counts=True)`) and explicit ICI link
parameters into a predicted multi-chip scaling curve.

Three evidence tiers, kept separate on purpose:

  * the census is ground truth - the jaxpr IS the program that will run
    on the mesh, so payload sizes and call counts per loop trip are
    exact, not modeled;
  * the trip counts are measured - inner sweeps / V-cycles per outer
    step from a real solve (they depend on the flow state, so they are
    sampled over a window and averaged);
  * only the link bandwidth / hop latency are parameters (`IciParams`,
    defaults from the public v5e spec), isolated so a future real-mesh
    calibration changes ONE place.

Reference contract: this quantifies the neighbor traffic the reference
pays through shared memory in its `prange` loops (`LDV PyCFD given by
sir.py:517-597`) when the domain instead spans chips - the roofline for
the "pick a mesh, shard, let XLA insert collectives" recipe.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

__all__ = [
    "Site",
    "LoopCensus",
    "census_collectives",
    "spmd_chunk_census",
    "measured_inner_trips",
    "effective_momentum_cadence",
    "step_traffic",
    "ca_compute_inflation",
    "IciParams",
    "predict_scaling",
]

# Primitive-name prefixes that move bytes between devices. Prefix match
# because jax splits variants (e.g. `psum` vs `psum_invariant`).
COLLECTIVE_PREFIXES = (
    "ppermute",
    "psum",
    "pmax",
    "pmin",
    "pbroadcast",
    "all_gather",
    "all_to_all",
    "reduce_scatter",
)


class Site(NamedTuple):
    """One static collective call site, aggregated by payload.

    `payload_bytes` is the per-rank operand size of ONE invocation (for
    `ppermute` that is exactly the bytes each rank puts on its link);
    `calls` is how many times the site runs per trip of the loop that
    owns it (scan-folded: a site inside a static-length `lax.scan` or
    unrolled `fori_loop` counts `length` times)."""

    name: str
    payload_bytes: int
    calls: int


class LoopCensus(NamedTuple):
    """Collectives of one loop body, with nested unknown-trip loops.

    `sites` are the collectives that run once per trip of THIS loop
    (including its cond - the exit test runs every trip too, and
    static-length scans folded in). `loops` are nested `while` loops in
    program order, whose trip counts the census cannot know - the caller
    supplies those (measured) to `step_traffic`."""

    sites: Tuple[Site, ...]
    loops: Tuple["LoopCensus", ...]

    def per_trip_bytes(self) -> int:
        """Bytes per trip from this loop's own sites (nested loops not
        included - their trip counts are the caller's)."""
        return sum(s.payload_bytes * s.calls for s in self.sites)

    def per_trip_calls(self) -> int:
        """Collective invocations per trip (each is >= one ICI hop of
        latency on a real mesh; scalar psums count - they are
        latency-bound, not bandwidth-bound)."""
        return sum(s.calls for s in self.sites)

    def per_trip_by_kind(self) -> Dict[str, Tuple[int, int]]:
        """(bytes, calls) per trip split into 'halo' (ppermute -
        neighbor exchange, one hop, low/high halos ride distinct links)
        and 'reduce' (psum/pmax/all_gather/reduce_scatter/... - ring
        algorithms whose hop and wire-byte cost grow with the device
        count). The split drives `predict_scaling`'s cost model."""
        out = {"halo": [0, 0], "reduce": [0, 0]}
        for s in self.sites:
            kind = "halo" if s.name.startswith("ppermute") else "reduce"
            out[kind][0] += s.payload_bytes * s.calls
            out[kind][1] += s.calls
        return {k: (v[0], v[1]) for k, v in out.items()}


def _payload(eqn) -> int:
    return sum(
        int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
        for v in eqn.invars
        if hasattr(v, "aval") and hasattr(v.aval, "shape")
    )


def _merge(into: Dict[Tuple[str, int], int], sites, mult: int) -> None:
    for s in sites:
        key = (s.name, s.payload_bytes)
        into[key] = into.get(key, 0) + s.calls * mult


def _jaxpr_of(v):
    return v.jaxpr if hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns") else v


def _walk(jaxpr) -> LoopCensus:
    """One level: collect sites + nested while loops of `jaxpr`.

    * `while`: becomes a nested `LoopCensus` (cond + body sites merged -
      both run every trip).
    * `scan`: statically folded - inner sites multiply by `length`
      (includes `fori_loop` with concrete bounds, which jax lowers to
      scan). A `while` nested inside a scan stays a nested loop.
    * `cond`: collectives inside branches would deadlock a mesh unless
      every rank takes the same branch; the codebase keeps collectives
      OUTSIDE conds (see spmd_step.rre_stage's docstring), so branch
      sites are merged at the PER-SITE max across branches - both the
      byte floor and the call (latency) floor stay conservative even
      when one branch has more calls and another more bytes.
    * anything else with a sub-jaxpr (pjit, shard_map, closed_call,
      custom_* wrappers): transparent."""
    sites: Dict[Tuple[str, int], int] = {}
    loops: List[LoopCensus] = []

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name.startswith(COLLECTIVE_PREFIXES):
            key = (name, _payload(eqn))
            sites[key] = sites.get(key, 0) + 1
        elif name == "while":
            body = _walk(_jaxpr_of(eqn.params["body_jaxpr"]))
            cond = _walk(_jaxpr_of(eqn.params["cond_jaxpr"]))
            merged: Dict[Tuple[str, int], int] = {}
            _merge(merged, body.sites, 1)
            _merge(merged, cond.sites, 1)
            loops.append(
                LoopCensus(
                    tuple(Site(n, b, c) for (n, b), c in merged.items()),
                    body.loops + cond.loops,
                )
            )
        elif name == "scan":
            inner = _walk(_jaxpr_of(eqn.params["jaxpr"]))
            _merge(sites, inner.sites, int(eqn.params["length"]))
            loops.extend(inner.loops)
        elif name == "cond":
            branches = [_walk(_jaxpr_of(b)) for b in eqn.params["branches"]]
            merged_max: Dict[Tuple[str, int], int] = {}
            for b in branches:
                for s in b.sites:
                    key = (s.name, s.payload_bytes)
                    merged_max[key] = max(merged_max.get(key, 0), s.calls)
                loops.extend(b.loops)
            _merge(sites,
                   [Site(n, b_, c) for (n, b_), c in merged_max.items()], 1)
        else:
            for p in eqn.params.values():
                vals = p if isinstance(p, (list, tuple)) else [p]
                for v in vals:
                    j = _jaxpr_of(v)
                    if hasattr(j, "eqns"):
                        inner = _walk(j)
                        _merge(sites, inner.sites, 1)
                        loops.extend(inner.loops)

    return LoopCensus(
        tuple(Site(n, b, c) for (n, b), c in sites.items()), tuple(loops)
    )


def census_collectives(fn, *args) -> LoopCensus:
    """Census the collectives of `fn(*args)` (traced, not run).

    Returns the top-level `LoopCensus`: `sites` run once per call,
    `loops` are the unknown-trip while loops in program order."""
    import jax

    return _walk(jax.make_jaxpr(fn)(*args).jaxpr)


def spmd_chunk_census(case, mesh, axis: str = "x") -> LoopCensus:
    """Census of one `SpmdSolver` chunk: the outer-iteration loop.

    The returned census is the CHUNK loop (one trip = one outer SIMPLE
    iteration); its `loops` are the inner solves in program order -
    u-momentum, v-momentum, pressure (sweeps or V-cycles) - exactly the
    keys `simple_step(with_counts=True)` measures."""
    from .spmd_step import SpmdSolver

    solver = SpmdSolver(case, mesh, axis)
    top = census_collectives(solver._chunk_fn, solver.local, solver._nu)
    # the chunk fn is jit(shard_map(chunk)): the sole top-level while IS
    # the outer-iteration loop (RRE adds cond stages, not loops)
    if len(top.loops) != 1:
        raise ValueError(
            f"expected one top-level chunk loop, found {len(top.loops)} - "
            "the chunk structure changed; update spmd_chunk_census"
        )
    return top.loops[0]


def measured_inner_trips(
    case, n_steps: int = 20, state=None
) -> Dict[str, float]:
    """Average inner sweeps (or V-cycles) per outer step, measured on the
    single-device solver over an `n_steps` window from `state` (fresh
    fields if None). The SPMD loop exits are count-identical to the
    single-device loop (tests/test_parallel.py), so these are the trip
    counts of the census's inner loops."""
    import jax.numpy as jnp

    from ..solver.simple import simple_step
    from ..solver.state import init_state, inlet_profile

    profile = inlet_profile(case)
    nu = jnp.asarray(case.fluid.nu, jnp.dtype(case.settings.dtype))
    if state is None:
        state = init_state(case)
    totals = {"u": 0.0, "v": 0.0, "p": 0.0}
    for _ in range(n_steps):
        state, counts = simple_step(
            state, case, profile, nu, with_counts=True
        )
        for k in totals:
            totals[k] += float(counts[k])
    return {k: v / n_steps for k, v in totals.items()}


def effective_momentum_cadence(case) -> int:
    """The momentum check cadence the compiled solver ACTUALLY runs.

    The big-grid tiled Pallas momentum path silently coerces
    `momentum_check_every` to >= 3 (solver/simple.py, multi-sweep kernel
    passes), so `measured_inner_trips` returns sweep counts in multiples
    of 3 for such cases; dividing by the configured cadence (often 1)
    would overstate momentum traffic ~3x."""
    from ..solver.simple import STREAM_MG_CELL_THRESHOLD

    st = case.settings
    mesh = case.mesh
    big_grid_pallas = st.use_pallas and (
        st.mg_slab_rows > 0
        or mesh.nx * mesh.ny > STREAM_MG_CELL_THRESHOLD
    )
    if (big_grid_pallas and st.inner_scheme == "redblack"
            and st.dtype == "float32"):
        return max(3, st.momentum_check_every)
    return st.momentum_check_every


def step_traffic(
    chunk: LoopCensus, trips: Dict[str, float], case=None
) -> Dict[str, float]:
    """Per-rank ICI traffic of ONE outer SIMPLE iteration.

    `chunk` from `spmd_chunk_census`, `trips` from
    `measured_inner_trips` (keys 'u','v','p' matching the chunk's inner
    loops in program order). Returns bytes and collective-call counts -
    calls bound the latency floor (each dependent collective is >= one
    ICI hop), bytes bound the bandwidth floor - split into 'halo'
    (ppermute) and 'reduce' (everything else) so `predict_scaling` can
    cost rings and neighbor exchanges differently.

    `measured_inner_trips` counts SWEEPS, but a census loop trip covers
    `check_every` sweeps (the loop body unrolls them - its per-trip
    bytes already include the whole batch), so pass `case` to convert:
    trips_of_loop = sweeps / {momentum,pressure}_check_every (momentum
    via `effective_momentum_cadence` - the tiled Pallas path coerces it)."""
    if len(chunk.loops) != 3:
        raise ValueError(
            f"expected 3 inner loops (u, v, p), found {len(chunk.loops)}"
        )
    if case is not None:
        st = case.settings
        # multigrid counts V-cycles and the mg loop trips once per
        # cycle; the sweeps loop batches pressure_check_every per trip
        p_div = (
            st.pressure_check_every
            if st.pressure_solver == "sweeps"
            else 1
        )
        m_div = effective_momentum_cadence(case)
        trips = {
            "u": trips["u"] / m_div,
            "v": trips["v"] / m_div,
            "p": trips["p"] / p_div,
        }
    names = ("u", "v", "p")
    by_loop = {}
    kinds = chunk.per_trip_by_kind()
    halo_bytes, halo_calls = map(float, kinds["halo"])
    reduce_bytes, reduce_calls = map(float, kinds["reduce"])
    for name, loop in zip(names, chunk.loops):
        # nested unknown-trip loops inside an inner solve would make the
        # budget under-read; the current chunks have none, assert so
        if loop.loops:
            raise ValueError(
                f"inner loop {name!r} has {len(loop.loops)} nested "
                "unknown-trip loops; extend step_traffic with their counts"
            )
        k = loop.per_trip_by_kind()
        by_loop[name] = {
            "bytes": loop.per_trip_bytes() * trips[name],
            "calls": loop.per_trip_calls() * trips[name],
            "trips": trips[name],
        }
        halo_bytes += k["halo"][0] * trips[name]
        halo_calls += k["halo"][1] * trips[name]
        reduce_bytes += k["reduce"][0] * trips[name]
        reduce_calls += k["reduce"][1] * trips[name]
    return {
        "bytes_per_step": halo_bytes + reduce_bytes,
        "calls_per_step": halo_calls + reduce_calls,
        "halo_bytes_per_step": halo_bytes,
        "halo_calls_per_step": halo_calls,
        "reduce_bytes_per_step": reduce_bytes,
        "reduce_calls_per_step": reduce_calls,
        "step_level_bytes": chunk.per_trip_bytes(),
        "inner": by_loop,
    }


def ca_compute_inflation(case, n_dev: int, trips: Dict[str, float]) -> float:
    """Analytic redundant-compute factor of the communication-avoiding
    halo schedule (VERDICT r4 #7, honesty term): a k-sweep block updates
    `rows + 2(H - d)` rows per sweep instead of `rows` (H = 2k + extra,
    spmd_step.ca_sweep_solve), so per-rank compute exceeds
    single-chip/n_dev by this factor. It is the price paid for ~10x
    fewer collectives; `predict_scaling(compute_inflation=...)` charges
    it against the compute term so the predicted win is auditable.

    Weighted across the momentum and pressure work using the measured
    sweep counts in `trips` and a 2:1 momentum:pressure per-row sweep
    cost (QUICK's 9-point convection + fluxes vs the 5-point Laplacian;
    XLA's cost model puts the ratio at ~2.2 at 400^2, bench.py
    `_sweep_costs`). Multigrid pressure weights each sharded level's
    smoothing by its point count and charges the replicated coarse tail
    at full (n_dev x) cost; restriction/prolongation matmuls (exact,
    not redundant) are not inflated - they are a small fraction of a
    cycle's work."""
    from .spmd_step import sweep_blocks

    st = case.settings
    nx, ny = case.mesh.nx, case.mesh.ny
    rows = nx // n_dev

    def block_factor(check_every: int, rows_band: int, d: int,
                     extra: int) -> float:
        k_max = max(1, (rows_band - extra) // 2)
        blocks = sweep_blocks(check_every, k_max)
        ext_rows = sum(
            kb * (rows_band + 2 * (2 * kb + extra) - 2 * d)
            for kb in blocks
        )
        return ext_rows / (check_every * rows_band)

    d_m, extra_m = (2, 1) if st.scheme == "QUICK" else (1, 0)
    infl_m = block_factor(st.momentum_check_every, rows, d_m, extra_m)
    w_m = 2.0 * (trips.get("u", 0.0) + trips.get("v", 0.0))

    if st.pressure_solver == "multigrid":
        from .spmd_mg import plan_spmd_mg

        plan = plan_spmd_mg(nx, ny, case.mesh.dx, case.mesh.dy,
                            case.mesh.volp, n_dev,
                            np.dtype(st.dtype), min_size=st.mg_min_size)
        n_smooth = st.mg_n_pre + st.mg_n_post
        w_p, acc = 0.0, 0.0
        for lvl, (nxl, nyl) in enumerate(plan.sizes):
            w = n_smooth * nxl * nyl * trips.get("p", 0.0)
            if lvl < plan.n_shard:
                rows_l = nxl // n_dev
                # pre-smoother carries extra=1..2 for the residual
                # by-product; charge the deeper (extra=2) bound
                f = block_factor(max(st.mg_n_pre, 1), rows_l, 1, 2)
            else:
                f = float(n_dev)  # replicated tail: full work per rank
            w_p += w
            acc += w * f
        infl_p_weighted = acc / max(w_p, 1e-30)
    else:
        infl_p_weighted = block_factor(st.pressure_check_every, rows, 1, 0)
        w_p = trips.get("p", 0.0)

    total_w = w_m + w_p
    if total_w <= 0:
        return 1.0
    return (w_m * infl_m + w_p * infl_p_weighted) / total_w


class IciParams(NamedTuple):
    """ICI link model. Defaults: TPU v5e - 400 Gbps per link per
    direction (public spec: 1,600 Gbps total over 4 links) = 5e10 B/s
    one-way, ~1 us per-hop collective latency (public TPU system
    papers' order of magnitude). Parameters, not measurements: this
    environment has one chip - recalibrate here on a real mesh."""

    link_bytes_per_s: float = 5.0e10
    hop_latency_s: float = 1.0e-6


def predict_scaling(
    single_chip_ms_per_step: float,
    traffic: Dict[str, float],
    n_devices: int,
    params: IciParams = IciParams(),
    parallel_fraction: float = 1.0,
    compute_inflation: float = 1.0,
) -> Dict[str, float]:
    """Predicted multi-chip step time: Amdahl compute + ICI comm.

    Two collective cost models, keyed on the census split:

    * halo (`ppermute`): the 1-D ring decomposition sends each rank's
      low/high halos on DISTINCT links concurrently, so the bandwidth
      term is the one-direction payload (bytes/2) over one link, and
      each exchange is one neighbor hop of latency.
    * reductions (`psum`/`pmax`/`all_gather`/`reduce_scatter`/...): a
      ring allreduce over N devices moves ~2(N-1)/N x the local payload
      per rank over the wire and takes ~2(N-1) dependent hops, so BOTH
      terms grow with the device count (an earlier revision charged one
      hop and local bytes, which grew optimistic with N).

    Comm does not overlap compute (the sweeps are data-dependent on the
    halos), so the terms add - this is the PESSIMISTIC bound; XLA may
    overlap the step-level collectives. `parallel_fraction` discounts
    any per-step work that does not decompose (1.0 for the SIMPLE step:
    every stage shards). `compute_inflation` charges the communication-
    avoiding schedule's redundant halo-row recompute against the
    decomposed compute term (`ca_compute_inflation`)."""
    compute_s = single_chip_ms_per_step / 1e3 * (
        (1 - parallel_fraction)
        + parallel_fraction * compute_inflation / n_devices
    )
    halo_b = traffic.get("halo_bytes_per_step", traffic["bytes_per_step"])
    halo_c = traffic.get("halo_calls_per_step", traffic["calls_per_step"])
    red_b = traffic.get("reduce_bytes_per_step", 0.0)
    red_c = traffic.get("reduce_calls_per_step", 0.0)
    ring_wire = 2.0 * (n_devices - 1) / n_devices  # allreduce wire factor
    ring_hops = 2.0 * (n_devices - 1)
    bw_s = (halo_b / 2.0 + red_b * ring_wire) / params.link_bytes_per_s
    lat_s = (halo_c + red_c * ring_hops) * params.hop_latency_s
    total_s = compute_s + bw_s + lat_s
    ideal_s = single_chip_ms_per_step / 1e3 / n_devices
    return {
        "n_devices": n_devices,
        "predicted_ms_per_step": total_s * 1e3,
        "compute_ms": compute_s * 1e3,
        "ici_bandwidth_ms": bw_s * 1e3,
        "ici_latency_ms": lat_s * 1e3,
        "speedup_vs_single": single_chip_ms_per_step / (total_s * 1e3),
        "parallel_efficiency": ideal_s / total_s,
    }
