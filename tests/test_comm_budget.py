"""Collective-traffic census + ICI budget (`parallel/comm_budget.py`).

The census is checked against hand-counted collectives of a toy
shard_map program (payloads, scan folding, while nesting) and against
the analytically-known halo sizes of the SPMD SIMPLE step: QUICK
momentum exchanges 2-row halos, pressure 1-row, each sweep refreshes
both red and black phases in both directions (4 ppermutes/sweep)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from sr_for_cfd_tpu.parallel.comm_budget import (
    IciParams,
    census_collectives,
    effective_momentum_cadence,
    measured_inner_trips,
    predict_scaling,
    spmd_chunk_census,
    step_traffic,
)
from sr_for_cfd_tpu.solver.cases import make_cavity_solver

N_DEV = 4


def _mesh():
    return Mesh(np.array(jax.devices()[:N_DEV]), ("x",))


def test_census_toy_program():
    """Hand-counted collectives of a toy shard_map fn."""
    mesh = _mesh()

    def fn(x):  # x: (8, 16) f32 sharded to (2, 16) per rank
        fwd = [(i, (i + 1) % N_DEV) for i in range(N_DEV)]
        top = jax.lax.ppermute(x[-1:], "x", fwd)  # (1,16) f32 = 64 B
        s = jax.lax.psum(jnp.sum(x), "x")  # 4 B scalar

        def body(_, c):
            return c + jax.lax.psum(jnp.max(x), "x")  # 4 B, folded x3

        s = s + jax.lax.fori_loop(0, 3, body, 0.0)
        return x + top.sum() + s

    wrapped = jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=P("x"), out_specs=P("x"))
    )
    top = census_collectives(wrapped, jnp.zeros((8, 16), jnp.float32))
    got = {(s.name.split("_")[0], s.payload_bytes): s.calls
           for s in top.sites}
    assert got[("ppermute", 64)] == 1
    # the scalar psums: 1 direct + 3 scan-folded (fori with static
    # bounds lowers to scan) = 4 calls of 4 bytes
    psum_calls = sum(c for (n, b), c in got.items()
                     if n == "psum" and b == 4)
    assert psum_calls == 4
    assert top.loops == ()  # no unknown-trip while loops


def test_census_while_loop_nesting():
    """A data-dependent while becomes a nested unknown-trip loop whose
    cond + body collectives both count per trip."""
    mesh = _mesh()

    def fn(x):
        def cond(c):
            return jax.lax.psum(jnp.sum(c), "x") < 10.0  # 4 B per trip

        def body(c):
            return c + jax.lax.pmax(jnp.max(c), "x")  # 4 B per trip

        return jax.lax.while_loop(cond, body, x)

    wrapped = jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=P("x"), out_specs=P("x"))
    )
    top = census_collectives(wrapped, jnp.ones((8,), jnp.float32))
    assert top.sites == ()
    assert len(top.loops) == 1
    loop = top.loops[0]
    assert loop.per_trip_bytes() == 8  # psum(4) in cond + pmax(4) in body
    assert loop.per_trip_calls() == 2


@pytest.fixture(scope="module")
def small_case():
    return make_cavity_solver(nx=40, ny=40, Re=100).case


@pytest.fixture(scope="module")
def small_chunk(small_case):
    return spmd_chunk_census(small_case, _mesh())


def test_spmd_census_matches_analytic_halos(small_case, small_chunk):
    """The SPMD chunk's halo payloads match the stencil analysis: QUICK
    momentum halos are 2 rows of (ny+2) f32, pressure halos 1 row; each
    sweep refreshes halos for both red-black phases in both directions
    (4 ppermutes); a pressure loop trip batches check_every sweeps."""
    st = small_case.settings
    row = (small_case.mesh.ny + 2) * 4  # one f32 ghost-inclusive row
    assert len(small_chunk.loops) == 3  # u, v, p in program order

    for loop in small_chunk.loops[:2]:  # momentum: QUICK -> 2-row halos
        halos = {s: c for (s, c) in
                 [((x.name, x.payload_bytes), x.calls) for x in loop.sites]}
        assert halos[("ppermute", 2 * row)] == 4 * st.momentum_check_every

    p_loop = small_chunk.loops[2]
    halos = {(s.name, s.payload_bytes): s.calls for s in p_loop.sites}
    assert halos[("ppermute", row)] == 4 * st.pressure_check_every
    # no unknown-trip loops hide inside the inner solves
    assert all(not lp.loops for lp in small_chunk.loops)


def test_step_traffic_cadence_conversion(small_case, small_chunk):
    """step_traffic divides measured SWEEP counts by the check cadence
    (a census trip batches check_every sweeps)."""
    st = small_case.settings
    sweeps = {"u": 3.0, "v": 2.0, "p": 8.0 * st.pressure_check_every}
    t = step_traffic(small_chunk, sweeps, small_case)
    assert t["inner"]["p"]["trips"] == 8.0
    assert t["inner"]["u"]["trips"] == 3.0 / st.momentum_check_every
    expect_p = small_chunk.loops[2].per_trip_bytes() * 8.0
    assert t["inner"]["p"]["bytes"] == pytest.approx(expect_p)
    total = (small_chunk.per_trip_bytes()
             + sum(v["bytes"] for v in t["inner"].values()))
    assert t["bytes_per_step"] == pytest.approx(total)


def test_budget_end_to_end_with_measured_trips(small_case, small_chunk):
    """Full pipeline: measured counts -> traffic -> scaling prediction.
    Sanity bounds only (counts are flow-dependent): all terms positive,
    efficiency in (0, 1], latency dominates bandwidth at this tiny
    40x40 size (rows are 168 B - the model must expose that a small
    grid does NOT scale over ICI)."""
    trips = measured_inner_trips(small_case, n_steps=3)
    assert trips["p"] > 0
    t = step_traffic(small_chunk, trips, small_case)
    pred = predict_scaling(0.27, t, 4, IciParams())
    assert 0 < pred["parallel_efficiency"] <= 1.0
    assert pred["ici_latency_ms"] > pred["ici_bandwidth_ms"]
    assert pred["predicted_ms_per_step"] == pytest.approx(
        pred["compute_ms"] + pred["ici_bandwidth_ms"]
        + pred["ici_latency_ms"]
    )


def test_cond_branches_merge_per_site_max():
    """cond branches merge at the PER-SITE max: a branch with more calls
    and a branch with more bytes must BOTH bound the census (ADVICE r3:
    picking the worst branch by bytes alone under-counted the latency
    floor)."""
    mesh = _mesh()

    def fn(x):
        def many_small(y):  # 3 scalar psums = 12 B, 3 calls
            for _ in range(3):
                y = y + jax.lax.psum(jnp.sum(y), "x")
            return y

        def one_big(y):  # 1 row ppermute = 64 B, 1 call
            fwd = [(i, (i + 1) % N_DEV) for i in range(N_DEV)]
            return y + jax.lax.ppermute(y[:1], "x", fwd).sum()

        return jax.lax.cond(jnp.sum(x) > 0, one_big, many_small, x)

    wrapped = jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=P("x"), out_specs=P("x"))
    )
    top = census_collectives(wrapped, jnp.ones((8, 16), jnp.float32))
    assert top.per_trip_calls() >= 4  # 3 psums AND the ppermute
    kinds = top.per_trip_by_kind()
    assert kinds["halo"][0] >= 64 and kinds["reduce"][0] >= 12


def test_traffic_split_and_ring_scaling(small_case, small_chunk):
    """Halo vs reduction split: reductions pay ring wire-bytes and hops
    that GROW with the device count (ADVICE r3 medium), so a reduction-
    heavy program's comm time must not shrink as devices are added."""
    trips = {"u": 3.0, "v": 3.0, "p": 50.0}
    t = step_traffic(small_chunk, trips, small_case)
    assert t["bytes_per_step"] == pytest.approx(
        t["halo_bytes_per_step"] + t["reduce_bytes_per_step"])
    assert t["halo_bytes_per_step"] > 0  # ppermute halos exist
    assert t["reduce_bytes_per_step"] > 0  # residual psums exist
    p2 = predict_scaling(0.27, t, 2)
    p8 = predict_scaling(0.27, t, 8)
    # ring hops grow ~2(N-1): the latency term must grow with N
    assert p8["ici_latency_ms"] > p2["ici_latency_ms"]
    # and the reduction wire factor 2(N-1)/N grows from 1.0 toward 2.0
    assert p8["ici_bandwidth_ms"] > p2["ici_bandwidth_ms"]


def test_effective_momentum_cadence():
    """The tiled Pallas momentum path coerces the cadence to >= 3
    (solver/simple.py); the budget must divide measured sweep counts by
    the cadence the compiled program actually runs (ADVICE r3 low)."""
    plain = make_cavity_solver(nx=40, ny=40, Re=100).case
    assert (effective_momentum_cadence(plain)
            == plain.settings.momentum_check_every)
    big = make_cavity_solver(
        nx=3072, ny=3072, Re=100, use_pallas=True, dtype="float32",
        pressure_solver="multigrid",
    ).case
    assert effective_momentum_cadence(big) == max(
        3, big.settings.momentum_check_every)


def test_multigrid_mode_census(small_case):
    """Multigrid pressure: the third loop is the V-cycle while; smoothing
    scans fold statically (no unknown-trip loops hide inside) and V-cycle
    counts pass through step_traffic undivided."""
    case = make_cavity_solver(
        nx=40, ny=40, Re=100, pressure_solver="multigrid"
    ).case
    chunk = spmd_chunk_census(case, _mesh())
    assert len(chunk.loops) == 3
    assert all(not lp.loops for lp in chunk.loops)
    # V-cycle trips: per-trip traffic dwarfs one sweeps-mode trip (a
    # whole cycle of smoothing halos + level hand-offs)
    assert (chunk.loops[2].per_trip_bytes()
            > spmd_chunk_census(small_case, _mesh())
            .loops[2].per_trip_bytes())
    t = step_traffic(chunk, {"u": 1.0, "v": 1.0, "p": 5.0}, case)
    assert t["inner"]["p"]["trips"] == 5.0
