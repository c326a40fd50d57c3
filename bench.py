"""Headline benchmark: SIMPLE outer iterations/sec on the reference's
data-generation workhorse config (lid-driven cavity, 400x400, Re=1050,
QUICK, dt=1e-3).

Baseline (BASELINE.md): the reference solves this case in 84,347 outer
iterations / 3,567.5 s on Kaggle CPU with Numba prange threads =
23.64 outer-iterations/sec. We time the same case cold-started on one TPU
chip for a fixed iteration budget (cold start covers the expensive
many-inner-sweep phase, so this is conservative vs the reference's
full-trajectory average).

Default mode: multigrid pressure solver - solves each outer step's
pressure system to the full 1e-6 tolerance (the reference's capped point
iteration exits at ~5e-4 on this grid) and is the fastest configuration.
BENCH_MODE=parity uses the fused Pallas kernel with the reference's exact
inner-loop semantics (1e-6/1000-sweep capped red-black).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

BASELINE_ITERS_PER_SEC = 84347 / 3567.5  # 23.64, reference CPU

NX = NY = 400
RE = 1050.0
DT = 1e-3
BENCH_ITERS = int(os.environ.get("BENCH_ITERS", 200))
WARMUP_ITERS = 10


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax

    from sr_for_cfd_tpu.solver.cases import make_cavity_solver

    mode = os.environ.get("BENCH_MODE", "multigrid")
    on_tpu = jax.default_backend() == "tpu"

    def build(n_iters):
        kw = dict(
            Re=RE, nx=NX, ny=NY, dt=DT, scheme="QUICK", dtype="float32",
            max_iterations=n_iters, chunk_size=n_iters,
        )
        if mode == "multigrid":
            kw["pressure_solver"] = "multigrid"
        else:  # parity: fused Pallas kernel, reference inner semantics
            kw["fused_step"] = on_tpu
        return make_cavity_solver(**kw)

    from sr_for_cfd_tpu.solver.state import init_state

    # warmup: compile + one full chunk execution on the same executable
    solver = build(BENCH_ITERS)
    state = solver._chunk_fn(solver.state, solver.profile)
    jax.block_until_ready(state)

    # timed runs: fresh states through the already-compiled chunk, each
    # perturbed so the remote runtime's (executable, inputs) result cache
    # cannot short-circuit the execution; report the best of 3
    best = float("inf")
    for rep in range(3):
        fresh = init_state(solver.case)
        fresh = fresh._replace(
            u=fresh.u.at[NX // 2, NY // 2].add(1e-7 * (rep + 1))
        )
        jax.block_until_ready(fresh)
        t0 = time.time()
        state = solver._chunk_fn(fresh, solver.profile)
        jax.block_until_ready(state)
        elapsed = time.time() - t0
        iters = int(state.count)
        if iters == BENCH_ITERS and elapsed / iters > 1e-5:
            best = min(best, elapsed / iters)
    value = 1.0 / best

    print(json.dumps({
        "metric": "cavity_400x400_Re1050_QUICK_outer_iterations_per_sec",
        "value": round(value, 2),
        "unit": "iterations/sec",
        "vs_baseline": round(value / BASELINE_ITERS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
