"""Grid-size scaling benchmark: ms per SIMPLE outer step at 512^2 ..
2048^2, multigrid (HBM-streamed jnp, any size) vs the fused VMEM-resident
Pallas step (fits up to ~900^2) - the record VERDICT r1 next-step #5 asks
for. Writes docs/scaling_bench.json.

Run on the real TPU: `python scripts/scaling_bench.py`.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRIDS = (512, 768, 1024, 2048)
ITERS = int(os.environ.get("SCALE_ITERS", 50))


def time_case(n, mode):
    import jax

    from sr_for_cfd_tpu.solver.cases import make_cavity_solver
    from sr_for_cfd_tpu.solver.state import init_state

    kw = dict(
        Re=1000.0, nx=n, ny=n, dt=1e-3, scheme="QUICK", dtype="float32",
        max_iterations=ITERS, chunk_size=ITERS,
    )
    if mode == "multigrid":
        kw["pressure_solver"] = "multigrid"
    elif mode == "tiled":
        kw["pressure_solver"] = "tiled"
        kw["pressure_sor"] = 1.9
    else:
        kw["fused_step"] = True
        kw["pressure_sor"] = 1.9
    solver = make_cavity_solver(**kw)
    state = solver._chunk_fn(solver.state, solver.profile)
    jax.block_until_ready(state)
    best = float("inf")
    for rep in range(2):
        fresh = init_state(solver.case)
        fresh = fresh._replace(u=fresh.u.at[n // 2, n // 2].add(1e-7 * (rep + 1)))
        jax.block_until_ready(fresh)
        t0 = time.time()
        state = solver._chunk_fn(fresh, solver.profile)
        jax.block_until_ready(state)
        el = time.time() - t0
        if int(state.count) == ITERS:
            best = min(best, el / ITERS)
    return best * 1e3


def main():
    results = {}
    for n in GRIDS:
        row = {}
        row["multigrid_ms_per_step"] = round(time_case(n, "multigrid"), 3)
        row["tiled_sweeps_ms_per_step"] = round(time_case(n, "tiled"), 3)
        try:
            row["fused_ms_per_step"] = round(time_case(n, "fused"), 3)
        except ValueError as e:  # VMEM ceiling (config-time validation)
            row["fused_ms_per_step"] = None
            row["fused_note"] = str(e).split(". ")[0]
        results[f"{n}x{n}"] = row
        print(f"{n}x{n}: {json.dumps(row)}", flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "scaling_bench.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
