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

GRIDS = (512, 768, 1024, 2048, 4096)
# 200-iteration single-dispatch chunks amortize the ~25 ms relay round
# trip (<3% at 1024^2; see bench.py)
ITERS = int(os.environ.get("SCALE_ITERS", 200))


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
    elif mode == "streamed_mg":
        # slab-streamed Pallas V-cycle (ops/pallas_stream.py); the auto
        # threshold picks it past the VMEM wall, force below it so the
        # whole curve is measured
        kw["pressure_solver"] = "multigrid"
        kw["use_pallas"] = True
        kw["mg_slab_rows"] = 256
    elif mode == "mg_pallas":
        # VMEM-RESIDENT whole-V-cycle kernel (ops/pallas_mg.py): the
        # best-Pallas option between the fused-step wall (~900^2) and
        # the streamed auto-threshold (~1160^2)
        kw["pressure_solver"] = "multigrid"
        kw["use_pallas"] = True
    elif mode == "fused_mg":
        kw["pressure_solver"] = "multigrid"
        kw["fused_step"] = True
    elif mode == "tiled":
        kw["pressure_solver"] = "tiled"
        kw["pressure_sor"] = 1.9
    else:
        kw["fused_step"] = True
        kw["pressure_sor"] = 1.9
    import jax.numpy as jnp

    solver = make_cavity_solver(**kw)
    state = solver._chunk_fn(solver.state, solver.profile)
    float(jnp.sum(state.u))  # true sync (block_until_ready can return early)
    best = float("inf")
    for rep in range(2):
        fresh = init_state(solver.case)
        fresh = fresh._replace(u=fresh.u.at[n // 2, n // 2].add(1e-7 * (rep + 1)))
        float(jnp.sum(fresh.u))
        t0 = time.time()
        state = solver._chunk_fn(fresh, solver.profile)
        float(jnp.sum(state.u))
        el = time.time() - t0
        if int(state.count) == ITERS:
            best = min(best, el / ITERS)
    return best * 1e3


def main():
    # SCALE_MODES / SCALE_GRIDS: comma-separated filters for partial
    # reruns; filtered runs MERGE into the existing json instead of
    # overwriting the other entries
    only_modes = os.environ.get("SCALE_MODES")
    only_modes = only_modes.split(",") if only_modes else None
    only_grids = os.environ.get("SCALE_GRIDS")
    grids = ([int(g) for g in only_grids.split(",")] if only_grids
             else GRIDS)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "scaling_bench.json")
    results = {}
    if (only_modes or only_grids) and os.path.exists(out):
        with open(out) as f:
            results = json.load(f)
    for n in grids:
        row = results.get(f"{n}x{n}", {})
        for m, key in (("multigrid", "multigrid_ms_per_step"),
                       ("mg_pallas", "mg_pallas_ms_per_step"),
                       ("streamed_mg", "streamed_mg_ms_per_step"),
                       ("tiled", "tiled_sweeps_ms_per_step"),
                       ("fused", "fused_ms_per_step"),
                       ("fused_mg", "fused_mg_ms_per_step")):
            if only_modes and m not in only_modes:
                continue
            row.pop(key.replace("ms_per_step", "note"), None)
            try:
                row[key] = round(time_case(n, m), 3)
            except Exception as e:  # VMEM ceiling / Mosaic limits: record
                row[key] = None
                row[key.replace("ms_per_step", "note")] = str(e).split(". ")[0][:200]
        results[f"{n}x{n}"] = row
        print(f"{n}x{n}: {json.dumps(row)}", flush=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
