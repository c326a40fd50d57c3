"""Generate the committed held-out BFS evaluation fixture
(data/bfs_eval_Re400.h5): the Re=400 coarse (10x10 and 20x20, 30k-budget
fused solves) and fine (400x400, 100k-budget multigrid) fields, produced
with EXACTLY the solver settings `scripts/train_bfs_sr.py` used for its
held-out pair - so the shipped BFS SR checkpoints can be re-evaluated by
the test suite (tests/test_artifacts.py) against the recorded
`artifacts/bfs_sr_eval_*.json` numbers without re-running the sweep.

Reference HDF5 schema (io/hdf5.py): groups Re400_mesh{10x10,20x20,
400x400} in one file; the training loader pairs them by Re.

Run on the real TPU: `python scripts/make_bfs_eval_fixture.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "data/bfs_eval_Re400.h5"
RE = 400.0


def solve_bfs(n, max_iterations, **kw):
    # identical settings to scripts/train_bfs_sr.py:solve_bfs
    from sr_for_cfd_tpu.workflow.hybrid import _make_solver

    solver = _make_solver("bfs", RE, n, n, 2e-3, "UPWIND", None,
                          max_iterations, None, dtype="float32", **kw)
    t0 = time.time()
    solver.solve(f"/tmp/bfs_fixture_{n}", verbose=False, save_results=False)
    print(f"  {n}x{n}: {int(solver.state.count)} iters "
          f"{time.time() - t0:.1f}s", flush=True)
    return solver


def main():
    from sr_for_cfd_tpu.io.hdf5 import save_fields_hdf5

    solvers = {}
    for n in (10, 20):
        solvers[n] = solve_bfs(n, 30000, chunk_size=30000,
                               pressure_sor=1.5, plateau_patience=5,
                               fused_step=True, inner_max_iter=64,
                               steps_per_kernel=500)
    solvers[400] = solve_bfs(400, 100000, chunk_size=10000,
                             pressure_solver="multigrid", fused_step=True)
    if os.path.exists(OUT):
        os.remove(OUT)
    for n, solver in solvers.items():
        save_fields_hdf5(
            OUT, solver.interior_fields(), solver.mesh, RE,
            case_name="backward facing step", bc_type="bfs_parabolic_inlet",
            bfs=solver.case.bfs,
        )
    print("wrote", OUT, os.path.getsize(OUT), "bytes")


if __name__ == "__main__":
    main()
