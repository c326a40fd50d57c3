"""Command-line interface.

The reference has no CLI - configuration lives in `__main__` "user control
panel" blocks (`bfs_ml_accelerated.py:1702-1766`, SURVEY.md section 5.6).
This exposes the same experiments as subcommands with the reference's
defaults:

  srcfd cavity  - lid-driven cavity solve (single/double lid)
  srcfd bfs     - backward-facing step solve
  srcfd hybrid  - coarse -> SR -> warm-started fine vs normal (the product)
  srcfd sweep   - Re x mesh data-generation sweep -> HDF5
  srcfd train   - SR autoencoder training from sweep HDF5
  srcfd bench   - solver throughput benchmark
"""

from __future__ import annotations

import argparse
import json
import sys


def _solver_args(p: argparse.ArgumentParser, dt: float, scheme: str):
    p.add_argument("--re", type=float, default=400)
    p.add_argument("--nx", type=int, default=100)
    p.add_argument("--ny", type=int, default=None)
    p.add_argument("--dt", type=float, default=dt)
    p.add_argument("--scheme", choices=["QUICK", "UPWIND"], default=scheme)
    p.add_argument("--max-iterations", type=int, default=100000)
    p.add_argument("--dtype", choices=["float32", "float64"], default="float32")
    p.add_argument("--chunk-size", type=int, default=100)
    p.add_argument("--fused", action="store_true",
                   help="fused Pallas outer-step kernel (f32, TPU); "
                        "combine with --pressure-solver multigrid for the "
                        "flagship whole-step + V-cycle kernel")
    p.add_argument("--steps-per-kernel", type=int, default=1, metavar="K",
                   help="outer iterations per fused-kernel launch "
                        "(bit-exact; amortizes launch overhead on tiny "
                        "grids; requires --fused and K | chunk-size)")
    p.add_argument("--sor", type=float, default=1.0,
                   help="pressure SOR factor (1.0 = reference semantics)")
    p.add_argument("--pressure-solver", choices=["sweeps", "multigrid"],
                   default="sweeps",
                   help="'multigrid' solves each step's pressure system to "
                        "tolerance (fastest on fine grids)")
    p.add_argument("--plateau", type=int, default=0, metavar="N",
                   help="stop when residuals plateau for N chunks "
                        "(working-precision convergence for float32)")
    p.add_argument("--use-pallas", action="store_true",
                   help="Pallas inner-solve kernels without fusing the "
                        "whole step: with --pressure-solver multigrid the "
                        "right kernel auto-dispatches by grid size "
                        "(VMEM-resident V-cycle, then slab-streamed "
                        "V-cycle + tiled momentum past ~1160^2)")
    p.add_argument("--rre", type=int, default=0, metavar="W",
                   help="reduced-rank extrapolation: snapshot the state "
                        "every W iterations and jump once depth+1 "
                        "snapshots accumulate (ops/extrapolate.py; "
                        "measured 2.3x fewer iterations on the 10x10 "
                        "coarse cavity; composes with --spmd)")
    p.add_argument("--rre-depth", type=int, default=6, metavar="K",
                   help="RRE window depth (snapshots per jump = K+1)")
    p.add_argument("--spmd", type=int, default=1, metavar="N",
                   help="domain-decompose the solve over N devices "
                        "(interior rows sharded, ppermute halos - "
                        "parallel.spmd_step.SpmdSolver; nx must divide N). "
                        "For `hybrid` this decomposes the fine phases; "
                        "the coarse phase stays single-device")
    p.add_argument("--out", default=None, help="output base name / directory")
    p.add_argument("--quiet", action="store_true")


def _common_kw(args):
    return dict(
        dt=args.dt, scheme=args.scheme, max_iterations=args.max_iterations,
        dtype=args.dtype, chunk_size=args.chunk_size,
        fused_step=args.fused, pressure_sor=args.sor,
        pressure_solver=args.pressure_solver,
        plateau_patience=args.plateau,
        steps_per_kernel=args.steps_per_kernel,
        use_pallas=args.use_pallas,
        rre_every=args.rre, rre_depth=args.rre_depth,
    )


def _run_spmd(args, make_solver, out):
    """Domain-decomposed solve over --spmd devices + the full artifact
    suite (same outputs as the single-device path)."""
    import time

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from .parallel.spmd_step import SpmdSolver

    devs = jax.devices()
    if len(devs) < args.spmd:
        raise SystemExit(
            f"--spmd {args.spmd} needs {args.spmd} devices; backend has "
            f"{len(devs)} (set XLA_FLAGS="
            "--xla_force_host_platform_device_count=N for a virtual mesh)"
        )
    kw = _common_kw(args)
    kw["spmd_devices"] = args.spmd
    ny = args.ny or args.nx
    case = make_solver(Re=args.re, nx=args.nx, ny=ny, **kw).case
    solver = SpmdSolver(case, Mesh(np.array(devs[:args.spmd]), ("x",)))
    t0 = time.time()
    local = solver.solve()
    secs = time.time() - t0
    solver.save_results(out)
    print(f"Converged in {int(local.count)} iterations ({secs:.2f} "
          f"seconds) on {args.spmd} devices")


def cmd_cavity(args):
    from .solver.cases import create_lid_driven_cavity, make_cavity_solver

    ny = args.ny or args.nx
    out = args.out or f"cavity_Re{int(args.re)}"
    if args.spmd > 1:
        from functools import partial

        _run_spmd(args, partial(make_cavity_solver,
                                double_lid=args.double_lid), out)
        return
    solver, iters, secs = create_lid_driven_cavity(
        Re=args.re, nx=args.nx, ny=ny, output_name=out,
        double_lid=args.double_lid, verbose=not args.quiet,
        **_common_kw(args),
    )
    print(f"Converged in {iters} iterations ({secs:.2f} seconds)")


def cmd_bfs(args):
    from .solver.cases import create_bfs_case, make_bfs_solver

    ny = args.ny or args.nx
    out = args.out or f"bfs_Re{int(args.re)}"
    if args.spmd > 1:
        _run_spmd(args, make_bfs_solver, out)
        return
    solver, iters, secs = create_bfs_case(
        Re=args.re, nx=args.nx, ny=ny, output_name=out,
        verbose=not args.quiet, **_common_kw(args),
    )
    print(f"Converged in {iters} iterations ({secs:.2f} seconds)")


def cmd_hybrid(args):
    from .workflow.hybrid import run_hybrid_experiment

    kw = dict(
        dt=args.dt, scheme=args.scheme, dtype=args.dtype,
        fused_step=args.fused, pressure_sor=args.sor,
        pressure_solver=args.pressure_solver,
        steps_per_kernel=args.steps_per_kernel,
        use_pallas=args.use_pallas,
    )
    if args.spmd > 1:
        # decompose the FINE phases over N devices (the coarse phase is
        # pinned single-device by run_hybrid_experiment)
        kw["spmd_devices"] = args.spmd
    if args.rre:
        # RRE on the COARSE phase's long pseudo-time march (whole-budget
        # single-dispatch chunk, so the cycle always fits)
        kw["coarse_overrides"] = {
            "rre_every": args.rre, "rre_depth": args.rre_depth,
        }
    if args.rre_fine:
        # RRE on BOTH fine phases (warm AND cold - honest economics: both
        # sides of the speedup ratio run the best solver; VERDICT r4 #3).
        # Cadence is separate from --rre: the 400^2 march has far slower
        # modes than the 10^2 coarse march (tune via the chunk: the
        # snapshot buffer is chunk-local, the cycle
        # rre_fine*(rre_depth+1) must fit inside one chunk)
        kw["rre_every"] = args.rre_fine
        kw["rre_depth"] = args.rre_depth
    # only forward the shared-solver defaults when the user changed them:
    # run_hybrid_experiment's coarse phase sets its own (plateau ON,
    # whole-budget single-dispatch chunk) and unconditional forwarding
    # defeated those setdefaults - the default CLI coarse phase then ran
    # its full cap in ~1000 host-synced dispatches
    if args.chunk_size != 100:
        kw["chunk_size"] = args.chunk_size
    if args.plateau:
        kw["plateau_patience"] = args.plateau
    results = run_hybrid_experiment(
        Re=args.re, lr_dim=args.lr_dim, hr_dim=args.hr_dim,
        case=args.case,
        max_iterations_coarse=args.max_iterations,
        max_iterations_ml=args.ml_iterations,
        max_iterations_normal=args.normal_iterations,
        stats_file=args.stats_file, model_file=args.model_file,
        use_aspect_ratio_correction=args.case == "bfs",
        use_adaptive_normalization=args.adaptive_norm,
        blend_factor=args.blend_factor,
        output_dir=args.out, verbose=not args.quiet,
        **kw,
    )
    results.pop("hr_fields")
    print(json.dumps(results, indent=2, default=str))


def cmd_sweep(args):
    from .workflow.sweep import generate_training_data

    path = generate_training_data(
        reynolds_numbers=args.re_list,
        mesh_sizes=args.mesh_sizes,
        output_dir=args.out or "results",
        double_lid=args.double_lid,
        dt=args.dt, scheme=args.scheme, dtype=args.dtype,
        max_iterations=args.max_iterations,
        use_device_mesh=args.device_mesh,
        spmd_devices=args.spmd,
        verbose=not args.quiet,
    )
    print(f"Combined dataset: {path}")


def cmd_train(args):
    import numpy as np

    from .io.hdf5 import load_paired_reynolds_multi
    from .workflow import training as tr

    x_lr, x_hr, res, comps, bcs = load_paired_reynolds_multi(
        args.data, args.lr_dim, args.hr_dim
    )
    print(f"Loaded {len(x_lr)} samples "
          f"({dict(zip(*np.unique(bcs, return_counts=True)))})")
    cfg = None
    if args.test_re:
        cfg = {
            str(bc): {"train": "ALL_EXCEPT_TEST", "test": args.test_re,
                      "evaluate": args.test_re}
            for bc in np.unique(bcs)
        }
    train_mask, test_mask = tr.split_by_reynolds_config(res, bcs, cfg)
    x_lr_n, x_hr_n, stats = tr.standardize_train_test(
        x_lr, x_hr, comps, train_mask, args.lr_dim, args.hr_dim
    )
    print(f"Train {train_mask.sum()} / test {test_mask.sum()} samples")
    result = tr.train_sr_autoencoder(
        x_lr_n[train_mask], x_hr_n[train_mask], args.lr_dim, args.hr_dim,
        epochs=args.epochs, batch_size=args.batch_size, verbose=not args.quiet,
    )
    print(f"Final loss {result.loss_history[-1]:.6f} "
          f"({result.seconds:.1f}s)")
    for re_val in args.test_re or []:
        tr.evaluate_for_re(
            re_val, result.model, result.params,
            x_lr_n[test_mask], x_hr_n[test_mask], res[test_mask],
            comps[test_mask], stats, args.lr_dim, args.hr_dim,
            plot_dir=args.out if args.plots else None,
        )
    paths = tr.export_models(
        result, stats, args.lr_dim, args.hr_dim, args.suffix,
        out_dir=args.out or ".",
    )
    print(json.dumps(paths, indent=2))


def cmd_bench(args):
    import importlib.util
    import os

    # bench.py lives at the repo root (driver contract), outside the
    # installed package; fall back to it by path
    try:
        import bench
    except ModuleNotFoundError:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        )
        spec = importlib.util.spec_from_file_location("bench", path)
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
    bench.main()


def _plan_case(args):
    from .solver.cases import make_bfs_solver, make_cavity_solver

    kw = dict(
        Re=args.re, nx=args.nx, ny=args.ny or args.nx, dt=args.dt,
        scheme=args.scheme, dtype=args.dtype,
        pressure_solver=args.pressure_solver, use_pallas=args.use_pallas,
        fused_step=args.fused, steps_per_kernel=args.steps_per_kernel,
    )
    make = make_bfs_solver if args.case == "bfs" else make_cavity_solver
    if args.case == "bfs" and args.ny is None:
        del kw["ny"]  # BFS default ny tracks the 10x3 domain aspect
    return make(**kw).case


def _plan_argv(args, ms: float) -> list:
    """Canonical `plan` argv for the virtual-mesh census subprocess."""
    argv = [
        "plan", "--case", args.case, "--re", str(args.re),
        "--nx", str(args.nx), "--dt", str(args.dt),
        "--scheme", args.scheme, "--dtype", args.dtype,
        "--pressure-solver", args.pressure_solver,
        "--ms-per-step", repr(ms),
        "--trip-window", str(args.trip_window),
        "--devices", *[str(d) for d in args.devices],
        "--no-subprocess",
    ]
    if args.ny is not None:
        argv += ["--ny", str(args.ny)]
    if args.use_pallas:
        argv.append("--use-pallas")
    if args.fused:
        argv.append("--fused")
    if args.steps_per_kernel != 1:
        argv += ["--steps-per-kernel", str(args.steps_per_kernel)]
    if args.json:
        argv += ["--json", args.json]
    return argv


def cmd_plan(args):
    """Decomposition planner (parallel/planner.py): census + ICI model
    -> recommended --spmd device count. When the backend has fewer
    devices than the largest candidate (the usual single-TPU-host
    situation), the single-chip ms/step is measured HERE on the real
    backend and the census leg re-runs in a subprocess on a virtual CPU
    mesh - the census is trace-only, so virtual devices are exact."""
    import os
    import subprocess

    import jax

    if os.environ.get("SRCFD_PLAN_FORCE_CPU"):
        # the census-leg subprocess: a sitecustomize hook may have
        # registered a TPU plugin and set jax_platforms at import time,
        # so an env var alone cannot force CPU - the config update can
        # (it must run before the first device query)
        jax.config.update("jax_platforms", "cpu")

    from .parallel import planner

    case = _plan_case(args)
    need = max(args.devices)
    if len(jax.devices()) < need and not args.no_subprocess:
        ms = args.ms_per_step
        if ms is None:
            ms = planner.measure_single_chip_ms(case)
            print(f"measured single-chip {ms:.3f} ms/step on "
                  f"{jax.default_backend()}", flush=True)
        env = dict(os.environ)
        env["SRCFD_PLAN_FORCE_CPU"] = "1"  # config-update in the child;
        # JAX_PLATFORMS alone is overridden by TPU-plugin sitecustomize
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={need}"
        ).strip()
        raise SystemExit(subprocess.call(
            [sys.executable, "-m", "sr_for_cfd_tpu.cli",
             *_plan_argv(args, ms)],
            env=env,
        ))
    plan = planner.plan_case(
        case, ms_single=args.ms_per_step, device_counts=args.devices,
        trip_window=args.trip_window,
    )
    print(planner.format_plan(plan))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(plan, f, indent=1)
        print(f"wrote {args.json}")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="srcfd",
        description="TPU-native ML-accelerated steady-state CFD "
                    "(SR-for-CFD capabilities, JAX/Pallas).",
    )
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("cavity", help="lid-driven cavity solve")
    _solver_args(p, dt=1e-3, scheme="QUICK")
    p.add_argument("--double-lid", action="store_true")
    p.set_defaults(fn=cmd_cavity, re=100)

    p = sub.add_parser("bfs", help="backward-facing step solve")
    _solver_args(p, dt=2e-3, scheme="UPWIND")
    p.set_defaults(fn=cmd_bfs)

    p = sub.add_parser("hybrid", help="ML-accelerated hybrid experiment")
    # dt/scheme default to None -> run_hybrid_experiment picks the
    # per-case reference defaults (bfs: UPWIND @ 2e-3; cavity: QUICK @ 1e-3)
    _solver_args(p, dt=None, scheme=None)
    p.add_argument("--case", choices=["cavity", "double_lid", "bfs"],
                   default="cavity")
    p.add_argument("--lr-dim", type=int, default=10)
    p.add_argument("--hr-dim", type=int, default=400)
    p.add_argument("--rre-fine", type=int, default=0, metavar="W",
                   help="reduced-rank extrapolation on BOTH fine phases "
                        "(warm and cold) at snapshot cadence W; --rre "
                        "covers the coarse phase, --rre-depth is shared")
    p.add_argument("--ml-iterations", type=int, default=200)
    p.add_argument("--normal-iterations", type=int, default=100000)
    p.add_argument("--stats-file", default=None)
    p.add_argument("--model-file", default=None)
    p.add_argument("--adaptive-norm", action="store_true")
    p.add_argument("--blend-factor", type=float, default=0.3)
    p.set_defaults(fn=cmd_hybrid, re=1000)

    p = sub.add_parser("sweep", help="data-generation sweep -> HDF5")
    p.add_argument("--re-list", type=float, nargs="+",
                   default=list(range(100, 801, 100)))
    p.add_argument("--mesh-sizes", type=int, nargs="+", default=[10, 50, 400])
    p.add_argument("--double-lid", action="store_true", default=True)
    p.add_argument("--single-lid", dest="double_lid", action="store_false")
    p.add_argument("--dt", type=float, default=1e-3)
    p.add_argument("--scheme", default="QUICK")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--max-iterations", type=int, default=100000)
    p.add_argument("--device-mesh", action="store_true",
                   help="shard cases across the device mesh")
    p.add_argument("--spmd", type=int, default=1, metavar="M",
                   help="decompose EACH case's grid over M devices while "
                        "cases shard over the rest (2-D case-x-grid mesh, "
                        "parallel/spmd_batch.py); sizes not divisible by "
                        "M fall back to case-parallel")
    p.add_argument("--out", default="results")
    p.add_argument("--quiet", action="store_true")
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser("train", help="train the SR autoencoder")
    p.add_argument("data", nargs="+", help="sweep HDF5 file(s)")
    p.add_argument("--lr-dim", type=int, default=10)
    p.add_argument("--hr-dim", type=int, default=400)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--test-re", type=float, nargs="*", default=[800])
    p.add_argument("--suffix", default="swish_tpu")
    p.add_argument("--plots", action="store_true")
    p.add_argument("--out", default="models")
    p.add_argument("--quiet", action="store_true")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("bench", help="solver throughput benchmark")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser(
        "plan",
        help="decomposition planner: recommended --spmd device count "
             "from the collective census + ICI model (no multi-chip "
             "hardware needed)",
    )
    p.add_argument("--case", choices=["cavity", "bfs"], default="cavity")
    p.add_argument("--re", type=float, default=1000)
    p.add_argument("--nx", type=int, default=400)
    p.add_argument("--ny", type=int, default=None)
    p.add_argument("--dt", type=float, default=1e-3)
    p.add_argument("--scheme", choices=["QUICK", "UPWIND"], default="QUICK")
    p.add_argument("--dtype", choices=["float32", "float64"],
                   default="float32")
    p.add_argument("--pressure-solver", choices=["sweeps", "multigrid"],
                   default="multigrid")
    p.add_argument("--use-pallas", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="measure the single-chip baseline with the fused "
                        "whole-step kernel (the honest best single-chip "
                        "config; the decomposed path runs per-shard "
                        "kernels instead)")
    p.add_argument("--steps-per-kernel", type=int, default=1)
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8],
                   help="candidate device counts")
    p.add_argument("--ms-per-step", type=float, default=None,
                   help="single-chip ms/step (default: measure live)")
    p.add_argument("--trip-window", type=int, default=6,
                   help="steps to measure inner-loop trip counts over")
    p.add_argument("--json", default=None, help="write the plan as JSON")
    p.add_argument("--no-subprocess", action="store_true",
                   help="fail infeasible rows instead of re-running the "
                        "census on a virtual CPU mesh")
    p.set_defaults(fn=cmd_plan)
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
