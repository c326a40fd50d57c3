"""Hybrid ML-accelerated CFD workflow (L4 - the product).

coarse solve -> super-resolve -> warm-started fine solve, plus the
cold-start baseline and the comparison/speedup analysis. Rebuilds the
reference's workflow functions (`PyCFD_ML_accelerated.py:696-1501`, BFS
variant `bfs_ml_accelerated.py:893-1957`) on the TPU-native solver: the
coarse solve, SR upsample and fine solve all run on-device; fields cross
the host boundary only for artifact I/O.

Both cavity (lx = ly = 1) and BFS (lx=10, ly=3, parabolic inlet) cases are
served by the same functions via the `case` argument - the reference keeps
two near-identical copies.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import BoundaryConditions
from ..io.datfiles import extract_centerlines
from ..solver.cases import make_bfs_solver, make_cavity_solver
from ..solver.simple import CFDSolver
from ..sr.inference import BicubicSR, SRModel, ml_super_resolution
from ..utils.naming import (
    coarse_run_name,
    create_timestamped_output_dir,
    default_model_files,
    fine_run_name,
    fmt_re,
)
from ..viz.plots import format_bc_summary, plot_centerline_comparison


def _make_solver(
    case: str,
    Re: float,
    nx: int,
    ny: int,
    dt: float,
    scheme: str,
    convergence_criteria,
    max_iterations: int,
    bc: Optional[BoundaryConditions],
    **kw,
) -> CFDSolver:
    if case == "bfs":
        solver = make_bfs_solver(
            Re=Re, nx=nx, ny=ny, dt=dt, scheme=scheme,
            convergence_criteria=convergence_criteria,
            max_iterations=max_iterations, bc=bc, **kw,
        )
    else:
        solver = make_cavity_solver(
            Re=Re, nx=nx, ny=ny, dt=dt, scheme=scheme,
            convergence_criteria=convergence_criteria,
            max_iterations=max_iterations, bc=bc,
            double_lid=(case == "double_lid"), **kw,
        )
    # spmd_devices > 1: run this phase domain-decomposed (interior rows
    # sharded over an N-device mesh, parallel/spmd_step.py) behind the
    # same CFDSolver-shaped surface the workflow drives
    if kw.get("spmd_devices", 1) > 1:
        from ..parallel.mesh import make_mesh
        from ..parallel.spmd_step import SpmdSolver, SpmdWorkflowAdapter

        return SpmdWorkflowAdapter(SpmdSolver(
            solver.case, make_mesh(kw["spmd_devices"], "x")))
    return solver


def run_coarse_simulation(
    Re: float,
    lr_dim: int = 10,
    dt: float = 0.001,
    scheme: str = "QUICK",
    convergence_criteria: Optional[Dict[str, float]] = None,
    max_iterations: int = 100000,
    output_dir: Optional[str] = None,
    bc: Optional[BoundaryConditions] = None,
    case: str = "cavity",
    verbose: bool = True,
    save_results: bool = True,
    **kw,
) -> Tuple[Dict[str, np.ndarray], CFDSolver, int, float]:
    """Step 1: coarse lr_dim x lr_dim solve; returns the interior fields
    transposed to (ny, nx) exactly as the reference extracts them
    (`PyCFD_ML_accelerated.py:696-761`)."""
    if output_dir is None:
        output_dir = create_timestamped_output_dir()
    os.makedirs(output_dir, exist_ok=True)
    prefix = "bfs_" if case == "bfs" else ""
    output_name = coarse_run_name(output_dir, prefix, Re, lr_dim,
                                  max_iterations)
    solver = _make_solver(
        case, Re, lr_dim, lr_dim, dt, scheme, convergence_criteria,
        max_iterations, bc, **kw,
    )
    solver.precompile()  # one-time host cost, kept out of phase timings
    iterations, elapsed = solver.solve(
        output_name, verbose=verbose, save_results=save_results
    )
    return solver.interior_fields(), solver, iterations, elapsed


def generate_coarse_mesh_solution(
    Re: float, lr_dim: int = 10, output_dir: Optional[str] = None, **kw
) -> Tuple[Dict[str, np.ndarray], str]:
    """Wrapper: timestamped dir + coarse run
    (`PyCFD_ML_accelerated.py:966-1021`)."""
    if output_dir is None:
        output_dir = create_timestamped_output_dir()
    fields, _, _, _ = run_coarse_simulation(
        Re, lr_dim=lr_dim, output_dir=output_dir, **kw
    )
    return fields, output_dir


def run_fine_simulation_with_ml_init(
    Re: float,
    nx: int,
    ny: int,
    ml_initial_fields: Dict[str, np.ndarray],
    dt: float = 0.001,
    scheme: str = "QUICK",
    convergence_criteria: Optional[Dict[str, float]] = None,
    max_iterations: int = 100000,
    output_name: str = "cavity_accelerated",
    bc: Optional[BoundaryConditions] = None,
    case: str = "cavity",
    verbose: bool = True,
    save_results: bool = True,
    **kw,
) -> Tuple[CFDSolver, int, float]:
    """Step 3: fine solve warm-started from the (ny, nx) ML fields
    (`PyCFD_ML_accelerated.py:882-959`)."""
    solver = _make_solver(
        case, Re, nx, ny, dt, scheme, convergence_criteria, max_iterations,
        bc, **kw,
    )
    solver.warm_start(ml_initial_fields)
    if not output_name.endswith("_accelerated"):
        output_name = f"{output_name}_accelerated"
    # keep one-time XLA compilation out of the ML-vs-normal wall-clock
    # comparison: whichever fine phase runs first would otherwise absorb
    # the whole compile (the cold run then hits the executable cache)
    compile_s = solver.precompile()
    if verbose and compile_s > 1.0:
        print(f"  (fine-step program compiled in {compile_s:.1f}s)")
    iterations, elapsed = solver.solve(
        output_name, verbose=verbose, save_results=save_results
    )
    return solver, iterations, elapsed


def run_normal_simulation(
    Re: float,
    nx: int,
    ny: int,
    dt: float = 0.001,
    scheme: str = "QUICK",
    convergence_criteria: Optional[Dict[str, float]] = None,
    max_iterations: int = 100000,
    output_name: str = "cavity_normal",
    bc: Optional[BoundaryConditions] = None,
    case: str = "cavity",
    verbose: bool = True,
    save_results: bool = True,
    **kw,
) -> Tuple[CFDSolver, int, float]:
    """Cold-start fine solve - the comparison baseline
    (`PyCFD_ML_accelerated.py:1126-1179`)."""
    solver = _make_solver(
        case, Re, nx, ny, dt, scheme, convergence_criteria, max_iterations,
        bc, **kw,
    )
    if not output_name.endswith("_normal"):
        output_name = f"{output_name}_normal"
    solver.precompile()  # cache hit when the ML phase ran first; symmetric
    iterations, elapsed = solver.solve(
        output_name, verbose=verbose, save_results=save_results
    )
    return solver, iterations, elapsed


def run_ml_accelerated_fine_simulation(
    Re: float,
    nx: int,
    ny: int,
    coarse_fields: Dict[str, np.ndarray],
    lr_dim: int = 10,
    hr_dim: Optional[int] = None,
    stats_file: Optional[str] = None,
    encoder_file: Optional[str] = None,
    decoder_file: Optional[str] = None,
    model_file: Optional[str] = None,
    model=None,
    model_suffix: str = "swish_trained_upto_700_multiBC",
    model_dir: str = ".",
    use_aspect_ratio_correction: bool = False,
    lx: float = 1.0,
    ly: float = 1.0,
    use_adaptive_normalization: bool = False,
    blend_factor: float = 0.3,
    output_name: str = "cavity_ml",
    case: str = "cavity",
    verbose: bool = True,
    **kw,
) -> Tuple[CFDSolver, int, float, Dict[str, np.ndarray]]:
    """Step 2+3: super-resolve the coarse fields, then run the warm-started
    fine solve (`PyCFD_ML_accelerated.py:1024-1119`).

    Model resolution order: explicit `model` object > `model_file`
    (.msgpack SRModel checkpoint) > bicubic fallback. `stats_file` defaults
    to the reference naming convention; file-existence checks mirror the
    reference's (`:1079-1087`).
    """
    if hr_dim is None:
        hr_dim = max(nx, ny)
    names = default_model_files(lr_dim, hr_dim, model_suffix, model_dir)
    if stats_file is None:
        stats_file = names["stats_file"]

    if model is None:
        # the reference's conventional artifact names are real defaults:
        # vanilla_encoder{lr}_to_{hr}_{suffix}.h5 etc. found in model_dir
        # are picked up without explicit paths (PyCFD_ML_accelerated.py
        # :1069-1087 does exactly this)
        if encoder_file is None and os.path.exists(names["encoder_file"]):
            encoder_file = names["encoder_file"]
        if decoder_file is None and os.path.exists(names["decoder_file"]):
            decoder_file = names["decoder_file"]
        if model_file and os.path.exists(model_file):
            model = SRModel.from_checkpoint(model_file, lr_dim, hr_dim)
        elif (encoder_file and decoder_file
              and os.path.exists(encoder_file) and os.path.exists(decoder_file)):
            # the reference's split encoder/decoder checkpoint convention
            model = SRModel.from_parts(encoder_file, decoder_file,
                                       lr_dim, hr_dim)
        else:
            if (model_file or encoder_file) and verbose:
                print("  model checkpoint(s) not found -> bicubic fallback")
            model = BicubicSR(lr_dim, hr_dim)

    stats = None
    if not os.path.exists(stats_file):
        if isinstance(model, BicubicSR):
            # the fallback is scale-free: identity stats keep the hybrid
            # runnable before any AE is trained (the reference could not
            # run at all without its stats artifact)
            if verbose:
                print(f"  stats file not found ({stats_file}) -> identity "
                      "standardization (bicubic fallback is scale-free)")
            stats = {f"{k}{d}_{c}": float(k == "std")
                     for k in ("mean", "std") for d in (lr_dim, hr_dim)
                     for c in ("u", "v", "p")}
            stats_file = None
        else:
            # a TRAINED model without its training stats would silently
            # mis-normalize - keep the reference's hard failure
            raise FileNotFoundError(
                f"Standardization stats file not found: {stats_file}")

    hr_fields = ml_super_resolution(
        coarse_fields,
        lr_dim,
        hr_dim,
        stats=stats,
        stats_file=stats_file,
        model=model,
        use_aspect_ratio_correction=use_aspect_ratio_correction,
        lx=lx,
        ly=ly,
        use_adaptive_normalization=use_adaptive_normalization,
        blend_factor=blend_factor,
        out_shape=(ny, nx),
        verbose=verbose,
    )
    solver, iterations, elapsed = run_fine_simulation_with_ml_init(
        Re, nx, ny, hr_fields, output_name=output_name, case=case,
        verbose=verbose, **kw,
    )
    return solver, iterations, elapsed, hr_fields


def run_hybrid_experiment(
    Re: float = 1000,
    lr_dim: int = 10,
    hr_dim: int = 400,
    dt: Optional[float] = None,
    scheme: Optional[str] = None,
    case: str = "cavity",
    max_iterations_coarse: int = 100000,
    max_iterations_ml: int = 200,
    max_iterations_normal: int = 100000,
    stats_file: Optional[str] = None,
    model=None,
    model_file: Optional[str] = None,
    use_aspect_ratio_correction: bool = False,
    use_adaptive_normalization: bool = False,
    blend_factor: float = 0.3,
    bc: Optional[BoundaryConditions] = None,
    output_dir: Optional[str] = None,
    verbose: bool = True,
    save_results: bool = True,
    coarse_overrides: Optional[Dict] = None,
    **kw,
) -> Dict:
    """The full experiment driver (reference `__main__`,
    `PyCFD_ML_accelerated.py:1355-1501` / `bfs_ml_accelerated.py:1692-1957`):
    coarse -> SR -> warm-started fine (capped) vs cold-start fine, then
    centerline comparison plot + speedup summary. Returns a results dict.

    Phase times measure the solve runs only: each phase precompiles its
    XLA program first (`CFDSolver.precompile`), so one-time compilation -
    a host cost the executable cache amortizes across runs, and one the
    reference never paid inside a timed fine phase (Numba had compiled
    during the coarse phase) - cannot land on whichever phase happens to
    run first. Enable jax's persistent compilation cache
    (`jax.config.update("jax_compilation_cache_dir", ...)`) to amortize
    it across processes too.
    """
    if output_dir is None:
        output_dir = create_timestamped_output_dir()
    is_bfs = case == "bfs"
    # per-case reference defaults: the BFS baseline runs UPWIND at
    # dt=2e-3 (`bfs code given by sir.py:810-811`); passing the cavity
    # defaults unconditionally silently lost BFS parity
    if dt is None:
        dt = 2e-3 if is_bfs else 1e-3
    if scheme is None:
        scheme = "UPWIND" if is_bfs else "QUICK"
    lx, ly = (10.0, 3.0) if is_bfs else (1.0, 1.0)
    prefix = "bfs" if is_bfs else "cavity"

    # solver choices can differ per phase: e.g. the fused point-iteration
    # kernel wins on the tiny coarse grid, multigrid wins on the fine grid.
    # Coarse-phase defaults: the reference's 10x10 coarse solve never
    # converges (it hit its 100k cap, BASELINE.md) - running it to the cap
    # is pure waste, so plateau stopping is ON by default here, and the
    # whole coarse budget runs as ONE dispatch (device-side plateau exits
    # early; tiny-grid chunks are dominated by host round-trip latency).
    coarse_kw = dict(kw)
    coarse_kw.setdefault("plateau_patience", 5)
    coarse_kw.setdefault("chunk_size", max_iterations_coarse)
    # spmd_devices targets the FINE phases; a 10x10 coarse grid cannot
    # (usefully) decompose - pin it single-device unless coarse_overrides
    # explicitly asks otherwise
    coarse_kw["spmd_devices"] = 1
    # tiny-grid inner solves hit their f32 residual floor in O(10) sweeps
    # (measured: 8 on 10x10); the floor sits knife-edge at the 1e-6 inner
    # tolerance, so the exit check can flip to the 1000-sweep cap and burn
    # ~100x the work for bit-noise. 256 is a >10x margin over any coarse
    # grid's floor while bounding the damage.
    coarse_kw.setdefault("inner_max_iter", 256)
    coarse_kw.update(coarse_overrides or {})
    # named trace regions per phase: when a jax.profiler trace is being
    # captured around this experiment (utils/timing.profile_trace), the
    # per-phase device-time breakdown can be read off the trace
    # (SURVEY 5.1). Zero overhead when no trace is active.
    from ..utils.timing import trace_annotation

    with trace_annotation("hybrid.coarse"):
        coarse_fields, _, coarse_iters, coarse_time = run_coarse_simulation(
            Re, lr_dim=lr_dim, dt=dt, scheme=scheme,
            max_iterations=max_iterations_coarse, output_dir=output_dir,
            bc=bc, case=case, verbose=verbose, save_results=save_results,
            **coarse_kw,
        )

    ml_name = fine_run_name(output_dir, prefix, Re, hr_dim, hr_dim,
                            max_iterations_coarse, max_iterations_ml, "ML")
    with trace_annotation("hybrid.ml_fine"):
        ml_solver, ml_iters, ml_time, hr_fields = \
            run_ml_accelerated_fine_simulation(
                Re, hr_dim, hr_dim, coarse_fields, lr_dim=lr_dim,
                hr_dim=hr_dim,
                stats_file=stats_file, model=model, model_file=model_file,
                use_aspect_ratio_correction=use_aspect_ratio_correction,
                lx=lx, ly=ly,
                use_adaptive_normalization=use_adaptive_normalization,
                blend_factor=blend_factor,
                dt=dt, scheme=scheme, max_iterations=max_iterations_ml,
                output_name=ml_name, bc=bc, case=case, verbose=verbose,
                save_results=save_results, **kw,
            )

    normal_name = fine_run_name(output_dir, prefix, Re, hr_dim, hr_dim,
                                None, max_iterations_normal, "NORMAL")
    with trace_annotation("hybrid.normal_fine"):
        normal_solver, normal_iters, normal_time = run_normal_simulation(
            Re, hr_dim, hr_dim, dt=dt, scheme=scheme,
            max_iterations=max_iterations_normal, output_name=normal_name,
            bc=bc, case=case, verbose=verbose, save_results=save_results,
            **kw,
        )

    ml_cl = extract_centerlines(ml_solver.Var, ml_solver.mesh)
    normal_cl = extract_centerlines(normal_solver.Var, normal_solver.mesh)
    diff_stats = plot_centerline_comparison(
        os.path.join(output_dir, f"{prefix}_Re{fmt_re(Re)}_centerline_comparison.png"),
        ml_cl, normal_cl, Re,
        # the reference's BC subtitle (`format_bc_summary`); custom BCs
        # are otherwise indistinguishable across comparison plots
        bc_summary=format_bc_summary(bc) if bc is not None else None,
    )

    speedup = normal_time / ml_time if ml_time > 0 else float("inf")
    iterations_saved = normal_iters - ml_iters
    # per-phase device time per outer iteration (SURVEY 5.1: "report device
    # time, not host wall-clock"). Each phase runs as a few large on-device
    # chunks, so wall/iterations approximates device ms/step to <1% once the
    # chunk is big; the coarse phase is a single dispatch by default.
    ms_per_iter = {
        phase: round(1e3 * t / n, 4) if n else None
        for phase, t, n in (
            ("coarse", coarse_time, coarse_iters),
            ("ml", ml_time, ml_iters),
            ("normal", normal_time, normal_iters),
        )
    }
    if verbose:
        print("\n" + "=" * 70)
        print("HYBRID EXPERIMENT SUMMARY")
        print(f"  Coarse solve : {coarse_iters} iters, {coarse_time:.2f}s "
              f"({ms_per_iter['coarse']} ms/iter)")
        print(f"  ML fine solve: {ml_iters} iters, {ml_time:.2f}s "
              f"({ms_per_iter['ml']} ms/iter)")
        print(f"  Normal solve : {normal_iters} iters, {normal_time:.2f}s "
              f"({ms_per_iter['normal']} ms/iter)")
        print(f"  Speedup (normal/ml): {speedup:.2f}x | iterations saved: "
              f"{iterations_saved}")
        print("=" * 70)

    return {
        "coarse_iterations": coarse_iters,
        "coarse_time": coarse_time,
        "ml_iterations": ml_iters,
        "ml_time": ml_time,
        "normal_iterations": normal_iters,
        "normal_time": normal_time,
        "ms_per_iteration": ms_per_iter,
        "speedup": speedup,
        "iterations_saved": iterations_saved,
        "centerline_diff": diff_stats,
        "output_dir": output_dir,
        "hr_fields": hr_fields,
    }
