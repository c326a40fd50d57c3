"""End-to-end solver validation (the golden tier of the test pyramid).

The BFS Re=400 10x10 coarse centerline is the reference's de-facto
regression fixture (`outputs/bfs_Re400_centerline.dat`, designated the
validation target by BASELINE.json). The reference's sweeps are
nondeterministic (asynchronous Gauss-Seidel); converged solutions still
agree to the 1e-6 inner tolerance, which is what we assert here.
"""

import os

import numpy as np
import pytest

from sr_for_cfd_tpu.solver.cases import make_bfs_solver, make_cavity_solver

REFERENCE_CENTERLINE = "/root/reference/outputs/bfs_Re400_centerline.dat"

# Golden values transcribed from outputs/bfs_Re400_centerline.dat (kept in
# tests_golden_values.py so other tests can reuse them).
from tests_golden_values import GOLDEN_U, GOLDEN_V


@pytest.mark.slow
def test_bfs_re400_golden_centerline(tmp_path):
    solver = make_bfs_solver(
        nx=10, ny=10, dt=2e-3, scheme="UPWIND", dtype="float64",
        chunk_size=1000,
    )
    iterations, _ = solver.solve(
        str(tmp_path / "bfs"), verbose=False, save_results=False
    )
    assert iterations == 100000  # reference hit the cap too
    var = solver.Var
    u_vert = var[0, 5, 1:-1]
    v_horz = var[1, 1:-1, 5]
    np.testing.assert_allclose(u_vert, GOLDEN_U, atol=5e-6)
    np.testing.assert_allclose(v_horz, GOLDEN_V, atol=5e-6)

    if os.path.exists(REFERENCE_CENTERLINE):
        from sr_for_cfd_tpu.io.datfiles import load_centerline_dat

        y, u_ref, x, v_ref = load_centerline_dat(REFERENCE_CENTERLINE)
        np.testing.assert_allclose(u_vert, u_ref, atol=5e-6)
        np.testing.assert_allclose(v_horz, v_ref, atol=5e-6)


def test_cavity_re100_physics(tmp_path):
    """Lid-driven cavity Re=100: converges, is physically sane (negative
    return flow at the bottom of the vertical centerline, u -> lid velocity
    at the top, interior mass conservation)."""
    solver = make_cavity_solver(
        Re=100, nx=32, ny=32, dt=2e-3, scheme="QUICK", dtype="float64",
        chunk_size=1000, max_iterations=40000,
    )
    iterations, _ = solver.solve(
        str(tmp_path / "cav"), verbose=False, save_results=False
    )
    assert iterations < 40000, "cavity Re=100 32x32 should converge"
    var = solver.Var
    u_vert = var[0, 16, 1:-1]
    # near-lid velocity approaches the lid speed
    assert u_vert[-1] > 0.5
    # recirculation: negative u in the lower half (Ghia et al. benchmark
    # shows min u ~ -0.21 for Re=100)
    assert u_vert.min() < -0.1
    assert u_vert.min() > -0.35
    # corrected face fluxes are (discretely) divergence-free at convergence
    ff = solver.state.ff
    div = np.asarray(ff.e + ff.n + ff.w + ff.s)
    assert np.abs(div).max() < 1e-6


def test_divergence_guard(tmp_path):
    """NaN/Inf residual guard raises DivergenceError (reference ML variants
    raise ValueError, `PyCFD_ML_accelerated.py:481-487`)."""
    from sr_for_cfd_tpu.solver.simple import DivergenceError

    # absurd dt makes the scheme blow up
    solver = make_cavity_solver(
        Re=1000, nx=16, ny=16, dt=50.0, scheme="QUICK", dtype="float32",
        chunk_size=50, max_iterations=500, inner_max_iter=2,
    )
    with pytest.raises(DivergenceError):
        solver.solve(str(tmp_path / "blowup"), verbose=False, save_results=False)


def test_warm_start_roundtrip(tmp_path):
    """Warm-starting from a converged solution's interior fields converges
    immediately (the restore path, `PyCFD_ML_accelerated.py:936-948`)."""
    solver = make_cavity_solver(
        Re=100, nx=16, ny=16, dt=2e-3, scheme="UPWIND", dtype="float64",
        chunk_size=1000,
    )
    it1, _ = solver.solve(str(tmp_path / "a"), verbose=False, save_results=False)
    fields = solver.interior_fields()

    solver2 = make_cavity_solver(
        Re=100, nx=16, ny=16, dt=2e-3, scheme="UPWIND", dtype="float64",
        chunk_size=100,
    )
    solver2.warm_start(fields)
    it2, _ = solver2.solve(str(tmp_path / "b"), verbose=False, save_results=False)
    assert it2 <= max(100, it1 // 10)
    np.testing.assert_allclose(
        solver2.Var[:, 1:-1, 1:-1], solver.Var[:, 1:-1, 1:-1], atol=1e-5
    )


@pytest.mark.slow
def test_channel_flow_custom_case(tmp_path):
    """The reference's commented channel-flow example
    (`LDV PyCFD given by sir.py:722-779`) through create_custom_case:
    inlet u=1, pressure outlet, no-slip walls -> downstream flow develops
    toward a parabolic profile."""
    from sr_for_cfd_tpu.solver.cases import create_custom_case

    solver, iterations, _ = create_custom_case(
        mesh_params={"nx": 60, "ny": 16, "lx": 4.0, "ly": 1.0},
        fluid_params={"Re": 100, "rho": 1.0},
        solver_params={
            "dt": 1e-3,
            "scheme": "QUICK",
            "dtype": "float64",
            "chunk_size": 2000,
            "max_iterations": 40000,
            # open inflow/outflow needs under-relaxation for stability,
            # like the BFS case
            "relaxation_factors": {"u": 0.5, "v": 0.5, "p": 0.2},
        },
        bc_params={
            "u_boundaries": {
                "left": {"type": "dirichlet", "value": 1.0},
                "right": {"type": "neumann", "value": 0.0},
                "top": {"type": "dirichlet", "value": 0.0},
                "bottom": {"type": "dirichlet", "value": 0.0},
            },
            "v_boundaries": {
                "left": {"type": "dirichlet", "value": 0.0},
                "right": {"type": "neumann", "value": 0.0},
                "top": {"type": "dirichlet", "value": 0.0},
                "bottom": {"type": "dirichlet", "value": 0.0},
            },
            "p_boundaries": {
                "left": {"type": "neumann", "value": 0.0},
                "right": {"type": "dirichlet", "value": 0.0},
                "top": {"type": "neumann", "value": 0.0},
                "bottom": {"type": "neumann", "value": 0.0},
            },
        },
        output_name=str(tmp_path / "channel"),
        verbose=False,
        save_results=False,
    )
    var = solver.Var
    u_outlet = var[0, -2, 1:-1]  # last interior column
    # developed channel flow: centerline fastest, ~1.5x bulk, walls slow
    assert u_outlet[8] > u_outlet[1] > 0
    assert 1.2 < u_outlet.max() < 1.7
    # mass conservation: outlet flux ~ inlet flux
    assert abs(u_outlet.mean() - 1.0) < 0.05
