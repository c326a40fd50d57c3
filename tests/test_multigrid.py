"""Multigrid pressure solver tests: linear-system agreement with the
point-iteration solver, and end-to-end golden parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from sr_for_cfd_tpu.ops.multigrid import mg_solve_pressure
from sr_for_cfd_tpu.ops.stencil import face_fluxes
from sr_for_cfd_tpu.ops.sweeps import solve_pressure


@pytest.mark.parametrize("n", [32, 100])
def test_mg_matches_converged_point_iteration(n, rng):
    """Both solvers target the same frozen-ghost linear system; at tight
    tolerance their solutions must agree."""
    u = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.1)
    v = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.1)
    p0 = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.01)
    dx = dy = 1.0 / n
    kw = dict(dx=dx, dy=dy, dt=1e-3, rho=1.0, volp=dx * dy, tol=1e-9)
    ff = face_fluxes(u, v, dx, dy)
    ref = solve_pressure(p0, ff, inner_scheme="redblack", check_every=8,
                         max_iter=300000, **kw)
    mg = mg_solve_pressure(p0, ff, max_cycles=60, **kw)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(mg), np.asarray(ref), atol=2e-5 * scale
    )
    # ghost ring untouched
    np.testing.assert_array_equal(np.asarray(mg)[0, :], np.asarray(p0)[0, :])


@pytest.mark.slow
def test_bfs_golden_with_multigrid(tmp_path):
    """The BFS Re=400 golden centerline is reproduced with the multigrid
    pressure solver (same converged state, different inner trajectory)."""
    from sr_for_cfd_tpu.solver.cases import make_bfs_solver
    from tests_golden_values import GOLDEN_U, GOLDEN_V  # noqa: F401

    solver = make_bfs_solver(
        nx=10, ny=10, dt=2e-3, scheme="UPWIND", dtype="float64",
        chunk_size=2000, pressure_solver="multigrid",
    )
    iterations, _ = solver.solve(
        str(tmp_path / "bfs_mg"), verbose=False, save_results=False
    )
    var = solver.Var
    np.testing.assert_allclose(var[0, 5, 1:-1], GOLDEN_U, atol=5e-5)
    np.testing.assert_allclose(var[1, 1:-1, 5], GOLDEN_V, atol=5e-5)


def test_multigrid_converges_on_anisotropic_grid(rng):
    """BFS runs a 10x3 physical domain on a square cell count, so dx/dy =
    10/3: with full coarsening the point-smoothed V-cycles DIVERGE
    (+34%/cycle measured) because the weak-direction error stays
    oscillatory and aliases onto the coarse grid. Semi-coarsening must
    make the same system converge to tolerance."""
    import jax.numpy as jnp

    from sr_for_cfd_tpu.ops.multigrid import _levels, mg_solve_pressure
    from sr_for_cfd_tpu.ops.stencil import face_fluxes

    n = 64
    lx, ly = 10.0, 3.0
    dx, dy = lx / n, ly / n
    u = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.1)
    v = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.1)
    p0 = jnp.zeros((n + 2, n + 2))
    ff = face_fluxes(u, v, dx, dy)
    p, cycles = mg_solve_pressure(
        p0, ff, dx=dx, dy=dy, dt=2e-3, rho=1.0, volp=dx * dy, tol=1e-7,
        max_cycles=60, return_count=True)
    # converged on tolerance, not stalled out at the cap
    from sr_for_cfd_tpu.ops.sweeps import pressure_residual
    r, _ = pressure_residual(p, ff.divergence_sum(), dx=dx, dy=dy, dt=2e-3,
                             rho=1.0, volp=dx * dy)
    rms = float(jnp.sqrt(jnp.sum(r * r) / (n * n)))
    assert rms < 1e-7, f"anisotropic MG did not converge: rms={rms}"
    # the schedule semi-coarsens: the first level halves only y
    sizes = _levels(n, n, dx, dy)
    assert sizes[1] == (n, n // 2)


def test_mg_shape_variants_same_solution(rng):
    """V-cycle shape knobs (2/2 smoothing, truncated hierarchy) change
    cost, not the solution: all variants solve the same system to the
    same tolerance."""
    n = 64
    u = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.1)
    v = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.1)
    p0 = jnp.zeros((n + 2, n + 2))
    dx = 1.0 / n
    kw = dict(dx=dx, dy=dx, dt=1e-3, rho=1.0, volp=dx * dx, tol=1e-9)
    ff = face_fluxes(u, v, dx, dx)
    ref = mg_solve_pressure(p0, ff, max_cycles=60, **kw)
    for extra in (dict(n_pre=2, n_post=2),
                  dict(min_size=24, coarsest_sweeps=80),
                  dict(n_pre=2, n_post=2, min_size=24,
                       coarsest_sweeps=80)):
        out = mg_solve_pressure(p0, ff, max_cycles=120, **kw, **extra)
        scale = float(jnp.abs(ref).max())
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5 * scale
        )
