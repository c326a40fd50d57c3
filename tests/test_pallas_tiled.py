"""Tiled double-buffered sweep kernel (ops/pallas_tiled.py) vs the jnp
red-black path - interpret mode on CPU; the real-silicon check runs in
bench/scaling scripts (same policy as the other Pallas kernels)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sr_for_cfd_tpu.ops.pallas_tiled import tiled_solve_pressure
from sr_for_cfd_tpu.ops.stencil import face_fluxes
from sr_for_cfd_tpu.ops.sweeps import solve_pressure


def _system(rng, n, lx=1.0, ly=1.0):
    dx, dy = lx / n, ly / n
    u = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.1, jnp.float32)
    p0 = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.01, jnp.float32)
    ff = face_fluxes(u, v, dx, dy)
    kw = dict(dx=dx, dy=dy, dt=1e-3, rho=1.0, volp=dx * dy)
    return p0, ff, kw


@pytest.mark.parametrize("n,slab", [(100, 32), (100, 64), (66, 32)])
def test_tiled_sweep_bitexact_vs_jnp(rng, n, slab):
    """The slab pipeline reproduces the single-array red-black sweep
    EXACTLY (same update order, frozen ghosts, rms-fused exit) for slab
    counts both dividing and not dividing the row count."""
    p0, ff, kw = _system(rng, n)
    ref = solve_pressure(p0, ff, inner_scheme="redblack", check_every=1,
                         tol=1e-5, max_iter=60, **kw)
    got = tiled_solve_pressure(p0, ff, tol=1e-5, max_iter=60,
                               slab_rows=slab, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_tiled_sweep_anisotropic_and_ghosts(rng):
    p0, ff, kw = _system(rng, 64, lx=10.0, ly=3.0)
    ref = solve_pressure(p0, ff, inner_scheme="redblack", check_every=1,
                         tol=1e-5, max_iter=40, **kw)
    got = tiled_solve_pressure(p0, ff, tol=1e-5, max_iter=40,
                               slab_rows=32, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # frozen ghost ring untouched
    np.testing.assert_array_equal(np.asarray(got)[0, :], np.asarray(p0)[0, :])
    np.testing.assert_array_equal(np.asarray(got)[:, -1],
                                  np.asarray(p0)[:, -1])


def test_tiled_pressure_solver_in_simple_step():
    """pressure_solver='tiled' through the full solver matches the sweeps
    path (exit-check granularity differs: tiled checks every sweep)."""
    from sr_for_cfd_tpu.solver.cases import make_cavity_solver

    kw = dict(Re=100, nx=32, ny=32, dt=2e-3, scheme="UPWIND",
              dtype="float32", max_iterations=200, chunk_size=200)
    tiled = make_cavity_solver(pressure_solver="tiled", **kw)
    tiled.solve("/tmp/unused_tiled", verbose=False, save_results=False)
    ref = make_cavity_solver(**kw)
    ref.solve("/tmp/unused_tiledref", verbose=False, save_results=False)
    np.testing.assert_allclose(np.asarray(tiled.state.u),
                               np.asarray(ref.state.u), atol=1e-5)


def test_tiled_rejects_f64():
    from sr_for_cfd_tpu.config import SolverSettings

    with pytest.raises(ValueError, match="tiled.*float32"):
        SolverSettings.make(pressure_solver="tiled", dtype="float64")
