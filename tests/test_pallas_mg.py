"""Fused Pallas multigrid kernel vs the jnp V-cycle (interpret mode on
CPU; the real-silicon path is gated by bench.py's on-TPU parity check).

Small grids + shallow hierarchies on purpose: interpret mode executes the
kernel op-by-op, and a deep V-cycle while_loop costs minutes at 48^2."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr_for_cfd_tpu.ops.multigrid import mg_solve_pressure
from sr_for_cfd_tpu.ops.pallas_mg import (
    _resize_matrix,
    pallas_mg_solve_pressure,
)
from sr_for_cfd_tpu.ops.stencil import face_fluxes


@pytest.mark.parametrize(
    "n_in,n_out", [(16, 8), (25, 12), (8, 16), (12, 25), (9, 9)]
)
def test_resize_matrix_matches_jax_image_resize(n_in, n_out):
    """The numpy triangle-kernel weights must equal the matrix of
    jax.image.resize(method='linear') - the kernel's transfer operators
    are then literally the same linear maps the jnp V-cycle applies."""
    m = _resize_matrix(n_in, n_out)
    ref = np.asarray(
        jax.image.resize(
            jnp.eye(n_in, dtype=jnp.float32), (n_out, n_in), method="linear"
        )
    )
    np.testing.assert_allclose(m, ref, atol=1e-6)


def _random_problem(rng, nx, ny, lx, ly):
    u = jnp.asarray(rng.standard_normal((nx + 2, ny + 2)) * 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal((nx + 2, ny + 2)) * 0.1, jnp.float32)
    p0 = jnp.asarray(rng.standard_normal((nx + 2, ny + 2)) * 0.01, jnp.float32)
    dx, dy = lx / nx, ly / ny
    return p0, face_fluxes(u, v, dx, dy), dx, dy


@pytest.mark.parametrize("nx,ny,lx,ly", [(16, 12, 1.0, 1.3), (20, 20, 1.0, 1.0)])
def test_pallas_mg_matches_jnp_mg(nx, ny, lx, ly, rng):
    p0, ff, dx, dy = _random_problem(rng, nx, ny, lx, ly)
    kw = dict(
        dx=dx, dy=dy, dt=1e-3, rho=1.0, volp=dx * dy, tol=1e-7,
        max_cycles=8, n_pre=2, n_post=2, coarsest_sweeps=10,
    )
    r_jnp = mg_solve_pressure(p0, ff, **kw)
    r_pal, cycles = pallas_mg_solve_pressure(
        p0, ff, interpret=True, return_count=True, **kw
    )
    np.testing.assert_allclose(
        np.asarray(r_pal), np.asarray(r_jnp), atol=2e-5
    )
    assert 1 <= int(cycles) <= 8
    # the frozen ghost ring must come back untouched
    np.testing.assert_array_equal(np.asarray(r_pal)[0, :], np.asarray(p0)[0, :])
    np.testing.assert_array_equal(np.asarray(r_pal)[:, -1], np.asarray(p0)[:, -1])


def test_pallas_mg_semi_coarsening_schedule(rng):
    """Anisotropic spacing triggers identity transfers on the
    weakly-coupled axis (semi-coarsening); the kernel must skip those
    matrices and still match the jnp path."""
    p0, ff, dx, dy = _random_problem(rng, 16, 16, 1.0, 0.3)
    kw = dict(
        dx=dx, dy=dy, dt=1e-3, rho=1.0, volp=dx * dy, tol=1e-7,
        max_cycles=6, n_pre=2, n_post=2, coarsest_sweeps=10,
    )
    r_jnp = mg_solve_pressure(p0, ff, **kw)
    r_pal = pallas_mg_solve_pressure(p0, ff, interpret=True, **kw)
    np.testing.assert_allclose(
        np.asarray(r_pal), np.asarray(r_jnp), atol=2e-5
    )


def test_pallas_mg_rejects_f64():
    p = jnp.zeros((10, 10), jnp.float64)
    ff = face_fluxes(p, p, 0.1, 0.1)
    with pytest.raises(ValueError, match="float32-only"):
        pallas_mg_solve_pressure(
            p, ff, dx=0.1, dy=0.1, dt=1e-3, rho=1.0, volp=0.01
        )


def test_simple_step_dispatches_pallas_mg(rng):
    """pressure_solver='multigrid' + use_pallas composes at config level
    and one outer step matches the jnp-multigrid step to f32 rounding."""
    from sr_for_cfd_tpu.solver.cases import make_cavity_solver
    from sr_for_cfd_tpu.solver.simple import simple_step
    from sr_for_cfd_tpu.solver.state import init_state, inlet_profile

    kw = dict(Re=100, nx=16, ny=16, dt=2e-3, scheme="QUICK",
              dtype="float32", pressure_solver="multigrid",
              mg_min_size=8, mg_coarsest_sweeps=10)
    case_j = make_cavity_solver(**kw).case
    case_p = make_cavity_solver(use_pallas=True, **kw).case
    prof = inlet_profile(case_j)
    s = init_state(case_j)
    for _ in range(2):
        s_j = simple_step(s, case_j, prof)
        s_p = simple_step(s, case_p, prof)
        np.testing.assert_allclose(
            np.asarray(s_p.p), np.asarray(s_j.p), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(s_p.u), np.asarray(s_j.u), atol=1e-5
        )
        s = s_j
