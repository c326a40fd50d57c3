"""Pallas fused pressure kernel vs the jnp red-black sweeps (interpret mode
on CPU; the TPU path is exercised by bench.py and the use_pallas solver
configs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sr_for_cfd_tpu.ops.pallas_kernels import pallas_solve_pressure
from sr_for_cfd_tpu.ops.stencil import face_fluxes
from sr_for_cfd_tpu.ops.sweeps import solve_pressure


@pytest.mark.parametrize("n", [16, 31])
def test_pallas_pressure_matches_jnp(n, rng):
    u = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.1, jnp.float32)
    p0 = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.01, jnp.float32)
    dx, dy = 1.0 / n, 1.3 / n
    volp = dx * dy
    ff = face_fluxes(u, v, dx, dy)
    kw = dict(dx=dx, dy=dy, dt=1e-3, rho=1.0, volp=volp, tol=1e-12,
              max_iter=40)
    r_jnp = solve_pressure(
        p0, ff, inner_scheme="redblack", check_every=8, **kw
    )
    r_pal = pallas_solve_pressure(p0, ff, check_every=8, interpret=True, **kw)
    np.testing.assert_allclose(
        np.asarray(r_pal), np.asarray(r_jnp), atol=5e-6
    )
    # ghosts must be untouched by the solve
    np.testing.assert_array_equal(np.asarray(r_pal)[0, :], np.asarray(p0)[0, :])


def test_fused_step_matches_jnp_step(rng):
    """The fully-fused Pallas outer step (interpret mode) reproduces the jnp
    simple_step on cavity/QUICK and BFS/UPWIND to f32 rounding."""
    import jax

    from sr_for_cfd_tpu.solver.cases import make_bfs_solver, make_cavity_solver
    from sr_for_cfd_tpu.solver.simple import simple_step
    from sr_for_cfd_tpu.solver.state import init_state, inlet_profile

    for builder, kw in (
        (make_cavity_solver, dict(Re=100, nx=16, ny=16, dt=2e-3, scheme="QUICK")),
        (make_bfs_solver, dict(Re=400, nx=12, ny=10, dt=2e-3, scheme="UPWIND")),
    ):
        case_j = builder(dtype="float32", **kw).case
        case_f = builder(dtype="float32", fused_step=True, **kw).case
        prof = inlet_profile(case_j)
        s = init_state(case_j)
        for _ in range(2):
            s_j = simple_step(s, case_j, prof)
            s_f = simple_step(s, case_f, prof)
            np.testing.assert_allclose(np.asarray(s_f.u), np.asarray(s_j.u), atol=1e-5)
            np.testing.assert_allclose(np.asarray(s_f.v), np.asarray(s_j.v), atol=1e-5)
            np.testing.assert_allclose(np.asarray(s_f.p), np.asarray(s_j.p), atol=1e-4)
            np.testing.assert_allclose(np.asarray(s_f.ff.e), np.asarray(s_j.ff.e), atol=1e-5)
            s = s_j


def test_fused_step_with_multigrid_pressure(rng):
    """fused_step composes with pressure_solver='multigrid': the in-kernel
    V-cycle (ops/pallas_mg.mg_while_loop embedded in the step kernel)
    reproduces the jnp multigrid step."""
    from sr_for_cfd_tpu.solver.cases import make_bfs_solver, make_cavity_solver
    from sr_for_cfd_tpu.solver.simple import simple_step
    from sr_for_cfd_tpu.solver.state import init_state, inlet_profile

    for builder, kw in (
        (make_cavity_solver, dict(Re=100, nx=16, ny=16, dt=2e-3, scheme="QUICK")),
        (make_bfs_solver, dict(Re=400, nx=12, ny=10, dt=2e-3, scheme="UPWIND")),
    ):
        mg = dict(pressure_solver="multigrid", mg_coarsest_sweeps=10)
        case_j = builder(dtype="float32", **mg, **kw).case
        case_f = builder(dtype="float32", fused_step=True, **mg, **kw).case
        prof = inlet_profile(case_j)
        s = init_state(case_j)
        for _ in range(2):
            s_j = simple_step(s, case_j, prof)
            s_f = simple_step(s, case_f, prof)
            np.testing.assert_allclose(
                np.asarray(s_f.u), np.asarray(s_j.u), atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(s_f.v), np.asarray(s_j.v), atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(s_f.p), np.asarray(s_j.p), atol=1e-4)
            s = s_j


def test_multi_step_kernel_bit_exact():
    """steps_per_kernel=K runs K outer iterations per kernel launch and is
    bit-exact vs K single-step launches (same op sequence, no re-entry
    through HBM in between)."""
    import jax.numpy as jnp

    from sr_for_cfd_tpu.solver.cases import make_cavity_solver
    from sr_for_cfd_tpu.solver.simple import jitted_run_chunk
    from sr_for_cfd_tpu.solver.state import init_state, inlet_profile

    kw = dict(Re=100, nx=16, ny=16, dt=2e-3, scheme="QUICK",
              dtype="float32", pressure_solver="sweeps", pressure_sor=1.5,
              inner_max_iter=16, max_iterations=64, chunk_size=64)
    c1 = make_cavity_solver(fused_step=True, **kw).case
    c4 = make_cavity_solver(fused_step=True, steps_per_kernel=4, **kw).case
    prof = inlet_profile(c1)
    s1 = jitted_run_chunk(init_state(c1), prof, case=c1, n_steps=64)
    s4 = jitted_run_chunk(init_state(c4), prof, case=c4, n_steps=64)
    assert int(s1.count) == int(s4.count) == 64
    np.testing.assert_array_equal(np.asarray(s1.u), np.asarray(s4.u))
    np.testing.assert_array_equal(np.asarray(s1.p), np.asarray(s4.p))
    np.testing.assert_array_equal(np.asarray(s1.rms), np.asarray(s4.rms))


def test_multi_step_kernel_config_validation():
    import pytest

    from sr_for_cfd_tpu.config import SolverSettings

    with pytest.raises(ValueError, match="requires fused_step"):
        SolverSettings.make(steps_per_kernel=4)
    with pytest.raises(ValueError, match="must divide chunk_size"):
        SolverSettings.make(fused_step=True, steps_per_kernel=3,
                            chunk_size=100)
    with pytest.raises(ValueError, match="must divide cauchy_check_every"):
        SolverSettings.make(fused_step=True, steps_per_kernel=400,
                            chunk_size=2000, cauchy_tol=1e-4,
                            cauchy_check_every=1000)
    SolverSettings.make(fused_step=True, steps_per_kernel=500,
                        chunk_size=100000, cauchy_tol=3e-5,
                        cauchy_check_every=2000, rre_every=1000)
