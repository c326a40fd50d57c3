"""Unit tests: vectorized JAX stencil kernels vs the loop-style NumPy oracle
on random small grids (the kernel tier of the test pyramid, SURVEY.md s4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sr_for_cfd_tpu.ops import stencil

from oracle import (
    apply_bc as oracle_apply_bc,
    diffusion_cell,
    face_fluxes as oracle_face_fluxes,
    project,
    quick_cell,
    rhie_chow,
    upwind_cell,
)

NX, NY = 7, 5
DX, DY = 1.0 / NX, 1.3 / NY
VOLP = DX * DY


@pytest.fixture
def fields(rng):
    u = rng.standard_normal((NX + 2, NY + 2))
    v = rng.standard_normal((NX + 2, NY + 2))
    p = rng.standard_normal((NX + 2, NY + 2))
    return u, v, p


def test_face_fluxes(fields):
    u, v, _ = fields
    ff = stencil.face_fluxes(jnp.asarray(u), jnp.asarray(v), DX, DY)
    fe, fn, fw, fs = oracle_face_fluxes(u, v, DX, DY)
    np.testing.assert_allclose(ff.e, fe, rtol=1e-12)
    np.testing.assert_allclose(ff.n, fn, rtol=1e-12)
    np.testing.assert_allclose(ff.w, fw, rtol=1e-12)
    np.testing.assert_allclose(ff.s, fs, rtol=1e-12)


def test_upwind_convection(fields):
    u, v, p = fields
    ff = stencil.face_fluxes(jnp.asarray(u), jnp.asarray(v), DX, DY)
    fc, ap_c = stencil.upwind_convection(jnp.asarray(p), ff, VOLP)
    fe, fn, fw, fs = oracle_face_fluxes(u, v, DX, DY)
    for i in range(1, NX + 1):
        for j in range(1, NY + 1):
            ofc, oap = upwind_cell(p, fe, fn, fw, fs, i, j, VOLP)
            assert fc[i - 1, j - 1] == pytest.approx(ofc, rel=1e-12, abs=1e-14)
            assert ap_c[i - 1, j - 1] == pytest.approx(oap, rel=1e-12, abs=1e-14)


def test_quick_convection(fields):
    u, v, p = fields
    ff = stencil.face_fluxes(jnp.asarray(u), jnp.asarray(v), DX, DY)
    fc, ap_c = stencil.quick_convection(jnp.asarray(p), ff, VOLP)
    fe, fn, fw, fs = oracle_face_fluxes(u, v, DX, DY)
    for i in range(1, NX + 1):
        for j in range(1, NY + 1):
            ofc, oap = quick_cell(p, fe, fn, fw, fs, i, j, VOLP)
            assert fc[i - 1, j - 1] == pytest.approx(ofc, rel=1e-12, abs=1e-14)
            assert ap_c[i - 1, j - 1] == pytest.approx(oap, rel=1e-12, abs=1e-14)


def test_diffusion(fields):
    _, _, p = fields
    fd, ap_d = stencil.diffusion(jnp.asarray(p), DX, DY, VOLP)
    for i in range(1, NX + 1):
        for j in range(1, NY + 1):
            ofd, oap = diffusion_cell(p, i, j, DX, DY, VOLP)
            assert fd[i - 1, j - 1] == pytest.approx(ofd, rel=1e-12, abs=1e-14)
            assert ap_d == pytest.approx(oap, rel=1e-12)


def test_rhie_chow_update(fields):
    u, v, p = fields
    ff = stencil.face_fluxes(jnp.asarray(u), jnp.asarray(v), DX, DY)
    ff2 = stencil.rhie_chow_update(ff, jnp.asarray(p), 0.01, 1.2, DX, DY)
    fe, fn, fw, fs = oracle_face_fluxes(u, v, DX, DY)
    ofe, ofn, ofw, ofs = rhie_chow(fe, fn, fw, fs, p, 0.01, 1.2, DX, DY)
    np.testing.assert_allclose(ff2.e, ofe, rtol=1e-12)
    np.testing.assert_allclose(ff2.n, ofn, rtol=1e-12)
    np.testing.assert_allclose(ff2.w, ofw, rtol=1e-12)
    np.testing.assert_allclose(ff2.s, ofs, rtol=1e-12)


def test_project_velocity(fields):
    u, v, p = fields
    ju, jv = stencil.project_velocity(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(p), 0.01, 1.2, DX, DY
    )
    ou, ov = project(u, v, p, 0.01, 1.2, DX, DY)
    np.testing.assert_allclose(ju, ou, rtol=1e-12)
    np.testing.assert_allclose(jv, ov, rtol=1e-12)
    # ghosts untouched
    np.testing.assert_array_equal(np.asarray(ju)[0, :], u[0, :])


def test_under_relax(fields):
    u, _, _ = fields
    old = u[1:-1, 1:-1] * 0.5
    out = stencil.under_relax(jnp.asarray(u), jnp.asarray(old), 0.3)
    expected = old + 0.3 * (u[1:-1, 1:-1] - old)
    np.testing.assert_allclose(np.asarray(out)[1:-1, 1:-1], expected, rtol=1e-12)
    # alpha = 1.0 is the identity (static fast path)
    out1 = stencil.under_relax(jnp.asarray(u), jnp.asarray(old), 1.0)
    np.testing.assert_array_equal(np.asarray(out1), u)


def test_residual_sumsq(fields):
    u, v, _ = fields
    old = v[1:-1, 1:-1]
    got = stencil.residual_sumsq(jnp.asarray(u), jnp.asarray(old))
    want = np.sum((u[1:-1, 1:-1] - old) ** 2)
    assert float(got) == pytest.approx(want, rel=1e-12)
