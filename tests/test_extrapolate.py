"""Tests for the RRE steady-state accelerator (ops/extrapolate.py).

The accelerator must (a) reach the SAME fixed point as the plain
pseudo-time march, (b) reach it in materially fewer iterations, and
(c) reject garbage jumps (singular Gram systems at the noise floor)
instead of injecting them. Beyond-reference addition: the reference's
coarse solves burn their full 100k budget marching (BASELINE.md).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sr_for_cfd_tpu.ops.extrapolate import (
    flat_size,
    flatten_state,
    rre_extrapolate,
    unflatten_state,
)
from sr_for_cfd_tpu.solver.cases import make_cavity_solver


def _solve(**kw):
    solver = make_cavity_solver(
        Re=1000, nx=10, ny=10, dt=1e-3, scheme="QUICK", double_lid=True,
        chunk_size=100000, max_iterations=100000, dtype="float64",
        inner_max_iter=256, **kw,
    )
    state = solver._chunk_fn(solver.state, solver.profile)
    return solver, state


def test_rre_same_fixed_point_fewer_iterations():
    base, st0 = _solve()
    acc, st1 = _solve(rre_every=1000, rre_depth=6)
    assert bool(st0.converged) and bool(st1.converged)
    # measured: 83,493 plain vs ~36,000 accelerated
    assert int(st1.count) < 0.6 * int(st0.count)
    np.testing.assert_allclose(
        np.asarray(st1.u), np.asarray(st0.u), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(st1.v), np.asarray(st0.v), atol=5e-5
    )


def test_rre_flatten_roundtrip():
    nx, ny = 7, 5
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((nx + 2, ny + 2)))
    v = jnp.asarray(rng.standard_normal((nx + 2, ny + 2)))
    p = jnp.asarray(rng.standard_normal((nx + 2, ny + 2)))
    from sr_for_cfd_tpu.ops.stencil import FaceFluxes

    ff = FaceFluxes(*(jnp.asarray(rng.standard_normal((nx, ny)))
                      for _ in range(4)))
    flat = flatten_state(u, v, p, ff)
    assert flat.shape == (flat_size(nx, ny),)
    u2, v2, p2, ff2 = unflatten_state(flat, nx, ny)
    np.testing.assert_array_equal(np.asarray(u2), np.asarray(u))
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(p))
    np.testing.assert_array_equal(np.asarray(ff2.s), np.asarray(ff.s))


def test_rre_exact_on_synthetic_geometric_modes():
    """x_k = x* + sum_j a_j rho_j^k with K independent modes: RRE over
    K+1 snapshots must recover x* (near) exactly - including an
    oscillating (negative-rho) mode, the case scalar Aitken cannot do."""
    rng = np.random.default_rng(1)
    n, K = 200, 4
    x_star = rng.standard_normal(n)
    modes = rng.standard_normal((K, n))
    rhos = np.array([0.9, 0.6, -0.7, 0.3])
    snaps = np.stack([
        x_star + (rhos[:, None] ** k * modes).sum(axis=0) for k in range(K + 2)
    ])
    out, ok = rre_extrapolate(jnp.asarray(snaps))
    assert bool(ok)
    # the 1e-6-relative Gram ridge (f32-robustness) bounds the recovery
    # accuracy; 1e-4 is still orders tighter than any solver tolerance
    np.testing.assert_allclose(np.asarray(out), x_star, atol=1e-4)


def test_rre_rejects_noise_floor():
    """Pure-noise differences (already-converged state) must not produce
    an accepted jump with a huge magnitude; either ok=False or the jump
    stays bounded by the guard."""
    rng = np.random.default_rng(2)
    base = rng.standard_normal(300)
    snaps = np.stack([base + 1e-9 * rng.standard_normal(300)
                      for _ in range(7)])
    out, ok = rre_extrapolate(jnp.asarray(snaps))
    if bool(ok):
        assert float(jnp.max(jnp.abs(out - snaps[-1]))) <= 1e3 * 2e-9 * 2
    # zero drift exactly -> must be rejected
    snaps0 = np.stack([base] * 7)
    _, ok0 = rre_extrapolate(jnp.asarray(snaps0))
    assert not bool(ok0)


def test_rre_depth_validation():
    with pytest.raises(ValueError, match="rre_depth"):
        make_cavity_solver(Re=100, nx=8, ny=8, rre_every=100, rre_depth=1)


def test_rre_chunk_size_validation():
    """A chunk shorter than one snapshot cycle would silently never jump
    (the buffer is chunk-local) - refused at config time instead."""
    with pytest.raises(ValueError, match="chunk_size"):
        make_cavity_solver(Re=100, nx=8, ny=8, rre_every=100,
                           chunk_size=500)  # needs 100*(6+1)=700
