"""Tiled momentum-sweep kernel (ops/pallas_momentum.py) vs its jnp
oracle `sweeps.solve_momentum` - interpret mode (the silicon gate lives
in tests/test_tpu_silicon.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sr_for_cfd_tpu.ops.pallas_momentum import tiled_solve_momentum
from sr_for_cfd_tpu.ops.stencil import face_fluxes
from sr_for_cfd_tpu.ops.sweeps import solve_momentum


def _problem(n=72, seed=3):
    dx = 1.0 / n
    g = np.random.default_rng(seed)
    u = jnp.asarray(g.standard_normal((n + 2, n + 2)) * 0.3, jnp.float32)
    v = jnp.asarray(g.standard_normal((n + 2, n + 2)) * 0.3, jnp.float32)
    old = u[1:-1, 1:-1] + jnp.asarray(
        g.standard_normal((n, n)) * 0.01, jnp.float32)
    ff = face_fluxes(u, v, dx, dx)
    return u, old, ff, dict(dx=dx, dy=dx, dt=1e-3, nu=0.01, volp=dx * dx,
                            tol=1e-6, max_iter=40, check_every=3)


@pytest.mark.parametrize("scheme", ["QUICK", "UPWIND"])
def test_matches_solve_momentum(scheme):
    """Same residual/update order/check cadence/stall policy: identical
    sweep counts, fields to f32 rounding - with a RAGGED slab split
    (72 rows / 16-row slabs) so the zero-pad tail path is exercised."""
    u, old, ff, kw = _problem()
    a, ca = solve_momentum(u, old, ff, scheme=scheme, return_count=True,
                           **kw)
    b, cb = tiled_solve_momentum(u, old, ff, scheme=scheme, slab_rows=16,
                                 return_count=True, interpret=True, **kw)
    assert int(ca) == int(cb)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_slab_size_invariance():
    """The slab decomposition is pure mechanics: any slab height gives
    the same answer (catches halo-block / window-offset bugs). Per-shape
    XLA reassociation leaves last-bit differences, hence atol."""
    u, old, ff, kw = _problem(n=48)
    outs = [
        np.asarray(tiled_solve_momentum(u, old, ff, scheme="QUICK",
                                        slab_rows=r, interpret=True, **kw))
        for r in (16, 24, 48)  # >= the 9-row halo (3 sweeps/pass, QUICK)
    ]
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-6)


def test_solver_big_grid_pallas_path_matches_jnp():
    """Solver-level: use_pallas + forced slab rows routes momentum to the
    tiled kernel and pressure to the streamed MG; fields match the plain
    jnp multigrid solver (p to the documented one-extra-cycle ~4e-5)."""
    from sr_for_cfd_tpu.solver.cases import make_cavity_solver

    kw = dict(Re=500, nx=64, ny=64, dt=2e-3, scheme="QUICK",
              dtype="float32", chunk_size=30, max_iterations=60,
              pressure_solver="multigrid")
    a = make_cavity_solver(**kw)
    a.solve("/tmp/unused_tm_a", verbose=False, save_results=False)
    b = make_cavity_solver(use_pallas=True, mg_slab_rows=16, **kw)
    b.solve("/tmp/unused_tm_b", verbose=False, save_results=False)
    assert int(a.state.count) == int(b.state.count)
    for k in ("u", "v", "p"):
        d = float(jnp.max(jnp.abs(getattr(a.state, k)
                                  - getattr(b.state, k))))
        assert d < 5e-5, (k, d)


def test_rejects_non_f32():
    """f64 input raises like the sibling kernels instead of silently
    downcasting to f32 and re-labeling the result as f64."""
    u, old, ff, kw = _problem(n=48)
    with pytest.raises(ValueError, match="float32-only"):
        tiled_solve_momentum(
            u.astype(jnp.float64), old.astype(jnp.float64), ff,
            scheme="UPWIND", interpret=True, **kw)
