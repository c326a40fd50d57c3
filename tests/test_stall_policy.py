"""Unified inner-loop stall policy (ops/sweeps.py: stall_update/stalled).

All four pressure/momentum inner loops (sweeps, fused Pallas kernels,
multigrid, shard_map halo) share one exit policy: a check "improves" only
when it sets a new ratio-best rms; exit after STALL_PATIENCE consecutive
checks without one, never before STALL_MIN_CHECKS checks. Two observed
failure modes drove the design and are pinned here:

  * SOR/red-black transients are non-monotone - a single non-improving
    check (vs the previous check) must not kill the loop.
  * At the precision floor the rms rattles ALTERNATING down/up (measured:
    3.257e-17 / 3.229e-17 alternation on a converged f64 momentum sweep),
    so "consecutive non-improving vs previous" never fires and would burn
    the full iteration cap. Comparing against the best-so-far fixes this.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sr_for_cfd_tpu.ops.sweeps import (
    STALL_MIN_CHECKS,
    STALL_PATIENCE,
    STALL_RATIO,
    solve_momentum,
    solve_pressure,
    stall_update,
    stalled,
)


def drive(trace, dtype=jnp.float64):
    """Feed an rms trace through the policy; return the 1-based check index
    of the stall exit, or None if the loop would run the trace out."""
    prev = jnp.asarray(jnp.inf, dtype)
    best = jnp.asarray(jnp.inf, dtype)
    stale = jnp.asarray(0, jnp.int32)
    for checks, rms in enumerate(trace, start=1):
        rms = jnp.asarray(rms, dtype)
        stale, best = stall_update(rms, prev, best, stale)
        prev = rms
        if bool(stalled(stale, checks)):
            return checks
    return None


def test_single_transient_bump_does_not_exit():
    # mid-convergence SOR transient: one non-improving check, then a new
    # best - the patience policy must carry the loop through the bump
    # (a single-check policy exits at the 0.51)
    assert drive([1.0, 0.5, 0.51, 0.2, 0.1, 0.05, 0.01, 0.005]) is None


def test_initial_hump_does_not_exit():
    # BFS's under-relaxed momentum solves rise ABOVE the first check's rms
    # and then descend for many checks before setting a new low; a
    # vs-best-only policy exits mid-hump (measured: killed the momentum
    # solve at 4 sweeps and blew up the BFS outer loop). Descending-vs-prev
    # checks must HOLD the counter.
    hump = [1.0, 1.5, 1.45, 1.38, 1.3, 1.2, 1.1, 1.05, 0.99, 0.8, 0.5]
    assert drive(hump) is None


def test_alternating_floor_rattle_exits():
    # measured f64 floor rattle (momentum sweep, 16x16 QUICK): alternating
    # down/up never improves on the best - up-checks increment, down-checks
    # only hold, so the rattle exits (a previous-check-only policy never
    # fires here and burns the cap)
    tr = [1.0, 0.1, 3.265e-17, 3.256e-17, 3.229e-17,
          3.257e-17, 3.229e-17, 3.257e-17, 3.229e-17, 3.257e-17]
    exit_at = drive(tr)
    assert exit_at is not None and exit_at <= 10


def test_slow_but_real_convergence_survives():
    # 0.5%/check sustained improvement must run to tolerance, not stall
    tr = [1.0 * (0.995 ** k) for k in range(40)]
    assert drive(tr) is None


def test_no_stall_exit_before_min_checks():
    assert drive([1.0] * (STALL_MIN_CHECKS - 1)) is None
    # a flat trace exits exactly when both patience and min-checks are met
    assert drive([1.0] * 20) == max(STALL_MIN_CHECKS, 1 + STALL_PATIENCE)


def test_ratio_accepts_permille_improvement():
    assert STALL_RATIO == 0.999


def test_momentum_sweep_exits_on_floor_not_cap(rng):
    """Real f64 momentum solve whose rms floor-rattles from ~check 21
    (the measured trace in the module docstring): the loop must stall-exit
    within a few checks of the floor instead of burning the 400 cap, and
    the solution must be converged far beyond the bump region."""
    from functools import partial

    from sr_for_cfd_tpu.ops.stencil import face_fluxes
    from sr_for_cfd_tpu.ops.sweeps import momentum_residual, sweep_loop

    rng = np.random.default_rng(1)
    n = 16
    dx = 1.0 / n
    u = jnp.asarray(rng.standard_normal((n + 2, n + 2)))
    v = jnp.asarray(rng.standard_normal((n + 2, n + 2)))
    ff = face_fluxes(u, v, dx, dx)
    fn = partial(momentum_residual, phi_old_int=u[1:-1, 1:-1], ff=ff,
                 scheme="QUICK", dx=dx, dy=dx, dt=5e-3, nu=1e-3,
                 volp=dx * dx)
    out, count = sweep_loop(u, fn, n, n, tol=0.0, max_iter=400,
                            return_count=True)
    count = int(count)
    assert 20 <= count <= 40, f"expected floor stall-exit, ran {count} sweeps"
    r, _ = fn(out)
    rms = float(jnp.sqrt(jnp.sum(r * r) / (n * n)))
    assert rms < 1e-12


def test_pressure_solvers_share_policy(rng):
    """solve_pressure and multigrid solve the same system to the same
    tolerance under the unified policy."""
    from sr_for_cfd_tpu.ops.multigrid import mg_solve_pressure
    from sr_for_cfd_tpu.ops.stencil import face_fluxes

    n = 32
    dx = 1.0 / n
    u = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.1)
    v = jnp.asarray(rng.standard_normal((n + 2, n + 2)) * 0.1)
    p0 = jnp.zeros((n + 2, n + 2))
    ff = face_fluxes(u, v, dx, dx)
    kw = dict(dx=dx, dy=dx, dt=1e-3, rho=1.0, volp=dx * dx, tol=1e-7)
    a = solve_pressure(p0, ff, max_iter=5000, **kw)
    b = mg_solve_pressure(p0, ff, max_cycles=40, **kw)
    # both residual-rms-converged to 1e-7; the solution difference bound is
    # looser by the Poisson system's conditioning (~(n/pi)^2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
