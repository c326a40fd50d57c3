"""Inner implicit point-iteration sweeps (momentum and pressure-Poisson).

The reference runs up to 1000 "chaotic" Gauss-Seidel point iterations per
momentum/pressure solve with an early exit at RMS < 1e-6
(`LDV PyCFD given by sir.py:517-583`), updating cells in place while other
threads read them - converging in practice but nondeterministic (SURVEY.md
section 5.2). Here the inner solve is a deterministic `lax.while_loop` over
whole-array sweeps:

  * 'redblack': two half-sweeps on a checkerboard coloring; the black
    half-sweep sees updated red cells, preserving Gauss-Seidel-like
    convergence rates while being embarrassingly parallel per color.
  * 'jacobi': one simultaneous update per sweep; cheaper per sweep, slower
    convergence.

Either way the loop exits when the same residual RMS measure the reference
uses - sqrt(sum R^2 / (nx ny)) - drops below `tol`, so converged outer
solutions agree with the reference within tolerance even though
per-iteration trajectories differ (by design).

Ghost cells are frozen during an inner solve, exactly as in the reference
(BCs are applied between kernels by the outer loop, never inside sweeps).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import QUICK
from .stencil import FaceFluxes, diffusion, quick_convection, upwind_convection

# residual_fn(phi) -> (R, ap) over the interior; ap may be scalar or array.
ResidualFn = Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]

# ---------------------------------------------------------------------------
# Unified inner-loop stall policy, shared by all four pressure/momentum
# solvers (this module, ops/pallas_kernels.py, ops/multigrid.py,
# parallel/halo.py). Three measured failure modes shape it:
#
#   * SOR/red-black traces have an initial transient HUMP (rms rises above
#     the starting value, then descends for many checks before setting a
#     new low) - BFS's under-relaxed momentum solves do this every outer
#     step, and killing them mid-hump blows up the outer loop.
#   * At the precision floor the rms RATTLES, often alternating down/up,
#     so "consecutive non-improving vs the PREVIOUS check" never fires and
#     burns the full iteration cap.
#   * Slow-but-real convergence (0.1-1%/check) must run to tolerance.
#
# Policy: each check lands in one of three states -
#   new margin-best          -> stall counter RESETS (real progress);
#   descending vs prev check -> counter HOLDS (transient hump descent:
#                               not yet progress, not yet a stall);
#   neither                  -> counter INCREMENTS.
# Exit after STALL_PATIENCE increments without an intervening reset, never
# before STALL_MIN_CHECKS checks. Floor rattle exits (every up-check
# increments; down-checks merely hold); humps of any descending length
# survive; sustained >=(1-STALL_RATIO)/check convergence always survives
# (each such check is descending -> held -> the loop keeps running to tol).
#
# The RESET margin is much wider than the descending margin. Resets gate
# on beating the best rms seen, and at a noisy f32 floor the running min
# of the noise keeps drifting down (extreme-value statistics): with a
# 0.1% reset margin, lucky sub-best samples reset the counter often
# enough to burn the full iteration cap. Measured on the fused 10x10
# cavity step: two compiles differing only in nu at the 1e-5 level ran
# identical trajectories at 0.067 vs 0.656 ms/step (occasionally 4.5),
# because the f32 pressure floor sits knife-edge at the 1e-6 tolerance
# and the exit path flipped between tol and stall/cap. A 2% reset margin
# is above the floor-noise scale, so the floor exits in ~PATIENCE checks;
# genuinely converging loops are unaffected (descending -> held).
STALL_PATIENCE = 2
STALL_MIN_CHECKS = 4
STALL_RATIO = 0.999
STALL_RESET_RATIO = 0.98


def stall_update(rms, prev, best, stale):
    """One policy step. Returns (stale, best); callers carry `prev` = the
    previous check's rms (start: +inf) and `best` (start: +inf)."""
    new_best = rms < STALL_RESET_RATIO * best
    descending = rms < STALL_RATIO * prev
    stale = jnp.where(
        new_best, 0, jnp.where(descending, stale, stale + 1)
    )
    return stale, jnp.minimum(best, rms)


def stalled(stale, checks):
    """True once the loop has met the unified stall-exit criterion."""
    return jnp.logical_and(stale >= STALL_PATIENCE, checks >= STALL_MIN_CHECKS)


def optimal_sor(nx: int, ny: int) -> float:
    """Grid-optimal red-black SOR factor 2/(1 + sin(pi/N)); requested
    factors are clamped to this (over-relaxing beyond it slows or
    destabilizes the sweep, badly so on small grids)."""
    import math

    return 2.0 / (1.0 + math.sin(math.pi / max(2, min(nx, ny))))


def checkerboard(nx: int, ny: int) -> np.ndarray:
    """Static red mask over the interior (True = red = even i+j parity,
    counting interior indices from 1 as the reference does)."""
    ii = np.arange(1, nx + 1)[:, None]
    jj = np.arange(1, ny + 1)[None, :]
    return (ii + jj) % 2 == 0


def momentum_residual(
    phi: jnp.ndarray,
    phi_old_int: jnp.ndarray,
    ff: FaceFluxes,
    scheme: str,
    dx: float,
    dy: float,
    dt: float,
    nu: float,
    volp: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Momentum point residual R and diagonal ap
    (`LDV PyCFD given by sir.py:526-531`):
      R  = -(volp/dt (phi - phi_old) + Fc - nu Fd)
      ap =   volp/dt + ap_c - nu ap_d
    """
    if scheme == QUICK:
        fc, ap_c = quick_convection(phi, ff, volp)
    else:
        fc, ap_c = upwind_convection(phi, ff, volp)
    fd, ap_d = diffusion(phi, dx, dy, volp)
    c = phi[1:-1, 1:-1]
    r = -(volp / dt * (c - phi_old_int) + fc - nu * fd)
    ap = volp / dt + ap_c - nu * ap_d
    return r, ap


def pressure_residual(
    p: jnp.ndarray,
    div_sum: jnp.ndarray,
    dx: float,
    dy: float,
    dt: float,
    rho: float,
    volp: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pressure-Poisson point residual (`LDV PyCFD given by sir.py:571-577`):
      R  = rho/dt sum(Ff) - Fd,   ap = ap_d  (note: ap_d < 0)
    `div_sum` is the frozen RHS sum of face fluxes."""
    fd, ap_d = diffusion(p, dx, dy, volp)
    r = rho / dt * div_sum - fd
    return r, jnp.full_like(r, ap_d)


def sweep_loop(
    phi: jnp.ndarray,
    residual_fn: ResidualFn,
    nx: int,
    ny: int,
    tol: float,
    max_iter: int,
    inner_scheme: str = "redblack",
    check_every: int = 1,
    sor: float = 1.0,
    return_count: bool = False,
) -> jnp.ndarray:
    """Iterate point sweeps until RMS(R) < tol or `max_iter` sweeps.

    Returns the updated padded field (with `return_count`, a
    `(field, sweeps_run)` pair - the observability hook behind the
    per-outer-iteration inner-sweep accounting, SURVEY.md section 5.1). The
    early exit mirrors the reference's hard-coded 1e-6 / 1000 inner loop
    (`LDV PyCFD given by sir.py:519-537`).

    `check_every > 1` evaluates the exit reduction only every K sweeps (the
    loop runs K sweeps per while iteration), trading up to K-1 extra sweeps
    for K-fold fewer scalar reductions/branches - a large win on TPU where
    per-iteration while_loop overhead rivals the sweep's VPU cost. Extra
    sweeps past the tolerance only sharpen the solve, so converged outer
    solutions are unaffected.
    """
    n_cells = nx * ny
    dtype = phi.dtype
    red = jnp.asarray(checkerboard(nx, ny))

    if inner_scheme == "jacobi":

        def sweep(f, with_rms):
            r, ap = residual_fn(f)
            f = f.at[1:-1, 1:-1].add(sor * r / ap)
            rms = jnp.sqrt(jnp.sum(r * r) / n_cells) if with_rms else None
            return f, rms

    else:  # red-black Gauss-Seidel

        def sweep(f, with_rms):
            r1, ap1 = residual_fn(f)
            f = f.at[1:-1, 1:-1].add(jnp.where(red, sor * r1 / ap1, 0.0))
            r2, ap2 = residual_fn(f)
            f = f.at[1:-1, 1:-1].add(jnp.where(red, 0.0, sor * r2 / ap2))
            rms = None
            if with_rms:
                ss = jnp.sum(jnp.where(red, r1 * r1, r2 * r2))
                rms = jnp.sqrt(ss / n_cells)
            return f, rms

    def body(carry):
        f, prev, best, stale, checks, it = carry
        for _ in range(check_every - 1):
            f, _ = sweep(f, with_rms=False)
        f, rms = sweep(f, with_rms=True)
        # stall detection: once rms stops improving (precision floor), more
        # sweeps are pure waste - crucial for f32 where the reference's
        # absolute 1e-6 tolerance may be unreachable and the loop would
        # otherwise burn its full cap every outer iteration. Unified policy
        # in stall_update/stalled: SOR transients are non-monotone.
        stale, best = stall_update(rms, prev, best, stale)
        return f, rms, best, stale, checks + 1, it + check_every

    def cond(carry):
        _, rms, _, stale, checks, it = carry
        return jnp.logical_and(
            jnp.logical_and(it < max_iter, rms >= tol),
            jnp.logical_not(stalled(stale, checks)),
        )

    big = jnp.asarray(jnp.inf, dtype=dtype)
    zero = jnp.asarray(0, jnp.int32)
    init = (phi, big, big, zero, zero, zero)
    phi, _, _, _, _, sweeps_run = jax.lax.while_loop(cond, body, init)
    if return_count:
        return phi, sweeps_run
    return phi


def solve_momentum(
    phi: jnp.ndarray,
    phi_old_int: jnp.ndarray,
    ff: FaceFluxes,
    *,
    scheme: str,
    dx: float,
    dy: float,
    dt: float,
    nu: float,
    volp: float,
    tol: float = 1e-6,
    max_iter: int = 1000,
    inner_scheme: str = "redblack",
    check_every: int = 1,
    return_count: bool = False,
) -> jnp.ndarray:
    """Implicit momentum solve for one velocity component
    (reference `solve_momentum_quick` / `solve_momentum_upwind`,
    `LDV PyCFD given by sir.py:517-559`)."""
    nx, ny = phi.shape[0] - 2, phi.shape[1] - 2
    fn = partial(
        momentum_residual,
        phi_old_int=phi_old_int,
        ff=ff,
        scheme=scheme,
        dx=dx,
        dy=dy,
        dt=dt,
        nu=nu,
        volp=volp,
    )
    return sweep_loop(phi, fn, nx, ny, tol, max_iter, inner_scheme,
                      check_every, return_count=return_count)


def solve_pressure(
    p: jnp.ndarray,
    ff: FaceFluxes,
    *,
    dx: float,
    dy: float,
    dt: float,
    rho: float,
    volp: float,
    tol: float = 1e-6,
    max_iter: int = 1000,
    inner_scheme: str = "redblack",
    check_every: int = 1,
    sor: float = 1.0,
    return_count: bool = False,
) -> jnp.ndarray:
    """Pressure-Poisson solve (reference `solve_pressure`,
    `LDV PyCFD given by sir.py:561-583`). The RHS (face-flux divergence) is
    frozen for the whole inner solve, as in the reference."""
    nx, ny = p.shape[0] - 2, p.shape[1] - 2
    # red-black tolerates omega up to the grid-optimal value; Jacobi
    # diverges for any omega > 1
    sor = min(sor, 1.0 if inner_scheme == "jacobi" else optimal_sor(nx, ny))
    div_sum = ff.divergence_sum()
    fn = partial(
        pressure_residual, div_sum=div_sum, dx=dx, dy=dy, dt=dt, rho=rho,
        volp=volp,
    )
    return sweep_loop(p, fn, nx, ny, tol, max_iter, inner_scheme, check_every,
                      sor, return_count=return_count)
