"""Geometric multigrid pressure-Poisson solver (performance mode).

The reference's point-iteration pressure solve caps at 1000 sweeps with the
system far from converged on fine grids (`LDV PyCFD given by sir.py:561-583`;
measured exit rms ~5e-4 vs the 1e-6 tolerance on 400x400 BFS) - red-black
GS alone cannot converge a 400^2 Poisson problem in 1000 sweeps. A V-cycle
hierarchy solves the same linear system to tolerance in a handful of
fine-grid-sweep equivalents. Same fixed point, massively fewer sweeps;
select with `SolverSettings(pressure_solver='multigrid')`.

System: during an inner pressure solve the ghost ring is frozen (reference
semantics), so the interior unknowns satisfy A x = b - L_ghost(p_ghost)
where A is the 5-point volp-scaled Laplacian with homogeneous Dirichlet
exterior. Coarse levels use cell-agglomerated grids (2x2 full-weighting
restriction, bilinear prolongation via jax.image.resize) with the level's
own dx, dy. The smoother is the same red-black GS used everywhere else.

Pure jnp: each level's masks and shapes are static; the V-cycle is unrolled
at trace time. Works in f32 and f64.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp

from .stencil import FaceFluxes
from .sweeps import stall_update, stalled

# Shared V-cycle loop defaults - single source of truth for the jnp path,
# the standalone Pallas MG kernel (ops/pallas_mg.py) and the fused step's
# embedded solve (ops/pallas_step.py), which must stay drop-in equivalent.
MG_MAX_CYCLES = 30
MG_SMOOTHER_SOR = 1.5


def _levels(nx: int, ny: int, dx: float = 1.0, dy: float = 1.0,
            min_size: int = 8) -> List[Tuple[int, int]]:
    """Coarsening schedule with ANISOTROPY-AWARE semi-coarsening.

    Point smoothers only smooth the error along the strongly-coupled
    (small-spacing) direction; full coarsening of an anisotropic grid
    aliases the still-oscillatory weak-direction error onto the coarse
    grid and the correction then AMPLIFIES it (measured on the BFS
    10x3-domain 400^2 grid, dy/dx = 0.3: V-cycles diverged at +34%/cycle).
    Standard cure: halve only the strongly-coupled direction until the
    level is near-isotropic (spacing ratio within 2x), then halve both."""
    sizes = [(nx, ny)]
    sp = [(dx, dy)]
    while min(sizes[-1]) > min_size:
        nxl, nyl = sizes[-1]
        dxl, dyl = sp[-1]
        if dxl > 2.0 * dyl and nyl > min_size:      # y strongly coupled
            nxl2, nyl2 = nxl, max(2, nyl // 2)
        elif dyl > 2.0 * dxl and nxl > min_size:    # x strongly coupled
            nxl2, nyl2 = max(2, nxl // 2), nyl
        else:
            nxl2, nyl2 = max(2, nxl // 2), max(2, nyl // 2)
        sizes.append((nxl2, nyl2))
        sp.append((dxl * nxl / nxl2, dyl * nyl / nyl2))
    return sizes


def _laplacian(x: jnp.ndarray, inv_dx2: float, inv_dy2: float, volp: float):
    """volp-scaled 5-point Laplacian with homogeneous Dirichlet exterior
    (x is interior-shaped; zero padding supplies the exterior)."""
    xp = jnp.pad(x, 1)
    c = xp[1:-1, 1:-1]
    return volp * (
        (xp[2:, 1:-1] - 2.0 * c + xp[:-2, 1:-1]) * inv_dx2
        + (xp[1:-1, 2:] - 2.0 * c + xp[1:-1, :-2]) * inv_dy2
    )


def ghost_fold(ghost_only, inv_dx2, inv_dy2, volp):
    """Ghost-ring contribution to the interior RHS of the frozen-ghost
    pressure system (off-diagonal Laplacian terms of the ghost values).
    `ghost_only` is the padded field with the interior zeroed; subtracting
    the result from the divergence RHS leaves a homogeneous-Dirichlet
    interior system. Single source of truth for the jnp V-cycle, the
    standalone Pallas MG kernel, and the fused-step kernel's embedded
    solve (plain jnp ops, callable inside Mosaic)."""
    return volp * (
        (ghost_only[2:, 1:-1] + ghost_only[:-2, 1:-1]) * inv_dx2
        + (ghost_only[1:-1, 2:] + ghost_only[1:-1, :-2]) * inv_dy2
    )


def _red_mask(nx: int, ny: int):
    ii = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 1)
    return (ii + jj) % 2 == 0


def _smooth(x, b, inv_dx2, inv_dy2, volp, red, n_sweeps: int, sor: float):
    ap = -volp * (2.0 * inv_dx2 + 2.0 * inv_dy2)
    inv_ap = sor / ap

    def sweep(_, x):
        r = b - _laplacian(x, inv_dx2, inv_dy2, volp)
        x = x + jnp.where(red, r * inv_ap, 0.0)
        r = b - _laplacian(x, inv_dx2, inv_dy2, volp)
        x = x + jnp.where(red, 0.0, r * inv_ap)
        return x

    return jax.lax.fori_loop(0, n_sweeps, sweep, x)


def _restrict(r: jnp.ndarray, shape_c: Tuple[int, int]) -> jnp.ndarray:
    """Restrict the residual to the coarse grid (bilinear; handles odd sizes)."""
    return jax.image.resize(r, shape_c, method="linear")


def _prolong(e: jnp.ndarray, shape_f: Tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(e, shape_f, method="linear")


def _v_cycle(x, b, level: int, sizes, spacings, volp_levels, masks,
             n_pre: int, n_post: int, sor: float, coarsest_sweeps: int = 40):
    inv_dx2, inv_dy2 = spacings[level]
    volp = volp_levels[level]
    red = masks[level]
    if level + 1 >= len(sizes):
        # coarsest level: solve (nearly) exactly - it's tiny
        return _smooth(x, b, inv_dx2, inv_dy2, volp, red,
                       coarsest_sweeps, 1.5)
    x = _smooth(x, b, inv_dx2, inv_dy2, volp, red, n_pre, sor)
    r = b - _laplacian(x, inv_dx2, inv_dy2, volp)
    # the volp-scaled stencil is scale-invariant across levels, so the
    # restricted residual (a finite-volume-integrated quantity) must be
    # scaled by the cell-agglomeration ratio (~4x per 2x coarsening)
    nf, mf = sizes[level]
    nc, mc = sizes[level + 1]
    scale = (nf / nc) * (mf / mc)
    r_c = _restrict(r, sizes[level + 1]) * scale
    e_c = _v_cycle(
        jnp.zeros_like(r_c), r_c, level + 1, sizes, spacings,
        volp_levels, masks, n_pre, n_post, sor, coarsest_sweeps,
    )
    x = x + _prolong(e_c, sizes[level])
    x = _smooth(x, b, inv_dx2, inv_dy2, volp, red, n_post, sor)
    return x


def mg_solve_pressure(
    p: jnp.ndarray,
    ff: FaceFluxes,
    *,
    dx: float,
    dy: float,
    dt: float,
    rho: float,
    volp: float,
    tol: float = 1e-6,
    max_cycles: int = MG_MAX_CYCLES,
    n_pre: int = 4,
    n_post: int = 4,
    smoother_sor: float = MG_SMOOTHER_SOR,
    min_size: int = 8,
    coarsest_sweeps: int = 40,
    return_count: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for `sweeps.solve_pressure`: solves the same
    frozen-ghost system to the same residual-RMS tolerance via V-cycles.
    Early exit on tolerance or stall, like the point-iteration loops.
    With `return_count`, returns `(p, v_cycles_run)`."""
    nx, ny = p.shape[0] - 2, p.shape[1] - 2
    dtype = p.dtype
    n_cells = nx * ny

    sizes = _levels(nx, ny, dx, dy, min_size=min_size)
    spacings = []
    volp_levels = []
    masks = []
    for lvl, (nxl, nyl) in enumerate(sizes):
        dxl = dx * nx / nxl
        dyl = dy * ny / nyl
        spacings.append((1.0 / (dxl * dxl), 1.0 / (dyl * dyl)))
        # level 0 uses the caller's volp verbatim so the smoothed system is
        # exactly the one the rms check (and solve_pressure) measures
        volp_levels.append(volp if lvl == 0 else dxl * dyl)
        masks.append(_red_mask(nxl, nyl))

    # RHS: b - ghost contributions (ghosts frozen during the inner solve)
    b = (rho / dt) * ff.divergence_sum()
    ghost_only = p.at[1:-1, 1:-1].set(0.0)
    inv_dx2, inv_dy2 = spacings[0]
    b_eff = b - ghost_fold(ghost_only, inv_dx2, inv_dy2, volp)

    x0 = p[1:-1, 1:-1]
    cycle = partial(
        _v_cycle, level=0, sizes=sizes, spacings=spacings,
        volp_levels=volp_levels, masks=masks, n_pre=n_pre, n_post=n_post,
        sor=smoother_sor, coarsest_sweeps=coarsest_sweeps,
    )

    def rms_of(x):
        r = b_eff - _laplacian(x, inv_dx2, inv_dy2, volp)
        return jnp.sqrt(jnp.sum(r * r) / n_cells)

    def body(carry):
        x, prev, best, stale, it = carry
        x = cycle(x, b_eff)
        rms = rms_of(x)
        # unified stall policy (ops/sweeps.py); `it` doubles as the check
        # count since rms is evaluated once per cycle. Multigrid residuals
        # drop ~10x/cycle, so on a converging solve STALL_MIN_CHECKS extra
        # cycles are never reached; on a stalled one they cost ~2 cycles.
        stale, best = stall_update(rms, prev, best, stale)
        return x, rms, best, stale, it + 1

    def cond(carry):
        x, prev, best, stale, it = carry
        return jnp.logical_and(
            jnp.logical_and(it < max_cycles, best >= tol),
            jnp.logical_not(stalled(stale, it)),
        )

    big = jnp.asarray(jnp.inf, dtype)
    zero = jnp.asarray(0, jnp.int32)
    x, _, _, _, cycles = jax.lax.while_loop(
        cond, body, (x0, big, big, zero, zero)
    )
    out = p.at[1:-1, 1:-1].set(x)
    if return_count:
        return out, cycles
    return out
