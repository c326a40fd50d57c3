"""Fused Pallas TPU kernels for the inner point-iteration solves.

The jnp `sweep_loop` lowers each red-black sweep to a handful of small XLA
kernels; at 400x400 the per-launch overhead (~tens of us) dwarfs the VPU
work (~us), and the pressure-Poisson solve - which runs to its 1000-sweep
cap nearly every outer iteration (reference `solve_pressure`,
`LDV PyCFD given by sir.py:561-583`) - dominates the solver's runtime.

These kernels run the ENTIRE inner loop inside one `pallas_call`: the field
and RHS live in VMEM for all ~1000 sweeps (a 402x402 f32 field is 0.65 MB -
the whole working set fits on-chip), with the early-exit RMS check folded
into the in-kernel `while_loop` every `check_every` sweeps. One kernel
launch per pressure solve instead of ~3000.

float32 only (TPU has no native f64); the f64 validation path keeps the jnp
sweeps. Numerics are identical to `sweeps.sweep_loop(inner_scheme=
'redblack')` up to reduction ordering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import FaceFluxes
from .sweeps import stall_update, stalled


def _padded_masks(shape):
    """(interior & red, interior & black) over the PADDED shape; parity is
    (i + j) % 2 == 0 in padded coordinates, which equals the interior-index
    parity used by `sweeps.checkerboard` ((i-1)+(j-1) has the same parity
    as i+j)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    interior = (
        (ii >= 1) & (ii <= shape[0] - 2) & (jj >= 1) & (jj <= shape[1] - 2)
    )
    red = (ii + jj) % 2 == 0
    return interior & red, interior & ~red


def _pressure_kernel(
    p_ref, b_ref, out_ref, cnt_ref, *, dx, dy, volp, tol, max_iter,
    check_every, sor=1.0,
):
    """Red-black Gauss-Seidel for volp*Laplacian(p) = b with frozen ghosts.

    b = rho/dt * sum(Ff), zero-padded to the full shape; the update is
    p += (b - Fd)/ap_d exactly as the reference's point iteration. All
    shifts are replicated-edge concatenated slices (no scatters -
    unsupported in Mosaic); the replicated values land only in ghost
    rows/columns, which the interior masks exclude from every update.
    """
    p = p_ref[:]
    b = b_ref[:]
    shape = p.shape
    nx, ny = shape[0] - 2, shape[1] - 2
    inv_dx2 = 1.0 / (dx * dx)
    inv_dy2 = 1.0 / (dy * dy)
    ap_d = -volp * (2.0 * inv_dx2 + 2.0 * inv_dy2)
    inv_ap = 1.0 / ap_d
    red_m, black_m = _padded_masks(shape)
    n_cells = nx * ny
    tol32 = jnp.asarray(tol, p.dtype)

    def residual(f):
        # concatenated slices with replicated edges instead of rolls
        # (measured ~18% cheaper per sweep on v5e, ops/pallas_mg.py);
        # the replicated values land only in ghost rows/columns, which
        # the interior masks exclude from every update
        east = jnp.concatenate([f[1:], f[-1:]], axis=0)
        west = jnp.concatenate([f[:1], f[:-1]], axis=0)
        north = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
        south = jnp.concatenate([f[:, :1], f[:, :-1]], axis=1)
        fd = volp * (
            (east - 2.0 * f + west) * inv_dx2
            + (north - 2.0 * f + south) * inv_dy2
        )
        return b - fd

    def half(f, mask):
        r = residual(f)
        f = f + jnp.where(mask, sor * r * inv_ap, 0.0)
        return f, r

    def sweep(f, with_rms):
        f, r1 = half(f, red_m)
        f, r2 = half(f, black_m)
        if not with_rms:
            return f, None
        ss = jnp.sum(
            jnp.where(red_m, r1 * r1, 0.0) + jnp.where(black_m, r2 * r2, 0.0)
        )
        return f, jnp.sqrt(ss / n_cells)

    def body(carry):
        f, prev, best, stale, checks, it = carry
        f = jax.lax.fori_loop(
            0, check_every - 1, lambda _, g: sweep(g, False)[0], f
        )
        f, rms = sweep(f, True)
        # unified stall policy (ops/sweeps.py): exit on the f32 precision
        # floor, but tolerate non-monotone SOR transients
        stale, best = stall_update(rms, prev, best, stale)
        return f, rms, best, stale, checks + 1, it + check_every

    def cond(carry):
        _, rms, _, stale, checks, it = carry
        return jnp.logical_and(
            jnp.logical_and(it < max_iter, rms >= tol32),
            jnp.logical_not(stalled(stale, checks)),
        )

    big = jnp.asarray(jnp.inf, p.dtype)
    zero = jnp.asarray(0, jnp.int32)
    init = (p, big, big, zero, zero, zero)
    p, _, _, _, _, it = jax.lax.while_loop(cond, body, init)
    out_ref[:] = p
    # sweeps run, as a (1,1) vector store (Mosaic rejects scalar VMEM
    # stores) - the SURVEY 5.1 inner-iteration counter (VERDICT r2 #6)
    cnt_ref[:, :] = it.reshape(1, 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "dx", "dy", "dt", "rho", "volp", "tol", "max_iter", "check_every",
        "sor", "return_count", "interpret",
    ),
)
def pallas_solve_pressure(
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
    check_every: int = 8,
    sor: float = 1.0,
    return_count: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for `sweeps.solve_pressure` (f32, red-black).
    With `return_count`, returns (p, sweeps_run) - the kernel emits its
    loop counter as a (1,1) output (SURVEY 5.1 observability)."""
    from .sweeps import optimal_sor

    sor = min(sor, optimal_sor(p.shape[0] - 2, p.shape[1] - 2))
    b_int = (rho / dt) * ff.divergence_sum()
    b = jnp.zeros(p.shape, p.dtype).at[1:-1, 1:-1].set(b_int)
    kernel = functools.partial(
        _pressure_kernel,
        dx=dx, dy=dy, volp=volp, tol=tol, max_iter=max_iter,
        check_every=check_every, sor=sor,
    )
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    space = pl.ANY if interpret else pltpu.VMEM
    out, cnt = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=space),
            pl.BlockSpec(memory_space=space),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=space),
            pl.BlockSpec(memory_space=space),
        ],
        interpret=interpret,
        **kw,
    )(p, b)
    if return_count:
        return out, cnt[0, 0]
    return out
