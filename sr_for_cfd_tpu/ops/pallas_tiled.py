"""Tiled, double-buffered red-black pressure sweep for grids beyond VMEM.

The VMEM-resident kernels (ops/pallas_kernels.py, ops/pallas_step.py) hold
the whole grid on-chip and die beyond ~900^2 f32. This kernel streams the
grid through VMEM in row slabs instead, with the whole red half-sweep,
black half-sweep, AND the residual-RMS reduction fused into ONE pass over
HBM: per sweep it moves 1x f read + 1x b read + 1x f write (~12 B/cell),
where the XLA lowering of the same sweep makes separate passes for each
half-sweep and the reduction. Works at any grid size; result-compatible
with `sweeps.solve_pressure(inner_scheme='redblack', check_every=1)`.

Mechanics (TPU Pallas grid steps run SEQUENTIALLY, which this exploits):
the grid iterates top-to-bottom over row slabs with automatic
double-buffered DMA (BlockSpec pipelining). Step i loads slab i+1 and
computes slab i - the lag gives the compute both its upper halo (original
rows carried in VMEM scratch from step i-1) and its lower halo (the first
rows of the freshly-loaded slab i+1). The red half is additionally
computed one halo row beyond the slab on each side, so the black half sees
red-updated neighbors exactly as the single-array sweep does; halo red
rows are recomputed redundantly (2 rows per slab) rather than
communicated. The array is padded by one slab of zero rows top and bottom
so every BlockSpec index is in range; interior masks keep ghost ring and
padding frozen.

Cited behavior: inner pressure loop semantics per the reference
(`LDV PyCFD given by sir.py:561-583`); see SURVEY.md section 7 and
VERDICT r1 next-step #5 (the tiled/double-buffered growth axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import FaceFluxes
from .sweeps import optimal_sor, stall_update, stalled


def _sweep_kernel(f_ref, b_ref, out_ref, rms_ref, s_f, s_b,
                  t_f, t_b, *, R, W, nrows, ny, inv_dx2, inv_dy2,
                  volp, ap, sor):
    """One grid step: load slab i+1 (f_ref/b_ref blocks), compute slab i
    from scratch + lookahead, write slab i, accumulate the rms partial.

    Scratch: s_f/s_b hold the ORIGINAL rows of slab i (loaded last step);
    t_f/t_b hold the original last-2 rows of slab i-1.
    """
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    cur_f = f_ref[:]
    cur_b = b_ref[:]

    @pl.when(i == 0)
    def _init():
        # (1,1) vector store: Mosaic cannot store SCALARS to VMEM (the
        # interpret-mode tests allowed it; real lowering rejects it)
        rms_ref[:, :] = jnp.zeros((1, 1), jnp.float32)
        t_f[:] = jnp.zeros((2, W), jnp.float32)
        t_b[:] = jnp.zeros((2, W), jnp.float32)
        # slab 0 of the padded array is all zeros by construction
        out_ref[:] = jnp.zeros((R, W), jnp.float32)

    @pl.when(jnp.logical_and(i > 0, i < n_steps - 1))
    def _compute():
        # extended original window: rows 0..R+3 = [last2 of slab i-1,
        # slab i, first2 of slab i+1]
        ext = jnp.concatenate([t_f[:], s_f[:], cur_f[:2]], axis=0)
        bext = jnp.concatenate([t_b[:], s_b[:], cur_b[:2]], axis=0)

        # global data-row index of ext row k at grid step i: slab i starts
        # at padded row i*R, data starts at padded row R -> g = (i-1)*R+k-2
        kk = jax.lax.broadcasted_iota(jnp.int32, (R + 4, W), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (R + 4, W), 1)
        g = (i - 1) * R + kk - 2
        interior = (g >= 1) & (g <= nrows - 2) & (jj >= 1) & (jj <= ny)
        red = interior & (((g + jj) % 2) == 0)
        black = interior & (((g + jj) % 2) == 1)

        def residual(x):
            up = jnp.concatenate([x[:1], x[:-1]], axis=0)
            dn = jnp.concatenate([x[1:], x[-1:]], axis=0)
            lf = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
            rt = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
            fd = volp * ((dn - 2.0 * x + up) * inv_dx2
                         + (rt - 2.0 * x + lf) * inv_dy2)
            return bext - fd

        r1 = residual(ext)
        ext_r = ext + jnp.where(red, sor * r1 / ap, 0.0)
        r2 = residual(ext_r)
        ext_rb = ext_r + jnp.where(black, sor * r2 / ap, 0.0)

        # rms partial over THIS slab's rows only (ext rows 2..R+1); the
        # halo rows belong to neighboring slabs' partials
        own = (kk >= 2) & (kk < R + 2)
        ss = jnp.sum(jnp.where(own & red, r1 * r1, 0.0)
                     + jnp.where(own & black, r2 * r2, 0.0))
        rms_ref[:, :] += ss.reshape(1, 1)

        out_ref[:] = ext_rb[2:R + 2]

    @pl.when(i == n_steps - 1)
    def _tail():
        # trailing zero-pad slab: keep it zero for the next sweep's reads
        out_ref[:] = jnp.zeros((R, W), jnp.float32)

    # slide the scratch window (original, pre-update rows)
    t_f[:] = s_f[R - 2:]
    t_b[:] = s_b[R - 2:]
    s_f[:] = cur_f
    s_b[:] = cur_b


def tiled_rb_sweep(fpad, bpad, *, R, nrows, ny, inv_dx2, inv_dy2, volp,
                   ap, sor, interpret=False):
    """One fused red-black sweep + rms over the slab-padded arrays.
    Returns (updated fpad, rms)."""
    padded_rows, W = fpad.shape
    n_blocks = padded_rows // R
    n_cells = (nrows - 2) * ny
    kernel = functools.partial(
        _sweep_kernel, R=R, W=W, nrows=nrows, ny=ny, inv_dx2=inv_dx2,
        inv_dy2=inv_dy2, volp=volp, ap=ap, sor=sor,
    )

    def load_idx(i):
        # at step i, load slab i+1 (clamped at the final tail step)
        return (jnp.minimum(i + 1, n_blocks - 1), 0)

    kw = {}
    if not interpret:
        # double-buffered in/out blocks + scratch exceed the default
        # 16 MiB scoped-vmem budget at 2048^2 (256-row slabs x 2050 wide
        # x ~10 buffers ~ 26 MiB); v5e has 128 MiB of VMEM
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out, ss = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        # donate f's buffer to the output: the write to block i trails
        # the (lagged) read of block i+1, so in-place is race-free under
        # the sequential grid; measured ~7% off the per-pass floor
        input_output_aliases={0: 0},
        in_specs=[
            pl.BlockSpec((R, W), load_idx),
            pl.BlockSpec((R, W), load_idx),
        ],
        out_specs=[
            pl.BlockSpec((R, W), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded_rows, W), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, W), jnp.float32),
            pltpu.VMEM((R, W), jnp.float32),
            pltpu.VMEM((2, W), jnp.float32),
            pltpu.VMEM((2, W), jnp.float32),
        ],
        interpret=interpret,
        **kw,
    )(fpad, bpad)
    return out, jnp.sqrt(ss[0, 0] / n_cells)


def _vmem_params(interpret):
    """Shared 100 MiB scoped-VMEM budget for all slab-streamed kernels
    (the 16 MiB default rejects double-buffered slabs at 2048^2)."""
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}


def _pad_slabs(x, R):
    """Pad (nrows, W) with one zero slab on top, round the total row count
    up to cover a trailing zero slab as well. Canonical copy - the other
    slab-streamed kernels (pallas_stream, pallas_momentum) import it."""
    nrows, W = x.shape
    total = (2 + -(-nrows // R)) * R
    out = jnp.zeros((total, W), x.dtype)
    return out.at[R:R + nrows].set(x)


@functools.partial(
    jax.jit,
    static_argnames=("dx", "dy", "dt", "rho", "volp", "tol", "max_iter",
                     "check_every", "sor", "slab_rows", "return_count",
                     "interpret"),
)
def tiled_solve_pressure(
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
    check_every: int = 1,
    sor: float = 1.0,
    slab_rows: int = 256,
    return_count: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for `sweeps.solve_pressure` (f32, red-black,
    check_every=1 semantics) at any grid size. The rms reduction is fused
    into every sweep at no extra HBM cost, so `check_every` is ignored -
    the exit condition is evaluated every sweep. With `return_count`,
    returns (p, sweeps_run)."""
    del check_every
    nrows, W = p.shape
    ny = W - 2
    nx = nrows - 2
    R = slab_rows
    inv_dx2, inv_dy2 = 1.0 / (dx * dx), 1.0 / (dy * dy)
    ap = -volp * (2.0 * inv_dx2 + 2.0 * inv_dy2)
    sor = min(sor, optimal_sor(nx, ny))

    b_int = (rho / dt) * ff.divergence_sum()
    b = jnp.zeros(p.shape, jnp.float32).at[1:-1, 1:-1].set(b_int)
    fpad = _pad_slabs(p.astype(jnp.float32), R)
    bpad = _pad_slabs(b, R)

    sweep = functools.partial(
        tiled_rb_sweep, bpad=bpad, R=R, nrows=nrows, ny=ny,
        inv_dx2=inv_dx2, inv_dy2=inv_dy2, volp=volp, ap=ap, sor=sor,
        interpret=interpret,
    )

    def body(carry):
        f, prev, best, stale, checks, it = carry
        f, rms = sweep(f)
        stale, best = stall_update(rms, prev, best, stale)
        return f, rms, best, stale, checks + 1, it + 1

    def cond(carry):
        _, rms, _, stale, checks, it = carry
        return jnp.logical_and(
            jnp.logical_and(it < max_iter, rms >= tol),
            jnp.logical_not(stalled(stale, checks)),
        )

    big = jnp.asarray(jnp.inf, jnp.float32)
    zero = jnp.asarray(0, jnp.int32)
    fpad, _, _, _, _, it = jax.lax.while_loop(
        cond, body, (fpad, big, big, zero, zero, zero)
    )
    out = fpad[R:R + nrows].astype(p.dtype)
    if return_count:
        return out, it
    return out
