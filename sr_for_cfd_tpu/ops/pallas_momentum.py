"""Tiled, double-buffered red-black MOMENTUM sweep for grids beyond VMEM.

At 1024^2+ the SIMPLE step is momentum-dominated: the pressure V-cycle
is ~0.6 ms of the 2.3 ms step, the two momentum inner loops (3 QUICK
sweeps each, warm) most of the rest. This kernel fuses one whole
red-black momentum sweep - red half, black half, and the residual-RMS
reduction - into ONE pass over HBM per sweep (read x/old/4 fluxes +
write x), using the same sequential-grid slab pipeline as
`ops/pallas_tiled.py`.

Performance note (measured on this chip; CORRECTED late-r3): the chip
streams ~740 GB/s pure-read / ~570 GB/s mixed read+write when timed by
trip-count differencing (two trip counts of one on-device loop, byte
delta over time delta - the method that cancels this environment's
~25 ms relay round-trip per synced dispatch; the interim "120-160
GB/s" figure here was that round-trip swamping a too-small probe, and
the bench's still-earlier "700 GB/s" was an XLA-cost-model byte
estimate that ignores fusion). Differenced, a QUICK red-black sweep costs
0.14 ms at 1024^2 / 0.49 ms at 2048^2 on the jnp lowering (~420 GB/s
of fused traffic - the jnp red half and black half each round-trip
HBM); this kernel's one-HBM-pass-per-sweep measures 0.325 ms at 2048^2
(-34%, both halves inside the slab), and multi-sweep passes
(`check_every` sweeps per HBM pass) stack on top. A 12-array
precomputed-coefficient variant (fewer VPU ops) moves ~2x the bytes
and measured SLOWER end-to-end. Keep the per-eval formulation.

Residual semantics are `sweeps.momentum_residual` exactly (QUICK or
UPWIND convection with the reference's edge-clamped +-2 far neighbors,
diffusion, temporal term; `LDV PyCFD given by sir.py:517-559`), the
same in-kernel formulation as the VMEM-resident fused step
(`ops/pallas_step.py`). The loop/stall policy matches
`sweeps.sweep_loop` (redblack, sor=1.0): trajectories are elementwise-
identical, fields match the jnp path to f32 rounding with identical
sweep counts.

Halo mechanics: own rows need red-updated +-1 neighbors and original
+-2 (QUICK) for their black half; red halo rows one beyond own need
their own original +-2. A 3-row halo (2 for UPWIND) per side covers it;
halo red rows are recomputed redundantly per slab instead of
communicated. Face fluxes and the old field are frozen for the whole
inner solve and stream alongside x with the same carry-window
treatment.

float32, TPU (interpret mode for CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import QUICK
from .pallas_step import _roll
from .pallas_tiled import _pad_slabs, _vmem_params
from .stencil import FaceFluxes
from .sweeps import stall_update, stalled


def _shift_rows(x, shift):
    """Row (sublane) shift with replicated edges (pallas_step._roll):
    out-of-range positions only feed masked or clamped cells."""
    return _roll(x, shift, 0)


def _shift_cols(x, shift):
    return _roll(x, shift, 1)


def _sweep_kernel(x_ref, o_ref, fe_ref, fn_ref, fw_ref, fs_ref, nu_ref,
                  out_ref, rms_ref, *scratch, R, W, nx, ny, H, k_sweeps,
                  quick, inv_dx2, inv_dy2, volp, dt, ap_d):
    """One grid step: compute slab i from carries + lookahead of all six
    streamed arrays, run k_sweeps FULL red-black sweeps (halo width
    H = 3k (QUICK) / 2k covers the progressive erosion of valid halo
    rows - the pallas_stream pass-A trick), write slab i's updated x,
    accumulate the LAST sweep's rms partial. Scratch layout:
    (s_x, t_x, s_o, t_o, s_fe, t_fe, ...)."""
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    cur = (x_ref[:], o_ref[:], fe_ref[:], fn_ref[:], fw_ref[:], fs_ref[:])
    ss = [scratch[2 * k] for k in range(6)]
    ts = [scratch[2 * k + 1] for k in range(6)]
    nu = nu_ref[0, 0]

    @pl.when(i == 0)
    def _init():
        rms_ref[:, :] = jnp.zeros((1, 1), jnp.float32)
        out_ref[:] = jnp.zeros((R, W), jnp.float32)
        # zero s, not t: the unconditional end-of-step slide below copies
        # t from s in this same grid step, so zeroing t directly would be
        # dead (t would be re-filled from uninitialized s scratch); with s
        # zeroed the slide leaves t zeroed for step 1, the exterior-carry
        # invariant the window masks assume (pallas_stream pass A does the
        # same)
        for s in ss:
            s[:] = jnp.zeros((R, W), jnp.float32)

    @pl.when(jnp.logical_and(i > 0, i < n_steps - 1))
    def _compute():
        # extended windows: rows 0..R+2H-1, own rows [H, H+R)
        x, old, fe, fn, fw, fs = (
            jnp.concatenate([t[:], s[:], c[:H]], axis=0)
            for t, s, c in zip(ts, ss, cur)
        )
        kk = jax.lax.broadcasted_iota(jnp.int32, (R + 2 * H, W), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (R + 2 * H, W), 1)
        g = (i - 1) * R + kk - H          # global padded row index
        interior = (g >= 1) & (g <= nx) & (jj >= 1) & (jj <= ny)
        red = interior & (((g + jj) % 2) == 0)
        black = interior & (((g + jj) % 2) == 1)
        own = (kk >= H) & (kk < H + R)

        def residual(f):
            e = _shift_rows(f, -1)
            w = _shift_rows(f, 1)
            n = _shift_cols(f, -1)
            s = _shift_cols(f, 1)
            pos_e, pos_w = fe >= 0, fw >= 0
            pos_n, pos_s = fn >= 0, fs >= 0
            if quick:
                # edge-clamped +-2 far neighbors (stencil.shifts2 /
                # pallas_step convention; the reference reads OOB here)
                ee = jnp.where(g == nx, e, _shift_rows(f, -2))
                ww = jnp.where(g == 1, w, _shift_rows(f, 2))
                nn = jnp.where(jj == ny, n, _shift_cols(f, -2))
                sss = jnp.where(jj == 1, s, _shift_cols(f, 2))
                ue = jnp.where(pos_e, 0.75 * f + 0.375 * e - 0.125 * w,
                               0.75 * e + 0.375 * f - 0.125 * ee)
                uw = jnp.where(pos_w, 0.75 * f + 0.375 * w - 0.125 * e,
                               0.75 * w + 0.375 * f - 0.125 * ww)
                un = jnp.where(pos_n, 0.75 * f + 0.375 * n - 0.125 * s,
                               0.75 * n + 0.375 * f - 0.125 * nn)
                us = jnp.where(pos_s, 0.75 * f + 0.375 * s - 0.125 * n,
                               0.75 * s + 0.375 * f - 0.125 * sss)
                sum_flux = (jnp.where(pos_e, 0.75, 0.375) * fe
                            + jnp.where(pos_w, 0.75, 0.375) * fw
                            + jnp.where(pos_n, 0.75, 0.375) * fn
                            + jnp.where(pos_s, 0.75, 0.375) * fs)
            else:
                ue = jnp.where(pos_e, f, e)
                uw = jnp.where(pos_w, f, w)
                un = jnp.where(pos_n, f, n)
                us = jnp.where(pos_s, f, s)
                sum_flux = (jnp.where(pos_e, fe, 0.0)
                            + jnp.where(pos_w, fw, 0.0)
                            + jnp.where(pos_n, fn, 0.0)
                            + jnp.where(pos_s, fs, 0.0))
            fc = ue * fe + uw * fw + un * fn + us * fs
            fd = volp * ((e - 2.0 * f + w) * inv_dx2
                         + (n - 2.0 * f + s) * inv_dy2)
            r = -(volp / dt * (f - old) + fc - nu * fd)
            ap = volp / dt + sum_flux * volp - nu * ap_d
            return r, ap

        r1 = r2 = None
        for _ in range(k_sweeps):
            r1, ap1 = residual(x)
            x = x + jnp.where(red, r1 / ap1, 0.0)
            r2, ap2 = residual(x)
            x = x + jnp.where(black, r2 / ap2, 0.0)

        part = jnp.sum(jnp.where(own & red, r1 * r1, 0.0)
                       + jnp.where(own & black, r2 * r2, 0.0))
        rms_ref[:, :] += part.reshape(1, 1)
        out_ref[:] = x[H:H + R]

    @pl.when(i == n_steps - 1)
    def _tail():
        out_ref[:] = jnp.zeros((R, W), jnp.float32)

    for t, s, c in zip(ts, ss, cur):
        t[:] = s[R - H:]
        s[:] = c


def _pad_interior(x, R, nrows, W):
    """Interior-shaped -> slab-padded in ONE materialization (a two-stage
    ghost-pad + slab-pad costs 4 HBM passes per array - ~0.5 ms/solve at
    1024^2, swamping the fused-sweep savings)."""
    total = (2 + -(-nrows // R)) * R
    nx = nrows - 2
    return (jnp.zeros((total, W), jnp.float32)
            .at[R + 1:R + 1 + nx, 1:-1].set(x))


def resolve_slab_rows(slab_rows: int, W: int) -> int:
    """Auto-shrink wide slabs: a (256, 2050) slab program crashes the TPU
    compile helper (measured at 2048^2); ~1 MiB slabs compile fine and
    the pipeline cost is slab-count-insensitive (module docstring).

    Momentum-specific guard: THIS kernel streams six input windows per
    slab, which is what blows the compile helper's budget. The sibling
    slab pipelines (pallas_tiled: 2 windows, pallas_stream: 2-3) compile
    and run at (256, 2050) - both are measured at 2048^2 by
    scripts/scaling_bench.py with 256-row slabs - so they deliberately
    do not auto-shrink."""
    R = slab_rows
    while R > 8 and R * W * 4 > (1 << 20):
        R //= 2
    return R


def pad_ff_slabs(ff: FaceFluxes, slab_rows, nrows, W):
    """Slab-pad the (frozen) face fluxes ONCE per outer step: the u and v
    momentum solves share them, so the caller can hoist this and pass the
    tuple as `ff` to both `tiled_solve_momentum` calls (same slab_rows)."""
    R = resolve_slab_rows(slab_rows, W)
    return tuple(_pad_interior(f, R, nrows, W)
                 for f in (ff.e, ff.n, ff.w, ff.s))


@functools.partial(
    jax.jit,
    static_argnames=("scheme", "dx", "dy", "dt", "volp", "tol", "max_iter",
                     "check_every", "slab_rows", "return_count",
                     "interpret"),
)
def tiled_solve_momentum(
    phi: jnp.ndarray,
    phi_old_int: jnp.ndarray,
    ff: FaceFluxes,
    *,
    scheme: str,
    dx: float,
    dy: float,
    dt: float,
    nu,
    volp: float,
    tol: float = 1e-6,
    max_iter: int = 1000,
    check_every: int = 1,
    slab_rows: int = 256,
    return_count: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for `sweeps.solve_momentum` (f32, redblack) at
    any grid size: same residual, update order, check cadence, and stall
    policy, one HBM pass per sweep. With `return_count`, returns
    (phi, sweeps_run)."""
    if phi.dtype != jnp.float32:
        # raise like the sibling kernels (pallas_stream/pallas_mg) rather
        # than silently downcasting: an f64 validation case would get
        # f32-rounded residuals re-labeled as f64
        raise ValueError("tiled_solve_momentum is float32-only")
    nrows, W = phi.shape
    nx, ny = nrows - 2, W - 2
    R = resolve_slab_rows(slab_rows, W)
    quick = scheme == QUICK
    # ALL check_every sweeps run inside one kernel pass (the rms is only
    # read at that cadence anyway): per-pass HBM traffic is ~constant, so
    # k sweeps cost ~1 sweep's bandwidth
    k_sweeps = max(1, check_every)
    H = (3 if quick else 2) * k_sweeps
    if R < H:
        if R < slab_rows:
            # the width-based compile-budget cap shrank R below the halo:
            # raising slab_rows CANNOT help (resolve_slab_rows re-caps it);
            # the only real remedies are fewer sweeps per pass or a
            # narrower grid
            raise ValueError(
                f"slab_rows auto-shrunk to {R} at width {W} (compile-"
                f"budget cap), below the {H}-row halo ({k_sweeps} "
                f"sweeps/pass) - lower check_every (raising slab_rows "
                f"cannot help at this width)")
        raise ValueError(
            f"slab_rows={R} smaller than the {H}-row halo "
            f"({k_sweeps} sweeps/pass) - raise slab_rows or lower "
            "check_every")
    inv_dx2, inv_dy2 = 1.0 / (dx * dx), 1.0 / (dy * dy)
    ap_d = -volp * (2.0 * inv_dx2 + 2.0 * inv_dy2)
    n_cells = nx * ny

    xpad = _pad_slabs(phi, R)
    opad = _pad_interior(phi_old_int, R, nrows, W)
    if isinstance(ff, tuple) and not isinstance(ff, FaceFluxes):
        fpads = list(ff)  # pre-padded by pad_ff_slabs (shared u/v)
        if fpads[0].shape != xpad.shape:
            raise ValueError("pre-padded ff slab shape mismatch")
    else:
        fpads = [_pad_interior(f, R, nrows, W)
                 for f in (ff.e, ff.n, ff.w, ff.s)]
    nu_arr = jnp.full((1, 1), 1.0, jnp.float32) * nu
    n_blocks = xpad.shape[0] // R

    kernel = functools.partial(
        _sweep_kernel, R=R, W=W, nx=nx, ny=ny, H=H, k_sweeps=k_sweeps,
        quick=quick, inv_dx2=inv_dx2, inv_dy2=inv_dy2, volp=volp, dt=dt,
        ap_d=ap_d,
    )

    def load_idx(i):
        return (jnp.minimum(i + 1, n_blocks - 1), 0)

    sweep_call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        # donate x's buffer to the output (write trails the lagged read;
        # see pallas_tiled)
        input_output_aliases={0: 0},
        in_specs=(
            [pl.BlockSpec((R, W), load_idx)] * 6
            + [pl.BlockSpec((1, 1), lambda i: (0, 0))]
        ),
        out_specs=[
            pl.BlockSpec((R, W), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xpad.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            s for _ in range(6)
            for s in (pltpu.VMEM((R, W), jnp.float32),
                      pltpu.VMEM((H, W), jnp.float32))
        ],
        interpret=interpret,
        **_vmem_params(interpret),
    )

    def sweep(x):
        out, ss = sweep_call(x, opad, *fpads, nu_arr)
        return out, jnp.sqrt(ss[0, 0] / n_cells)

    def body(carry):
        f, prev, best, stale, checks, it = carry
        f, rms = sweep(f)  # k_sweeps sweeps + the last one's rms
        stale, best = stall_update(rms, prev, best, stale)
        return f, rms, best, stale, checks + 1, it + k_sweeps

    def cond(carry):
        _, rms, best, stale, checks, it = carry
        return jnp.logical_and(
            jnp.logical_and(it < max_iter, rms >= tol),
            jnp.logical_not(stalled(stale, checks)),
        )

    big = jnp.asarray(jnp.inf, jnp.float32)
    zero = jnp.asarray(0, jnp.int32)
    xpad, _, _, _, _, it = jax.lax.while_loop(
        cond, body, (xpad, big, big, zero, zero, zero)
    )
    out = xpad[R:R + nrows]
    if return_count:
        return out, it
    return out
