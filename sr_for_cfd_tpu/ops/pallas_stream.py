"""Slab-streamed Pallas multigrid: the Pallas performance path PAST the
VMEM wall (VERDICT r2 item #1).

The VMEM-resident kernels (ops/pallas_mg.py, ops/pallas_step.py) hold the
whole grid + hierarchy on-chip and die at ~900^2 f32; beyond that the only
prior Pallas option was the tiled reference-semantics sweep
(ops/pallas_tiled.py) - the wrong algorithm for the regime (bandwidth-
optimal per sweep, but point iteration needs O(N) sweeps where multigrid
needs O(1) cycles). This module streams the V-cycle's FINE level through
VMEM in row slabs while the coarse sub-hierarchy (from nf/2 down) stays
VMEM-resident, so the per-cycle HBM traffic is ~6 fine-array passes
instead of the jnp path's 2 passes per half-sweep:

  pass A  (streamed)  k1 = n_pre red-black sweeps + residual + restrict,
                      ONE pass over HBM: wide halos (2*k1+2 rows) let all
                      k1 sweeps run per slab with redundant halo-row
                      recompute, the same lag-one double-buffer mechanics
                      as ops/pallas_tiled.py; also emits the ENTRY
                      residual RMS (the convergence measure, see below)
  coarse  (resident)  one recursive V-cycle on levels 1.. - the same
                      operators/smoother as ops/pallas_mg.py (shared
                      `make_level_ops`), plus the column prolongation
                      matmul, in one kernel
  pass B  (streamed)  row-prolong + correct + k2 = n_post sweeps,
                      one pass over HBM

Fine-level transfer operators: `jax.image.resize(linear)` at exact 2x is
a stride-2 [1,3,3,1]/8 conv (restriction; boundary rows renormalize to
/7) and a [0.75, 0.25] two-tap interpolation (prolongation; boundary
rows collapse to identity, reproduced by edge-replicated padding).
Verified equal to `pallas_mg._resize_matrix` to f32 rounding in
tests/test_pallas_stream.py. Rows (sublane dim) use these convs; columns
(lane dim) use the exact `_resize_matrix` operators on the MXU - lane-dim
strided ops are the one thing Mosaic handles badly, dense matmul is what
it handles best. Semi-coarsened levels (anisotropy, e.g. the BFS 10x3
domain) skip the identity direction entirely, exactly like the jnp path.

Convergence semantics: the fine-level residual RMS is measured at pass
A's ENTRY (free: the first half-sweep's residual IS the entry residual).
That value equals the rms AFTER the previous cycle, so the exit check
lags one cycle and the loop runs one extra cycle past tolerance compared
with `mg_solve_pressure` - the extra cycle only tightens the solve (same
fixed point; converged fields agree to ~1e-5, gated on silicon in
bench.py). Same unified stall policy as every other inner loop.

float32, TPU (interpret mode for CPU tests). Reference semantics: the
frozen-ghost pressure-Poisson system of `LDV PyCFD given by
sir.py:561-583`, solved to tolerance; SURVEY.md section 5.7 names the
spatial grid as the reference's scaling axis - this kernel is the
single-chip answer (parallel/spmd_step.py is the multi-chip one).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .multigrid import MG_MAX_CYCLES, MG_SMOOTHER_SOR, ghost_fold
from .pallas_mg import (
    MGPlan,
    make_level_ops,
    mxu_dot_f32,
    plan_hierarchy,
)
from .pallas_tiled import _pad_slabs, _vmem_params
from .stencil import FaceFluxes
from .sweeps import stall_update, stalled

# default slab height (rows per grid step); must be a multiple of 16 (the
# restrict/prolong slice offsets (i-1)*R/2 must stay sublane-aligned, see
# stream_mg_solve_pressure)
SLAB_ROWS = 256


def _row_restrict_norm(nc: int, scale: float, coarsen_x: bool):
    """Per-coarse-row normalization of the unnormalized [1,3,3,1] stride-2
    row conv, times the finite-volume restriction scale: interior rows
    1/8, boundary rows 1/7 (the triangle kernel's in-range weight sum) -
    exactly `_resize_matrix(nf, nc)`'s row action. Built in-kernel from an
    iota (Pallas kernels cannot capture materialized array constants)."""
    if not coarsen_x:
        return jnp.float32(scale)
    rows = jax.lax.broadcasted_iota(jnp.int32, (nc, 1), 0)
    boundary = (rows == 0) | (rows == nc - 1)
    return jnp.where(boundary, jnp.float32(scale / 7.0),
                     jnp.float32(scale / 8.0))


def _subplan(plan: MGPlan):
    """The hierarchy from level 1 down (VMEM-resident in the coarse
    kernel), plus the number of level-0 transfer matrices to skip."""
    n_l0_mats = sum(1 for ident in plan.idents[0] if not ident)
    sub = MGPlan(
        sizes=plan.sizes[1:], spacings=plan.spacings[1:],
        volp_levels=plan.volp_levels[1:], scales=plan.scales[1:],
        idents=plan.idents[1:], mats=plan.mats[n_l0_mats:],
    )
    return sub, n_l0_mats


def _lap_win(f, inv_dx2, inv_dy2, volp):
    """5-point volp-scaled Laplacian on a window with zero row/column
    edges (true exterior at domain edges; garbage-but-discarded in halo
    rows mid-domain)."""
    n, m = f.shape
    zr = jnp.zeros((1, m), f.dtype)
    zc = jnp.zeros((n, 1), f.dtype)
    e = jnp.concatenate([f[1:], zr], axis=0)
    w = jnp.concatenate([zr, f[:-1]], axis=0)
    nn = jnp.concatenate([f[:, 1:], zc], axis=1)
    ss = jnp.concatenate([zc, f[:, :-1]], axis=1)
    return volp * ((e - 2.0 * f + w) * inv_dx2
                   + (nn - 2.0 * f + ss) * inv_dy2)


def _pass_a_kernel(x_ref, b_ref, *rest, R, W, nf, Ha, k1, inv_dx2, inv_dy2,
                   volp, sor, coarsen_x, coarsen_y):
    """Streamed pre-smooth + entry-rms + residual + restrict."""
    if coarsen_y:
        rct_ref = rest[0]
        rest = rest[1:]
    else:
        rct_ref = None
    xo_ref, rc_ref, ss_ref, s_x, s_b, t_x, t_b = rest
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    cur_x = x_ref[:]
    cur_b = b_ref[:]
    ap = -volp * (2.0 * inv_dx2 + 2.0 * inv_dy2)
    inv_ap = sor / ap

    @pl.when(i == 0)
    def _init():
        xo_ref[:] = jnp.zeros((R, W), jnp.float32)
        rc_ref[:] = jnp.zeros(rc_ref.shape, jnp.float32)
        ss_ref[:, :] = jnp.zeros((1, 1), jnp.float32)
        # zero s_* so the end-of-step slide leaves t_* = zeros: the carry
        # rows represent the EXTERIOR (g < 0), which must be exactly zero
        # here (unlike pallas_tiled, whose carry rows are never read)
        s_x[:] = jnp.zeros((R, W), jnp.float32)
        s_b[:] = jnp.zeros((R, W), jnp.float32)

    @pl.when(jnp.logical_and(i > 0, i < n_steps - 1))
    def _compute():
        win = jnp.concatenate([t_x[:], s_x[:], cur_x[:Ha]], axis=0)
        bwin = jnp.concatenate([t_b[:], s_b[:], cur_b[:Ha]], axis=0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (R + 2 * Ha, W), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (R + 2 * Ha, W), 1)
        g = (i - 1) * R - Ha + kk
        valid = (g >= 0) & (g < nf)
        red = valid & (((g + jj) % 2) == 0)
        black = valid & (((g + jj) % 2) == 1)
        own = (kk >= Ha) & (kk < Ha + R)

        ss_part = None
        for s in range(k1):
            r = bwin - _lap_win(win, inv_dx2, inv_dy2, volp)
            if s == 0:
                # the first half-sweep's residual IS the entry residual
                # (pre-update) - the lagged convergence measure, free
                ss_part = jnp.sum(jnp.where(own & valid, r * r, 0.0))
            win = win + jnp.where(red, r * inv_ap, 0.0)
            r = bwin - _lap_win(win, inv_dx2, inv_dy2, volp)
            win = win + jnp.where(black, r * inv_ap, 0.0)
        ss_ref[:, :] += ss_part.reshape(1, 1)
        xo_ref[:] = win[Ha:Ha + R]

        # residual after k1 sweeps, valid on own rows (Ha = 2 k1 + 2
        # halo rows keep own +-1 neighbors exact); exterior zeroed
        r_fin = bwin - _lap_win(win, inv_dx2, inv_dy2, volp)
        # own is identically True on [Ha, Ha+R): slice first, mask after
        r_own = jnp.where(valid[Ha:Ha + R], r_fin[Ha:Ha + R], 0.0)

        if coarsen_y:
            r_cols = mxu_dot_f32(r_own, rct_ref[:])
        else:
            r_cols = r_own
        mcc = r_cols.shape[1]
        if coarsen_x:
            # unnormalized [1,3,3,1] stride-2 row conv; per-row norms
            # (1/8 interior, 1/7 boundary, x restriction scale) are
            # applied in the coarse kernel after cross-slab accumulation
            rp = jnp.concatenate(
                [jnp.zeros((3, mcc), jnp.float32), r_cols,
                 jnp.zeros((3, mcc), jnp.float32)], axis=0)
            half = rp.reshape((R + 6) // 2, 2, mcc)
            ev, od = half[:, 0], half[:, 1]
            u = ev[:-1] + 3.0 * od[:-1] + 3.0 * ev[1:] + od[1:]
            # global c0 = c0p - 1 (rc carries one top pad row); R % 16
            # keeps the store offset sublane-aligned (Mosaic requires a
            # provable multiple of 8 for dynamic dim-0 indices)
            c0p = pl.multiple_of((i - 1) * (R // 2), 8)
            rc_ref[pl.ds(c0p, R // 2 + 2), :] += u
        else:
            # identity rows: no top pad (an offset of (i-1)R + 1 would be
            # sublane-misaligned; the coarse kernel reads rows [0, nf))
            rc_ref[pl.ds(pl.multiple_of((i - 1) * R, 8), R), :] += r_cols

    @pl.when(i == n_steps - 1)
    def _tail():
        xo_ref[:] = jnp.zeros((R, W), jnp.float32)

    t_x[:] = s_x[R - Ha:]
    t_b[:] = s_b[R - Ha:]
    s_x[:] = cur_x
    s_b[:] = cur_b


def _coarse_kernel(rc_ref, *rest, subplan, scale0, coarsen_x, n_pre,
                   n_post, sor, coarsest_sweeps, coarsen_y, hbp):
    """One recursive V-cycle on the VMEM-resident sub-hierarchy, then
    column prolongation (MXU) and edge-row padding for pass B."""
    n_sub_mats = len(subplan.mats)
    mat_refs = rest[:n_sub_mats]
    if coarsen_y:
        pct_ref = rest[n_sub_mats]
        e2_ref = rest[n_sub_mats + 1]
    else:
        pct_ref = None
        e2_ref = rest[n_sub_mats]
    ncr = subplan.sizes[0][0]
    norm_row = _row_restrict_norm(ncr, scale0, coarsen_x)
    rc_top = 1 if coarsen_x else 0  # conv layout carries one top pad row
    rc = rc_ref[rc_top:rc_top + ncr] * norm_row
    _, _, v_cycle = make_level_ops(
        [m[:] for m in mat_refs], subplan, n_pre=n_pre, n_post=n_post,
        sor=sor, coarsest_sweeps=coarsest_sweeps,
    )
    e = v_cycle(jnp.zeros(subplan.sizes[0], jnp.float32), rc, 0)
    if coarsen_y:
        # f32-accurate 3-pass dot: default MXU dot is bf16 (pallas_mg)
        e = mxu_dot_f32(e, pct_ref[:])
    # edge-replicated row padding: hbp rows on top (prolongation's edge
    # clamp + negative slice offsets at the first slab), the rest on the
    # bottom (ragged final slabs slice past nc; the replicated rows are
    # exterior-masked in pass B)
    bot_pad = e2_ref.shape[0] - hbp - ncr
    top = jnp.concatenate([e[0:1]] * hbp, axis=0)
    bot = jnp.concatenate([e[-1:]] * bot_pad, axis=0)
    e2_ref[:] = jnp.concatenate([top, e, bot], axis=0)


def _pass_b_kernel(x_ref, b_ref, e2_ref, xo_ref, s_x, s_b, t_x, t_b, *,
                   R, W, nf, Hb, k2, inv_dx2, inv_dy2, volp, sor,
                   coarsen_x, hbp):
    """Streamed row-prolong + correct + post-smooth."""
    # the e2 slice offsets below algebraically absorb hbp (the coarse
    # kernel's top-pad depth); assert the relation they encode so an
    # e2-padding change cannot silently desynchronize the two kernels
    assert hbp == ((Hb // 2 + 1) if coarsen_x else Hb)
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    cur_x = x_ref[:]
    cur_b = b_ref[:]
    ap = -volp * (2.0 * inv_dx2 + 2.0 * inv_dy2)
    inv_ap = sor / ap
    nwin = R + 2 * Hb

    @pl.when(i == 0)
    def _init():
        xo_ref[:] = jnp.zeros((R, W), jnp.float32)
        s_x[:] = jnp.zeros((R, W), jnp.float32)  # exterior carry (see A)
        s_b[:] = jnp.zeros((R, W), jnp.float32)

    @pl.when(jnp.logical_and(i > 0, i < n_steps - 1))
    def _compute():
        win = jnp.concatenate([t_x[:], s_x[:], cur_x[:Hb]], axis=0)
        bwin = jnp.concatenate([t_b[:], s_b[:], cur_b[:Hb]], axis=0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (nwin, W), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (nwin, W), 1)
        g = (i - 1) * R - Hb + kk
        valid = (g >= 0) & (g < nf)
        red = valid & (((g + jj) % 2) == 0)
        black = valid & (((g + jj) % 2) == 1)

        if coarsen_x:
            # fine row g -> 0.75 E[g//2] + 0.25 E[g//2 -+ 1] (odd/even);
            # boundary identity rows come from e2's edge-replicated pad.
            # The slice offset (m0 + hbp - 1 for m0 = g0//2) simplifies
            # to (i-1) R/2 exactly - sublane-aligned given R % 16 == 0
            # (Mosaic needs a provable multiple of 8)
            off = pl.multiple_of((i - 1) * (R // 2), 8)
            Es = e2_ref[pl.ds(off, nwin // 2 + 2), :]
            em1, em, ep1 = Es[:-2], Es[1:-1], Es[2:]
            c_even = 0.75 * em + 0.25 * em1
            c_odd = 0.75 * em + 0.25 * ep1
            corr = jnp.stack([c_even, c_odd], axis=1).reshape(nwin, W)
        else:
            # identity rows: offset (i-1)R - Hb + hbp == (i-1)R exactly
            # (hbp == Hb in this mode)
            off = pl.multiple_of((i - 1) * R, 8)
            corr = e2_ref[pl.ds(off, nwin), :]
        win = win + jnp.where(valid, corr, 0.0)

        for _ in range(k2):
            r = bwin - _lap_win(win, inv_dx2, inv_dy2, volp)
            win = win + jnp.where(red, r * inv_ap, 0.0)
            r = bwin - _lap_win(win, inv_dx2, inv_dy2, volp)
            win = win + jnp.where(black, r * inv_ap, 0.0)
        xo_ref[:] = win[Hb:Hb + R]

    @pl.when(i == n_steps - 1)
    def _tail():
        xo_ref[:] = jnp.zeros((R, W), jnp.float32)

    t_x[:] = s_x[R - Hb:]
    t_b[:] = s_b[R - Hb:]
    s_x[:] = cur_x
    s_b[:] = cur_b


@functools.partial(
    jax.jit,
    static_argnames=("dx", "dy", "dt", "rho", "volp", "tol", "max_cycles",
                     "n_pre", "n_post", "smoother_sor", "min_size",
                     "coarsest_sweeps", "slab_rows", "return_count",
                     "interpret"),
)
def stream_mg_solve_pressure(
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
    slab_rows: int = SLAB_ROWS,
    return_count: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for `multigrid.mg_solve_pressure` at grids past
    the VMEM wall (f32): same level schedule, smoother, and transfer
    operators; lagged exit check (one extra cycle - see module docstring).
    With `return_count`, returns (p, bodies_run)."""
    if p.dtype != jnp.float32:
        raise ValueError("stream_mg_solve_pressure is float32-only")
    nx, ny = p.shape[0] - 2, p.shape[1] - 2
    if nx % 2 or ny % 2:
        raise ValueError("streamed multigrid needs even nx, ny")
    plan = plan_hierarchy(nx, ny, dx, dy, volp, min_size=min_size)
    if len(plan.sizes) < 2:
        raise ValueError("grid too small for a multigrid hierarchy")
    if n_pre < 1 or n_post < 1:
        raise ValueError("the streamed V-cycle needs n_pre >= 1 and "
                         "n_post >= 1 (entry-rms and halo widths are "
                         "built from the smoothing sweeps)")
    coarsen_x = not plan.idents[0][0]
    coarsen_y = not plan.idents[0][1]
    nc, mc = plan.sizes[1]
    subplan, n_l0 = _subplan(plan)
    R = slab_rows
    if R % 16:
        raise ValueError("slab_rows must be a multiple of 16 (keeps the "
                         "restrict/prolong slice offsets (i-1)*R/2 "
                         "sublane-aligned for Mosaic)")
    Ha = 2 * n_pre + 2
    Hb = 2 * n_post
    if Ha > R or Hb > R:
        raise ValueError("slab_rows too small for the smoother halos")
    inv_dx2, inv_dy2 = plan.spacings[0]
    volp0 = plan.volp_levels[0]
    sor = smoother_sor
    n_cells = nx * ny

    # RHS with the frozen ghost ring folded in (identical to
    # mg_solve_pressure / pallas_mg_solve_pressure)
    b_int = (rho / dt) * ff.divergence_sum()
    ghost_only = p.at[1:-1, 1:-1].set(0.0)
    b_eff = b_int - ghost_fold(ghost_only, inv_dx2, inv_dy2, volp0)

    fpad = _pad_slabs(p[1:-1, 1:-1], R)
    bpad = _pad_slabs(b_eff, R)
    n_blocks = fpad.shape[0] // R
    W = ny

    # level-0 column transfer operators (exact resize matrices, MXU)
    l0_mats = []
    if coarsen_y:
        l0_mats = [plan.mats[0 + (1 if coarsen_x else 0)]]  # RcT (mf, mc)
        # plan.mats order per level: R_row (if x), Rc_T (if y), P_row
        # (if x), Pc_T (if y)
        pct = plan.mats[n_l0 - 1]  # Pc_T (mc, mf): always last of level 0
    else:
        pct = None
    space = pl.ANY if interpret else pltpu.VMEM
    kw = _vmem_params(interpret)
    # buffer row counts are sized to the PADDED slab span, not nc: a
    # ragged final slab's restrict writes / prolong reads run past nc by
    # up to a slab's worth of (zero / exterior-masked) rows, and an
    # out-of-range dynamic slice silently clamps its start - corrupting
    # real rows (measured: 72-row grid with 16-row slabs, diff ~1.0)
    n_data = n_blocks - 2
    ebase = (n_data * R // 2) if coarsen_x else (n_data * R)
    nc_pad = ebase + 2
    # pass B slices e2 rows at offset g_lo//2 - 1 (coarsened rows) or
    # g_lo (identity rows), g_lo = -Hb at the first data slab; pad e2's
    # rows so the offset stays >= 0
    hbp = (Hb // 2 + 1) if coarsen_x else Hb
    e2_rows = ebase + 2 * hbp + 2

    def load_idx(i):
        return (jnp.minimum(i + 1, n_blocks - 1), 0)

    pass_a = pl.pallas_call(
        functools.partial(
            _pass_a_kernel, R=R, W=W, nf=nx, Ha=Ha, k1=n_pre,
            inv_dx2=inv_dx2, inv_dy2=inv_dy2, volp=volp0, sor=sor,
            coarsen_x=coarsen_x, coarsen_y=coarsen_y,
        ),
        # donate x's buffer (write trails the lagged read; pallas_tiled)
        input_output_aliases={0: 0},
        grid=(n_blocks,),
        in_specs=(
            [pl.BlockSpec((R, W), load_idx), pl.BlockSpec((R, W), load_idx)]
            + ([pl.BlockSpec((W, mc), lambda i: (0, 0))] if coarsen_y
               else [])
        ),
        out_specs=[
            pl.BlockSpec((R, W), lambda i: (i, 0)),
            pl.BlockSpec((nc_pad, mc), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(fpad.shape, jnp.float32),
            jax.ShapeDtypeStruct((nc_pad, mc), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, W), jnp.float32),
            pltpu.VMEM((R, W), jnp.float32),
            pltpu.VMEM((Ha, W), jnp.float32),
            pltpu.VMEM((Ha, W), jnp.float32),
        ],
        interpret=interpret,
        **kw,
    )

    coarse = pl.pallas_call(
        functools.partial(
            _coarse_kernel, subplan=subplan, scale0=plan.scales[0],
            coarsen_x=coarsen_x, n_pre=n_pre, n_post=n_post, sor=sor,
            coarsest_sweeps=coarsest_sweeps, coarsen_y=coarsen_y,
            hbp=hbp,
        ),
        in_specs=[pl.BlockSpec(memory_space=space)]
        * (1 + len(subplan.mats) + (1 if coarsen_y else 0)),
        out_specs=pl.BlockSpec(memory_space=space),
        out_shape=jax.ShapeDtypeStruct((e2_rows, W), jnp.float32),
        interpret=interpret,
        **kw,
    )

    pass_b = pl.pallas_call(
        functools.partial(
            _pass_b_kernel, R=R, W=W, nf=nx, Hb=Hb, k2=n_post,
            inv_dx2=inv_dx2, inv_dy2=inv_dy2, volp=volp0, sor=sor,
            coarsen_x=coarsen_x, hbp=hbp,
        ),
        input_output_aliases={0: 0},
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((R, W), load_idx),
            pl.BlockSpec((R, W), load_idx),
            pl.BlockSpec((e2_rows, W), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((R, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(fpad.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R, W), jnp.float32),
            pltpu.VMEM((R, W), jnp.float32),
            pltpu.VMEM((Hb, W), jnp.float32),
            pltpu.VMEM((Hb, W), jnp.float32),
        ],
        interpret=interpret,
        **kw,
    )

    def body(carry):
        f, prev, best, stale, it = carry
        f, rc, ss = pass_a(f, bpad, *l0_mats)
        rms = jnp.sqrt(ss[0, 0] / n_cells)
        e2 = coarse(rc, *subplan.mats, *([pct] if coarsen_y else []))
        f = pass_b(f, bpad, e2)
        stale, best = stall_update(rms, prev, best, stale)
        return f, rms, best, stale, it + 1

    def cond(carry):
        _, rms, best, stale, it = carry
        # `rms` lags one cycle (it is the residual BEFORE this body's
        # pre-smooth = after the previous cycle), so the loop runs one
        # extra cycle past tolerance
        return jnp.logical_and(
            jnp.logical_and(it < max_cycles, best >= tol),
            jnp.logical_not(stalled(stale, it)),
        )

    big = jnp.float32(jnp.inf)
    zero = jnp.asarray(0, jnp.int32)
    fpad, _, _, _, cycles = jax.lax.while_loop(
        cond, body, (fpad, big, big, zero, zero)
    )
    out = p.at[1:-1, 1:-1].set(fpad[R:R + nx])
    if return_count:
        return out, cycles
    return out
