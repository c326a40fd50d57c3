"""Slab-streamed Pallas multigrid: the Pallas performance path PAST the
VMEM wall (VERDICT r2 item #1).

The VMEM-resident kernels (ops/pallas_mg.py, ops/pallas_step.py) hold the
whole grid + hierarchy on-chip and die at ~900^2 f32; beyond that the only
prior Pallas option was the tiled reference-semantics sweep
(ops/pallas_tiled.py) - the wrong algorithm for the regime (bandwidth-
optimal per sweep, but point iteration needs O(N) sweeps where multigrid
needs O(1) cycles). This module streams the V-cycle's FINE levels through
VMEM in row slabs - RECURSIVELY: every level too big for the resident
coarse kernel streams (at 4096^2 the 4096 and 2048 levels stream, 1024
down stays resident) - so the per-cycle HBM traffic is ~6 fine-array
passes instead of the jnp path's 2 passes per half-sweep:

  pass A  (streamed)  k1 = n_pre red-black sweeps + residual + restrict,
                      ONE pass over HBM: wide halos (2*k1+2 rows) let all
                      k1 sweeps run per slab with redundant halo-row
                      recompute, the same lag-one double-buffer mechanics
                      as ops/pallas_tiled.py; also emits the ENTRY
                      residual RMS (the convergence measure, see below)
  coarse              the level-1 correction: one V-cycle on levels 1..
                      as ONE VMEM-resident kernel when the sub-hierarchy
                      fits (same operators/smoother as ops/pallas_mg.py,
                      shared `make_level_ops`), RECURSING this module's
                      streaming onto level 1 when it doesn't
                      (RESIDENT_SUB_CELLS_MAX)
  pass B  (streamed)  row-prolong + correct + k2 = n_post sweeps,
                      one pass over HBM

Past ~2560^2 the pass kernels themselves outgrow VMEM (the dense column
transfer operand alone is 32 MiB at 4096^2) and switch to the `wide`
hand-off layout (WIDE_VMEM_BYTES): per-slab restriction partials that
XLA overlap-adds, column transfers as `jax.image.resize` outside the
kernel (computed, not 100+ MiB baked-in matrix constants), and e2
pre-sliced into per-slab windows.

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
    computed_mats,
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

# Silicon-proven slab envelope: R x W cells per slab that the streaming
# passes (and the tiled momentum kernel) can double-buffer through VMEM.
# R=256 @ W=4098 (4096^2) compiles and wins; R=256 @ W=8194 fails the TPU
# compile helper (2026-08-19); R=64 and R=128 @ W=8194 both compile and
# run. Keep the proven 4096^2 operating point as the ceiling.
SLAB_CELLS_MAX = 256 * 4160


def auto_slab_rows(requested: int, width: int) -> int:
    """Clamp a requested slab height so R x `width` stays inside the
    silicon-proven VMEM envelope (halving preserves the multiple-of-16
    alignment). This is what lets `use_pallas=True` run 8192^2 out of the
    box instead of failing compile at the default R=256 (VERDICT r3 #3)."""
    r = requested
    while r > 16 and r * width > SLAB_CELLS_MAX:
        r //= 2
    return max(16, r)


# Ceiling (cells) on the TOP level of the VMEM-resident coarse kernel's
# sub-hierarchy. A 1024^2-top hierarchy (4096^2 fine grid streamed twice,
# or 2048^2 streamed once) compiles and runs; a 2048^2-top one needs
# >128 MiB of VMEM (live 16.8 MiB level arrays during smoothing + ~40 MiB
# of transfer matrices + the e2 output) and SIGABRTs the TPU compiler
# (observed at 4096^2, 2026-08-18). Past the ceiling the coarse correction
# RECURSES the slab streaming onto level 1 instead.
RESIDENT_SUB_CELLS_MAX = 1_500_000

# Per-pass VMEM estimate (double-buffered blocks + scratch, bytes) above
# which the streaming passes switch to the `wide` hand-off layout (no
# in-kernel column matmul, per-slab restriction partials, pre-sliced e2
# windows). Silicon calibration on v5e: 2048^2 estimates 42 MiB and
# compiles; 2560^2 estimates 60 MiB and SIGABRTs the TPU compiler -
# Mosaic's window temporaries eat the headroom under the 100 MiB scoped
# budget long before the budget itself is reached.
WIDE_VMEM_BYTES = 50 * 1024 * 1024


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
                   volp, sor, coarsen_x, coarsen_y, wide=False):
    """Streamed pre-smooth + entry-rms + residual + restrict.

    `wide` (the hand-off layout for very large grids, see
    `_make_streamed_cycle`): no in-kernel column restriction (the dense
    RcT operand alone is 32 MiB at 4096^2) and the restricted rows are
    emitted as PER-SLAB partial blocks at fine column width instead of
    accumulated into one VMEM-resident rc array - XLA overlap-adds the
    partials and applies the column matmul outside the kernel."""
    if coarsen_y and not wide:
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

    if wide:
        # every step owns a distinct partial block: blocks the compute
        # branch below skips (first/last) must still be zeroed
        @pl.when(i == n_steps - 1)
        def _zero_tail_partial():
            rc_ref[:] = jnp.zeros(rc_ref.shape, jnp.float32)

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
        # halo rows keep own +-1 neighbors exact); exterior zeroed.
        # Mask-then-slice, NEVER slice the i1 mask: sublane-slicing a
        # bool vector at the unaligned offset Ha crashes Mosaic's
        # ApplyVectorLayoutPass ("Check failed: limits[i] <= dim(i)" in
        # vector_extract_strided_slice under scf_if) at some widths -
        # W = 1280/2560/3072/3584 crash while 64..1024, 2048, and the
        # historical 768 runs compile, so the trigger looks like a
        # non-power-of-two lane-tile count above 8 tiles (isolated by a
        # strip-down ladder on v5e, 2026-08-18; this line was the only
        # difference between the failing kernel and a compiling one).
        # Slicing the f32 where-result at the same offset is fine.
        r_fin = bwin - _lap_win(win, inv_dx2, inv_dy2, volp)
        r_own = jnp.where(valid, r_fin, 0.0)[Ha:Ha + R]

        if coarsen_y and not wide:
            r_cols = mxu_dot_f32(r_own, rct_ref[:])
        else:
            r_cols = r_own
        mcc = r_cols.shape[1]
        if coarsen_x:
            # unnormalized [1,3,3,1] stride-2 row conv; per-row norms
            # (1/8 interior, 1/7 boundary, x restriction scale) are
            # applied in the coarse kernel (or the XLA hand-off, wide
            # mode) after cross-slab accumulation
            rp = jnp.concatenate(
                [jnp.zeros((3, mcc), jnp.float32), r_cols,
                 jnp.zeros((3, mcc), jnp.float32)], axis=0)
            half = rp.reshape((R + 6) // 2, 2, mcc)
            ev, od = half[:, 0], half[:, 1]
            u = ev[:-1] + 3.0 * od[:-1] + 3.0 * ev[1:] + od[1:]
            if wide:
                # pad the (R/2 + 2)-row partial to the block's 8-aligned
                # height (Mosaic: tiled block dims must divide by 8)
                pad = rc_ref.shape[0] - u.shape[0]
                rc_ref[:] = jnp.concatenate(
                    [u, jnp.zeros((pad, u.shape[1]), jnp.float32)], axis=0)
            else:
                # global c0 = c0p - 1 (rc carries one top pad row); R %
                # 16 keeps the store offset sublane-aligned (Mosaic
                # requires a provable multiple of 8 for dynamic dim-0
                # indices)
                c0p = pl.multiple_of((i - 1) * (R // 2), 8)
                rc_ref[pl.ds(c0p, R // 2 + 2), :] += u
        elif wide:
            pad = rc_ref.shape[0] - r_cols.shape[0]
            rc_ref[:] = jnp.concatenate(
                [r_cols, jnp.zeros((pad, r_cols.shape[1]), jnp.float32)],
                axis=0)
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
                   coarsen_x, hbp, windowed=False):
    """Streamed row-prolong + correct + post-smooth.

    `windowed` (wide hand-off layout): e2 arrives PRE-SLICED into
    per-slab windows (XLA built them), so the kernel never holds the
    whole correction in VMEM - the block IS this slab's window."""
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
            if windowed:
                # the block IS this slab's window, padded to an 8-aligned
                # height - the true window is its first nwin//2+2 rows
                Es = e2_ref[:][:nwin // 2 + 2]
            else:
                off = pl.multiple_of((i - 1) * (R // 2), 8)
                Es = e2_ref[pl.ds(off, nwin // 2 + 2), :]
            em1, em, ep1 = Es[:-2], Es[1:-1], Es[2:]
            c_even = 0.75 * em + 0.25 * em1
            c_odd = 0.75 * em + 0.25 * ep1
            corr = jnp.stack([c_even, c_odd], axis=1).reshape(nwin, W)
        elif windowed:
            corr = e2_ref[:][:nwin]
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


def _make_streamed_cycle(plan, *, R, n_pre, n_post, sor, coarsest_sweeps,
                         resident_sub_cells_max, wide_vmem_bytes,
                         interpret):
    """Build `cycle(fpad, bpad) -> (fpad', entry_sumsq)`: ONE streamed
    V-cycle on `plan`'s level 0 in padded-slab layout (`_pad_slabs`).

    The coarse correction between pass A and pass B is VMEM-resident
    (one kernel, `make_level_ops`) when the sub-hierarchy's top level
    fits `resident_sub_cells_max`; past that it RECURSES this factory
    onto level 1 - the level-1 smoothing/residual/restriction stream
    through VMEM in slabs too, and only a small-enough tail stays
    resident. The recursive hand-off runs three cheap XLA steps on the
    (nc, mc) coarse arrays (restriction normalization, the column
    prolongation matmul at HIGHEST precision, e2 edge padding) that the
    resident kernel otherwise fuses - at 4096^2 that is ~3 extra HBM
    round trips of 16 MiB arrays against a compiler crash without them
    (see RESIDENT_SUB_CELLS_MAX)."""
    nf, W = plan.sizes[0]
    coarsen_x = not plan.idents[0][0]
    coarsen_y = not plan.idents[0][1]
    nc, mc = plan.sizes[1]
    subplan, n_l0 = _subplan(plan)
    Ha = 2 * n_pre + 2
    Hb = 2 * n_post
    if Ha > R or Hb > R:
        raise ValueError("slab_rows too small for the smoother halos")
    inv_dx2, inv_dy2 = plan.spacings[0]
    volp0 = plan.volp_levels[0]

    n_blocks = 2 + -(-nf // R)
    n_data = n_blocks - 2
    ebase = (n_data * R // 2) if coarsen_x else (n_data * R)
    nc_pad = ebase + 2
    hbp = (Hb // 2 + 1) if coarsen_x else Hb
    e2_rows = ebase + 2 * hbp + 2

    # level-0 column transfer operators (exact resize matrices, MXU)
    l0_mats = []
    pct = None
    if coarsen_y:
        l0_mats = [plan.mats[0 + (1 if coarsen_x else 0)]]  # RcT (mf, mc)
        # plan.mats order per level: R_row (if x), Rc_T (if y), P_row
        # (if x), Pc_T (if y)
        pct = plan.mats[n_l0 - 1]  # Pc_T (mc, mf): always last of level 0
    space = pl.ANY if interpret else pltpu.VMEM
    kw = _vmem_params(interpret)

    # Wide hand-off decision: estimate each pass's VMEM (the pipeline
    # double-buffers every block) and switch layouts when the in-kernel
    # column matmul / whole-rc / whole-e2 residency cannot fit. Silicon
    # calibration (v5e, 2026-08-18): 2048^2 (est ~42 MiB/pass) compiles
    # and wins; 2560^2 (est ~60 MiB) SIGABRTs the TPU compiler - the
    # effective ceiling sits well under the 100 MiB scoped budget once
    # Mosaic's own window temporaries are counted.
    prt_rows = (R // 2 + 2) if coarsen_x else R
    prt_pad = -(-prt_rows // 8) * 8  # Mosaic: tiled block dims % 8 == 0
    est_a = 2 * (3 * R * W + (W * mc if coarsen_y else 0) + nc_pad * mc)
    est_b = 2 * (3 * R * W + e2_rows * W)
    est_scratch = 2 * R * W + 2 * Ha * W
    wide = (max(est_a, est_b) + est_scratch) * 4 > wide_vmem_bytes
    if wide and len(subplan.sizes) < 2:
        raise ValueError(
            "grid too wide for in-kernel transfer operators but its "
            "hierarchy is too shallow to recurse; raise min_size levels"
        )

    def load_idx(i):
        return (jnp.minimum(i + 1, n_blocks - 1), 0)

    pass_a = pl.pallas_call(
        functools.partial(
            _pass_a_kernel, R=R, W=W, nf=nf, Ha=Ha, k1=n_pre,
            inv_dx2=inv_dx2, inv_dy2=inv_dy2, volp=volp0, sor=sor,
            coarsen_x=coarsen_x, coarsen_y=coarsen_y, wide=wide,
        ),
        # donate x's buffer (write trails the lagged read; pallas_tiled)
        input_output_aliases={0: 0},
        grid=(n_blocks,),
        in_specs=(
            [pl.BlockSpec((R, W), load_idx), pl.BlockSpec((R, W), load_idx)]
            + ([pl.BlockSpec((W, mc), lambda i: (0, 0))]
               if (coarsen_y and not wide) else [])
        ),
        out_specs=[
            pl.BlockSpec((R, W), lambda i: (i, 0)),
            (pl.BlockSpec((prt_pad, W), lambda i: (i, 0)) if wide
             else pl.BlockSpec((nc_pad, mc), lambda i: (0, 0))),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * R, W), jnp.float32),
            (jax.ShapeDtypeStruct((n_blocks * prt_pad, W), jnp.float32)
             if wide
             else jax.ShapeDtypeStruct((nc_pad, mc), jnp.float32)),
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

    nwin_b = R + 2 * Hb
    win_rows = (nwin_b // 2 + 2) if coarsen_x else nwin_b
    win_pad = -(-win_rows // 8) * 8  # Mosaic: tiled block dims % 8 == 0
    pass_b = pl.pallas_call(
        functools.partial(
            _pass_b_kernel, R=R, W=W, nf=nf, Hb=Hb, k2=n_post,
            inv_dx2=inv_dx2, inv_dy2=inv_dy2, volp=volp0, sor=sor,
            coarsen_x=coarsen_x, hbp=hbp, windowed=wide,
        ),
        input_output_aliases={0: 0},
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((R, W), load_idx),
            pl.BlockSpec((R, W), load_idx),
            (pl.BlockSpec((win_pad, W), lambda i: (i, 0)) if wide
             else pl.BlockSpec((e2_rows, W), lambda i: (0, 0))),
        ],
        out_specs=pl.BlockSpec((R, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks * R, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R, W), jnp.float32),
            pltpu.VMEM((R, W), jnp.float32),
            pltpu.VMEM((Hb, W), jnp.float32),
            pltpu.VMEM((Hb, W), jnp.float32),
        ],
        interpret=interpret,
        **kw,
    )

    sub_cells = subplan.sizes[0][0] * subplan.sizes[0][1]
    recurse = wide or (
        len(subplan.sizes) >= 2 and sub_cells > resident_sub_cells_max
    )
    norm_row = _row_restrict_norm(nc, plan.scales[0], coarsen_x)
    rc_top = 1 if coarsen_x else 0  # conv layout carries one top pad row

    if recurse:
        # level-1 too big for the resident kernel: stream it too
        sub_cycle = _make_streamed_cycle(
            subplan, R=R, n_pre=n_pre, n_post=n_post, sor=sor,
            coarsest_sweeps=coarsest_sweeps,
            resident_sub_cells_max=resident_sub_cells_max,
            wide_vmem_bytes=wide_vmem_bytes,
            interpret=interpret,
        )

        def level1_solve(r1):
            """One recursive streamed V-cycle on the normalized level-1
            system (zero initial guess), exactly `v_cycle(0, rc, 0)` on
            the sub-hierarchy."""
            x1pad, _ = sub_cycle(
                _pad_slabs(jnp.zeros_like(r1), R), _pad_slabs(r1, R)
            )
            return x1pad[R:R + nc]

        def e2_of(e):
            """Column prolongation + edge-replicated row padding, exactly
            as `_coarse_kernel`'s tail. The prolongation is
            `jax.image.resize` - the OPERATOR the in-kernel Pc_T matmul
            was built from (`pallas_mg._resize_matrix`), computed instead
            of baked in: embedding the dense matrices as XLA constants
            blows the program size at huge grids (a 134 MiB Rc_T at
            8192^2 overflows the compile request), and XLA's f32 resize
            is exact where bf16-default matmuls were the drift the
            silicon gates caught."""
            if coarsen_y:
                e = jax.image.resize(e, (e.shape[0], W), method="linear")
            top = jnp.repeat(e[:1], hbp, axis=0)
            bot = jnp.repeat(e[-1:], e2_rows - hbp - nc, axis=0)
            return jnp.concatenate([top, e, bot], axis=0)

        def coarse_correct(rc):
            # pass A leaves rc unnormalized (cross-slab conv
            # accumulation); the resident kernel folds these factors in
            # at entry - here XLA applies the identical per-row norms
            return e2_of(level1_solve(rc[rc_top:rc_top + nc] * norm_row))
    else:
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

        def coarse_correct(rc):
            return coarse(rc, *subplan.mats, *([pct] if coarsen_y else []))

    if not wide:

        def cycle(fpad, bpad):
            fpad, rc, ss = pass_a(fpad, bpad, *l0_mats)
            e2 = coarse_correct(rc)
            fpad = pass_b(fpad, bpad, e2)
            return fpad, ss[0, 0]

        return cycle

    # wide hand-off cycle: XLA reassembles the per-slab restriction
    # partials (overlap-add - each coarse row receives contributions
    # from at most two slabs, so the add order matches the in-kernel
    # accumulation bitwise), applies the column restriction (as
    # jax.image.resize - see e2_of), recurses, then pre-slices e2 into
    # the per-slab windows pass B's blocked input expects. ~4 extra HBM
    # round trips of (nc, W)-class arrays per cycle - at 4096^2 that is
    # ~2 ms against a compiler crash without them.

    def cycle(fpad, bpad):
        fpad, parts_flat, ss = pass_a(fpad, bpad)
        parts = parts_flat.reshape(n_blocks, prt_pad, W)[:, :prt_rows]
        rc_full = jnp.zeros((nc_pad, W), jnp.float32)
        if coarsen_x:
            for i in range(1, n_blocks - 1):
                a0 = (i - 1) * (R // 2)
                rc_full = rc_full.at[a0:a0 + prt_rows].add(parts[i])
        else:
            rc_full = rc_full.at[0:n_data * R].set(
                parts[1:-1].reshape(n_data * R, W)
            )
        r = rc_full[rc_top:rc_top + nc] * norm_row
        if coarsen_y:
            r = jax.image.resize(r, (nc, mc), method="linear")
        e2 = e2_of(level1_solve(r))
        # over-pad e2 so the last slab's 8-aligned window never overruns
        e2p = jnp.concatenate(
            [e2, jnp.zeros((win_pad, W), jnp.float32)], axis=0)
        zw = jnp.zeros((win_pad, W), jnp.float32)
        step = (R // 2) if coarsen_x else R
        wins = [zw] + [
            e2p[(i - 1) * step:(i - 1) * step + win_pad]
            for i in range(1, n_blocks - 1)
        ] + [zw]
        fpad = pass_b(fpad, bpad, jnp.concatenate(wins, axis=0))
        return fpad, ss[0, 0]

    return cycle


@functools.partial(
    jax.jit,
    static_argnames=("dx", "dy", "dt", "rho", "volp", "tol", "max_cycles",
                     "n_pre", "n_post", "smoother_sor", "min_size",
                     "coarsest_sweeps", "slab_rows", "return_count",
                     "resident_sub_cells_max", "wide_vmem_bytes",
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
    resident_sub_cells_max: int = RESIDENT_SUB_CELLS_MAX,
    wide_vmem_bytes: int = WIDE_VMEM_BYTES,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for `multigrid.mg_solve_pressure` at grids past
    the VMEM wall (f32): same level schedule, smoother, and transfer
    operators; lagged exit check (one extra cycle - see module docstring).
    Levels stream through VMEM recursively until one fits the resident
    coarse kernel (`resident_sub_cells_max`; at 4096^2 the fine AND the
    2048^2 level stream, 1024^2 down stays resident). With
    `return_count`, returns (p, bodies_run)."""
    if p.dtype != jnp.float32:
        raise ValueError("stream_mg_solve_pressure is float32-only")
    nx, ny = p.shape[0] - 2, p.shape[1] - 2
    if nx % 2 or ny % 2:
        raise ValueError("streamed multigrid needs even nx, ny")
    plan = plan_hierarchy(nx, ny, dx, dy, volp, min_size=min_size)
    if len(plan.sizes) < 2:
        raise ValueError("grid too small for a multigrid hierarchy")
    # big transfer matrices computed in-program instead of baked in as
    # constants: at 8192^2 the baked sub-kernel matrices alone were
    # ~28 MB of MLIR, overflowing the compile-request ceiling. The seed
    # must be a TRACED exact zero (isfinite-guarded so a divergent field
    # cannot poison it with 0 * inf = nan).
    x00 = p[0, 0]
    traced_zero = jnp.where(jnp.isfinite(x00), x00, 0.0) * 0.0
    plan = MGPlan(plan.sizes, plan.spacings, plan.volp_levels,
                  plan.scales, plan.idents, computed_mats(plan, traced_zero))
    if n_pre < 1 or n_post < 1:
        raise ValueError("the streamed V-cycle needs n_pre >= 1 and "
                         "n_post >= 1 (entry-rms and halo widths are "
                         "built from the smoothing sweeps)")
    R = slab_rows
    if R % 16:
        raise ValueError("slab_rows must be a multiple of 16 (keeps the "
                         "restrict/prolong slice offsets (i-1)*R/2 "
                         "sublane-aligned for Mosaic)")
    clamped = auto_slab_rows(R, ny)
    if clamped != R:
        print(f"[stream-mg] slab_rows {R} -> {clamped} at width {ny} "
              "(VMEM slab envelope; see pallas_stream.SLAB_CELLS_MAX)",
              flush=True)
        R = clamped
    inv_dx2, inv_dy2 = plan.spacings[0]
    volp0 = plan.volp_levels[0]
    n_cells = nx * ny

    # RHS with the frozen ghost ring folded in (identical to
    # mg_solve_pressure / pallas_mg_solve_pressure)
    b_int = (rho / dt) * ff.divergence_sum()
    ghost_only = p.at[1:-1, 1:-1].set(0.0)
    b_eff = b_int - ghost_fold(ghost_only, inv_dx2, inv_dy2, volp0)

    fpad = _pad_slabs(p[1:-1, 1:-1], R)
    bpad = _pad_slabs(b_eff, R)

    cycle = _make_streamed_cycle(
        plan, R=R, n_pre=n_pre, n_post=n_post, sor=smoother_sor,
        coarsest_sweeps=coarsest_sweeps,
        resident_sub_cells_max=resident_sub_cells_max,
        wide_vmem_bytes=wide_vmem_bytes,
        interpret=interpret,
    )

    def body(carry):
        f, prev, best, stale, it = carry
        f, ss = cycle(f, bpad)
        rms = jnp.sqrt(ss / n_cells)
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
