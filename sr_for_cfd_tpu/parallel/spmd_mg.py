"""Domain-decomposed multigrid pressure solve for the explicit-SPMD
solver: V-cycles at reference grid sizes over a device mesh.

`SpmdSolver` ran the reference-semantics point-iteration pressure loop
(`parallel/spmd_step.py`) - correct, but the wrong algorithm at scale
(point iteration needs O(N) sweeps; multigrid needs O(1) cycles, and is
what the single-device path uses for every fine grid). This module is
the same V-cycle as `ops.multigrid.mg_solve_pressure`, decomposed:

  * FINE levels stay sharded: each rank holds `rows_l = nxl // n_dev`
    interior rows. Red-black smoothing uses GLOBAL parity and
    COMMUNICATION-AVOIDING halos: one stacked (x, b) ppermute pair per
    block of k sweeps (2k halo rows, redundant halo-row recompute -
    `smooth_ca`), with the post-smoothing residual handed back as a
    local by-product so neither the restriction nor the cycle-exit rms
    re-exchanges. Zero rows at the domain edge - the frozen-ghost
    system has homogeneous Dirichlet exterior, ghosts are folded into
    the RHS exactly like the single-device path.
  * Row restriction/prolongation between sharded levels are per-rank
    SLICES of the exact global `jax.image.resize` operator matrices
    (`pallas_mg._resize_matrix`), applied to the 1-row-halo-extended
    band as small MXU matmuls (precision=HIGHEST - default MXU dots run
    bf16, measured 4e-3/cycle drift). Columns are complete on every
    rank, so column transfers are the exact full matrices.
  * From the first level whose transition cannot stay sharded (rows not
    divisible / too few per rank / non-2x semi-coarsening), the
    restricted residual is `all_gather`ed and the REMAINING sub-V-cycle
    runs replicated on every rank via the single-device `_v_cycle` -
    deterministic, so all ranks hold identical coarse corrections; each
    rank then slices its rows for the sharded prolongation. A ~200^2
    f32 coarse gather is ~160 KB over ICI per cycle - noise next to the
    fine-level HBM traffic it saves.

Same level schedule, smoother, restriction scale, tolerance and stall
policy as `mg_solve_pressure`; per-cycle fields match the single-device
V-cycle to f32 reduction-order rounding (tested on the 8-device virtual
mesh). Reference semantics: the frozen-ghost pressure-Poisson system of
`LDV PyCFD given by sir.py:561-583`; SURVEY.md sections 5.7/5.8 (spatial
decomposition at grids beyond single-chip capacity).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.multigrid import (
    MG_MAX_CYCLES,
    MG_SMOOTHER_SOR,
    _levels,
    _red_mask,
    _v_cycle,
)
from ..ops.pallas_mg import _resize_matrix
from ..ops.sweeps import stall_update, stalled
from .mesh import ring_perms
from .spmd_step import sweep_blocks
from .vma import vary as _vary

# keep a level sharded only while every rank holds at least this many of
# its rows (below that the halo exchanges outweigh the local smoothing)
MIN_SHARD_ROWS = 8


class SpmdMGPlan(NamedTuple):
    """Static per-case plan (host-side numpy; hashable by identity)."""

    sizes: tuple            # full level schedule ((nx, ny) per level)
    spacings: tuple         # (inv_dx2, inv_dy2) per level
    volp_levels: tuple
    n_shard: int            # levels [0, n_shard) are sharded
    rstack: tuple           # per-transition (n_dev, rows_c, rows_f+2) or None
    pstack: tuple           # per-transition (n_dev, rows_f, rows_c+2) or None
    rcolT: tuple            # per-transition (mf, mc) or None
    pcolT: tuple            # per-transition (mc, mf) or None
    scales: tuple           # restriction scale per transition


def _row_slices(nf: int, nc: int, n_dev: int, dtype):
    """Per-rank banded slices of the exact global resize operators.

    Restriction rows: coarse row m reads fine rows [2m-1, 2m+2], so rank
    r's block is R[m0:m1, r*rows_f-1 : (r+1)*rows_f+1] against its 1-row
    halo-extended band (out-of-range columns are zero - the operator
    never reads the exterior). Prolongation symmetrically."""
    rows_f, rows_c = nf // n_dev, nc // n_dev
    R = _resize_matrix(nf, nc).astype(dtype)     # (nc, nf)
    P = _resize_matrix(nc, nf).astype(dtype)     # (nf, nc)

    def band(mat, r0_out, n_out, c0_in, n_in, width):
        blk = np.zeros((n_out, width), dtype)
        lo, hi = max(c0_in, 0), min(c0_in + width, n_in)
        blk[:, lo - c0_in:hi - c0_in] = mat[r0_out:r0_out + n_out, lo:hi]
        return blk

    rstack = np.stack([
        band(R, r * rows_c, rows_c, r * rows_f - 1, nf, rows_f + 2)
        for r in range(n_dev)
    ])
    pstack = np.stack([
        band(P, r * rows_f, rows_f, r * rows_c - 1, nc, rows_c + 2)
        for r in range(n_dev)
    ])
    return rstack, pstack


def plan_spmd_mg(nx: int, ny: int, dx: float, dy: float, volp: float,
                 n_dev: int, dtype, min_size: int = 8) -> SpmdMGPlan:
    """Build the level schedule exactly as `mg_solve_pressure`, then pick
    the longest sharded prefix and precompute all transfer operators."""
    sizes = _levels(nx, ny, dx, dy, min_size=min_size)
    spacings, volp_levels = [], []
    for lvl, (nxl, nyl) in enumerate(sizes):
        dxl = dx * nx / nxl
        dyl = dy * ny / nyl
        spacings.append((1.0 / (dxl * dxl), 1.0 / (dyl * dyl)))
        volp_levels.append(volp if lvl == 0 else dxl * dyl)

    n_shard = 0
    for lvl in range(len(sizes) - 1):
        nxf, nxc = sizes[lvl][0], sizes[lvl + 1][0]
        ok = (nxf % n_dev == 0 and nxf // n_dev >= MIN_SHARD_ROWS
              # x transition must be exact 2x halving (the banded-slice
              # operators assume it) or identity (semi-coarsening)
              and (nxc == nxf or (nxf % 2 == 0 and nxc * 2 == nxf
                                  and nxc % n_dev == 0)))
        if not ok:
            break
        n_shard = lvl + 1

    rstack, pstack, rcolT, pcolT, scales = [], [], [], [], []
    for lvl in range(n_shard):
        (nxf, nyf), (nxc, nyc) = sizes[lvl], sizes[lvl + 1]
        scales.append((nxf / nxc) * (nyf / nyc))
        if nxc != nxf:
            rs, ps = _row_slices(nxf, nxc, n_dev, dtype)
        else:
            rs = ps = None
        rstack.append(rs)
        pstack.append(ps)
        if nyc != nyf:
            rcolT.append(_resize_matrix(nyf, nyc).astype(dtype).T)
            pcolT.append(_resize_matrix(nyc, nyf).astype(dtype).T)
        else:
            rcolT.append(None)
            pcolT.append(None)
    return SpmdMGPlan(
        sizes=tuple(sizes), spacings=tuple(spacings),
        volp_levels=tuple(volp_levels), n_shard=n_shard,
        rstack=tuple(rstack), pstack=tuple(pstack),
        rcolT=tuple(rcolT), pcolT=tuple(pcolT), scales=tuple(scales),
    )


def make_spmd_mg_solve(plan: SpmdMGPlan, axis: str, n_dev: int, *,
                       tol: float, n_pre: int = 4, n_post: int = 4,
                       sor: float = MG_SMOOTHER_SOR,
                       max_cycles: int = MG_MAX_CYCLES,
                       coarsest_sweeps: int = 40,
                       use_pallas: bool = False,
                       interpret: bool = False):
    """Build `solve(x_band, b_band) -> (x_band, cycles)` for use inside
    the shard_map step. Bands are (rows, nyl) interior blocks.

    `use_pallas=True` runs the sharded-level smoother sweeps as per-rank
    Pallas kernels (`spmd_pallas.shard_rb_sweep` - the MG system is the
    same masked red-black update with a zero exterior instead of frozen
    BC ghosts, so the kernel is shared): one 2-row halo exchange per
    sweep with redundant halo-row recompute, each rank's block
    VMEM-resident. Transfers stay MXU matmuls and the replicated coarse
    tail stays jnp - the smoother is where the sweep FLOPs are."""
    fwd, bwd = ring_perms(n_dev)
    nx0, ny0 = plan.sizes[0]
    n_cells = nx0 * ny0
    hi = jax.lax.Precision.HIGHEST
    # masks for the replicated tail only (sharded levels build theirs
    # from global indices)
    tail_masks = [_red_mask(nxl, nyl) for nxl, nyl in plan.sizes]

    def rank_of():
        return jax.lax.axis_index(axis)

    def vary(x):
        # fresh zeros are 'replicated'; loop carries meet 'varying' RHSs
        return _vary(x, axis)

    def assemble0(x, h=1):
        """1-row halo extension with ZERO exterior at the domain edges
        (homogeneous-Dirichlet MG system; cf. spmd_step.assemble which
        substitutes frozen BC ghosts)."""
        z = jnp.zeros((h, x.shape[1]), x.dtype)
        up = jax.lax.ppermute(x[-h:], axis, fwd)
        dn = jax.lax.ppermute(x[:h], axis, bwd)
        rank = rank_of()
        top = jnp.where(rank == 0, z, up)
        bot = jnp.where(rank == n_dev - 1, z, dn)
        return jnp.concatenate([top, x, bot], axis=0)

    def lap_band(ext, lvl):
        """volp-scaled 5-point Laplacian on own rows given the 1-halo
        extension; zero column exterior."""
        inv_dx2, inv_dy2 = plan.spacings[lvl]
        volp = plan.volp_levels[lvl]
        c = ext[1:-1]
        xp = jnp.pad(c, ((0, 0), (1, 1)))
        return volp * (
            (ext[2:] - 2.0 * c + ext[:-2]) * inv_dx2
            + (xp[:, 2:] - 2.0 * c + xp[:, :-2]) * inv_dy2
        )

    def smooth_band_jnp(x, b, lvl, n_sweeps, omega):
        x, _ = smooth_ca(x, b, lvl, n_sweeps, omega, extra=0)
        return x

    def smooth_ca(x, b, lvl, n_sweeps, omega, extra):
        """Communication-avoiding red-black smoothing: one stacked
        (x, b) ppermute pair per block of k sweeps with the halo rows'
        updates recomputed redundantly, instead of two 1-row exchanges
        per sweep. Erosion accounting as `spmd_step.ca_sweep_solve`
        (5-point: H = 2k halo rows buy k sweeps; own-row updates read
        the same values in the same op order, so trajectories are
        BITWISE identical to the exchange-per-half-sweep schedule).

        `extra` requests the post-smoothing residual r = b - lap(x) as
        a local by-product (halo depth 2k + extra): extra=1 returns r
        on own rows (the cycle-exit rms), extra=2 on own rows +-1 (the
        operand of the banded restriction matmul, replacing its
        assemble0). Out-of-domain rows of the returned residual hold
        garbage the zeroed operator columns annihilate. Returns
        (x_own, residual | None)."""
        inv_dx2, inv_dy2 = plan.spacings[lvl]
        volp_l = plan.volp_levels[lvl]
        inv_ap = omega / (-volp_l * (2.0 * inv_dx2 + 2.0 * inv_dy2))
        nxl, nyl = plan.sizes[lvl]
        rows_l = x.shape[0]
        blocks = sweep_blocks(n_sweeps, max(1, (rows_l - extra) // 2))
        rank = rank_of()

        def masks(h):
            nreg = rows_l + 2 * h - 2
            gi = (jax.lax.broadcasted_iota(jnp.int32, (nreg, nyl), 0)
                  + rank * rows_l - h + 1)
            jj = jax.lax.broadcasted_iota(jnp.int32, (nreg, nyl), 1)
            red = (gi + jj) % 2 == 0
            dom = jnp.logical_and(gi >= 0, gi < nxl)
            return jnp.logical_and(red, dom), jnp.logical_and(~red, dom)

        def lap_region(ext):
            c = ext[1:-1]
            xp = jnp.pad(c, ((0, 0), (1, 1)))
            return volp_l * (
                (ext[2:] - 2.0 * c + ext[:-2]) * inv_dx2
                + (xp[:, 2:] - 2.0 * c + xp[:, :-2]) * inv_dy2
            )

        res = None
        for bi, kb in enumerate(blocks):
            last = bi == len(blocks) - 1
            h = 2 * kb + (extra if last else 0)
            pair = jnp.stack([x, b])
            up = jax.lax.ppermute(pair[:, -h:], axis, fwd)
            dn = jax.lax.ppermute(pair[:, :h], axis, bwd)
            z = jnp.zeros_like(up)
            up = jnp.where(rank == 0, z, up)
            dn = jnp.where(rank == n_dev - 1, z, dn)
            ext2 = jnp.concatenate([up, pair, dn], axis=1)
            xe, br = ext2[0], ext2[1, 1:-1]
            red_r, blk_r = masks(h)
            for _ in range(kb):
                r = br - lap_region(xe)
                xe = xe.at[1:-1].add(jnp.where(red_r, r * inv_ap, 0.0))
                r = br - lap_region(xe)
                xe = xe.at[1:-1].add(jnp.where(blk_r, r * inv_ap, 0.0))
            if last and extra:
                r_full = br - lap_region(xe)
                o = h - extra
                res = r_full[o:o + rows_l + 2 * (extra - 1)]
            x = xe[h:-h]
        return x, res

    def smooth_band_pallas(x, b, lvl, n_sweeps, omega):
        """Per-rank Pallas smoother with the communication-avoiding
        block schedule: one 2kb-row halo exchange buys kb in-kernel
        sweeps (`spmd_pallas.py` module docstring; same erosion
        accounting as `smooth_ca`). b's halo travels once per smooth
        call (frozen during the sweeps)."""
        from .spmd_pallas import extend_b_halo, shard_rb_sweep

        inv_dx2, inv_dy2 = plan.spacings[lvl]
        nxl, nyl = plan.sizes[lvl]
        rows = x.shape[0]
        rank = rank_of()
        row0 = jnp.full((1, 1), 1, jnp.int32) * (rank * rows)
        blocks = sweep_blocks(n_sweeps, max(1, rows // 2))
        h_max = 2 * blocks[0]
        b_ext = extend_b_halo(b, axis, fwd, bwd, rank, n_dev, h=h_max)

        for kb in blocks:
            h = 2 * kb
            zc = jnp.zeros((rows + 2 * h, 1), x.dtype)
            ext = jnp.concatenate([zc, assemble0(x, h=h), zc], axis=1)
            own, _ = shard_rb_sweep(
                ext, b_ext[h_max - h:h_max + rows + h], row0, nxg=nxl,
                inv_dx2=inv_dx2, inv_dy2=inv_dy2,
                volp=plan.volp_levels[lvl], sor=omega, h=h, kb=kb,
                axis_name=axis, interpret=interpret,
            )
            x = own[:, 1:-1]
        return x

    smooth_band = smooth_band_pallas if use_pallas else smooth_band_jnp

    def pick(stack):
        return jax.lax.dynamic_index_in_dim(
            jnp.asarray(stack), rank_of(), keepdims=False)

    def restrict_band(r, lvl, pre_extended=False):
        """`pre_extended` skips the assemble0 when the caller already
        holds r on own rows +-1 (the smoother's residual by-product)."""
        if plan.rstack[lvl] is not None:
            r = jnp.dot(pick(plan.rstack[lvl]),
                        r if pre_extended else assemble0(r),
                        precision=hi)
        if plan.rcolT[lvl] is not None:
            r = jnp.dot(r, plan.rcolT[lvl], precision=hi)
        return r * jnp.asarray(plan.scales[lvl], r.dtype)

    def prolong_band(e, lvl):
        """Coarse band at level lvl+1 -> fine band at level lvl."""
        if plan.pcolT[lvl] is not None:
            e = jnp.dot(e, plan.pcolT[lvl], precision=hi)
        if plan.pstack[lvl] is not None:
            e = jnp.dot(pick(plan.pstack[lvl]), assemble0(e),
                        precision=hi)
        return e

    def v_band(x, b, lvl, want_rms=False):
        """Sharded V-cycle level; recursion bottoms out in the replicated
        single-device `_v_cycle` tail. On the jnp path the pre-smoother
        hands back its residual halo-extended (no assemble0 before the
        restriction) and, with `want_rms` (level 0 only), the
        post-smoother hands back the own-row residual the cycle-exit rms
        needs - so one cycle level costs 3 ppermute pairs (pre-smooth,
        prolongation, post-smooth) instead of one per half-sweep."""
        if lvl == plan.n_shard:
            full = _v_cycle(
                vary(jnp.zeros(plan.sizes[lvl], b.dtype)),
                jax.lax.all_gather(b, axis, tiled=True),
                lvl, plan.sizes, plan.spacings, plan.volp_levels,
                tail_masks, n_pre, n_post, sor, coarsest_sweeps,
            )
            rows = plan.sizes[lvl][0] // n_dev
            return jax.lax.dynamic_slice_in_dim(
                full, rank_of() * rows, rows, axis=0)
        if use_pallas:
            x = smooth_band(x, b, lvl, n_pre, sor)
            r = b - lap_band(assemble0(x), lvl)
            r_c = restrict_band(r, lvl)
        else:
            rowwise = plan.rstack[lvl] is not None
            x, r = smooth_ca(x, b, lvl, n_pre, sor,
                             extra=2 if rowwise else 1)
            r_c = restrict_band(r, lvl, pre_extended=rowwise)
        e_c = v_band(vary(jnp.zeros_like(r_c)), r_c, lvl + 1)
        x = x + prolong_band(e_c, lvl)
        if use_pallas:
            return smooth_band(x, b, lvl, n_post, sor)
        x, r_post = smooth_ca(x, b, lvl, n_post, sor,
                              extra=1 if want_rms else 0)
        return (x, r_post) if want_rms else x

    def v_replicated(x_full, b_full):
        return _v_cycle(x_full, b_full, 0, plan.sizes, plan.spacings,
                        plan.volp_levels, tail_masks, n_pre, n_post, sor,
                        coarsest_sweeps)

    def solve(x_band, b_band):
        dtype = x_band.dtype

        def rms_of(x):
            r = b_band - lap_band(assemble0(x), 0)
            return jnp.sqrt(jax.lax.psum(jnp.sum(r * r), axis) / n_cells)

        if plan.n_shard == 0:
            # degenerate decomposition (too few rows per rank): run the
            # whole hierarchy replicated, slice own rows at exit. b is
            # frozen for the whole solve - gather it ONCE, outside the
            # cycle loop (XLA does not reliably hoist collectives out of
            # while bodies)
            rows = nx0 // n_dev
            bf = jax.lax.all_gather(b_band, axis, tiled=True)

            def cycle_rms(x):
                full = jax.lax.all_gather(x, axis, tiled=True)
                out = v_replicated(full, bf)
                x = jax.lax.dynamic_slice_in_dim(
                    out, rank_of() * rows, rows, axis=0)
                return x, rms_of(x)
        elif use_pallas:
            def cycle_rms(x):
                x = v_band(x, b_band, 0)
                return x, rms_of(x)
        else:
            def cycle_rms(x):
                # the post-smoother's own-row residual by-product IS the
                # exit-test residual - no extra exchange
                x, r = v_band(x, b_band, 0, want_rms=True)
                return x, jnp.sqrt(
                    jax.lax.psum(jnp.sum(r * r), axis) / n_cells)

        def body(carry):
            x, prev, best, stale, it = carry
            x, rms = cycle_rms(x)
            stale, best = stall_update(rms, prev, best, stale)
            return x, rms, best, stale, it + 1

        def cond(carry):
            _, rms, best, stale, it = carry
            return jnp.logical_and(
                jnp.logical_and(it < max_cycles, best >= tol),
                jnp.logical_not(stalled(stale, it)),
            )

        big = jnp.asarray(jnp.inf, dtype)
        zero = jnp.asarray(0, jnp.int32)
        x, _, _, _, cycles = jax.lax.while_loop(
            cond, body, (x_band, big, big, zero, zero)
        )
        return x, cycles

    return solve
