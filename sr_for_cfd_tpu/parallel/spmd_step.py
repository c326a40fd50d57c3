"""Explicit-SPMD full SIMPLE step: the whole outer iteration under
`shard_map`, with ppermute halo exchange - at REFERENCE grid sizes.

The GSPMD path (`parallel/domain.py`) shards the padded (nx+2, ny+2)
fields, which no reference grid divides evenly (402/1026/2050 over 4 or 8
devices). This module shards the INTERIOR rows instead - 400, 512, 1024,
2048 all divide over 2/4/8-device meshes - and derives the ghost ring on
demand:

  * each rank owns `rows = nx // n_dev` interior rows as a local
    (rows, ny+2) block (y-ghost columns included; y BCs are rank-local);
  * x-halo rows travel by `jax.lax.ppermute` over ICI in
    COMMUNICATION-AVOIDING blocks: ONE deep exchange buys k full
    red-black sweeps, with the halo rows' updates recomputed
    redundantly instead of communicated (the progressive-erosion idea
    of `ops/pallas_momentum.py`, here with the exact per-color
    recurrence: each sweep erodes red validity by the stencil radius d
    and black lags one row, so H = 2k+1 halo rows suffice for k QUICK
    sweeps and H = 2k for 5-point/UPWIND - see `ca_sweep_solve`). k is
    the rms check cadence (`momentum_check_every` /
    `pressure_check_every`), so sweep counts and exit decisions are
    identical to the single-device loop and own-row trajectories stay
    BITWISE identical (own-cell updates read the same values in the
    same op order). Per-solve-constant arrays (old fields, face
    fluxes, the pressure RHS) ride one STACKED ppermute pair per inner
    solve. Bands too narrow for even a 1-sweep halo (QUICK at
    rows == 2) fall back to the original exchange-per-half-sweep
    schedule;
  * the domain's x-ghost rows (global rows 0 and nx+1) are COMPUTED on
    the boundary ranks from the BC spec - valid because a ghost row is a
    pure function of its adjacent interior row and the interior never
    changes between a BC application and the next ghost read (reference
    order of operations, `LDV PyCFD given by sir.py:171-232`). Inner
    solves capture the ghost rows once at entry, reproducing the
    reference's frozen-ghost semantics exactly;
  * residual reductions are `jax.lax.psum` (the TPU-native replacement
    for the reference's prange scalar reductions,
    `bfs code given by sir.py:690-709`).

Red-black parity and the stall policy use GLOBAL quantities, so every
rank's `while_loop` runs in lockstep and the iteration is identical to
the single-device sweep: results match `solver.simple.simple_step` to
reduction-order rounding (bit-exact trajectories in f64, tested).

This is the structural cousin of ring/context parallelism for stencils
(SURVEY.md sections 5.7/5.8): neighbor exchange over ICI instead of the
reference's shared-memory `prange` reads (`LDV PyCFD given by
sir.py:517-597`).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DIRICHLET, QUICK, CaseConfig
from ..ops.bc import BFSInletProfile
from ..ops.stencil import (
    FaceFluxes,
    Shifted,
    diffusion,
    face_fluxes,
    quick_convection,
    shifts1,
    upwind_convection,
)
from ..ops.sweeps import optimal_sor, stall_update, stalled
from ..solver.state import SolverState, init_state, inlet_profile
from .mesh import ring_perms
from .vma import vary as _vary, vary_over


class SpmdState(NamedTuple):
    """Per-rank solver state: local blocks of the global state.

    u/v/p are (rows, ny+2) own-interior-row bands (y-ghost columns
    included); olds and face fluxes are (rows, ny); scalars are
    replicated and identical on every rank."""

    u: jnp.ndarray
    v: jnp.ndarray
    p: jnp.ndarray
    u_old: jnp.ndarray
    v_old: jnp.ndarray
    p_old: jnp.ndarray
    ff: FaceFluxes
    rms: jnp.ndarray       # (3,)
    count: jnp.ndarray     # int32
    converged: jnp.ndarray
    diverged: jnp.ndarray
    # ---- convergence-detector carries (mirroring SolverState: they live
    # in the state so detection spans chunk boundaries at any chunk size).
    # held/plat_* are replicated scalars (rms is already global); the
    # Cauchy refs are local (rows, ny+2) bands like u/v.
    held: jnp.ndarray        # int32: consecutive iterations criteria held
    plat_best: jnp.ndarray   # (3,) best plateau-window mean rms seen
    plat_acc: jnp.ndarray    # (3,) current-window rms accumulator
    plat_n: jnp.ndarray      # int32: iterations in the current window
    plat_stale: jnp.ndarray  # int32: consecutive non-improving windows
    cau_u: jnp.ndarray       # (rows, ny+2) band at last Cauchy snapshot
    cau_v: jnp.ndarray
    cau_count: jnp.ndarray   # int32: iteration of that snapshot


def _specs(axis: str) -> SpmdState:
    row = P(axis, None)
    rep = P()
    return SpmdState(
        u=row, v=row, p=row, u_old=row, v_old=row, p_old=row,
        ff=FaceFluxes(e=row, n=row, w=row, s=row),
        rms=rep, count=rep, converged=rep, diverged=rep,
        held=rep, plat_best=rep, plat_acc=rep, plat_n=rep, plat_stale=rep,
        cau_u=row, cau_v=row, cau_count=rep,
    )


def sweep_blocks(total: int, k_max: int):
    """Split `total` sweeps into communication-avoiding blocks of at most
    `k_max` sweeps each (largest first); one halo exchange per block.
    Shared by the SIMPLE-step inner solves and the multigrid smoother
    (`spmd_mg.py`)."""
    out, rem = [], total
    while rem > 0:
        b = min(k_max, rem)
        out.append(b)
        rem -= b
    return out


def _ghost_row(row, side_bc, var_k: int, profile: Optional[BFSInletProfile],
               is_left: bool):
    """The domain x-ghost row derived from its adjacent interior row
    (reference `apply_bc_configured` reflection/zero-gradient,
    `LDV PyCFD given by sir.py:386-414`; BFS inlet override
    `bfs code given by sir.py:146-184`). Corner entries get reflected
    values where the reference leaves zeros - both are never read."""
    g = (2.0 * side_bc.value - row) if side_bc.type == DIRICHLET else row
    if is_left and profile is not None and var_k in (0, 1):
        if var_k == 1:
            g = -row
        else:
            g = jnp.where(profile.below, -row, 2.0 * profile.u_in - row)
    return g


def _apply_bc_y(x_own: jnp.ndarray, bc) -> jnp.ndarray:
    """Rank-local y-ghost-column fill (every own row is a global interior
    row, so top/bottom BCs apply to all of them)."""
    bot = (2.0 * bc.bottom.value - x_own[:, 1]
           if bc.bottom.type == DIRICHLET else x_own[:, 1])
    top = (2.0 * bc.top.value - x_own[:, -2]
           if bc.top.type == DIRICHLET else x_own[:, -2])
    return x_own.at[:, 0].set(bot).at[:, -1].set(top)


def _make_rre_ops(case: CaseConfig, profile: Optional[BFSInletProfile],
                  n_dev: int):
    """Per-rank flatten/inject for decomposed RRE (`ops/extrapolate.py`
    run under shard_map; enabled by `rre_every > 0` on `SpmdSolver`).

    The local flat vector is this rank's band of the SAME global vector
    the single-device path extrapolates (`extrapolate.flatten_state`:
    padded fields + face fluxes): interior-row bands plus the derived
    domain x-ghost rows, the latter carried in per-rank slots that are
    ZERO off the boundary ranks. Zeros contribute nothing to dot
    products, so psum of the per-rank partial Grams equals the
    single-device whole-vector Gram up to reduction order."""
    nx, ny = case.mesh.nx, case.mesh.ny
    rows = nx // n_dev
    bcs = {0: case.u_bc, 1: case.v_bc, 2: case.p_bc}

    def flatten(s: SpmdState, rank) -> jnp.ndarray:
        parts = []
        for x, k in ((s.u, 0), (s.v, 1), (s.p, 2)):
            bc = bcs[k]
            gl = _ghost_row(x[0], bc.left, k, profile, is_left=True)
            gh = _ghost_row(x[-1], bc.right, k, profile, is_left=False)
            # corner entries: apply_bc never writes them, so the single-
            # device snapshot carries exact zeros there (ops/bc.py:12-14);
            # _ghost_row reflects them - zero them for Gram parity
            gl = gl.at[0].set(0.0).at[-1].set(0.0)
            gh = gh.at[0].set(0.0).at[-1].set(0.0)
            zero = jnp.zeros_like(gl)
            parts.append(jnp.where(rank == 0, gl, zero))
            parts.append(x.ravel())
            parts.append(jnp.where(rank == n_dev - 1, gh, zero))
        parts += [s.ff.e.ravel(), s.ff.n.ravel(),
                  s.ff.w.ravel(), s.ff.s.ravel()]
        return jnp.concatenate(parts)

    def inject(s: SpmdState, x_star: jnp.ndarray) -> SpmdState:
        """Mirror of `extrapolate.inject_state`: rebuild fields from the
        extrapolated vector, refresh the rank-local y ghosts (x ghosts
        are derived on demand from the BC spec each step), reset olds
        and face fluxes to the extrapolated values."""
        band_n, row_n, core = rows * (ny + 2), ny + 2, rows * ny
        off, bands = 0, []
        for k in range(3):
            off += row_n  # skip the ghost-row slot (re-derived on demand)
            band = x_star[off:off + band_n].reshape(rows, ny + 2)
            off += band_n + row_n
            bands.append(_apply_bc_y(band, bcs[k]))
        u2, v2, p2 = bands
        ffs = []
        for _ in range(4):
            ffs.append(x_star[off:off + core].reshape(rows, ny))
            off += core
        return s._replace(
            u=u2, v=v2, p=p2,
            u_old=u2[:, 1:-1], v_old=v2[:, 1:-1], p_old=p2[:, 1:-1],
            ff=FaceFluxes(*ffs),
        )

    n_flat_local = 3 * (rows + 2) * (ny + 2) + 4 * rows * ny
    return flatten, inject, n_flat_local


def _make_step(case: CaseConfig, profile: Optional[BFSInletProfile],
               mesh: Mesh, axis: str):
    """Build the per-rank step function (closed over all static config)."""
    mcfg, fluid, st = case.mesh, case.fluid, case.settings
    nx, ny = mcfg.nx, mcfg.ny
    n_dev = mesh.shape[axis]
    rows = nx // n_dev
    if rows < 2:
        # assemble() fetches a 2-row halo from the IMMEDIATE neighbor
        # (QUICK's +-2 stencil and the pressure-RHS extension both need
        # it); a 1-row band would silently broadcast the single neighbor
        # row into both halo slots (jnp.where broadcasting), producing
        # wrong fields instead of an error.
        raise ValueError(
            f"nx={nx} over {n_dev} '{axis}' devices leaves {rows} interior "
            f"row(s) per rank; the halo exchange needs at least 2 "
            f"(use a coarser mesh axis or a finer grid)"
        )
    dx, dy, volp, dt = mcfg.dx, mcfg.dy, mcfg.volp, st.dt
    rho = fluid.rho
    quick = st.scheme == QUICK
    n_cells = nx * ny
    p_sor = min(st.pressure_sor, optimal_sor(nx, ny))
    # per-shard Pallas pressure sweep (parallel/spmd_pallas.py): each
    # rank's block is VMEM-resident, halos still travel by ppermute
    use_pallas_p = st.use_pallas
    pallas_interpret = jax.default_backend() != "tpu"
    use_mg_p = st.pressure_solver == "multigrid"
    if use_mg_p:
        from .spmd_mg import make_spmd_mg_solve, plan_spmd_mg

        mg_plan = plan_spmd_mg(nx, ny, dx, dy, volp, n_dev,
                               np.dtype(st.dtype), min_size=st.mg_min_size)
        mg_solve = make_spmd_mg_solve(
            mg_plan, axis, n_dev, tol=st.inner_tolerance,
            n_pre=st.mg_n_pre, n_post=st.mg_n_post,
            coarsest_sweeps=st.mg_coarsest_sweeps,
            use_pallas=use_pallas_p, interpret=pallas_interpret,
        )
    alpha = {k: st.relax(k) for k in ("u", "v", "p")}
    fwd, bwd = ring_perms(n_dev)
    bcs = {0: case.u_bc, 1: case.v_bc, 2: case.p_bc}

    def rank_of():
        return jax.lax.axis_index(axis)

    def red_mask():
        rank = rank_of()
        ii = (jax.lax.broadcasted_iota(jnp.int32, (rows, ny), 0)
              + rank * rows + 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (rows, ny), 1) + 1
        return (ii + jj) % 2 == 0

    def ghosts(x_own, var_k: int):
        """(glow, ghigh) domain x-ghost rows for this variable, each
        (ny+2,). Computed on every rank; used only on boundary ranks."""
        bc = bcs[var_k]
        return (
            _ghost_row(x_own[0], bc.left, var_k, profile, is_left=True),
            _ghost_row(x_own[-1], bc.right, var_k, profile, is_left=False),
        )

    def assemble(x_own, h: int, glow, ghigh):
        """(rows + 2h, ny+2) halo-extended block: h neighbor rows by
        ppermute; boundary ranks substitute the (frozen) domain ghost
        row, edge-replicated beyond it exactly as `stencil.shifts2`
        edge-clamps the global +-2 reads."""
        rank = rank_of()
        from_up = jax.lax.ppermute(x_own[-h:], axis, fwd)
        from_dn = jax.lax.ppermute(x_own[:h], axis, bwd)
        gl = jnp.broadcast_to(glow, (h, ny + 2))
        gh = jnp.broadcast_to(ghigh, (h, ny + 2))
        top = jnp.where(rank == 0, gl, from_up)
        bot = jnp.where(rank == n_dev - 1, gh, from_dn)
        return jnp.concatenate([top, x_own, bot], axis=0)

    def shifts2_of(ext2):
        mid = ext2[2:-2]
        cp = jnp.pad(mid, ((0, 0), (1, 1)), mode="edge")
        return Shifted(
            c=mid[:, 1:-1], e=ext2[3:-1, 1:-1], w=ext2[1:-3, 1:-1],
            n=mid[:, 2:], s=mid[:, :-2],
            ee=ext2[4:, 1:-1], ww=ext2[:-4, 1:-1],
            nn=cp[:, 4:], ss=cp[:, :-4],
        )

    def apply_bc_y(x_own, var_k: int):
        return _apply_bc_y(x_own, bcs[var_k])

    def momentum_residual(x_own, glow, ghigh, old_own, ff, nu):
        if quick:
            s2 = shifts2_of(assemble(x_own, 2, glow, ghigh))
            fc, ap_c = quick_convection(None, ff, volp, shifts=s2)
            sh1 = (s2.c, s2.e, s2.w, s2.n, s2.s)
        else:
            sh1 = shifts1(assemble(x_own, 1, glow, ghigh))
            fc, ap_c = upwind_convection(None, ff, volp, shifts=sh1)
        fd, ap_d = diffusion(None, dx, dy, volp, shifts=sh1)
        c = sh1[0]
        r = -(volp / dt * (c - old_own) + fc - nu * fd)
        ap = volp / dt + ap_c - nu * ap_d
        return r, ap

    def sweep_solve(x_own, residual_fn, sor, check_every, dtype,
                    sweep_override=None):
        """The local counterpart of `sweeps.sweep_loop` (red-black only):
        identical exit conditions on globally-psum'd RMS, so all ranks
        stay in lockstep and trajectories match the single-device loop.
        `sweep_override(f, with_rms) -> (f, rms|None)` swaps the sweep
        body (the per-shard Pallas kernel path, `parallel/spmd_pallas.py`)
        while keeping the loop/stall policy identical."""
        red = red_mask()

        def sweep_jnp(f, with_rms):
            r1, ap1 = residual_fn(f)
            f = f.at[:, 1:-1].add(jnp.where(red, sor * r1 / ap1, 0.0))
            r2, ap2 = residual_fn(f)
            f = f.at[:, 1:-1].add(jnp.where(red, 0.0, sor * r2 / ap2))
            rms = None
            if with_rms:
                ss = jax.lax.psum(
                    jnp.sum(jnp.where(red, r1 * r1, r2 * r2)), axis
                )
                rms = jnp.sqrt(ss / n_cells)
            return f, rms

        sweep = sweep_override if sweep_override is not None else sweep_jnp

        def body(carry):
            f, prev, best, stale, checks, it = carry
            for _ in range(check_every - 1):
                f, _ = sweep(f, with_rms=False)
            f, rms = sweep(f, with_rms=True)
            stale, best = stall_update(rms, prev, best, stale)
            return f, rms, best, stale, checks + 1, it + check_every

        def cond(carry):
            _, rms, _, stale, checks, it = carry
            return jnp.logical_and(
                jnp.logical_and(it < st.inner_max_iter,
                                rms >= st.inner_tolerance),
                jnp.logical_not(stalled(stale, checks)),
            )

        # carry-init vma must match the body EXACTLY: the psum'd rms (and
        # everything stall_update derives from it) is invariant over this
        # mesh's solve axis but still varies over any OTHER manual axis
        # the field carries (the 'case' axis of parallel/spmd_batch.py)
        extra = frozenset(
            getattr(jax.typeof(x_own), "vma", frozenset())) - {axis}
        big = vary_over(jnp.asarray(jnp.inf, dtype), extra)
        zi = vary_over(jnp.asarray(0, jnp.int32), extra)
        zero = jnp.asarray(0, jnp.int32)
        out = jax.lax.while_loop(cond, body,
                                 (x_own, big, big, zi, zero, zero))
        return out[0]

    # ---- communication-avoiding sweeps -------------------------------
    # One H-deep halo exchange buys k full red-black sweeps by
    # recomputing the halo rows' updates redundantly. Exact erosion
    # accounting (per color, stencil radius d): a red update reads black
    # at +-1 and red at +-d', so with r_s/b_s = invalid depth after
    # sweep s, r_s = max(b_{s-1}+1, r_{s-1}+d) and
    # b_s = max(r_s+1, b_{s-1}+d) => r_s = d*s, b_s = d*s+1 for d=2
    # (QUICK) and r_s = 2s-1, b_s = 2s for d=1 (5-point). Own rows (and
    # the final sweep's own-row residuals) are exact iff
    # H >= 2k + (1 if d == 2 else 0). Own-cell updates read the same
    # values in the same op order as the exchange-per-half-sweep
    # schedule, so trajectories are BITWISE identical (the f64 parity
    # tests run unchanged); only the collective count changes:
    # 2 ppermutes per k sweeps instead of 4 per sweep.
    d_mom = 2 if quick else 1
    extra_mom = 1 if quick else 0
    k_max_mom = (rows - extra_mom) // 2   # deepest exchange <= rows

    def extend_consts(cs, H: int):
        """(n, rows+2H, ny) halo extension of the per-solve-constant
        arrays: one stacked fwd/bwd ppermute pair carries every
        constant's H-deep bands (2 collectives instead of 2n). Edge
        ranks receive the ring-wrapped opposite side - garbage, but
        only ever read at out-of-domain rows whose updates the domain
        mask discards (constants enter the residual pointwise at the
        updated cell only)."""
        arr = jnp.stack(cs)
        up = jax.lax.ppermute(arr[:, -H:], axis, fwd)
        dn = jax.lax.ppermute(arr[:, :H], axis, bwd)
        return jnp.concatenate([up, arr, dn], axis=1)

    def ca_sweep_solve(x_own, region_residual, consts, sor, check_every,
                       d, glow, ghigh, dtype, block_override=None):
        """`sweep_solve` with the communication-avoiding block schedule:
        same while_loop, stall policy and globally-psum'd rms at the
        same cadence, but each body trip exchanges once per block of
        sweeps instead of once per half-sweep. `region_residual(ext,
        consts_region) -> (r, ap)` evaluates the point residual over an
        extended block's updatable region ext[d:-d].
        `block_override(f, kb, with_rms) -> (f, rms|None)` swaps the
        whole block body (the per-shard Pallas kernel path) while
        keeping the loop/stall policy and block schedule identical."""
        extra = 1 if d == 2 else 0
        blocks = sweep_blocks(check_every, (rows - extra) // 2)
        if block_override is None:
            H_max = 2 * blocks[0] + extra
            ce_full = extend_consts(consts, H_max)
        red_own = red_mask()

        def region_masks(H: int):
            nreg = rows + 2 * H - 2 * d
            rank = rank_of()
            gi = (jax.lax.broadcasted_iota(jnp.int32, (nreg, ny), 0)
                  + rank * rows - H + d)
            jj = jax.lax.broadcasted_iota(jnp.int32, (nreg, ny), 1) + 1
            red = (gi + 1 + jj) % 2 == 0
            dom = jnp.logical_and(gi >= 0, gi < nx)
            return jnp.logical_and(red, dom), jnp.logical_and(~red, dom)

        def block_sweeps(f, kb: int, with_rms: bool):
            H = 2 * kb + extra
            fe = assemble(f, H, glow, ghigh)
            ce = ce_full[:, H_max - H:H_max + rows + H]
            cr = ce[:, d:-d]
            red_r, blk_r = region_masks(H)
            rms = None
            for j in range(kb):
                r1, ap1 = region_residual(fe, cr)
                fe = fe.at[d:-d, 1:-1].add(
                    jnp.where(red_r, sor * r1 / ap1, 0.0))
                r2, ap2 = region_residual(fe, cr)
                fe = fe.at[d:-d, 1:-1].add(
                    jnp.where(blk_r, sor * r2 / ap2, 0.0))
                if with_rms and j == kb - 1:
                    o = H - d
                    ss = jax.lax.psum(
                        jnp.sum(jnp.where(red_own,
                                          r1[o:o + rows] * r1[o:o + rows],
                                          r2[o:o + rows] * r2[o:o + rows])),
                        axis,
                    )
                    rms = jnp.sqrt(ss / n_cells)
            return fe[H:-H], rms

        block = block_override if block_override is not None else block_sweeps

        def body(carry):
            f, prev, best, stale, checks, it = carry
            rms = None
            for bi, kb in enumerate(blocks):
                f, r = block(f, kb, bi == len(blocks) - 1)
                if r is not None:
                    rms = r
            stale, best = stall_update(rms, prev, best, stale)
            return f, rms, best, stale, checks + 1, it + check_every

        def cond(carry):
            _, rms, _, stale, checks, it = carry
            return jnp.logical_and(
                jnp.logical_and(it < st.inner_max_iter,
                                rms >= st.inner_tolerance),
                jnp.logical_not(stalled(stale, checks)),
            )

        extra_axes = frozenset(
            getattr(jax.typeof(x_own), "vma", frozenset())) - {axis}
        big = vary_over(jnp.asarray(jnp.inf, dtype), extra_axes)
        zi = vary_over(jnp.asarray(0, jnp.int32), extra_axes)
        zero = jnp.asarray(0, jnp.int32)
        out = jax.lax.while_loop(cond, body,
                                 (x_own, big, big, zi, zero, zero))
        return out[0]

    def momentum_residual_region(ext, cr, nu):
        """Point residual over an extended block's region (cr carries
        the halo-extended constants: old field, 4 face fluxes)."""
        old_r = cr[0]
        ff_r = FaceFluxes(e=cr[1], n=cr[2], w=cr[3], s=cr[4])
        if quick:
            s2 = shifts2_of(ext)
            fc, ap_c = quick_convection(None, ff_r, volp, shifts=s2)
            sh1 = (s2.c, s2.e, s2.w, s2.n, s2.s)
        else:
            sh1 = shifts1(ext)
            fc, ap_c = upwind_convection(None, ff_r, volp, shifts=sh1)
        fd, ap_d = diffusion(None, dx, dy, volp, shifts=sh1)
        c = sh1[0]
        r = -(volp / dt * (c - old_r) + fc - nu * fd)
        ap = volp / dt + ap_c - nu * ap_d
        return r, ap

    def pressure_residual_region(ext, cr):
        """cr[0] is the frozen RHS rho/dt * div_sum, halo-extended."""
        sh1 = shifts1(ext)
        fd, ap_d = diffusion(None, dx, dy, volp, shifts=sh1)
        r = cr[0] - fd
        return r, jnp.full_like(r, ap_d)

    def under_relax_own(x_own, old_own, a):
        if isinstance(a, float) and a == 1.0:
            return x_own
        c = x_own[:, 1:-1]
        return x_own.at[:, 1:-1].set(old_own + a * (c - old_own))

    def step(s: SpmdState, nu) -> SpmdState:
        dtype = s.u.dtype

        # -- momentum (frozen ghosts captured at entry) -------------------
        def solve_mom(x, old_own, var_k):
            glow, ghigh = ghosts(x, var_k)
            if k_max_mom >= 1:
                return ca_sweep_solve(
                    x, partial(momentum_residual_region, nu=nu),
                    [old_own, s.ff.e, s.ff.n, s.ff.w, s.ff.s],
                    1.0, st.momentum_check_every, d_mom, glow, ghigh,
                    dtype,
                )
            # band too narrow for even a 1-sweep QUICK halo (rows == 2):
            # original exchange-per-half-sweep schedule
            return sweep_solve(
                x,
                partial(momentum_residual, glow=glow, ghigh=ghigh,
                        old_own=old_own, ff=s.ff, nu=nu),
                1.0, st.momentum_check_every, dtype,
            )

        u = solve_mom(s.u, s.u_old, 0)
        u = under_relax_own(u, s.u_old, alpha["u"])
        u = apply_bc_y(u, 0)

        v = solve_mom(s.v, s.v_old, 1)
        v = under_relax_own(v, s.v_old, alpha["v"])
        v = apply_bc_y(v, 1)

        # -- face fluxes (fresh ghosts: post-BC u, v) ---------------------
        glow_u, ghigh_u = ghosts(u, 0)
        glow_v, ghigh_v = ghosts(v, 1)
        ff = face_fluxes(assemble(u, 1, glow_u, ghigh_u),
                         assemble(v, 1, glow_v, ghigh_v), dx, dy)

        # -- pressure (frozen ghosts at entry) ----------------------------
        glow_p, ghigh_p = ghosts(s.p, 2)
        div_sum = ff.divergence_sum()
        if use_mg_p:
            # same frozen-ghost system as mg_solve_pressure: fold the
            # ghost ring's off-diagonal Laplacian terms into the RHS,
            # leaving a homogeneous-Dirichlet interior V-cycle
            rank = rank_of()
            inv_dx2, inv_dy2 = 1.0 / (dx * dx), 1.0 / (dy * dy)
            fold = jnp.zeros_like(div_sum)
            fold = fold.at[:, 0].add(inv_dy2 * s.p[:, 0])
            fold = fold.at[:, -1].add(inv_dy2 * s.p[:, -1])
            fold = fold.at[0, :].add(
                jnp.where(rank == 0, inv_dx2 * glow_p[1:-1], 0.0))
            fold = fold.at[-1, :].add(
                jnp.where(rank == n_dev - 1, inv_dx2 * ghigh_p[1:-1], 0.0))
            b_eff = rho / dt * div_sum - volp * fold
            x, _ = mg_solve(s.p[:, 1:-1], b_eff)
            p = s.p.at[:, 1:-1].set(x)
        elif use_pallas_p:
            # communication-avoiding blocks through the per-shard kernel:
            # one 2kb-row exchange per kb in-kernel sweeps, same block
            # schedule/rms cadence as the jnp ca path
            from .spmd_pallas import extend_b_halo, shard_rb_sweep

            rank = rank_of()
            p_blocks = sweep_blocks(st.pressure_check_every, rows // 2)
            h_max = 2 * p_blocks[0]
            b_ext_full = extend_b_halo(rho / dt * div_sum, axis, fwd, bwd,
                                       rank, n_dev, h=h_max)
            row0 = jnp.full((1, 1), 1, jnp.int32) * (rank * rows)

            def block_pallas(f, kb, with_rms):
                h = 2 * kb
                ext = assemble(f, h, glow_p, ghigh_p)
                own, ss = shard_rb_sweep(
                    ext, b_ext_full[h_max - h:h_max + rows + h], row0,
                    nxg=nx, inv_dx2=1.0 / (dx * dx),
                    inv_dy2=1.0 / (dy * dy), volp=volp, sor=p_sor,
                    h=h, kb=kb, axis_name=axis,
                    interpret=pallas_interpret,
                )
                rms = None
                if with_rms:
                    rms = jnp.sqrt(jax.lax.psum(ss, axis) / n_cells)
                return own, rms

            p = ca_sweep_solve(
                s.p, None, None, p_sor, st.pressure_check_every, 1,
                glow_p, ghigh_p, dtype, block_override=block_pallas,
            )
        else:
            p = ca_sweep_solve(
                s.p, pressure_residual_region, [rho / dt * div_sum],
                p_sor, st.pressure_check_every, 1, glow_p, ghigh_p,
                dtype,
            )
        p = under_relax_own(p, s.p_old, alpha["p"])
        p = apply_bc_y(p, 2)

        # -- projection + residuals (fresh p ghosts) ----------------------
        glow_p, ghigh_p = ghosts(p, 2)
        pc, pe, pw, pn, ps = shifts1(assemble(p, 1, glow_p, ghigh_p))
        u = u.at[:, 1:-1].add(-(dt / rho) * (pe - pw) / (2.0 * dx))
        v = v.at[:, 1:-1].add(-(dt / rho) * (pn - ps) / (2.0 * dy))

        def sumsq(new, old):
            d = new[:, 1:-1] - old
            return jax.lax.psum(jnp.sum(d * d), axis)

        res = jnp.stack([sumsq(u, s.u_old), sumsq(v, s.v_old),
                         sumsq(p, s.p_old)])
        u = apply_bc_y(u, 0)
        v = apply_bc_y(v, 1)

        # -- Rhie-Chow flux correction ------------------------------------
        c = dt / rho
        ff = FaceFluxes(
            e=ff.e - c * (pe - pc) * dy / dx,
            n=ff.n - c * (pn - pc) * dx / dy,
            w=ff.w - c * (pw - pc) * dy / dx,
            s=ff.s - c * (ps - pc) * dx / dy,
        )

        # -- convergence check -------------------------------------------
        rms = jnp.sqrt(res / n_cells) / dt
        crit = jnp.asarray(
            [st.criterion("u"), st.criterion("v"), st.criterion("p")],
            dtype=rms.dtype,
        )
        count = s.count + 1
        crossed = jnp.all(rms <= crit)

        # -- detectors (mirroring solver.simple.run_chunk: sustained hold,
        # field-Cauchy steady state, device-side plateau - all on GLOBAL
        # quantities so every rank stays in lockstep) ---------------------
        if st.convergence_hold > 1:
            held = jnp.where(crossed, s.held + 1, 0)
            converged = held >= st.convergence_hold
        else:
            held = s.held
            converged = crossed

        cau_u, cau_v, cau_count = s.cau_u, s.cau_v, s.cau_count
        if st.cauchy_tol > 0.0:
            at_check = (count % st.cauchy_check_every) == 0
            full = (count - s.cau_count) >= st.cauchy_check_every
            do = jnp.logical_and(at_check, full)
            # the drift branch's outputs derive from sharded bands; the
            # zero branch must carry the same vma (incl. a batched 'case'
            # axis, spmd_batch.py)
            zero = vary_over(
                jnp.asarray(0.0, rms.dtype),
                getattr(jax.typeof(u), "vma", frozenset()),
            )

            def drift():
                # local abs-max only (the expensive band reduction); the
                # scalar pmax runs unconditionally below so no collective
                # sits inside the cond (single-device: max over the padded
                # field incl. derived ghosts - drift there mirrors the
                # interior, so the band max is the same criterion)
                return (jnp.max(jnp.abs(u - s.cau_u)),
                        jnp.max(jnp.abs(v - s.cau_v)))

            du_l, dv_l = jax.lax.cond(do, drift, lambda: (zero, zero))
            du = jax.lax.pmax(du_l, axis)
            dv = jax.lax.pmax(dv_l, axis)
            steady = do & (du < st.cauchy_tol) & (dv < st.cauchy_tol)
            converged = jnp.logical_or(converged, steady)
            cau_u = jnp.where(at_check, u, s.cau_u)
            cau_v = jnp.where(at_check, v, s.cau_v)
            cau_count = jnp.where(at_check, count, s.cau_count)

        plat_best, plat_acc = s.plat_best, s.plat_acc
        plat_n, plat_stale = s.plat_n, s.plat_stale
        if st.plateau_patience > 0:
            acc = s.plat_acc + rms
            wn = s.plat_n + 1
            at_check = (count % st.plateau_check_every) == 0
            mean = acc / jnp.maximum(wn, 1).astype(acc.dtype)
            improved = jnp.any(
                mean < (1.0 - st.plateau_rtol) * s.plat_best)
            plat_stale = jnp.where(
                at_check, jnp.where(improved, 0, s.plat_stale + 1),
                s.plat_stale,
            )
            plat_best = jnp.where(
                at_check, jnp.minimum(s.plat_best, mean), s.plat_best)
            plat_acc = jnp.where(at_check, jnp.zeros_like(acc), acc)
            plat_n = jnp.where(at_check, 0, wn)
            converged = jnp.logical_or(
                converged, plat_stale >= st.plateau_patience)

        return SpmdState(
            u=u, v=v, p=p,
            u_old=u[:, 1:-1], v_old=v[:, 1:-1], p_old=p[:, 1:-1],
            ff=ff, rms=rms, count=count,
            converged=converged,
            diverged=jnp.logical_not(jnp.all(jnp.isfinite(rms))),
            held=held, plat_best=plat_best, plat_acc=plat_acc,
            plat_n=plat_n, plat_stale=plat_stale,
            cau_u=cau_u, cau_v=cau_v, cau_count=cau_count,
        )

    return step


def _make_chunk(case: CaseConfig, profile, mesh: Mesh, axis: str,
                n_steps: int):
    step = _make_step(case, profile, mesh, axis)
    st = case.settings
    use_rre = st.rre_every > 0
    if use_rre:
        from ..ops import extrapolate as rre

        n_dev = mesh.shape[axis]
        flatten, inject, n_flat = _make_rre_ops(case, profile, n_dev)
        K = st.rre_depth

    def vary(x):
        return _vary(x, axis)

    def rre_stage(s: SpmdState, buf):
        """Decomposed reduced-rank extrapolation: same snapshot cadence,
        coefficient solve, plausibility gate and injection as the
        single-device loop (`solver/simple.py:run_chunk`), with the two
        global reductions (window drift, difference Gram) assembled by
        pmax/psum of per-rank partials. Local reductions run inside
        `lax.cond` (999 of 1000 iterations skip them), the collectives
        run unconditionally outside - the same no-collective-in-a-cond
        pattern as the Cauchy detector above. One deliberate delta vs
        single-device: the detectors run inside `step`, so at an
        iteration where a jump fires the Cauchy reference holds the
        PRE-jump field; the next drift check then reads large and cannot
        falsely declare steady state (self-correcting, conservative)."""
        rank = jax.lax.axis_index(axis)
        at_snap = jnp.logical_and(
            (s.count % st.rre_every) == 0, s.count >= st.rre_min_count
        )
        buf = jax.lax.cond(
            at_snap,
            lambda b: rre.push_snapshot(b, flatten(s, rank)),
            lambda b: b,
            buf,
        )
        do_jump = buf.count > K
        dtype = buf.snaps.dtype
        zero = vary(jnp.asarray(0.0, dtype))
        drift_l = jax.lax.cond(
            do_jump,
            lambda: jnp.max(jnp.abs(buf.snaps[-1] - buf.snaps[-2])),
            lambda: zero,
        )
        drift = jax.lax.pmax(drift_l, axis)
        scale = jnp.maximum(drift, jnp.finfo(dtype).tiny)
        zK = vary(jnp.zeros((K, K), dtype))

        def gram():
            Dn = (buf.snaps[1:] - buf.snaps[:-1]) / scale
            return Dn @ Dn.T

        # replicated global Gram; gram_coeffs is only evaluated inside
        # the do_jump branches (G is all-zero -> singular otherwise)
        G = jax.lax.psum(jax.lax.cond(do_jump, gram, lambda: zK), axis)

        def jump_mag():
            x_star = rre.gram_coeffs(G) @ buf.snaps[1:]
            return jnp.max(jnp.abs(x_star - buf.snaps[-1]))

        jump = jax.lax.pmax(
            jax.lax.cond(do_jump, jump_mag, lambda: zero), axis
        )
        # a non-finite local x_star surfaces as a non-finite pmax'd jump
        # (same rejection the single-device all-isfinite check performs)
        ok = (do_jump & jnp.isfinite(jump)
              & (jump <= 1e3 * drift) & (drift > 0))

        def do_inject(args):
            s_in, b = args
            # x_star recomputed rather than threaded out of jump_mag: a
            # K*n_local matmul per JUMP iteration beats an n_local-sized
            # false-branch carry on EVERY iteration
            s_out = inject(s_in, rre.gram_coeffs(G) @ b.snaps[1:])
            s_new = jax.tree.map(
                lambda a, bb: jnp.where(ok, a, bb), s_out, s_in
            )
            return s_new, b._replace(count=jnp.asarray(0, jnp.int32))

        return jax.lax.cond(do_jump, do_inject, lambda a: a, (s, buf))

    def chunk(s: SpmdState, nu) -> SpmdState:
        def body(carry):
            s, i, buf = carry
            s = step(s, nu)
            if use_rre:
                s, buf = rre_stage(s, buf)
            return s, i + 1, buf

        def cond(carry):
            s, i = carry[0], carry[1]
            active = jnp.logical_and(
                jnp.logical_and(~s.converged, ~s.diverged),
                s.count < st.max_iterations,
            )
            return jnp.logical_and(i < n_steps, active)

        if use_rre:
            buf0 = rre.empty_buffer(K, n_flat, s.u.dtype)
            buf0 = buf0._replace(snaps=vary(buf0.snaps))
        else:
            buf0 = jnp.asarray(0, jnp.int32)  # placeholder, never touched
        out = jax.lax.while_loop(
            cond, body, (s, jnp.asarray(0, jnp.int32), buf0)
        )
        return out[0]

    specs = _specs(axis)
    # check_vma must be off on the Pallas path: vma propagation through
    # pallas_call's interpret evaluator rejects mixed-vma ref indexing
    # (jax's own error message names check_vma=False as the workaround)
    return jax.jit(jax.shard_map(
        chunk, mesh=mesh, in_specs=(specs, P()), out_specs=specs,
        check_vma=not st.use_pallas,
    ))


# (mesh, axis, case, n_steps) -> compiled shard_map chunk
_CHUNK_CACHE: Dict[Tuple, object] = {}
_CHUNK_CACHE_MAX = 16


class SpmdSolver:
    """Domain-decomposed solver at reference grid sizes: interior rows
    sharded over the mesh (`nx % n_devices == 0` - 400/512/1024/2048 all
    qualify), full SIMPLE step under shard_map with explicit halo
    exchange. Results match the single-device solver to reduction-order
    rounding. Complements `parallel.domain.ShardedSolver` (GSPMD,
    bit-identical, but needs `(nx+2) % n_devices == 0`)."""

    def __init__(self, case: CaseConfig, mesh: Mesh, axis: str = "x"):
        n_dev = mesh.shape[axis]
        if case.mesh.nx % n_dev != 0:
            raise ValueError(
                f"nx = {case.mesh.nx} must divide over {n_dev} '{axis}' "
                f"devices (interior-row decomposition)"
            )
        if case.settings.spmd_devices not in (1, n_dev):
            raise ValueError(
                f"spmd_devices={case.settings.spmd_devices} does not match "
                f"the {n_dev}-device '{axis}' mesh: the config-time VMEM "
                "gate scaled the per-rank Pallas working set by a "
                "decomposition factor this mesh won't deliver"
            )
        if case.settings.pressure_solver not in ("sweeps", "multigrid"):
            raise ValueError(
                "SpmdSolver supports pressure_solver='sweeps' (reference-"
                "semantics inner loop) or 'multigrid' (sharded V-cycles, "
                f"parallel/spmd_mg.py); got {case.settings.pressure_solver!r}"
            )
        if case.settings.fused_step:
            raise ValueError("SpmdSolver shards the step; the fused "
                             "single-device whole-step kernel doesn't "
                             "apply (use_pallas=True runs the per-shard "
                             "Pallas pressure sweep instead)")
        # use_pallas + multigrid runs the sharded V-cycle with per-rank
        # Pallas smoother kernels (spmd_mg.smooth_band_pallas); use_pallas
        # + sweeps runs the per-shard Pallas pressure sweep
        # (parallel/spmd_pallas.py) - every single-device mode has a
        # decomposed counterpart.
        # rre_every > 0 runs decomposed reduced-rank extrapolation
        # (_make_rre_ops / rre_stage): per-rank snapshot bands, psum'd
        # Gram, replicated coefficient solve. As on the single-device
        # path, the snapshot buffer is chunk-local - a cycle needs
        # rre_every*(rre_depth+1) iterations within one chunk to fire.
        self.case = case
        self.mesh = mesh
        self.axis = axis
        self.profile = inlet_profile(case)
        self._nu = jnp.asarray(case.fluid.nu,
                               jnp.dtype(case.settings.dtype))
        key = (mesh, axis, case, case.settings.chunk_size)
        if key not in _CHUNK_CACHE:
            while len(_CHUNK_CACHE) >= _CHUNK_CACHE_MAX:
                _CHUNK_CACHE.pop(next(iter(_CHUNK_CACHE)))
            _CHUNK_CACHE[key] = _make_chunk(
                case, self.profile, mesh, axis, case.settings.chunk_size
            )
        else:
            # LRU, not FIFO: refresh recency on hit so workloads cycling
            # >16 (mesh, case) combos evict the coldest compiled chunk,
            # not potentially the hottest (each miss is a full re-jit)
            _CHUNK_CACHE[key] = _CHUNK_CACHE.pop(key)
        self._chunk_fn = _CHUNK_CACHE[key]
        self.local = self._to_local(init_state(case))
        from ..solver.simple import ResidualHistory

        self.residual_history = ResidualHistory()

    def _to_local(self, state: SolverState) -> SpmdState:
        """Shard a global SolverState's interior bands over the mesh."""
        row = NamedSharding(self.mesh, P(self.axis, None))
        rep = NamedSharding(self.mesh, P())

        def band(x):  # (nx+2, ny+2) -> (nx, ny+2) interior rows
            return jax.device_put(x[1:-1, :], row)

        def put_row(x):
            return jax.device_put(x, row)

        return SpmdState(
            u=band(state.u), v=band(state.v), p=band(state.p),
            u_old=put_row(state.u_old), v_old=put_row(state.v_old),
            p_old=put_row(state.p_old),
            ff=FaceFluxes(*(put_row(f) for f in state.ff)),
            rms=jax.device_put(state.rms, rep),
            count=jax.device_put(state.count, rep),
            converged=jax.device_put(state.converged, rep),
            diverged=jax.device_put(state.diverged, rep),
            held=jax.device_put(state.held, rep),
            plat_best=jax.device_put(state.plat_best, rep),
            plat_acc=jax.device_put(state.plat_acc, rep),
            plat_n=jax.device_put(state.plat_n, rep),
            plat_stale=jax.device_put(state.plat_stale, rep),
            cau_u=band(state.cau_u_ref), cau_v=band(state.cau_v_ref),
            cau_count=jax.device_put(state.cau_count, rep),
        )

    def run_chunk(self) -> SpmdState:
        self.local = self._chunk_fn(self.local, self._nu)
        return self.local

    def solve(self, max_chunks: Optional[int] = None) -> SpmdState:
        st = self.case.settings
        chunks = 0
        rms_window: list = []
        while True:
            self.run_chunk()
            chunks += 1
            rms = np.asarray(self.local.rms)
            self.residual_history.append(int(self.local.count), rms)
            done = (bool(self.local.converged) or bool(self.local.diverged)
                    or int(self.local.count) >= st.max_iterations)
            if done or (max_chunks is not None and chunks >= max_chunks):
                return self.local
            # host-side plateau window over chunk-boundary samples,
            # mirroring CFDSolver.solve (the device-side detector inside
            # the chunk is the primary; this catches plateaus whose
            # window exceeds plateau_check_every resolution)
            if st.plateau_patience > 0:
                rms_window.append(rms)
                n = st.plateau_patience
                if len(rms_window) >= 2 * n:
                    recent = np.median(rms_window[-n:], axis=0)
                    prior = np.median(rms_window[-2 * n:-n], axis=0)
                    if np.all(recent >= (1.0 - st.plateau_rtol) * prior):
                        return self.local
                    rms_window = rms_window[-2 * n:]

    def global_fields(self) -> Dict[str, np.ndarray]:
        """Gather {u, v, p} as full padded (nx+2, ny+2) arrays with the
        ghost ring re-derived (identical to the single-device state)."""
        from ..ops.bc import apply_bc, apply_bfs_inlet

        nx, ny = self.case.mesh.nx, self.case.mesh.ny
        out = {}
        for name, band, k, bc in (
            ("u", self.local.u, 0, self.case.u_bc),
            ("v", self.local.v, 1, self.case.v_bc),
            ("p", self.local.p, 2, self.case.p_bc),
        ):
            full = jnp.zeros((nx + 2, ny + 2), band.dtype)
            full = full.at[1:-1, :].set(jax.device_get(band))
            full = apply_bc(full, bc)
            if k in (0, 1):
                full = apply_bfs_inlet(full, k, self.profile)
            out[name] = np.asarray(full)
        return out

    # -- artifact-suite adapter (same surface io.results expects of the
    # single-device CFDSolver, so the reference's .dat/.h5/plot outputs
    # work for decomposed runs too) -----------------------------------
    @property
    def Var(self) -> np.ndarray:
        f = self.global_fields()
        return np.stack([f["u"], f["v"], f["p"]])

    def interior_fields(self) -> Dict[str, np.ndarray]:
        # (ny, nx) transposed, matching SolverState.interior_fields - the
        # contract of the HDF5 writer, SR inference, and warm_start
        return {k: v[1:-1, 1:-1].T.copy()
                for k, v in self.global_fields().items()}

    def save_results(self, output_base_name: str) -> None:
        from ..io.results import save_all_results

        save_all_results(self, output_base_name)

    # -- checkpoint / resume (same .npz format as the single-device
    # solver, io/checkpoint.py - snapshots are interchangeable) --------
    def checkpoint(self, path: str) -> None:
        from types import SimpleNamespace

        from ..io.checkpoint import save_solver_state

        f = self.global_fields()
        save_solver_state(path, SimpleNamespace(
            u=f["u"], v=f["v"], p=f["p"], count=int(self.local.count)))

    def warm_start(self, fields: Dict[str, np.ndarray],
                   count: int = 0) -> None:
        """Re-seed from (ny, nx) interior fields (the same contract as
        `CFDSolver.warm_start`): ghosts, olds and face fluxes re-derived,
        so a resumed trajectory matches the single-device solver resumed
        from the same snapshot."""
        from ..solver.state import warm_start_state

        st = warm_start_state(self.case, fields)
        if count:
            st = st._replace(count=jnp.asarray(count, jnp.int32))
        self.local = self._to_local(st)

    def resume_from(self, path: str) -> None:
        from ..io.checkpoint import _npz_path, load_solver_fields

        fields = load_solver_fields(path)
        with np.load(_npz_path(path)) as data:
            count = int(data["count"])
        self.warm_start(fields, count=count)


class SpmdWorkflowAdapter:
    """CFDSolver-shaped facade over `SpmdSolver` for the hybrid workflow
    (`workflow/hybrid.py`): the fine phases of the reference experiment
    (`PyCFD_ML_accelerated.py:882-959, 1126-1179`) run domain-decomposed
    while keeping the exact warm_start/precompile/solve/artifact surface
    the workflow drives. `.mesh` is MeshParameters (as on CFDSolver);
    the device mesh lives at `.spmd.mesh`."""

    def __init__(self, solver: SpmdSolver):
        self.spmd = solver
        self.case = solver.case

    @property
    def mesh(self):
        return self.case.mesh

    @property
    def fluid(self):
        return self.case.fluid

    @property
    def settings(self):
        return self.case.settings

    @property
    def Var(self) -> np.ndarray:
        return self.spmd.Var

    @property
    def residual_history(self):
        return self.spmd.residual_history

    def interior_fields(self) -> Dict[str, np.ndarray]:
        return self.spmd.interior_fields()

    def warm_start(self, fields: Dict[str, np.ndarray],
                   count: int = 0) -> None:
        self.spmd.warm_start(fields, count=count)

    def precompile(self) -> float:
        """AOT-compile the shard_map chunk ahead of the timed phase. (No
        sacrificial warmup dispatch here, unlike CFDSolver.precompile -
        the relay-stall workaround matters on the tunneled single-chip
        backend, where SpmdSolver isn't the perf path.)"""
        import time

        t0 = time.time()
        self.spmd._chunk_fn.lower(self.spmd.local, self.spmd._nu).compile()
        return time.time() - t0

    def solve(self, output_base_name: str, verbose: bool = True,
              save_results: bool = True, **_ignored):
        """(iterations, elapsed_seconds), writing the same artifact suite
        as CFDSolver.solve."""
        import time

        t0 = time.time()
        local = self.spmd.solve()
        elapsed = time.time() - t0
        if bool(local.diverged):
            from ..solver.simple import DivergenceError

            raise DivergenceError(
                f"Solution diverged at iteration {int(local.count)}: "
                f"RMS = {np.asarray(local.rms).tolist()} (NaN/Inf)."
            )
        if verbose:
            print(f"\nSimulation completed in {elapsed:.2f} seconds "
                  f"({self.spmd.mesh.shape} device mesh)")
            print(f"Total iterations: {int(local.count)}")
        if save_results:
            self.spmd.save_results(output_base_name)
        return int(local.count), elapsed
