"""Fully-fused SIMPLE outer step as a single Pallas TPU kernel.

One `pallas_call` executes the reference's entire `_implicit_solve` +
residual computation (`LDV PyCFD given by sir.py:171-232`,
`bfs code given by sir.py:254-305`): both momentum inner loops, BC ghost
fills, face fluxes, the full pressure-Poisson inner loop, under-relaxation,
projection, residual reductions, and the Rhie-Chow flux update - with every
field VMEM-resident for the whole step. This removes all XLA kernel-launch
granularity from the hot path; per-step cost collapses to the raw VPU sweep
work (dominated by the up-to-1000-sweep pressure loop).

Layout rules inside the kernel: all arrays are full padded shape
(nx+2, ny+2); neighbor access is `_roll` - concatenated slices with
REPLICATED edges (cheaper than pltpu.roll on the VPU); every update and
reduction is masked to the interior, so the replicated edge values in
ghost positions never contaminate results. QUICK's +-2 far neighbors are
edge-clamped at the first/last interior line via iota masks, matching
`ops.stencil.shifts2` (the reference reads out of bounds there - see
SURVEY.md section 7 "hard parts").

float32 only; the f64 CPU validation path uses the jnp step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DIRICHLET, QUICK, CaseConfig
from .bc import BFSInletProfile
from .stencil import FaceFluxes
from .sweeps import stall_update, stalled


def _masks(shape):
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    interior = (
        (ii >= 1) & (ii <= shape[0] - 2) & (jj >= 1) & (jj <= shape[1] - 2)
    )
    return ii, jj, interior


def _roll(f, shift, axis):
    """Neighbor shift via concatenated slices with replicated edges
    (measured ~18% cheaper per sweep than pltpu.roll on v5e; see
    ops/pallas_mg.py). result[i] = f[i + |shift|] for shift < 0 and
    f[i - shift] for shift > 0, with out-of-range positions holding the
    replicated edge value instead of pltpu.roll's wraparound. Every call
    site consumes only in-range or explicitly clamped positions (ghost
    rows are update-masked), so the two are interchangeable here."""
    k = abs(shift)
    if axis == 0:
        edge = jnp.concatenate([f[-1:]] * k, axis=0) if shift < 0 else (
            jnp.concatenate([f[:1]] * k, axis=0))
        return (jnp.concatenate([f[k:], edge], axis=0) if shift < 0
                else jnp.concatenate([edge, f[:-k]], axis=0))
    edge = jnp.concatenate([f[:, -1:]] * k, axis=1) if shift < 0 else (
        jnp.concatenate([f[:, :1]] * k, axis=1))
    return (jnp.concatenate([f[:, k:], edge], axis=1) if shift < 0
            else jnp.concatenate([edge, f[:, :-k]], axis=1))


class _Shifts(NamedTuple):
    e: jnp.ndarray
    w: jnp.ndarray
    n: jnp.ndarray
    s: jnp.ndarray


def _nbrs(f) -> _Shifts:
    return _Shifts(
        e=_roll(f, -1, 0), w=_roll(f, 1, 0), n=_roll(f, -1, 1), s=_roll(f, 1, 1)
    )


def make_step_kernel(case: CaseConfig, has_bfs: bool):
    """Build the fused-step kernel for a static case config."""
    mesh, fluid, st = case.mesh, case.fluid, case.settings
    nx, ny = mesh.nx, mesh.ny
    shape = (nx + 2, ny + 2)
    dx, dy, volp, dt = mesh.dx, mesh.dy, mesh.volp, st.dt
    rho = fluid.rho
    inv_dx2, inv_dy2 = 1.0 / (dx * dx), 1.0 / (dy * dy)
    ap_d = -volp * (2.0 * inv_dx2 + 2.0 * inv_dy2)
    n_cells = nx * ny
    tol = st.inner_tolerance
    max_iter = st.inner_max_iter
    m_check = max(1, st.momentum_check_every)
    p_check = max(1, st.pressure_check_every)
    # clamp SOR to the grid's optimal omega (shared helper; values above it
    # slow red-black convergence, badly so on small grids)
    from .sweeps import optimal_sor

    sor = min(st.pressure_sor, optimal_sor(nx, ny))
    alpha = {k: st.relax(k) for k in ("u", "v", "p")}
    quick = st.scheme == QUICK
    k_steps = max(1, st.steps_per_kernel)
    # pressure mode: the reference-semantics point-iteration loop, or the
    # in-kernel V-cycle (same operators/stall policy as ops/pallas_mg.py;
    # transfer matrices arrive as extra kernel inputs)
    use_mg = st.pressure_solver == "multigrid"
    if use_mg:
        from .multigrid import MG_MAX_CYCLES, MG_SMOOTHER_SOR, ghost_fold
        from .pallas_mg import mg_while_loop, plan_hierarchy

        plan = plan_hierarchy(nx, ny, dx, dy, volp, min_size=st.mg_min_size)
    else:
        plan = None

    def kernel(u_ref, v_ref, p_ref, fe_ref, fn_ref, fw_ref, fs_ref,
               uin_ref, below_ref, nu_ref, *rest):
        if use_mg:
            # trailing two entries are interior-shaped VMEM scratch: the
            # V-cycle's concatenate-based shifts need canonical (offset-0)
            # vector layouts, which a slice of the padded field does not
            # have - storing through a ref relayouts it
            mat_refs, scratch = rest[:-11], rest[-2:]
            outs = rest[-11:-2]
        else:
            mat_refs, scratch = rest[:-9], None
            outs = rest[-9:]
        (uo_ref, vo_ref, po_ref, feo_ref, fno_ref, fwo_ref, fso_ref,
         res_ref, cnt_ref) = outs
        # viscosity as a runtime scalar so all Reynolds numbers share one
        # compiled executable
        nu = nu_ref[0, 0]
        ii, jj, interior = _masks(shape)
        int_j = (jj >= 1) & (jj <= ny)
        int_i = (ii >= 1) & (ii <= nx)
        red = interior & (((ii + jj) % 2) == 0)
        black = interior & (((ii + jj) % 2) == 1)

        u0 = u_ref[:]
        v0 = v_ref[:]
        p0 = p_ref[:]
        fe = fe_ref[:]
        fn = fn_ref[:]
        fw = fw_ref[:]
        fs = fs_ref[:]
        u_in = uin_ref[:]      # (1, ny+2) parabolic inlet profile
        below = below_ref[:]   # (1, ny+2) 1.0 where wall section

        # ---- BC ghost fills (roll+where; reference apply_bc_configured,
        # `LDV PyCFD given by sir.py:386-414`) --------------------------
        def bc(f, spec, var_k):
            up = _roll(f, -1, 0)      # up[0] = f[1]
            down = _roll(f, 1, 0)     # down[-1] = f[-2]
            lv = (2.0 * spec.left.value - up) if spec.left.type == DIRICHLET else up
            f = jnp.where((ii == 0) & int_j, lv, f)
            rv = (2.0 * spec.right.value - down) if spec.right.type == DIRICHLET else down
            f = jnp.where((ii == shape[0] - 1) & int_j, rv, f)
            fwd = _roll(f, -1, 1)
            back = _roll(f, 1, 1)
            tv = (2.0 * spec.top.value - back) if spec.top.type == DIRICHLET else back
            f = jnp.where((jj == shape[1] - 1) & int_i, tv, f)
            bv = (2.0 * spec.bottom.value - fwd) if spec.bottom.type == DIRICHLET else fwd
            f = jnp.where((jj == 0) & int_i, bv, f)
            if has_bfs and var_k in (0, 1):
                up = _roll(f, -1, 0)
                if var_k == 1:
                    ghost = -up
                else:
                    ghost = jnp.where(below > 0.5, -up, 2.0 * u_in - up)
                f = jnp.where((ii == 0) & int_j, ghost, f)
            return f

        bc_u = functools.partial(bc, spec=case.u_bc, var_k=0)
        bc_v = functools.partial(bc, spec=case.v_bc, var_k=1)
        bc_p = functools.partial(bc, spec=case.p_bc, var_k=2)

        def one_step(u0, v0, p0, fe, fn, fw, fs):
            """One full SIMPLE outer iteration on in-register fields;
            every helper that reads the face fluxes or the pressure RHS
            is defined INSIDE so closures see this step's values (the
            multi-step loop rebinds them each iteration)."""
            # ---- convection + diffusion residual (full-array) --------------
            def momentum_residual(f, f_old):
                nb = _nbrs(f)
                if quick:
                    # edge-clamped +-2 neighbors (see module docstring)
                    ee = jnp.where(ii == nx, nb.e, _roll(f, -2, 0))
                    ww = jnp.where(ii == 1, nb.w, _roll(f, 2, 0))
                    nn = jnp.where(jj == ny, nb.n, _roll(f, -2, 1))
                    ss = jnp.where(jj == 1, nb.s, _roll(f, 2, 1))
                    pos_e, pos_w = fe >= 0, fw >= 0
                    pos_n, pos_s = fn >= 0, fs >= 0
                    ue = jnp.where(pos_e, 0.75 * f + 0.375 * nb.e - 0.125 * nb.w,
                                   0.75 * nb.e + 0.375 * f - 0.125 * ee)
                    uw = jnp.where(pos_w, 0.75 * f + 0.375 * nb.w - 0.125 * nb.e,
                                   0.75 * nb.w + 0.375 * f - 0.125 * ww)
                    un = jnp.where(pos_n, 0.75 * f + 0.375 * nb.n - 0.125 * nb.s,
                                   0.75 * nb.n + 0.375 * f - 0.125 * nn)
                    us = jnp.where(pos_s, 0.75 * f + 0.375 * nb.s - 0.125 * nb.n,
                                   0.75 * nb.s + 0.375 * f - 0.125 * ss)
                    sum_flux = (jnp.where(pos_e, 0.75, 0.375) * fe
                                + jnp.where(pos_w, 0.75, 0.375) * fw
                                + jnp.where(pos_n, 0.75, 0.375) * fn
                                + jnp.where(pos_s, 0.75, 0.375) * fs)
                else:
                    pos_e, pos_w = fe >= 0, fw >= 0
                    pos_n, pos_s = fn >= 0, fs >= 0
                    ue = jnp.where(pos_e, f, nb.e)
                    uw = jnp.where(pos_w, f, nb.w)
                    un = jnp.where(pos_n, f, nb.n)
                    us = jnp.where(pos_s, f, nb.s)
                    sum_flux = (jnp.where(pos_e, fe, 0.0)
                                + jnp.where(pos_w, fw, 0.0)
                                + jnp.where(pos_n, fn, 0.0)
                                + jnp.where(pos_s, fs, 0.0))
                fc = ue * fe + uw * fw + un * fn + us * fs
                ap_c = sum_flux * volp
                fd = volp * ((nb.e - 2.0 * f + nb.w) * inv_dx2
                             + (nb.n - 2.0 * f + nb.s) * inv_dy2)
                r = -(volp / dt * (f - f_old) + fc - nu * fd)
                ap = volp / dt + ap_c - nu * ap_d
                return r, ap

            def momentum_solve(f0):
                """Red-black inner loop; f0 doubles as VarOld (they are equal
                at step entry)."""
                def sweep(f, with_rms):
                    r1, ap1 = momentum_residual(f, f0)
                    f = f + jnp.where(red, r1 / ap1, 0.0)
                    r2, ap2 = momentum_residual(f, f0)
                    f = f + jnp.where(black, r2 / ap2, 0.0)
                    if not with_rms:
                        return f, None
                    ss = jnp.sum(jnp.where(red, r1 * r1, 0.0)
                                 + jnp.where(black, r2 * r2, 0.0))
                    return f, jnp.sqrt(ss / n_cells)

                def body(c):
                    f, prev, best, stale, checks, it = c
                    f = jax.lax.fori_loop(
                        0, m_check - 1, lambda _, g: sweep(g, False)[0], f
                    )
                    f, rms = sweep(f, True)
                    stale, best = stall_update(rms, prev, best, stale)
                    return f, rms, best, stale, checks + 1, it + m_check

                def cond(c):
                    _, prev, best, stale, checks, it = c
                    return jnp.logical_and(
                        jnp.logical_and(it < max_iter, best >= tol),
                        jnp.logical_not(stalled(stale, checks)),
                    )

                big = jnp.asarray(jnp.inf, f0.dtype)
                zero = jnp.asarray(0, jnp.int32)
                f, _, _, _, _, it = jax.lax.while_loop(
                    cond, body, (f0, big, big, zero, zero, zero)
                )
                return f, it

            # ---- momentum ---------------------------------------------------
            u, u_it = momentum_solve(u0)
            if alpha["u"] != 1.0:
                u = jnp.where(interior, u0 + alpha["u"] * (u - u0), u)
            u = bc_u(u)

            v, v_it = momentum_solve(v0)
            if alpha["v"] != 1.0:
                v = jnp.where(interior, v0 + alpha["v"] * (v - v0), v)
            v = bc_v(v)

            # ---- face fluxes (`linear_interpolation`) ------------------------
            fe = jnp.where(interior, (u + _roll(u, -1, 0)) * (0.5 * dy), 0.0)
            fw = jnp.where(interior, -(u + _roll(u, 1, 0)) * (0.5 * dy), 0.0)
            fn = jnp.where(interior, (v + _roll(v, -1, 1)) * (0.5 * dx), 0.0)
            fs = jnp.where(interior, -(v + _roll(v, 1, 1)) * (0.5 * dx), 0.0)

            # ---- pressure-Poisson loop ---------------------------------------
            b = (rho / dt) * (fe + fn + fw + fs)

            def p_solve_mg(p0):
                """In-kernel V-cycle solve of the same frozen-ghost system
                (interior unknowns, ghost contributions folded into the RHS -
                identical to pallas_mg_solve_pressure's wrapper)."""
                ghost_only = jnp.where(interior, 0.0, p0)
                lg = ghost_fold(ghost_only, inv_dx2, inv_dy2, volp)
                x_s, b_s = scratch
                x_s[:] = p0[1:-1, 1:-1]
                b_s[:] = b[1:-1, 1:-1] - lg
                x, cycles = mg_while_loop(
                    x_s[:], b_s[:],
                    [m[:] for m in mat_refs], plan,
                    tol=tol, max_cycles=MG_MAX_CYCLES, n_pre=st.mg_n_pre,
                    n_post=st.mg_n_post, sor=st.mg_smoother_sor,
                    coarsest_sweeps=st.mg_coarsest_sweeps,
                )
                zc = jnp.zeros((nx, 1), jnp.float32)
                zr = jnp.zeros((1, ny + 2), jnp.float32)
                xp = jnp.concatenate([zc, x, zc], axis=1)
                xp = jnp.concatenate([zr, xp, zr], axis=0)
                return jnp.where(interior, xp, p0), cycles

            def p_sweep(f, with_rms):
                def half(f, mask):
                    nb = _nbrs(f)
                    fd = volp * ((nb.e - 2.0 * f + nb.w) * inv_dx2
                                 + (nb.n - 2.0 * f + nb.s) * inv_dy2)
                    r = b - fd
                    f = f + jnp.where(mask, sor * r / ap_d, 0.0)
                    return f, r

                f, r1 = half(f, red)
                f, r2 = half(f, black)
                if not with_rms:
                    return f, None
                ss = jnp.sum(jnp.where(red, r1 * r1, 0.0)
                             + jnp.where(black, r2 * r2, 0.0))
                return f, jnp.sqrt(ss / n_cells)

            def p_body(c):
                f, prev, best, stale, checks, it = c
                f = jax.lax.fori_loop(
                    0, p_check - 1, lambda _, g: p_sweep(g, False)[0], f
                )
                f, rms = p_sweep(f, True)
                stale, best = stall_update(rms, prev, best, stale)
                return f, rms, best, stale, checks + 1, it + p_check

            def p_cond(c):
                _, prev, best, stale, checks, it = c
                return jnp.logical_and(
                    jnp.logical_and(it < max_iter, best >= tol),
                    jnp.logical_not(stalled(stale, checks)),
                )

            if use_mg:
                p, p_it = p_solve_mg(p0)
            else:
                bigp = jnp.asarray(jnp.inf, p0.dtype)
                zerop = jnp.asarray(0, jnp.int32)
                p, _, _, _, _, p_it = jax.lax.while_loop(
                    p_cond, p_body, (p0, bigp, bigp, zerop, zerop, zerop)
                )
            if alpha["p"] != 1.0:
                p = jnp.where(interior, p0 + alpha["p"] * (p - p0), p)
            p = bc_p(p)

            # ---- projection + residuals (`correct_velocity`) -----------------
            pn = _nbrs(p)
            u = jnp.where(interior,
                          u - dt / rho * (pn.e - pn.w) / (2.0 * dx), u)
            v = jnp.where(interior,
                          v - dt / rho * (pn.n - pn.s) / (2.0 * dy), v)
            du = jnp.where(interior, u - u0, 0.0)
            dv = jnp.where(interior, v - v0, 0.0)
            dp = jnp.where(interior, p - p0, 0.0)
            res_u = jnp.sum(du * du)
            res_v = jnp.sum(dv * dv)
            res_p = jnp.sum(dp * dp)
            u = bc_u(u)
            v = bc_v(v)

            # ---- Rhie-Chow flux correction (`update_flux`) -------------------
            c = dt / rho
            fe = jnp.where(interior, fe - c * (pn.e - p) * dy / dx, 0.0)
            fn = jnp.where(interior, fn - c * (pn.n - p) * dx / dy, 0.0)
            fw = jnp.where(interior, fw - c * (pn.w - p) * dy / dx, 0.0)
            fs = jnp.where(interior, fs - c * (pn.s - p) * dx / dy, 0.0)

            return (u, v, p, fe, fn, fw, fs, (res_u, res_v, res_p),
                    (u_it, v_it, p_it))

        if k_steps == 1:
            u, v, p, fe, fn, fw, fs, res, cnts = one_step(
                u0, v0, p0, fe, fn, fw, fs)
        else:
            # run k_steps outer iterations per kernel launch: on tiny
            # grids the per-launch overhead (~16 us) dwarfs the step's
            # device work, so the chunk driver amortizes it K-fold.
            # Residuals of the LAST step are returned (same value the
            # per-step driver would see at the same iteration count);
            # inner counts are SUMS over the launch's k steps.
            zero = jnp.float32(0.0)
            izero = jnp.asarray(0, jnp.int32)

            def loop_body(_, carry):
                cu, cv, cp, cfe, cfn, cfw, cfs, _, acc = carry
                out = one_step(cu, cv, cp, cfe, cfn, cfw, cfs)
                cnts = out[-1]
                return out[:-1] + (tuple(a + c for a, c in zip(acc, cnts)),)

            u, v, p, fe, fn, fw, fs, res, cnts = jax.lax.fori_loop(
                0, k_steps, loop_body,
                (u0, v0, p0, fe, fn, fw, fs, (zero, zero, zero),
                 (izero, izero, izero)),
            )
        res_u, res_v, res_p = res

        uo_ref[:] = u
        vo_ref[:] = v
        po_ref[:] = p
        feo_ref[:] = fe
        fno_ref[:] = fn
        fwo_ref[:] = fw
        fso_ref[:] = fs
        res_ref[:] = jnp.stack([res_u, res_v, res_p]).reshape(1, 3)
        # inner-solve counters (u sweeps, v sweeps, p sweeps-or-V-cycles)
        # as a (1,3) vector store - SURVEY 5.1, VERDICT r2 #6
        cnt_ref[:, :] = jnp.stack(cnts).reshape(1, 3)

    return kernel, shape, plan


def pallas_simple_step(
    u: jnp.ndarray,
    v: jnp.ndarray,
    p: jnp.ndarray,
    ff: FaceFluxes,
    case: CaseConfig,
    profile: Optional[BFSInletProfile],
    nu=None,
    interpret: bool = False,
):
    """Run one fused SIMPLE outer iteration. Returns (u, v, p, FaceFluxes
    interior, res_sums[3], counts[3]) - counts = (u sweeps, v sweeps,
    p sweeps-or-V-cycles) summed over the launch's `steps_per_kernel`
    steps. Inputs: padded fields + interior-shaped fluxes.
    """
    kernel, shape, plan = make_step_kernel(case, has_bfs=profile is not None)
    mats = plan.mats if plan is not None else []
    dtype = u.dtype

    def pad_flux(x):
        return jnp.zeros(shape, dtype).at[1:-1, 1:-1].set(x)

    if profile is not None:
        u_in = profile.u_in.reshape(1, -1).astype(dtype)
        below = profile.below.reshape(1, -1).astype(dtype)
    else:
        u_in = jnp.zeros((1, shape[1]), dtype)
        below = jnp.zeros((1, shape[1]), dtype)
    if nu is None:
        nu = case.fluid.nu
    nu_arr = jnp.full((1, 1), 1.0, dtype) * nu

    vmem = pl.ANY if interpret else pltpu.VMEM
    kw = {}
    if not interpret:
        # the working set (9 in + 8 out + temps) exceeds the default 16 MiB
        # scoped-vmem budget at 400x400; v5e has 128 MiB of VMEM
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            [jax.ShapeDtypeStruct(shape, dtype)] * 7
            + [jax.ShapeDtypeStruct((1, 3), dtype),
               jax.ShapeDtypeStruct((1, 3), jnp.int32)]
        ),
        in_specs=[pl.BlockSpec(memory_space=vmem)] * (10 + len(mats)),
        out_specs=[pl.BlockSpec(memory_space=vmem)] * 9,
        scratch_shapes=(
            [pltpu.VMEM((shape[0] - 2, shape[1] - 2), jnp.float32)] * 2
            if plan is not None else []
        ),
        interpret=interpret,
        **kw,
    )(u, v, p, pad_flux(ff.e), pad_flux(ff.n), pad_flux(ff.w), pad_flux(ff.s),
      u_in, below, nu_arr, *mats)
    u2, v2, p2, fe, fn, fw, fs, res, cnt = outs
    ff2 = FaceFluxes(
        e=fe[1:-1, 1:-1], n=fn[1:-1, 1:-1], w=fw[1:-1, 1:-1], s=fs[1:-1, 1:-1]
    )
    return u2, v2, p2, ff2, res[0], cnt[0]
