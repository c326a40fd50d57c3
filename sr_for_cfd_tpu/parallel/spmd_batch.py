"""Case-parallel x domain-decomposed solves on a 2-D ('case', 'x') mesh.

The data-generation sweep shards whole cases over devices (one case per
device, `workflow/sweep.py` - SURVEY.md sections 3.4/5.8), and the
explicit-SPMD solver decomposes one case's grid over devices
(`parallel/spmd_step.py`). This module composes the two: a batch of
same-shape cavity cases (per-case Reynolds number), each decomposed over
the mesh's 'x' axis, cases sharded over its 'case' axis - e.g. 2 x 400^2
cases each split 4 ways on an 8-device slice. This is how fine-grid
training data generation uses a pod when there are fewer concurrent cases
than chips.

Mechanics: the per-rank SPMD step (`spmd_step._make_step`: ppermute halos
over 'x', psum residuals over 'x') is `jax.vmap`ed over a leading local-
case axis inside one `shard_map` over the 2-D mesh - vmap's batching
rules carry the collectives (verified: halo rings stay within a case row,
whose members share identical per-case convergence flags, so rows exit
the chunk loop in lockstep). Converged cases are frozen by masking, as in
`workflow.sweep.batched_cavity_solve` (a vmapped outer while_loop would
keep stepping them); the INNER sweep loops need no masking - vmap's
while_loop batching rule already freezes early-exiting members, so each
case's inner-iteration trajectory is identical to its solo SPMD run.

Reference contract: the strictly sequential Re x mesh loop of
`sr-simulation-data-creation.ipynb` cell 2 (`/tmp/sr-simulation-data-
creation.txt:756-809`), composed with the prange replacement of
`LDV PyCFD given by sir.py:517-597`.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CaseConfig
from ..ops.stencil import FaceFluxes
from ..solver.state import init_state, inlet_profile
from .spmd_step import SpmdState, _make_step


def make_case_x_mesh(n_case: int, n_x: int,
                     case_axis: str = "case", x_axis: str = "x") -> Mesh:
    """2-D mesh over the first n_case*n_x devices."""
    devs = jax.devices()
    need = n_case * n_x
    if len(devs) < need:
        raise ValueError(
            f"case-x mesh needs {n_case}x{n_x}={need} devices; backend "
            f"has {len(devs)}"
        )
    return Mesh(np.array(devs[:need]).reshape(n_case, n_x),
                (case_axis, x_axis))


def _batched_specs(xaxis: str) -> SpmdState:
    """spmd_step._specs with a leading case axis on every leaf.

    The specs name only the MANUAL `xaxis`: the case axis stays an AUTO
    (GSPMD) mesh axis - see `_make_batched_chunk` for why. (Built
    explicitly rather than tree-mapping over `_specs`: PartitionSpec is
    a tuple subclass, so tree_map would recurse into the specs.)"""
    row = P(None, xaxis, None)
    rep = P()
    return SpmdState(
        u=row, v=row, p=row, u_old=row, v_old=row, p_old=row,
        ff=FaceFluxes(e=row, n=row, w=row, s=row),
        rms=rep, count=rep, converged=rep, diverged=rep,
        held=rep, plat_best=rep, plat_acc=rep, plat_n=rep, plat_stale=rep,
        cau_u=row, cau_v=row, cau_count=rep,
    )


def _batched_local(case: CaseConfig, n: int, mesh: Mesh,
                   caxis: str, xaxis: str) -> SpmdState:
    """n copies of the initial per-rank state, case axis sharded."""
    s0 = init_state(case)
    row = NamedSharding(mesh, P(caxis, xaxis, None))
    rep = NamedSharding(mesh, P(caxis))

    def b(x, shard):
        return jax.device_put(jnp.broadcast_to(x, (n,) + x.shape), shard)

    return SpmdState(
        u=b(s0.u[1:-1], row), v=b(s0.v[1:-1], row), p=b(s0.p[1:-1], row),
        u_old=b(s0.u_old, row), v_old=b(s0.v_old, row),
        p_old=b(s0.p_old, row),
        ff=FaceFluxes(*(b(f, row) for f in s0.ff)),
        rms=b(s0.rms, rep), count=b(s0.count, rep),
        converged=b(s0.converged, rep), diverged=b(s0.diverged, rep),
        held=b(s0.held, rep), plat_best=b(s0.plat_best, rep),
        plat_acc=b(s0.plat_acc, rep), plat_n=b(s0.plat_n, rep),
        plat_stale=b(s0.plat_stale, rep),
        cau_u=b(s0.cau_u_ref[1:-1], row), cau_v=b(s0.cau_v_ref[1:-1], row),
        cau_count=b(s0.cau_count, rep),
    )


def _make_batched_chunk(case: CaseConfig, profile, mesh: Mesh,
                        xaxis: str, n_steps: int):
    step = _make_step(case, profile, mesh, xaxis)
    st = case.settings

    def chunk(states: SpmdState, nus) -> SpmdState:
        vstep = jax.vmap(step, in_axes=(0, 0))

        def active(s):
            return jnp.logical_and(
                jnp.logical_and(~s.converged, ~s.diverged),
                s.count < st.max_iterations,
            )

        def body(carry):
            s, i = carry
            new = vstep(s, nus)
            a = active(s)

            def sel(old, new_):
                m = a.reshape(a.shape + (1,) * (new_.ndim - 1))
                return jnp.where(m, new_, old)

            return jax.tree.map(sel, s, new), i + 1

        def cond(carry):
            s, i = carry
            # any case active, GLOBALLY: the case axis is an AUTO axis,
            # so this any() over the case-sharded flags becomes a GSPMD
            # all-reduce and every device runs the same trip count
            return jnp.logical_and(i < n_steps, jnp.any(active(s)))

        out, _ = jax.lax.while_loop(
            cond, body, (states, jnp.asarray(0, jnp.int32))
        )
        return out

    # manual ONLY over the solve axis; the case axis stays AUTO (GSPMD).
    # With 'case' manual, distinct case rows would run data-dependent
    # while trip counts (each row's cases converge at different inner/
    # outer counts) - legal SPMD on paper (collectives stay within a
    # row), but XLA:CPU's collective runtime ABORTS on divergent trip
    # counts across the launch (measured on the 8-device virtual mesh,
    # where all multi-chip testing happens). As an auto axis, every
    # batched loop condition reduces over the full case batch (GSPMD
    # inserts the all-reduce), all devices stay in lockstep, and vmap's
    # while_loop batching rule select-freezes each finished case - so
    # per-case trajectories still match their solo runs exactly.
    specs = _batched_specs(xaxis)
    # check_vma stays on: this path refuses use_pallas (the only reason
    # the single-case chunk ever turns it off)
    return jax.jit(jax.shard_map(
        chunk, mesh=mesh, axis_names=frozenset({xaxis}),
        in_specs=(specs, P()), out_specs=specs,
    ))


def batched_spmd_cavity_solve(
    reynolds: Sequence[float],
    nx: int,
    ny: int,
    mesh: Mesh,
    *,
    dt: float = 1e-3,
    scheme: str = "QUICK",
    double_lid: bool = True,
    max_iterations: int = 100000,
    chunk_size: int = 1000,
    verbose: bool = True,
    case_axis: str = "case",
    x_axis: str = "x",
    **settings_kw,
) -> Tuple[Dict[float, Dict[str, np.ndarray]], np.ndarray]:
    """All Reynolds numbers of one cavity mesh size, cases sharded over
    `case_axis` and each case's grid decomposed over `x_axis`.

    Same return contract as `workflow.sweep.batched_cavity_solve`:
    ({Re: {u, v, p} interior (ny, nx) fields}, iterations[n]), diverged
    cases dropped with a printed notice.
    """
    from ..solver.cases import make_cavity_solver

    res = np.asarray(list(reynolds), dtype=np.float64)
    n = len(res)
    n_case, n_x = mesh.shape[case_axis], mesh.shape[x_axis]
    if n % n_case != 0:
        raise ValueError(
            f"{n} cases do not shard over {n_case} '{case_axis}' devices"
        )
    if settings_kw.get("rre_every", 0) > 0:
        raise ValueError(
            "rre_every is not supported on the case-batched decomposed "
            "path (the snapshot buffer is per-case chunk state); use "
            "SpmdSolver for a single extrapolated decomposed solve"
        )
    if (settings_kw.get("pressure_solver", "sweeps") not in
            ("sweeps", "multigrid")
            or settings_kw.get("use_pallas")
            or settings_kw.get("fused_step")):
        raise ValueError(
            "the case-batched decomposed path runs the jnp sweeps or "
            "sharded-multigrid pressure solves (vmap carries their "
            "collectives; the Pallas kernels are single-case) - for "
            "Pallas inner solves decompose one case at a time with "
            "SpmdSolver"
        )
    settings_kw.setdefault("chunk_size", chunk_size)
    solver = make_cavity_solver(
        Re=float(res[0]), nx=nx, ny=ny, dt=dt, scheme=scheme,
        double_lid=double_lid, max_iterations=max_iterations, **settings_kw,
    )
    case = solver.case
    if nx % n_x != 0:
        raise ValueError(
            f"nx = {nx} must divide over {n_x} '{x_axis}' devices"
        )
    profile = inlet_profile(case)
    states = _batched_local(case, n, mesh, case_axis, x_axis)
    nus = jax.device_put(
        jnp.asarray(1.0 / res, states.u.dtype),
        NamedSharding(mesh, P(case_axis)),
    )
    chunk_fn = _make_batched_chunk(
        case, profile, mesh, x_axis, case.settings.chunk_size,
    )

    while True:
        states = chunk_fn(states, nus)
        counts = np.asarray(states.count)
        act = (~(np.asarray(states.converged) | np.asarray(states.diverged))
               & (counts < max_iterations))
        if verbose:
            print(f"  spmd-sweep {nx}x{ny} ({n_case}x{n_x} mesh): iters "
                  f"{counts.min()}..{counts.max()}, {act.sum()}/{n} active")
        if not act.any():
            break

    u, v, p = (np.asarray(x) for x in (states.u, states.v, states.p))
    diverged = np.asarray(states.diverged)
    fields = {
        float(re_val): {
            # bands hold all interior rows; strip y ghosts, transpose to
            # the (ny, nx) HDF5/SR contract
            "u": u[i, :, 1:-1].T.copy(),
            "v": v[i, :, 1:-1].T.copy(),
            "p": p[i, :, 1:-1].T.copy(),
        }
        for i, re_val in enumerate(res)
        if not diverged[i]
    }
    if len(fields) < len(res):
        dropped = [float(r) for i, r in enumerate(res) if diverged[i]]
        print(f"  spmd-sweep {nx}x{ny}: DROPPED diverged cases Re={dropped}")
    return fields, np.asarray(states.count)
