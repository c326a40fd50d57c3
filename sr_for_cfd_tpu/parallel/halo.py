"""Explicit halo-exchange pressure solver via shard_map + collectives.

Two multi-chip modes exist in this framework (SURVEY.md sections 5.7/5.8):

  * `parallel/domain.py` - GSPMD: annotate shardings on the global-view
    program and let XLA insert the halo collective-permutes (the default;
    bit-identical to single-device by construction).
  * this module - explicit SPMD: each device owns a contiguous x-slab of
    interior rows, neighbor rows travel by `jax.lax.ppermute` over ICI
    every sweep, residual reductions are `jax.lax.psum`, and domain
    boundary ranks substitute the frozen ghost rows. This is the
    hand-written counterpart (ring-neighbor exchange, the structural cousin
    of ring attention/context parallelism for stencils) - useful where
    GSPMD's automatic partitioning is not available (e.g. around Pallas
    kernels) and as an executable specification of the communication
    pattern.

Red-black parity is computed from GLOBAL indices (rank * rows_local +
local index), so the iteration is identical to the single-device sweep and
results match `ops.sweeps.solve_pressure` to reduction-order rounding.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.stencil import FaceFluxes
from ..ops.sweeps import optimal_sor, stall_update, stalled
from .mesh import ring_perms

# (mesh, static config) -> compiled shard_map solver; built once per config
_SOLVER_CACHE: Dict[Tuple, object] = {}
_SOLVER_CACHE_MAX = 16  # keys include float params (dt/tol/sor): bound
# the cache so an adaptive-dt sweep can't leak one executable per value


def shardmap_solve_pressure(
    p: jnp.ndarray,
    ff: FaceFluxes,
    mesh: Mesh,
    *,
    dx: float,
    dy: float,
    dt: float,
    rho: float,
    volp: float,
    tol: float = 1e-6,
    max_iter: int = 1000,
    sor: float = 1.0,
    axis: str = "x",
) -> jnp.ndarray:
    """Red-black pressure solve with the interior x-rows sharded over
    `mesh` and explicit per-sweep halo exchange. Drop-in result-compatible
    with `ops.sweeps.solve_pressure(inner_scheme='redblack')`.

    Requires nx % n_devices == 0.
    """
    nx, ny = p.shape[0] - 2, p.shape[1] - 2
    n_dev = mesh.shape[axis]
    if nx % n_dev != 0:
        raise ValueError(f"nx = {nx} must divide over {n_dev} '{axis}' devices")
    rows = nx // n_dev
    inv_dx2, inv_dy2 = 1.0 / (dx * dx), 1.0 / (dy * dy)
    ap_d = -volp * (2.0 * inv_dx2 + 2.0 * inv_dy2)
    n_cells = nx * ny
    # same clamp as solve_pressure (result compatibility)
    sor = min(sor, optimal_sor(nx, ny))
    fwd, bwd = ring_perms(n_dev)

    b_int = (rho / dt) * ff.divergence_sum()          # (nx, ny)
    p_int = p[1:-1, 1:-1]                             # (nx, ny) unknowns
    ghost_w = p[0, 1:-1]                              # (ny,) frozen ghosts
    ghost_e = p[-1, 1:-1]
    ghost_s = p[1:-1, 0]                              # (nx,)
    ghost_n = p[1:-1, -1]

    def local_solve(x, b, gw, ge, gs, gn):
        # x, b: (rows, ny); gw/ge: (ny,) replicated; gs/gn: (rows,)
        rank = jax.lax.axis_index(axis)
        ii = jax.lax.broadcasted_iota(jnp.int32, (rows, ny), 0) + rank * rows
        jj = jax.lax.broadcasted_iota(jnp.int32, (rows, ny), 1)
        red = (ii + jj) % 2 == 0  # global interior parity (offsets cancel)

        def assemble(x):
            """Local padded (rows+2, ny+2): halo rows by ppermute, domain
            ghosts on boundary ranks, frozen y-ghost columns."""
            from_left = jax.lax.ppermute(x[-1, :], axis, fwd)
            from_right = jax.lax.ppermute(x[0, :], axis, bwd)
            top = jnp.where(rank == 0, gw, from_left)
            bottom = jnp.where(rank == n_dev - 1, ge, from_right)
            xp = jnp.concatenate([top[None, :], x, bottom[None, :]], axis=0)
            left_col = jnp.concatenate(
                [jnp.zeros((1,), x.dtype), gs, jnp.zeros((1,), x.dtype)]
            )
            right_col = jnp.concatenate(
                [jnp.zeros((1,), x.dtype), gn, jnp.zeros((1,), x.dtype)]
            )
            return jnp.concatenate(
                [left_col[:, None], xp, right_col[:, None]], axis=1
            )

        def residual(x):
            xp = assemble(x)
            c = xp[1:-1, 1:-1]
            fd = volp * (
                (xp[2:, 1:-1] - 2.0 * c + xp[:-2, 1:-1]) * inv_dx2
                + (xp[1:-1, 2:] - 2.0 * c + xp[1:-1, :-2]) * inv_dy2
            )
            return b - fd

        def sweep(x):
            r1 = residual(x)
            x = x + jnp.where(red, sor * r1 / ap_d, 0.0)
            r2 = residual(x)
            x = x + jnp.where(red, 0.0, sor * r2 / ap_d)
            ss = jax.lax.psum(
                jnp.sum(jnp.where(red, r1 * r1, r2 * r2)), axis
            )
            return x, jnp.sqrt(ss / n_cells)

        def body(carry):
            x, prev, best, stale, it = carry
            x, rms = sweep(x)
            # unified stall policy (ops/sweeps.py); check_every == 1 here so
            # `it` doubles as the check count
            stale, best = stall_update(rms, prev, best, stale)
            return x, rms, best, stale, it + 1

        def cond(carry):
            _, rms, _, stale, it = carry
            return jnp.logical_and(
                jnp.logical_and(it < max_iter, rms >= tol),
                jnp.logical_not(stalled(stale, it)),
            )

        big = jnp.asarray(jnp.inf, x.dtype)
        zero = jnp.asarray(0, jnp.int32)
        x, _, _, _, _ = jax.lax.while_loop(
            cond, body, (x, big, big, zero, zero),
        )
        return x

    cache_key = (
        mesh, axis, nx, ny, str(p.dtype), dx, dy, dt, rho, volp, tol,
        max_iter, sor,
    )
    if cache_key in _SOLVER_CACHE:
        # LRU, not FIFO: refresh recency on hit (same policy as
        # spmd_step._CHUNK_CACHE) so a workload cycling >16 keys evicts
        # the coldest compiled executable, not potentially the hottest
        _SOLVER_CACHE[cache_key] = _SOLVER_CACHE.pop(cache_key)
    else:
        while len(_SOLVER_CACHE) >= _SOLVER_CACHE_MAX:
            _SOLVER_CACHE.pop(next(iter(_SOLVER_CACHE)))
        _SOLVER_CACHE[cache_key] = jax.jit(
            jax.shard_map(
                local_solve,
                mesh=mesh,
                in_specs=(P(axis, None), P(axis, None), P(), P(),
                          P(axis), P(axis)),
                out_specs=P(axis, None),
            )
        )
    x = _SOLVER_CACHE[cache_key](p_int, b_int, ghost_w, ghost_e, ghost_s,
                                 ghost_n)
    return p.at[1:-1, 1:-1].set(x)
