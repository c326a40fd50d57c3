"""Ghost-cell boundary-condition fills.

Vectorized re-design of the reference's `apply_bc_configured`
(`LDV PyCFD given by sir.py:386-414`) and `_apply_bfs_inlet`
(`bfs code given by sir.py:146-184`). BC *types* are static config, so the
per-side Dirichlet/Neumann branch is resolved at trace time - the compiled
program contains only the four ghost-line writes it needs.

Semantics (identical to the reference):
  * Dirichlet: ghost = 2 * value - interior   (value held at the face)
  * Neumann (zero-gradient): ghost = interior
  * Only the non-corner ghost entries are written (j in [1, ny] for
    left/right, i in [1, nx] for top/bottom); corners stay at their initial
    zeros, as in the reference.

Implementation note: the fills are expressed as `jnp.roll` + `jnp.where`
with iota row/column masks rather than `.at[row].set(...)` scatters. The
elementwise form partitions correctly under SPMD domain decomposition
(roll becomes a neighbor collective-permute); single-row scatters were
observed to be applied at every shard's local row 0 by the partitioner
(JAX 0.9 / XLA CPU, 8-way mesh), silently corrupting interior rows.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DIRICHLET, BFSGeometry, MeshParameters, VariableBCs


def _row_col_masks(shape):
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    interior_j = jnp.logical_and(jj >= 1, jj <= shape[1] - 2)
    interior_i = jnp.logical_and(ii >= 1, ii <= shape[0] - 2)
    return ii, jj, interior_i, interior_j


def apply_bc(a: jnp.ndarray, bc: VariableBCs) -> jnp.ndarray:
    """Fill the ghost ring of a padded (nx+2, ny+2) field per `bc`."""
    shape = a.shape
    ii, jj, interior_i, interior_j = _row_col_masks(shape)

    # neighbor views via roll: up[i] = a[i+1], down[i] = a[i-1], etc.
    up = jnp.roll(a, -1, axis=0)
    down = jnp.roll(a, 1, axis=0)

    left_val = (2.0 * bc.left.value - up) if bc.left.type == DIRICHLET else up
    a = jnp.where(jnp.logical_and(ii == 0, interior_j), left_val, a)
    right_val = (2.0 * bc.right.value - down) if bc.right.type == DIRICHLET else down
    a = jnp.where(jnp.logical_and(ii == shape[0] - 1, interior_j), right_val, a)

    fwd = jnp.roll(a, -1, axis=1)  # fwd[j] = a[j+1]
    back = jnp.roll(a, 1, axis=1)  # back[j] = a[j-1]
    top_val = (2.0 * bc.top.value - back) if bc.top.type == DIRICHLET else back
    a = jnp.where(jnp.logical_and(jj == shape[1] - 1, interior_i), top_val, a)
    bottom_val = (2.0 * bc.bottom.value - fwd) if bc.bottom.type == DIRICHLET else fwd
    a = jnp.where(jnp.logical_and(jj == 0, interior_i), bottom_val, a)
    return a


class BFSInletProfile(NamedTuple):
    """Precomputed left-boundary inlet data for the BFS case.

    `below` marks cell centers y < step_height (no-slip wall section);
    `u_in` holds the parabolic profile 6 Ub (y'/h)(1 - y'/h) with
    y' = clip(y - step_height, 0, h) (`bfs code given by sir.py:162-182`).
    Both have shape (ny+2,), indexed by the padded j (ghost entries unused).
    """

    below: jnp.ndarray
    u_in: jnp.ndarray


def bfs_inlet_profile(
    mesh: MeshParameters, geom: BFSGeometry, dtype=jnp.float32
) -> BFSInletProfile:
    # padded-j indexing: entry j corresponds to cell center (j - 0.5) dy
    yc = (np.arange(0, mesh.ny + 2) - 0.5) * mesh.dy
    below = yc < geom.step_height
    yprime = np.clip(yc - geom.step_height, 0.0, geom.h)
    u_in = 6.0 * geom.Ub * (yprime / geom.h) * (1.0 - yprime / geom.h)
    return BFSInletProfile(
        below=jnp.asarray(below), u_in=jnp.asarray(u_in, dtype=dtype)
    )


def apply_bfs_inlet(
    a: jnp.ndarray, k: int, profile: Optional[BFSInletProfile]
) -> jnp.ndarray:
    """Override the left ghost column with the BFS wall/inlet mixture.

    k = 0 (u): ghost = -interior below the step, 2 u_in - interior above.
    k = 1 (v): ghost = -interior everywhere (v = 0 across the whole inlet).
    k = 2 (p): untouched.
    Mirrors `_apply_bfs_inlet` (`bfs code given by sir.py:146-184`).
    """
    if profile is None or k not in (0, 1):
        return a
    shape = a.shape
    ii, jj, _, interior_j = _row_col_masks(shape)
    up = jnp.roll(a, -1, axis=0)  # up[0, j] = a[1, j] (the interior cell)
    if k == 1:
        ghost = -up
    else:
        ghost = jnp.where(
            profile.below[None, :], -up, 2.0 * profile.u_in[None, :] - up
        )
    return jnp.where(jnp.logical_and(ii == 0, interior_j), ghost, a)
