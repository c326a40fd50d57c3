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
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..config import DIRICHLET, BFSGeometry, MeshParameters, VariableBCs


def apply_bc(a: jnp.ndarray, bc: VariableBCs) -> jnp.ndarray:
    """Fill the ghost ring of a padded (nx+2, ny+2) field per `bc`."""
    # left (i = 0) / right (i = nx+1)
    if bc.left.type == DIRICHLET:
        a = a.at[0, 1:-1].set(2.0 * bc.left.value - a[1, 1:-1])
    else:
        a = a.at[0, 1:-1].set(a[1, 1:-1])
    if bc.right.type == DIRICHLET:
        a = a.at[-1, 1:-1].set(2.0 * bc.right.value - a[-2, 1:-1])
    else:
        a = a.at[-1, 1:-1].set(a[-2, 1:-1])
    # top (j = ny+1) / bottom (j = 0)
    if bc.top.type == DIRICHLET:
        a = a.at[1:-1, -1].set(2.0 * bc.top.value - a[1:-1, -2])
    else:
        a = a.at[1:-1, -1].set(a[1:-1, -2])
    if bc.bottom.type == DIRICHLET:
        a = a.at[1:-1, 0].set(2.0 * bc.bottom.value - a[1:-1, 1])
    else:
        a = a.at[1:-1, 0].set(a[1:-1, 1])
    return a


class BFSInletProfile(NamedTuple):
    """Precomputed left-boundary inlet data for the BFS case.

    `below` marks cell centers y < step_height (no-slip wall section);
    `u_in` holds the parabolic profile 6 Ub (y'/h)(1 - y'/h) with
    y' = clip(y - step_height, 0, h) (`bfs code given by sir.py:162-182`).
    Both have shape (ny,), indexed by the interior j.
    """

    below: jnp.ndarray
    u_in: jnp.ndarray


def bfs_inlet_profile(
    mesh: MeshParameters, geom: BFSGeometry, dtype=jnp.float32
) -> BFSInletProfile:
    yc = (np.arange(1, mesh.ny + 1) - 0.5) * mesh.dy
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
    interior = a[1, 1:-1]
    if k == 1:
        ghost = -interior
    else:
        ghost = jnp.where(
            profile.below, -interior, 2.0 * profile.u_in - interior
        )
    return a.at[0, 1:-1].set(ghost)
