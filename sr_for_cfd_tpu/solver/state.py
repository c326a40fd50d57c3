"""Immutable solver state pytree.

Replaces the reference's mutable `Var/VarOld/Ff/residual` buffers
(`LDV PyCFD given by sir.py:84-89`) with a functional `SolverState` threaded
through `lax.while_loop`. `u, v, p` are padded (nx+2, ny+2) fields; the
`*_old` copies are interior-only (nx, ny) because the reference only ever
reads VarOld at interior cells; face fluxes are interior-shaped.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..config import CaseConfig
from ..ops.bc import BFSInletProfile, apply_bc, apply_bfs_inlet, bfs_inlet_profile
from ..ops.stencil import FaceFluxes, face_fluxes


class SolverState(NamedTuple):
    u: jnp.ndarray  # (nx+2, ny+2)
    v: jnp.ndarray
    p: jnp.ndarray
    u_old: jnp.ndarray  # (nx, ny) interior
    v_old: jnp.ndarray
    p_old: jnp.ndarray
    ff: FaceFluxes  # interior (nx, ny) x 4
    rms: jnp.ndarray  # (3,) last convergence-check RMS values
    count: jnp.ndarray  # scalar int32, outer iterations completed
    converged: jnp.ndarray  # scalar bool
    diverged: jnp.ndarray  # scalar bool (NaN/Inf guard)
    # ---- convergence-detector carries ----------------------------------
    # These live IN the state (not the chunk loop's local carry) so that
    # plateau / Cauchy / sustained-hold detection works across chunk
    # boundaries for ANY chunk size. With chunk-local carries a fine run
    # driven in chunks smaller than a detector window could NEVER fire
    # its detector (measured: the r2.0 demo recordings padded both fine
    # phases with 20-70k junk iterations exactly this way).
    held: jnp.ndarray  # int32: consecutive iterations criteria held
    plat_best: jnp.ndarray  # (3,) best plateau-window mean rms seen
    plat_acc: jnp.ndarray  # (3,) current-window rms accumulator
    plat_n: jnp.ndarray  # int32: iterations in the current window
    plat_stale: jnp.ndarray  # int32: consecutive non-improving windows
    cau_u_ref: jnp.ndarray  # (nx+2, ny+2) field at last Cauchy snapshot
    cau_v_ref: jnp.ndarray
    cau_count: jnp.ndarray  # int32: iteration of that snapshot

    # ---- reference-compatible views -----------------------------------
    def var(self) -> np.ndarray:
        """Materialize the reference's Var[3, nx+2, ny+2] layout."""
        return np.stack([np.asarray(self.u), np.asarray(self.v), np.asarray(self.p)])

    def interior_fields(self) -> Dict[str, np.ndarray]:
        """{u, v, p} interior transposed to (ny, nx) - the exact array the
        reference's workflow extracts (`PyCFD_ML_accelerated.py:756-758`)."""
        return {
            "u": np.asarray(self.u)[1:-1, 1:-1].T.copy(),
            "v": np.asarray(self.v)[1:-1, 1:-1].T.copy(),
            "p": np.asarray(self.p)[1:-1, 1:-1].T.copy(),
        }


def _dtype(case: CaseConfig):
    return jnp.dtype(case.settings.dtype)


def inlet_profile(case: CaseConfig) -> Optional[BFSInletProfile]:
    if case.bfs is None:
        return None
    return bfs_inlet_profile(case.mesh, case.bfs, dtype=_dtype(case))


def _finalize(u, v, p, case: CaseConfig, profile) -> SolverState:
    """Apply BCs, seed old copies and face fluxes - the reference's
    `_initialize_fields` tail (`LDV PyCFD given by sir.py:120-132`)."""
    u = apply_bfs_inlet(apply_bc(u, case.u_bc), 0, profile)
    v = apply_bfs_inlet(apply_bc(v, case.v_bc), 1, profile)
    p = apply_bc(p, case.p_bc)
    ff = face_fluxes(u, v, case.mesh.dx, case.mesh.dy)
    dt = _dtype(case)
    return SolverState(
        u=u,
        v=v,
        p=p,
        u_old=u[1:-1, 1:-1],
        v_old=v[1:-1, 1:-1],
        p_old=p[1:-1, 1:-1],
        ff=ff,
        rms=jnp.full((3,), jnp.inf, dtype=dt),
        count=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(False),
        diverged=jnp.asarray(False),
        held=jnp.asarray(0, jnp.int32),
        plat_best=jnp.full((3,), jnp.inf, dtype=dt),
        plat_acc=jnp.zeros((3,), dtype=dt),
        plat_n=jnp.asarray(0, jnp.int32),
        plat_stale=jnp.asarray(0, jnp.int32),
        cau_u_ref=u,
        cau_v_ref=v,
        cau_count=jnp.asarray(0, jnp.int32),
    )


def init_state(case: CaseConfig) -> SolverState:
    """Zero-initialized state with BCs applied."""
    shape = (case.mesh.nx + 2, case.mesh.ny + 2)
    z = jnp.zeros(shape, dtype=_dtype(case))
    return _finalize(z, z, z, case, inlet_profile(case))


def warm_start_state(case: CaseConfig, fields: Dict[str, np.ndarray]) -> SolverState:
    """State initialized from (ny, nx)-shaped interior fields - the
    first-class restore/warm-start path (reference injection,
    `PyCFD_ML_accelerated.py:936-948`). Accepts the workflow's transposed
    field dict and re-seeds ghosts, old copies and face fluxes."""
    nx, ny = case.mesh.nx, case.mesh.ny
    dt = _dtype(case)
    shape = (nx + 2, ny + 2)

    def embed(f):
        f = jnp.asarray(f, dtype=dt)
        if f.shape != (ny, nx):
            raise ValueError(f"expected ({ny}, {nx}) field, got {f.shape}")
        return jnp.zeros(shape, dtype=dt).at[1:-1, 1:-1].set(f.T)

    return _finalize(
        embed(fields["u"]), embed(fields["v"]), embed(fields["p"]),
        case, inlet_profile(case),
    )
