"""Reduced-rank extrapolation (RRE) steady-state accelerator.

The reference reaches steady state by pseudo-time marching alone - its
10x10 coarse solves burn their full 100,000-iteration budget without
converging (`BASELINE.md`; `sr-simulation-data-creation.ipynb` cell 2
output) because the outer SIMPLE iteration is a fixed-point map whose
slowest error mode decays like (1 - c*dt) per step. This module adds the
classic Eddy/Mesina reduced-rank extrapolation on top of ANY step scheme:
collect K+1 state snapshots W iterations apart, find the affine
combination whose successive differences cancel (min ||D c||, sum c = 1),
and jump there. With the error spanned by a few geometric/oscillatory
modes - exactly the structure pseudo-time marching produces - each cycle
removes the modes the window resolves. Measured on the 10x10 double-lid
cavity at Re=1000 (f64): 83,493 iterations to the 1e-9 criteria plain,
~40,000 with W=1000/K=6 cycles, identical fixed point (the jump target is
a combination of solver iterates, and the solver keeps iterating on it -
a bad jump is self-correcting, never silently accepted as the answer).

Scalar Aitken (the K=1 special case) fails on this flow: the dominant
error mode is an oscillatory complex pair (measured drift autocorrelation
rho ~ 0.3 while the error envelope decays at 0.68 per window), which a
one-mode real extrapolation cannot cancel; K >= 4 handles it.

TPU-native design: everything runs INSIDE the jitted solve loop - the
snapshot ring buffer lives in the while_loop carry, the K x K Gram system
is solved on device, and the jump is injected with `lax.cond`, so a whole
accelerated solve is still ONE dispatch (host round trips through the
remote relay cost 30ms-3s each, dwarfing any tiny-grid iteration).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CaseConfig
from .bc import BFSInletProfile, apply_bc, apply_bfs_inlet
from .stencil import FaceFluxes


class RREBuffer(NamedTuple):
    """Snapshot ring buffer carried through the solve while_loop."""

    snaps: jnp.ndarray  # (K+1, n_flat)
    count: jnp.ndarray  # scalar int32: snapshots collected so far


def flat_size(nx: int, ny: int) -> int:
    """Length of the flattened extrapolation vector: the three padded
    fields plus the four interior face-flux arrays. Face fluxes are part
    of the fixed point (they carry the converged Rhie-Chow correction);
    extrapolating them avoids the re-seeding transient a plain field
    warm start pays (`solver/state.py:warm_start_state`)."""
    return 3 * (nx + 2) * (ny + 2) + 4 * nx * ny


def flatten_state(u, v, p, ff: FaceFluxes) -> jnp.ndarray:
    return jnp.concatenate([
        u.ravel(), v.ravel(), p.ravel(),
        ff.e.ravel(), ff.n.ravel(), ff.w.ravel(), ff.s.ravel(),
    ])


def unflatten_state(
    x: jnp.ndarray, nx: int, ny: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, FaceFluxes]:
    pad = (nx + 2) * (ny + 2)
    core = nx * ny
    fields = []
    off = 0
    for _ in range(3):
        fields.append(x[off:off + pad].reshape(nx + 2, ny + 2))
        off += pad
    ffs = []
    for _ in range(4):
        ffs.append(x[off:off + core].reshape(nx, ny))
        off += core
    return fields[0], fields[1], fields[2], FaceFluxes(*ffs)


def empty_buffer(depth: int, n_flat: int, dtype) -> RREBuffer:
    return RREBuffer(
        snaps=jnp.zeros((depth + 1, n_flat), dtype=dtype),
        count=jnp.asarray(0, jnp.int32),
    )


def push_snapshot(buf: RREBuffer, flat: jnp.ndarray) -> RREBuffer:
    snaps = jax.lax.dynamic_update_slice(
        buf.snaps, flat[None, :], (buf.count, jnp.asarray(0, jnp.int32))
    )
    return RREBuffer(snaps=snaps, count=buf.count + 1)


def gram_coeffs(G: jnp.ndarray) -> jnp.ndarray:
    """Affine-combination coefficients from a (K, K) difference Gram
    matrix: solve (G + ridge I) gamma = 1, c = gamma / sum gamma.

    Shared by the single-device path (`rre_extrapolate`, whole-vector
    Gram) and the decomposed path (`parallel/spmd_step.py`, psum of
    per-rank partial Grams) so both apply the identical ridge policy.
    The dtype-aware ridge is ~sqrt(eps) relative - large enough to
    dominate the inner-product rounding noise of the Gram entries, small
    enough not to bias the mode cancellation (kappa(G) = kappa(D)^2
    amplifies the ridge into recovery error)."""
    K = G.shape[0]
    rel = 1e-6 if G.dtype == jnp.float32 else 1e-12
    ridge = jnp.asarray(rel, G.dtype) * jnp.trace(G) / K
    G = G + ridge * jnp.eye(K, dtype=G.dtype)
    gamma = jnp.linalg.solve(G, jnp.ones((K,), G.dtype))
    return gamma / jnp.sum(gamma)


def rre_extrapolate(
    snaps: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Given snapshots x_0..x_K (rows), return (x_star, ok).

    Solves min ||D c||_2 s.t. sum(c) = 1 over the difference matrix
    D = [x_1-x_0, ..., x_K-x_{K-1}] via the normal equations
    (G gamma = 1, c = gamma / sum gamma), then x_star = sum c_i x_{i+1}.
    The Gram matrix is computed on globally-scaled differences (scale
    invariance of the constrained problem) with a small ridge
    (`gram_coeffs`); `ok` is False when the result is non-finite or the
    jump is implausibly large relative to the last window drift
    (singular G at the noise floor) - callers skip the injection and
    simply keep iterating.
    """
    D = snaps[1:] - snaps[:-1]  # (K, n)
    drift = jnp.max(jnp.abs(D[-1]))
    scale = jnp.maximum(drift, jnp.finfo(snaps.dtype).tiny)
    Dn = D / scale
    c = gram_coeffs(Dn @ Dn.T)
    x_star = c @ snaps[1:]
    jump = jnp.max(jnp.abs(x_star - snaps[-1]))
    ok = jnp.all(jnp.isfinite(x_star)) & (jump <= 1e3 * drift) & (drift > 0)
    return x_star, ok


def inject_state(
    x_star: jnp.ndarray,
    case: CaseConfig,
    profile: Optional[BFSInletProfile],
):
    """Rebuild solver fields from an extrapolated flat vector: reapply the
    exact boundary conditions to the ghost ring (extrapolation is affine,
    Dirichlet ghosts survive it exactly, but reapplying costs nothing and
    keeps Neumann ghosts consistent) and return (u, v, p, ff)."""
    nx, ny = case.mesh.nx, case.mesh.ny
    u, v, p, ff = unflatten_state(x_star, nx, ny)
    u = apply_bfs_inlet(apply_bc(u, case.u_bc), 0, profile)
    v = apply_bfs_inlet(apply_bc(v, case.v_bc), 1, profile)
    p = apply_bc(p, case.p_bc)
    return u, v, p, ff
