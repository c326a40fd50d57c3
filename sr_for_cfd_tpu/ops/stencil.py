"""Finite-volume stencil kernels (L1), pure-jnp form.

TPU-native, vectorized re-design of the reference's per-cell Numba kernels
(`LDV PyCFD given by sir.py:379-597`). Every kernel here is a pure function
over whole arrays: the per-cell `if` ladders of the reference become
`jnp.where` over shifted views, which XLA fuses into a handful of VPU passes.

Array conventions (identical to the reference so converged fields compare
directly):
  * padded field `A` has shape (nx+2, ny+2); axis 0 is x (i), axis 1 is y (j)
  * the ghost ring is i, j in {0, n+1}; the interior is [1, n]
  * face fluxes are interior-shaped (nx, ny) arrays (fe, fn, fw, fs) - the
    reference stores them in a padded (4, nx+2, ny+2) buffer but only ever
    reads/writes the interior (`LDV PyCFD given by sir.py:417-423,508-515`).

QUICK far-neighbor note: the reference's `quick_scheme` reads i+-2 neighbors,
which at the first/last interior cell overruns the single ghost ring
(undefined behavior under Numba; SURVEY.md section 7 "hard parts"). We clamp
the far neighbor to the ghost cell instead (edge padding); boundary-adjacent
QUICK fluxes therefore differ from the reference's UB by O(0.125 * ghost
delta), which vanishes in converged interior comparisons.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class Shifted(NamedTuple):
    """Interior-shaped shifted views of a padded (nx+2, ny+2) field."""

    c: jnp.ndarray
    e: jnp.ndarray
    w: jnp.ndarray
    n: jnp.ndarray
    s: jnp.ndarray
    ee: jnp.ndarray
    ww: jnp.ndarray
    nn: jnp.ndarray
    ss: jnp.ndarray


def shifts1(a: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """(center, east, west, north, south) interior views; no copies."""
    return (
        a[1:-1, 1:-1],
        a[2:, 1:-1],
        a[:-2, 1:-1],
        a[1:-1, 2:],
        a[1:-1, :-2],
    )


def shifts2(a: jnp.ndarray) -> Shifted:
    """All +-1 and +-2 shifted interior views, with the +-2 neighbors clamped
    to the ghost ring at the domain ends (edge padding)."""
    a2 = jnp.pad(a, 1, mode="edge")  # (nx+4, ny+4)
    return Shifted(
        c=a2[2:-2, 2:-2],
        e=a2[3:-1, 2:-2],
        w=a2[1:-3, 2:-2],
        n=a2[2:-2, 3:-1],
        s=a2[2:-2, 1:-3],
        ee=a2[4:, 2:-2],
        ww=a2[:-4, 2:-2],
        nn=a2[2:-2, 4:],
        ss=a2[2:-2, :-4],
    )


class FaceFluxes(NamedTuple):
    """Signed mass fluxes through the four faces of every interior cell.
    West/south carry a negative sign exactly as in the reference
    (`LDV PyCFD given by sir.py:416-423`)."""

    e: jnp.ndarray
    n: jnp.ndarray
    w: jnp.ndarray
    s: jnp.ndarray

    def divergence_sum(self) -> jnp.ndarray:
        return self.e + self.n + self.w + self.s


def face_fluxes(u: jnp.ndarray, v: jnp.ndarray, dx: float, dy: float) -> FaceFluxes:
    """Linear face interpolation of cell velocities x face length
    (reference `linear_interpolation`, `LDV PyCFD given by sir.py:416-423`)."""
    uc, ue, uw, _, _ = shifts1(u)
    vc, _, _, vn, vs = shifts1(v)
    return FaceFluxes(
        e=(uc + ue) * (0.5 * dy),
        n=(vc + vn) * (0.5 * dx),
        w=-(uc + uw) * (0.5 * dy),
        s=-(vc + vs) * (0.5 * dx),
    )


def upwind_convection(
    phi: jnp.ndarray, ff: FaceFluxes, volp: float, shifts=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First-order upwind convective flux Fc and diagonal ap_c
    (reference `simple_upwind`, `LDV PyCFD given by sir.py:425-457`).

    Face value = donor cell by flux sign; only outflow faces (F >= 0)
    contribute to the diagonal. `shifts` optionally supplies pre-built
    (c, e, w, n, s) views (the explicit-SPMD path assembles these from
    halo-exchanged local blocks, parallel/spmd_step.py).
    """
    c, e, w, n, s = shifts1(phi) if shifts is None else shifts
    pos_e = ff.e >= 0
    pos_w = ff.w >= 0
    pos_n = ff.n >= 0
    pos_s = ff.s >= 0
    ue = jnp.where(pos_e, c, e)
    uw = jnp.where(pos_w, c, w)
    un = jnp.where(pos_n, c, n)
    us = jnp.where(pos_s, c, s)
    fc = ue * ff.e + uw * ff.w + un * ff.n + us * ff.s
    sum_flux = (
        jnp.where(pos_e, ff.e, 0.0)
        + jnp.where(pos_w, ff.w, 0.0)
        + jnp.where(pos_n, ff.n, 0.0)
        + jnp.where(pos_s, ff.s, 0.0)
    )
    return fc, sum_flux * volp


def quick_convection(
    phi: jnp.ndarray, ff: FaceFluxes, volp: float,
    shifts: "Shifted" = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """QUICK quadratic upwind-biased convective flux Fc and diagonal ap_c
    (reference `quick_scheme`, `LDV PyCFD given by sir.py:459-499`;
    weights 0.75 / 0.375 / -0.125, diagonal weights 0.75 upwind / 0.375
    downwind). Far neighbors are edge-clamped (see module docstring).
    `shifts` optionally supplies a pre-built `Shifted` (the explicit-SPMD
    path builds one from halo-exchanged local blocks)."""
    v = shifts2(phi) if shifts is None else shifts
    pos_e = ff.e >= 0
    pos_w = ff.w >= 0
    pos_n = ff.n >= 0
    pos_s = ff.s >= 0
    ue = jnp.where(
        pos_e,
        0.75 * v.c + 0.375 * v.e - 0.125 * v.w,
        0.75 * v.e + 0.375 * v.c - 0.125 * v.ee,
    )
    uw = jnp.where(
        pos_w,
        0.75 * v.c + 0.375 * v.w - 0.125 * v.e,
        0.75 * v.w + 0.375 * v.c - 0.125 * v.ww,
    )
    un = jnp.where(
        pos_n,
        0.75 * v.c + 0.375 * v.n - 0.125 * v.s,
        0.75 * v.n + 0.375 * v.c - 0.125 * v.nn,
    )
    us = jnp.where(
        pos_s,
        0.75 * v.c + 0.375 * v.s - 0.125 * v.n,
        0.75 * v.s + 0.375 * v.c - 0.125 * v.ss,
    )
    fc = ue * ff.e + uw * ff.w + un * ff.n + us * ff.s
    sum_flux = (
        jnp.where(pos_e, 0.75, 0.375) * ff.e
        + jnp.where(pos_w, 0.75, 0.375) * ff.w
        + jnp.where(pos_n, 0.75, 0.375) * ff.n
        + jnp.where(pos_s, 0.75, 0.375) * ff.s
    )
    return fc, sum_flux * volp


def diffusion(
    phi: jnp.ndarray, dx: float, dy: float, volp: float, shifts=None
) -> Tuple[jnp.ndarray, float]:
    """5-point Laplacian flux Fd and (scalar) diagonal ap_d
    (reference `diffusive_flux`, `LDV PyCFD given by sir.py:501-506`)."""
    c, e, w, n, s = shifts1(phi) if shifts is None else shifts
    fd = volp * ((e - 2.0 * c + w) / (dx * dx) + (n - 2.0 * c + s) / (dy * dy))
    ap_d = -volp * (2.0 / (dx * dx) + 2.0 / (dy * dy))
    return fd, ap_d


def rhie_chow_update(
    ff: FaceFluxes, p: jnp.ndarray, dt: float, rho: float, dx: float, dy: float
) -> FaceFluxes:
    """Post-pressure face-flux correction Ff += -dt/rho * dp/dn * face/delta
    (reference `update_flux`, `LDV PyCFD given by sir.py:508-515`)."""
    pc, pe, pw, pn, ps = shifts1(p)
    c = dt / rho
    return FaceFluxes(
        e=ff.e - c * (pe - pc) * dy / dx,
        n=ff.n - c * (pn - pc) * dx / dy,
        w=ff.w - c * (pw - pc) * dy / dx,
        s=ff.s - c * (ps - pc) * dx / dy,
    )


def project_velocity(
    u: jnp.ndarray, v: jnp.ndarray, p: jnp.ndarray, dt: float, rho: float,
    dx: float, dy: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Velocity projection u -= dt/rho * dp/dx (central), v likewise
    (reference `correct_velocity`, `bfs code given by sir.py:690-709`).
    Interior-only update; ghosts untouched."""
    pc, pe, pw, pn, ps = shifts1(p)
    du = -(dt / rho) * (pe - pw) / (2.0 * dx)
    dv = -(dt / rho) * (pn - ps) / (2.0 * dy)
    u = u.at[1:-1, 1:-1].add(du)
    v = v.at[1:-1, 1:-1].add(dv)
    return u, v


def residual_sumsq(new: jnp.ndarray, old_interior: jnp.ndarray) -> jnp.ndarray:
    """Race-free residual reduction: sum over the interior of (new - old)^2,
    replacing the reference's prange scalar reduction
    (`bfs code given by sir.py:690-709`) with an XLA tree-reduce."""
    d = new[1:-1, 1:-1] - old_interior
    return jnp.sum(d * d)


def under_relax(
    phi: jnp.ndarray, old_interior: jnp.ndarray, alpha
) -> jnp.ndarray:
    """Interior under-relaxation Var = Old + alpha (Var - Old)
    (reference `under_relax_field`, `bfs code given by sir.py:616-620`).
    alpha may be a python float or a traced scalar; alpha == 1.0 is identity.
    """
    if isinstance(alpha, float) and alpha == 1.0:
        return phi
    c = phi[1:-1, 1:-1]
    return phi.at[1:-1, 1:-1].set(old_interior + alpha * (c - old_interior))
