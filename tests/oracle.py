"""Loop-style float64 NumPy oracle of the finite-volume discretization.

Written directly from the mathematical formulas (SIMPLE projection with
QUICK/upwind convection on a collocated grid with ghost cells) so the
vectorized JAX kernels in sr_for_cfd_tpu.ops can be verified cell-by-cell
on tiny grids. Deliberately slow and explicit.

Index conventions match the framework: A[i, j], i = x in [0, nx+1],
j = y in [0, ny+1]; interior is [1, n]. Far neighbors for QUICK are
edge-clamped (the framework's documented boundary handling).
"""

import numpy as np


def clamp(i, lo, hi):
    return max(lo, min(hi, i))


def face_fluxes(u, v, dx, dy):
    nx, ny = u.shape[0] - 2, u.shape[1] - 2
    fe = np.zeros((nx, ny))
    fn = np.zeros((nx, ny))
    fw = np.zeros((nx, ny))
    fs = np.zeros((nx, ny))
    for i in range(1, nx + 1):
        for j in range(1, ny + 1):
            fe[i - 1, j - 1] = (u[i, j] + u[i + 1, j]) * dy * 0.5
            fn[i - 1, j - 1] = (v[i, j] + v[i, j + 1]) * dx * 0.5
            fw[i - 1, j - 1] = -(u[i, j] + u[i - 1, j]) * dy * 0.5
            fs[i - 1, j - 1] = -(v[i, j] + v[i, j - 1]) * dx * 0.5
    return fe, fn, fw, fs


def upwind_cell(phi, fe, fn, fw, fs, i, j, volp):
    F = {"e": fe[i - 1, j - 1], "w": fw[i - 1, j - 1],
         "n": fn[i - 1, j - 1], "s": fs[i - 1, j - 1]}
    nbr = {"e": phi[i + 1, j], "w": phi[i - 1, j],
           "n": phi[i, j + 1], "s": phi[i, j - 1]}
    fc = 0.0
    sum_flux = 0.0
    for face in "ewns":
        if F[face] >= 0:
            val = phi[i, j]
            sum_flux += F[face]
        else:
            val = nbr[face]
        fc += val * F[face]
    return fc, sum_flux * volp


def quick_cell(phi, fe, fn, fw, fs, i, j, volp):
    nx, ny = phi.shape[0] - 2, phi.shape[1] - 2

    def px(ii, jj):  # edge-clamped access
        return phi[clamp(ii, 0, nx + 1), clamp(jj, 0, ny + 1)]

    fc = 0.0
    sum_flux = 0.0
    # east
    F = fe[i - 1, j - 1]
    if F >= 0:
        val = 0.75 * px(i, j) + 0.375 * px(i + 1, j) - 0.125 * px(i - 1, j)
        sum_flux += 0.75 * F
    else:
        val = 0.75 * px(i + 1, j) + 0.375 * px(i, j) - 0.125 * px(i + 2, j)
        sum_flux += 0.375 * F
    fc += val * F
    # west
    F = fw[i - 1, j - 1]
    if F >= 0:
        val = 0.75 * px(i, j) + 0.375 * px(i - 1, j) - 0.125 * px(i + 1, j)
        sum_flux += 0.75 * F
    else:
        val = 0.75 * px(i - 1, j) + 0.375 * px(i, j) - 0.125 * px(i - 2, j)
        sum_flux += 0.375 * F
    fc += val * F
    # north
    F = fn[i - 1, j - 1]
    if F >= 0:
        val = 0.75 * px(i, j) + 0.375 * px(i, j + 1) - 0.125 * px(i, j - 1)
        sum_flux += 0.75 * F
    else:
        val = 0.75 * px(i, j + 1) + 0.375 * px(i, j) - 0.125 * px(i, j + 2)
        sum_flux += 0.375 * F
    fc += val * F
    # south
    F = fs[i - 1, j - 1]
    if F >= 0:
        val = 0.75 * px(i, j) + 0.375 * px(i, j - 1) - 0.125 * px(i, j + 1)
        sum_flux += 0.75 * F
    else:
        val = 0.75 * px(i, j - 1) + 0.375 * px(i, j) - 0.125 * px(i, j - 2)
        sum_flux += 0.375 * F
    fc += val * F
    return fc, sum_flux * volp


def diffusion_cell(phi, i, j, dx, dy, volp):
    fd = volp * (
        (phi[i + 1, j] - 2 * phi[i, j] + phi[i - 1, j]) / dx**2
        + (phi[i, j + 1] - 2 * phi[i, j] + phi[i, j - 1]) / dy**2
    )
    ap_d = -volp * (2 / dx**2 + 2 / dy**2)
    return fd, ap_d


def apply_bc(a, types, values):
    """types/values: dicts side -> 'dirichlet'/'neumann', float."""
    a = a.copy()
    nx, ny = a.shape[0] - 2, a.shape[1] - 2
    for j in range(1, ny + 1):
        if types["left"] == "dirichlet":
            a[0, j] = 2 * values["left"] - a[1, j]
        else:
            a[0, j] = a[1, j]
        if types["right"] == "dirichlet":
            a[nx + 1, j] = 2 * values["right"] - a[nx, j]
        else:
            a[nx + 1, j] = a[nx, j]
    for i in range(1, nx + 1):
        if types["top"] == "dirichlet":
            a[i, ny + 1] = 2 * values["top"] - a[i, ny]
        else:
            a[i, ny + 1] = a[i, ny]
        if types["bottom"] == "dirichlet":
            a[i, 0] = 2 * values["bottom"] - a[i, 1]
        else:
            a[i, 0] = a[i, 1]
    return a


def rhie_chow(fe, fn, fw, fs, p, dt, rho, dx, dy):
    nx, ny = p.shape[0] - 2, p.shape[1] - 2
    fe, fn, fw, fs = fe.copy(), fn.copy(), fw.copy(), fs.copy()
    for i in range(1, nx + 1):
        for j in range(1, ny + 1):
            fe[i - 1, j - 1] += -dt / rho * (p[i + 1, j] - p[i, j]) * dy / dx
            fn[i - 1, j - 1] += -dt / rho * (p[i, j + 1] - p[i, j]) * dx / dy
            fw[i - 1, j - 1] += -dt / rho * (p[i - 1, j] - p[i, j]) * dy / dx
            fs[i - 1, j - 1] += -dt / rho * (p[i, j - 1] - p[i, j]) * dx / dy
    return fe, fn, fw, fs


def project(u, v, p, dt, rho, dx, dy):
    nx, ny = u.shape[0] - 2, u.shape[1] - 2
    u, v = u.copy(), v.copy()
    for i in range(1, nx + 1):
        for j in range(1, ny + 1):
            u[i, j] -= dt / rho * (p[i + 1, j] - p[i - 1, j]) / (2 * dx)
            v[i, j] -= dt / rho * (p[i, j + 1] - p[i, j - 1]) / (2 * dy)
    return u, v
