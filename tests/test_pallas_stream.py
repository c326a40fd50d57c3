"""Slab-streamed Pallas multigrid (ops/pallas_stream.py), interpret mode.

The real-silicon gates (Mosaic codegen, VMEM budgets, timing) live in
bench.py / scripts/scaling_bench.py; these tests pin the algorithm:
fine-level conv transfer operators == the exact resize matrices, and the
streamed solve matches the jnp V-cycle path on isotropic, ragged-slab,
and semi-coarsened (anisotropic) problems.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr_for_cfd_tpu.ops.multigrid import mg_solve_pressure
from sr_for_cfd_tpu.ops.pallas_mg import _resize_matrix
from sr_for_cfd_tpu.ops.pallas_stream import stream_mg_solve_pressure
from sr_for_cfd_tpu.ops.stencil import face_fluxes


def test_traced_resize_matrices_match_numpy():
    """`_resize_matrix_traced` (in-program transfer-matrix build; what
    keeps the 8192^2 streamed program under the compile-request size
    ceiling) must reproduce the f64 numpy build: bit-exact at the
    hierarchy's factor-2 transitions, <= 1 ulp elsewhere. Also walks
    `computed_mats` against a real plan: same order, same shapes, same
    values."""
    from sr_for_cfd_tpu.ops.pallas_mg import (
        _resize_matrix_traced,
        computed_mats,
        plan_hierarchy,
    )

    for ni, no in ((2048, 1024), (1024, 2048), (400, 200), (194, 97),
                   (97, 48), (48, 97), (12, 25)):
        a = _resize_matrix(ni, no)
        b = np.asarray(
            jax.jit(lambda z, ni=ni, no=no: _resize_matrix_traced(ni, no, z))(
                jnp.float32(0.0)))
        # factor-2 transitions (what the hierarchy produces) are exact:
        # every operand is an exact binary rational in f32. Non-factor-2
        # ratios accumulate a few f32 ulp in the normalization (~2e-6
        # measured) - far under the 1e-5 silicon parity gates.
        tol = 0.0 if (ni == 2 * no or no == 2 * ni) else 5e-6
        np.testing.assert_allclose(a, b, rtol=0.0, atol=tol)

    plan = plan_hierarchy(512, 512, 1 / 512, 1 / 512, (1 / 512) ** 2)
    cm = computed_mats(plan, jnp.float32(0.0))
    assert len(cm) == len(plan.mats)
    for m0, m1 in zip(plan.mats, cm):
        assert m0.shape == tuple(m1.shape)
        np.testing.assert_allclose(m0, np.asarray(m1), atol=1e-6)
    # the big matrices really were swapped for computed ones
    assert any(not isinstance(m, np.ndarray) for m in cm), (
        "no matrix exceeded the constant threshold at 512^2 - threshold "
        "drifted?")


def test_fine_transfer_convs_match_resize_matrices():
    """The streamed kernel's stride-2 [1,3,3,1]/8 restriction conv (with
    1/7 boundary renormalization) and [0.75, 0.25] prolongation taps are
    exactly `jax.image.resize(linear)` at 2x - the operators the jnp and
    VMEM-resident Pallas paths use."""
    for nf in (16, 64, 400, 256):
        nc = nf // 2
        R = np.asarray(_resize_matrix(nf, nc))  # (nc, nf)
        Rc = np.zeros((nc, nf), np.float64)
        for jc in range(nc):
            idx = np.array([2 * jc - 1, 2 * jc, 2 * jc + 1, 2 * jc + 2])
            w = np.array([1.0, 3.0, 3.0, 1.0])
            ok = (idx >= 0) & (idx < nf)
            Rc[jc, idx[ok]] = w[ok] / w[ok].sum()
        np.testing.assert_allclose(R, Rc, atol=1e-7)

        P = np.asarray(_resize_matrix(nc, nf))  # (nf, nc)
        Pc = np.zeros((nf, nc), np.float64)
        for m in range(nc):
            Pc[2 * m, m] += 0.75
            Pc[2 * m, max(m - 1, 0)] += 0.25  # edge clamp
            Pc[2 * m + 1, m] += 0.75
            Pc[2 * m + 1, min(m + 1, nc - 1)] += 0.25
        np.testing.assert_allclose(P, Pc, atol=1e-7)


def _poisson_case(rng, nx, ny, lx=1.0, ly=1.0):
    dx, dy = lx / nx, ly / ny
    u = jnp.asarray(rng.standard_normal((nx + 2, ny + 2)) * 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal((nx + 2, ny + 2)) * 0.1, jnp.float32)
    p0 = jnp.asarray(rng.standard_normal((nx + 2, ny + 2)) * 0.01,
                     jnp.float32)
    ff = face_fluxes(u, v, dx, dy)
    kw = dict(dx=dx, dy=dy, dt=1e-3, rho=1.0, volp=dx * dy)
    return p0, ff, kw


@pytest.mark.parametrize(
    "nx,ny,lx,ly,label",
    [
        (64, 64, 1.0, 1.0, "isotropic"),
        (72, 64, 1.0, 1.0, "ragged final slab"),
        (64, 48, 10.0, 3.0, "semi-coarsen y (BFS anisotropy)"),
        (48, 64, 3.0, 10.0, "semi-coarsen x"),
    ],
)
def test_single_cycle_matches_jnp_vcycle(rng, nx, ny, lx, ly, label):
    """One forced V-cycle of the streamed kernel == one jnp V-cycle to
    f32 rounding: same smoother, same transfer operators, same scales."""
    p0, ff, kw = _poisson_case(rng, nx, ny, lx, ly)
    a = mg_solve_pressure(p0, ff, tol=1e-30, max_cycles=1, **kw)
    b = stream_mg_solve_pressure(p0, ff, tol=1e-30, max_cycles=1,
                                 slab_rows=16, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize(
    "nx,ny,lx,ly,label",
    [
        (64, 64, 1.0, 1.0, "isotropic, depth-2 recursion"),
        (72, 64, 1.0, 1.0, "ragged final slab"),
        (64, 48, 10.0, 3.0, "semi-coarsen y (BFS anisotropy)"),
    ],
)
def test_recursive_streaming_matches_jnp_vcycle(rng, nx, ny, lx, ly, label):
    """`resident_sub_cells_max=0` forces the coarse correction to recurse
    the slab streaming at EVERY level that still has a sub-hierarchy
    (the 4096^2 configuration, where the resident 2048^2 coarse kernel
    cannot compile) - one forced cycle must still equal one jnp V-cycle:
    the recursion only changes where each level's smoothing runs, not
    the operators."""
    p0, ff, kw = _poisson_case(rng, nx, ny, lx, ly)
    a = mg_solve_pressure(p0, ff, tol=1e-30, max_cycles=1, **kw)
    b = stream_mg_solve_pressure(p0, ff, tol=1e-30, max_cycles=1,
                                 slab_rows=16, interpret=True,
                                 resident_sub_cells_max=0, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize(
    "nx,ny,lx,ly,label",
    [
        (64, 64, 1.0, 1.0, "isotropic"),
        (72, 64, 1.0, 1.0, "ragged final slab"),
        (64, 48, 10.0, 3.0, "semi-coarsen y"),
        (48, 64, 3.0, 10.0, "semi-coarsen x (identity columns)"),
    ],
)
def test_wide_handoff_matches_jnp_vcycle(rng, nx, ny, lx, ly, label):
    """A tiny `wide_vmem_bytes` forces the top level onto the wide
    hand-off layout (the >=2560^2 configuration: per-slab restriction
    partials overlap-added in XLA, column matmuls at HIGHEST precision
    outside the kernel, e2 pre-sliced into per-slab windows) while
    deeper levels stay on the in-kernel layout - two forced cycles must
    match the jnp V-cycle like the resident path does."""
    p0, ff, kw = _poisson_case(rng, nx, ny, lx, ly)
    a = mg_solve_pressure(p0, ff, tol=1e-30, max_cycles=2, **kw)
    b = stream_mg_solve_pressure(p0, ff, tol=1e-30, max_cycles=2,
                                 slab_rows=16, interpret=True,
                                 wide_vmem_bytes=40_000, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_streamed_solve_reaches_tolerance(rng):
    """Full streamed solve: reaches the same tolerance as the jnp path
    (one extra cycle by the lagged exit check), ghost ring untouched."""
    from sr_for_cfd_tpu.ops.multigrid import _laplacian, ghost_fold

    nx = ny = 64
    p0, ff, kw = _poisson_case(rng, nx, ny)
    tol = 1e-6
    a, ca = mg_solve_pressure(p0, ff, tol=tol, max_cycles=25,
                              return_count=True, **kw)
    b, cb = stream_mg_solve_pressure(p0, ff, tol=tol, max_cycles=25,
                                     slab_rows=16, interpret=True,
                                     return_count=True, **kw)
    assert int(cb) <= int(ca) + 2  # lag costs at most ~1 extra cycle

    inv_dx2 = 1.0 / (kw["dx"] * kw["dx"])
    b_int = (kw["rho"] / kw["dt"]) * ff.divergence_sum()
    ghost_only = p0.at[1:-1, 1:-1].set(0.0)
    b_eff = b_int - ghost_fold(ghost_only, inv_dx2, inv_dx2, kw["volp"])
    r = b_eff - _laplacian(b[1:-1, 1:-1], inv_dx2, inv_dx2, kw["volp"])
    rms = float(jnp.sqrt(jnp.sum(r * r) / (nx * ny)))
    assert rms < tol
    np.testing.assert_array_equal(np.asarray(b)[0, :], np.asarray(p0)[0, :])
    np.testing.assert_array_equal(np.asarray(b)[-1, :], np.asarray(p0)[-1, :])


def test_solver_integration_forced_streamed():
    """A cavity solve with mg_slab_rows forced matches the jnp-multigrid
    solve (both solve the pressure system to the same tolerance)."""
    from sr_for_cfd_tpu.solver.cases import make_cavity_solver

    kw = dict(Re=100, nx=48, ny=48, dt=2e-3, scheme="UPWIND",
              dtype="float32", chunk_size=100, max_iterations=200,
              pressure_solver="multigrid")
    ref = make_cavity_solver(**kw)
    ref.solve("/tmp/unused_stream_ref", verbose=False, save_results=False)
    got = make_cavity_solver(use_pallas=True, mg_slab_rows=16, **kw)
    got.solve("/tmp/unused_stream_got", verbose=False, save_results=False)
    assert int(got.state.count) == int(ref.state.count)
    np.testing.assert_allclose(
        np.asarray(got.state.u), np.asarray(ref.state.u), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.state.p), np.asarray(ref.state.p), atol=2e-4
    )


def test_config_validates_mg_slab_rows():
    from sr_for_cfd_tpu.config import SolverSettings

    with pytest.raises(ValueError, match="multiple of 16"):
        SolverSettings.make(mg_slab_rows=12, pressure_solver="multigrid",
                            use_pallas=True)
    with pytest.raises(ValueError, match="multiple of 16"):
        SolverSettings.make(mg_slab_rows=8, pressure_solver="multigrid",
                            use_pallas=True)
    with pytest.raises(ValueError, match="Pallas multigrid"):
        SolverSettings.make(mg_slab_rows=16)


def test_auto_slab_rows_envelope():
    """The slab auto-clamp keeps R x width inside the silicon-proven VMEM
    envelope (R=256 fails the TPU compiler at 8192-wide; R<=128 runs),
    preserves multiples of 16, and leaves proven operating points alone."""
    from sr_for_cfd_tpu.ops.pallas_stream import SLAB_ROWS, auto_slab_rows

    assert auto_slab_rows(256, 4096) == 256   # proven point, untouched
    assert auto_slab_rows(256, 2048) == 256
    assert auto_slab_rows(256, 8192) == 128   # 8192^2: halved once
    assert auto_slab_rows(256, 16384) == 64
    assert auto_slab_rows(64, 8192) == 64     # explicit small R respected
    assert auto_slab_rows(SLAB_ROWS, 1 << 20) == 16  # floor
    for w in (400, 4096, 8192, 20000):
        assert auto_slab_rows(256, w) % 16 == 0
