"""Real-silicon gates: every Pallas kernel family compiled by Mosaic and
numerically checked against its jnp oracle ON the TPU (VERDICT r2 #8).

Interpret mode (the CPU lane) accepts programs Mosaic rejects - scalar
VMEM stores, concatenating vectors with mismatched sublane offsets - and
both round-2 Mosaic bugs were silicon-only. Run as:

    SRTPU_TEST_TPU=1 python -m pytest tests -m tpu -q

(~4-6 min: each kernel family compiles once, ~20-40 s through the relay.)
These duplicate bench.py's parity gates as tests so regressions surface in
a test run, not mid-benchmark.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")


@pytest.fixture(scope="module")
def poisson_128():
    from sr_for_cfd_tpu.ops.stencil import face_fluxes

    _require_tpu()
    n = 128
    dx = 1.0 / n
    g = np.random.default_rng(0)
    u = jnp.asarray(g.standard_normal((n + 2, n + 2)) * 0.1, jnp.float32)
    v = jnp.asarray(g.standard_normal((n + 2, n + 2)) * 0.1, jnp.float32)
    p0 = jnp.zeros((n + 2, n + 2), jnp.float32)
    ff = face_fluxes(u, v, dx, dx)
    return p0, ff, dict(dx=dx, dy=dx, dt=1e-3, rho=1.0, volp=dx * dx,
                        tol=1e-6)


def test_pressure_kernel_matches_jnp(poisson_128):
    from sr_for_cfd_tpu.ops.pallas_kernels import pallas_solve_pressure
    from sr_for_cfd_tpu.ops.sweeps import solve_pressure

    p0, ff, kw = poisson_128
    a = solve_pressure(p0, ff, check_every=8, max_iter=200, **kw)
    b, cnt = pallas_solve_pressure(p0, ff, check_every=8, max_iter=200,
                                   return_count=True, **kw)
    assert float(jnp.max(jnp.abs(a - b))) <= 1e-5
    assert 0 < int(cnt) <= 200


def test_mg_kernel_matches_jnp(poisson_128):
    from sr_for_cfd_tpu.ops.multigrid import mg_solve_pressure
    from sr_for_cfd_tpu.ops.pallas_mg import pallas_mg_solve_pressure

    p0, ff, kw = poisson_128
    c = mg_solve_pressure(p0, ff, max_cycles=20, **kw)
    d = pallas_mg_solve_pressure(p0, ff, max_cycles=20, **kw)
    assert float(jnp.max(jnp.abs(c - d))) <= 1e-5


def test_streamed_mg_kernel_matches_jnp(poisson_128):
    """Forced-equal-cycles: the streamed kernel's exit check lags one
    cycle by design, so tolerance-stopped fields are two differently-
    stopped iterates (~4e-5 apart) - pinning the cycle count makes the
    gate sharp (f32 rounding). This gate caught the default-precision
    MXU transfer matmuls running bf16 on silicon (4e-3/cycle drift,
    invisible in interpret mode - now Precision.HIGHEST)."""
    from sr_for_cfd_tpu.ops.multigrid import mg_solve_pressure
    from sr_for_cfd_tpu.ops.pallas_stream import stream_mg_solve_pressure

    p0, ff, kw = poisson_128
    kw = dict(kw, tol=1e-30)
    c = mg_solve_pressure(p0, ff, max_cycles=6, **kw)
    g = stream_mg_solve_pressure(p0, ff, max_cycles=6, slab_rows=64, **kw)
    assert float(jnp.max(jnp.abs(c - g))) <= 1e-5


def test_recursive_streamed_mg_on_silicon(poisson_128):
    """Forced recursion (`resident_sub_cells_max=0`): the coarse
    correction streams EVERY level with a sub-hierarchy - the 4096^2
    configuration, where a resident 2048^2 coarse kernel SIGABRTs the
    TPU compiler - Mosaic-compiled and numerically gated at a small size.
    The recursion adds per-level XLA hand-off steps (rc normalization,
    HIGHEST-precision column prolongation, e2 padding) that only real
    silicon exercises faithfully."""
    from sr_for_cfd_tpu.ops.multigrid import mg_solve_pressure
    from sr_for_cfd_tpu.ops.pallas_stream import stream_mg_solve_pressure

    p0, ff, kw = poisson_128
    kw = dict(kw, tol=1e-30)
    c = mg_solve_pressure(p0, ff, max_cycles=4, **kw)
    g = stream_mg_solve_pressure(p0, ff, max_cycles=4, slab_rows=16,
                                 resident_sub_cells_max=0, **kw)
    assert float(jnp.max(jnp.abs(c - g))) <= 1e-5


def test_wide_handoff_streamed_mg_on_silicon():
    """The wide hand-off layout (the >=2560^2 production configuration:
    per-slab restriction partials, XLA column matmuls, pre-sliced e2
    windows) forced at 512^2 via the VMEM-estimate threshold, gated
    against the jnp V-cycle at forced-equal cycles. Exercises the
    8-aligned partial/window blocks and the mask-then-slice workaround
    for Mosaic's vector_extract_strided_slice crash on real silicon."""
    from sr_for_cfd_tpu.ops.multigrid import mg_solve_pressure
    from sr_for_cfd_tpu.ops.pallas_stream import stream_mg_solve_pressure
    from sr_for_cfd_tpu.ops.stencil import face_fluxes

    _require_tpu()
    n = 512
    dx = 1.0 / n
    g = np.random.default_rng(3)
    u = jnp.asarray(g.standard_normal((n + 2, n + 2)) * 0.1, jnp.float32)
    v = jnp.asarray(g.standard_normal((n + 2, n + 2)) * 0.1, jnp.float32)
    p0 = jnp.zeros((n + 2, n + 2), jnp.float32)
    ff = face_fluxes(u, v, dx, dx)
    kw = dict(dx=dx, dy=dx, dt=1e-3, rho=1.0, volp=dx * dx, tol=1e-30)
    c = mg_solve_pressure(p0, ff, max_cycles=4, **kw)
    w = stream_mg_solve_pressure(p0, ff, max_cycles=4, slab_rows=64,
                                 wide_vmem_bytes=2_000_000, **kw)
    assert float(jnp.max(jnp.abs(c - w))) <= 1e-5


def test_tiled_kernel_matches_jnp(poisson_128):
    from sr_for_cfd_tpu.ops.pallas_tiled import tiled_solve_pressure
    from sr_for_cfd_tpu.ops.sweeps import solve_pressure

    p0, ff, kw = poisson_128
    e, cnt = tiled_solve_pressure(p0, ff, slab_rows=64, max_iter=200,
                                  return_count=True, **kw)
    f = solve_pressure(p0, ff, inner_scheme="redblack", check_every=1,
                       max_iter=200, **kw)
    assert float(jnp.max(jnp.abs(e - f))) <= 1e-5
    assert 0 < int(cnt) <= 200


def _small_state(fused, mg=False, steps=2):
    from sr_for_cfd_tpu.solver.cases import make_cavity_solver

    extra = {"pressure_solver": "multigrid"} if mg else {}
    solver = make_cavity_solver(
        Re=100.0, nx=128, ny=128, dt=1e-3, scheme="QUICK", dtype="float32",
        max_iterations=steps, chunk_size=steps, fused_step=fused, **extra,
    )
    state = solver._chunk_fn(solver.state, solver.profile)
    jax.block_until_ready(state)
    return solver, state


def _max_field_diff(a, b):
    return max(
        float(jnp.max(jnp.abs(a.u - b.u))),
        float(jnp.max(jnp.abs(a.v - b.v))),
        float(jnp.max(jnp.abs(a.p - b.p))),
    )


def test_fused_step_matches_jnp_step():
    _require_tpu()
    _, ref = _small_state(fused=False)
    _, fused = _small_state(fused=True)
    assert _max_field_diff(ref, fused) <= 1e-5


def test_fused_mg_step_matches_jnp_mg_step():
    _require_tpu()
    _, ref = _small_state(fused=False, mg=True)
    _, fused = _small_state(fused=True, mg=True)
    assert _max_field_diff(ref, fused) <= 1e-4


def test_fused_step_counters_on_silicon():
    """The (1,3) int32 counter store is exactly the kind of op Mosaic can
    reject while interpret mode shrugs - gate it on real silicon."""
    from functools import partial

    from sr_for_cfd_tpu.solver.simple import simple_step

    _require_tpu()
    solver, state = _small_state(fused=True, mg=True)
    step = jax.jit(partial(simple_step, case=solver.case,
                           profile=solver.profile, with_counts=True))
    state, counts = step(state)
    vals = {k: int(v) for k, v in counts.items()}
    assert set(vals) == {"u", "v", "p"}
    assert all(v >= 0 for v in vals.values())
    assert vals["p"] >= 1  # at least one V-cycle ran


def test_spmd_pallas_kernel_on_silicon():
    """The per-shard pressure sweep kernel (parallel/spmd_pallas.py)
    Mosaic-compiled on real silicon via a 1-device mesh (the kernel and
    its layout are rank-count-independent; only the ppermute ring is
    trivial here). Matches the jnp shard_map sweep like the 8-rank
    interpret-mode tests."""
    import numpy as np
    from jax.sharding import Mesh

    from sr_for_cfd_tpu.parallel.spmd_step import SpmdSolver
    from sr_for_cfd_tpu.solver.cases import make_cavity_solver

    _require_tpu()
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    kw = dict(Re=100, nx=64, ny=64, dt=2e-3, scheme="UPWIND",
              dtype="float32", chunk_size=40, max_iterations=80,
              inner_max_iter=40)
    a = SpmdSolver(make_cavity_solver(**kw).case, mesh)
    a.solve()
    b = SpmdSolver(make_cavity_solver(use_pallas=True, **kw).case, mesh)
    b.solve()
    assert int(b.local.count) == int(a.local.count)
    fa, fb = a.global_fields(), b.global_fields()
    for k in ("u", "v", "p"):
        np.testing.assert_allclose(fb[k], fa[k], atol=2e-5)


def test_spmd_mg_pallas_smoother_on_silicon():
    """The sharded-multigrid Pallas smoother (spmd_mg.smooth_band_pallas,
    reusing the per-shard sweep kernel with a zero exterior)
    Mosaic-compiled on real silicon via a 1-device mesh; matches the jnp
    sharded V-cycle like the 8-rank interpret-mode test."""
    import numpy as np
    from jax.sharding import Mesh

    from sr_for_cfd_tpu.parallel.spmd_step import SpmdSolver
    from sr_for_cfd_tpu.solver.cases import make_cavity_solver

    _require_tpu()
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    kw = dict(Re=100, nx=64, ny=64, dt=2e-3, scheme="UPWIND",
              dtype="float32", chunk_size=60, max_iterations=120,
              pressure_solver="multigrid")
    a = SpmdSolver(make_cavity_solver(**kw).case, mesh)
    a.solve()
    b = SpmdSolver(make_cavity_solver(use_pallas=True, **kw).case, mesh)
    b.solve()
    assert int(b.local.count) == int(a.local.count)
    fa, fb = a.global_fields(), b.global_fields()
    for k in ("u", "v", "p"):
        np.testing.assert_allclose(fb[k], fa[k], atol=2e-5)


def test_tiled_momentum_kernel_matches_jnp(poisson_128):
    """The tiled momentum sweep Mosaic-compiled and gated on silicon
    (QUICK: the +-2 clamps, 3-row halo carries, and the six streamed
    input windows are exactly the machinery interpret mode can't
    faithfully check)."""
    from sr_for_cfd_tpu.ops.pallas_momentum import tiled_solve_momentum
    from sr_for_cfd_tpu.ops.sweeps import solve_momentum

    p0, ff, _ = poisson_128
    n = p0.shape[0] - 2
    dx = 1.0 / n
    g = np.random.default_rng(5)
    u = jnp.asarray(g.standard_normal(p0.shape) * 0.3, jnp.float32)
    old = u[1:-1, 1:-1]
    kw = dict(scheme="QUICK", dx=dx, dy=dx, dt=1e-3, nu=0.01,
              volp=dx * dx, tol=1e-6, max_iter=40, check_every=3)
    a, ca = solve_momentum(u, old, ff, return_count=True, **kw)
    b, cb = tiled_solve_momentum(u, old, ff, slab_rows=32,
                                 return_count=True, **kw)
    assert int(ca) == int(cb)
    assert float(jnp.max(jnp.abs(a - b))) <= 1e-5
