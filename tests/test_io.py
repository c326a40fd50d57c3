"""I/O layer tests: .dat round-trips, HDF5 schema, checkpoints, naming."""

import numpy as np
import pytest

from sr_for_cfd_tpu.config import BFSGeometry, MeshParameters
from sr_for_cfd_tpu.io import datfiles, hdf5
from sr_for_cfd_tpu.io.checkpoint import (
    load_params,
    load_solver_fields,
    save_params,
    save_solver_state,
)
from sr_for_cfd_tpu.utils import naming


def test_centerline_dat_roundtrip(tmp_path, rng):
    mesh = MeshParameters(nx=8, ny=6, lx=2.0, ly=3.0)
    var = rng.standard_normal((3, 10, 8))
    path = str(tmp_path / "c.dat")
    datfiles.save_centerline_data(path, var, mesh, re=250)
    y, u, x, v = datfiles.load_centerline_dat(path)
    cl = datfiles.extract_centerlines(var, mesh)
    np.testing.assert_allclose(u, cl["u_centerline"], atol=1e-6)
    np.testing.assert_allclose(v, cl["v_centerline"], atol=1e-6)
    np.testing.assert_allclose(y, cl["y"], atol=1e-6)
    np.testing.assert_allclose(x, cl["x"], atol=1e-6)


def test_golden_centerline_parses():
    """Our parser reads the reference's golden artifact."""
    import os

    path = "/root/reference/outputs/bfs_Re400_centerline.dat"
    if not os.path.exists(path):
        pytest.skip("reference artifact absent")
    y, u, x, v = datfiles.load_centerline_dat(path)
    assert len(y) == len(u) == len(x) == len(v) == 10
    assert y[-1] == pytest.approx(3.0)
    assert x[-1] == pytest.approx(10.0)


def test_hdf5_schema_and_loader_roundtrip(tmp_path, rng):
    """Fields written by save_fields_hdf5 load back through the training
    loader with correct pairing."""
    path = str(tmp_path / "sim.h5")
    for size in (4, 8):
        mesh = MeshParameters(nx=size, ny=size)
        for re in (100, 200):
            fields = {c: rng.standard_normal((size, size)).astype(np.float32)
                      for c in "uvp"}
            hdf5.save_fields_hdf5(path, fields, mesh, re, bc_type="testbc")
    x_lr, x_hr, res, comps, bcs = hdf5.load_paired_reynolds_multi([path], 4, 8)
    assert x_lr.shape == (6, 4, 4, 1)
    assert x_hr.shape == (6, 8, 8, 1)
    assert set(res.tolist()) == {100, 200}
    assert set(bcs.tolist()) == {"testbc"}


def test_hdf5_bfs_attrs(tmp_path, rng):
    import h5py

    path = str(tmp_path / "bfs.h5")
    mesh = MeshParameters(nx=4, ny=4, lx=10.0, ly=3.0)
    fields = {c: rng.standard_normal((4, 4)) for c in "uvp"}
    hdf5.save_fields_hdf5(path, fields, mesh, 400, bfs=BFSGeometry())
    with h5py.File(path) as f:
        g = f["Re400_mesh4x4"]
        assert g.attrs["lx"] == 10.0
        assert g.attrs["step_height"] == 1.0


def test_solver_state_checkpoint(tmp_path):
    """Solver snapshot -> restore via warm_start reproduces the fields."""
    from sr_for_cfd_tpu.solver.cases import make_cavity_solver

    solver = make_cavity_solver(Re=100, nx=8, ny=8, dt=2e-3, dtype="float64",
                                max_iterations=50, chunk_size=50)
    solver.solve(str(tmp_path / "x"), verbose=False, save_results=False)
    path = str(tmp_path / "state.npz")
    save_solver_state(path, solver.state)
    fields = load_solver_fields(path)
    np.testing.assert_allclose(fields["u"], solver.interior_fields()["u"])

    solver2 = make_cavity_solver(Re=100, nx=8, ny=8, dt=2e-3, dtype="float64")
    solver2.warm_start(fields)
    np.testing.assert_allclose(
        np.asarray(solver2.state.u)[1:-1, 1:-1],
        np.asarray(solver.state.u)[1:-1, 1:-1],
    )


def test_params_checkpoint_roundtrip(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from sr_for_cfd_tpu.models.autoencoder import build_encoder

    enc = build_encoder(10)
    params = enc.init(jax.random.key(0), jnp.zeros((1, 10, 10, 1)))
    path = str(tmp_path / "enc.msgpack")
    save_params(path, params)
    loaded = load_params(path, params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_naming_conventions():
    assert naming.fmt_re(400.0) == "400"
    assert naming.fmt_re(412.5) == "412.5"
    files = naming.default_model_files(10, 400, "swish_trained_upto_700")
    assert files["encoder_file"].endswith(
        "vanilla_encoder10_to_400_swish_trained_upto_700.h5"
    )
    assert files["stats_file"].endswith(
        "standardization_stats_10to400_swish_trained_upto_700.txt"
    )
    assert "vanilla_decoder400_from_10" in files["decoder_file"]


def test_native_dat_writer_byte_parity(tmp_path, rng):
    """The C++ fast writer produces byte-identical .dat output to the
    Python formatter, and the fallback engages cleanly when unavailable."""
    from sr_for_cfd_tpu.io import native_io

    mesh = MeshParameters(nx=12, ny=9)
    var = rng.standard_normal((3, 14, 11))
    p_native = str(tmp_path / "n.dat")
    p_python = str(tmp_path / "p.dat")
    datfiles.save_full_field(p_native, var, mesh, 250, 1e-3)
    used_native = native_io._load() is not None
    # force the Python path
    saved = (native_io._failed, native_io._lib)
    native_io._failed, native_io._lib = True, None
    try:
        datfiles.save_full_field(p_python, var, mesh, 250, 1e-3)
    finally:
        native_io._failed, native_io._lib = saved
    with open(p_native, "rb") as a, open(p_python, "rb") as b:
        assert a.read() == b.read()
    if not used_native:
        pytest.skip("no C++ toolchain; exercised fallback only")


def test_periodic_snapshots_resume(tmp_path):
    """snapshot_every writes restartable state mid-solve; resuming from it
    reaches the same solution (SURVEY 5.4 periodic checkpointing)."""
    from sr_for_cfd_tpu.solver.cases import make_cavity_solver

    base = str(tmp_path / "run")
    solver = make_cavity_solver(Re=100, nx=12, ny=12, dt=2e-3, dtype="float64",
                                chunk_size=200, max_iterations=1000)
    solver.solve(base, verbose=False, save_results=False, snapshot_every=400)
    snap = base + "_snapshot.npz"
    import os

    assert os.path.exists(snap)
    fields = load_solver_fields(snap)
    resumed = make_cavity_solver(Re=100, nx=12, ny=12, dt=2e-3,
                                 dtype="float64", chunk_size=1000)
    resumed.warm_start(fields)
    it, _ = resumed.solve(str(tmp_path / "r"), verbose=False,
                          save_results=False)
    final = make_cavity_solver(Re=100, nx=12, ny=12, dt=2e-3, dtype="float64",
                               chunk_size=1000)
    final.solve(str(tmp_path / "f"), verbose=False, save_results=False)
    np.testing.assert_allclose(
        np.asarray(resumed.state.u), np.asarray(final.state.u), atol=1e-6
    )


def test_loader_tracks_per_group_bc_type(tmp_path):
    """A combined file can mix BC types; each sample must carry its own
    group's bc_type attr (a file-level read mislabeled samples and
    corrupted the per-BC train/test split)."""
    import h5py

    path = str(tmp_path / "mixed.h5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        for re, bc in ((100, "lid_driven_cavity"),
                       (200, "double_lid(u_top=1,u_bottom=1)")):
            for dim in (4, 8):
                g = f.create_group(f"Re{re}_mesh{dim}x{dim}")
                g.attrs["bc_type"] = bc
                for c in ("u", "v", "p"):
                    g.create_dataset(c, data=rng.standard_normal(dim * dim))
    from sr_for_cfd_tpu.io.hdf5 import load_paired_reynolds_multi

    _, _, res, comps, bcs = load_paired_reynolds_multi([path], 4, 8)
    assert len(res) == 6
    for re, bc in zip(res, bcs):
        expected = ("lid_driven_cavity" if re == 100
                    else "double_lid(u_top=1,u_bottom=1)")
        assert bc == expected, (re, bc)


def test_solver_state_roundtrip_without_extension(tmp_path):
    """np.savez appends .npz silently; the load side must normalize so
    save/restore round-trips for any input path."""
    from sr_for_cfd_tpu.io.checkpoint import (
        load_solver_fields,
        save_solver_state,
    )
    from sr_for_cfd_tpu.solver.cases import make_cavity_solver
    from sr_for_cfd_tpu.solver.state import init_state

    s = init_state(make_cavity_solver(Re=100, nx=6, ny=6, dtype="float32").case)
    base = str(tmp_path / "snap")  # no extension
    save_solver_state(base, s)
    fields = load_solver_fields(base)
    assert fields["u"].shape == (6, 6)
