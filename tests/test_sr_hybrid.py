"""SR inference + hybrid workflow integration tests (small grids)."""

import numpy as np
import pytest

from sr_for_cfd_tpu.models import standardize as stz
from sr_for_cfd_tpu.sr.inference import BicubicSR, SRModel, ml_super_resolution


def _make_stats(lr, hr):
    stats = {}
    for comp in ("u", "v", "p"):
        for dim in (lr, hr):
            stats[f"mean{dim}_{comp}"] = 0.1
            stats[f"std{dim}_{comp}"] = 0.5
    return stats


def test_ml_super_resolution_shapes(rng):
    coarse = {c: rng.standard_normal((10, 10)).astype(np.float32) for c in "uvp"}
    hr = ml_super_resolution(
        coarse, 10, 20, stats=_make_stats(10, 20), model=BicubicSR(10, 20),
        verbose=False,
    )
    for c in "uvp":
        assert hr[c].shape == (20, 20)
        assert np.all(np.isfinite(hr[c]))


def test_ml_super_resolution_untrained_model(rng):
    """An untrained SRModel still produces finite fields of the right shape
    (NaN scrub guarantees solver-safe output)."""
    coarse = {c: rng.standard_normal((10, 10)).astype(np.float32) for c in "uvp"}
    model = SRModel.create(10, 20)
    hr = ml_super_resolution(
        coarse, 10, 20, stats=_make_stats(10, 20), model=model, verbose=False
    )
    for c in "uvp":
        assert hr[c].shape == (20, 20)
        assert np.all(np.isfinite(hr[c]))


def test_aspect_ratio_and_adaptive_norm(rng):
    """BFS-style options: rect->square resample around the model + stat
    blending (`bfs_ml_accelerated.py:979-1137`)."""
    coarse = {c: rng.standard_normal((10, 10)).astype(np.float32) for c in "uvp"}
    hr = ml_super_resolution(
        coarse, 10, 20, stats=_make_stats(10, 20), model=BicubicSR(10, 20),
        use_aspect_ratio_correction=True, lx=10.0, ly=3.0,
        use_adaptive_normalization=True, blend_factor=0.3,
        out_shape=(20, 20), verbose=False,
    )
    for c in "uvp":
        assert hr[c].shape == (20, 20)
        assert np.all(np.isfinite(hr[c]))


def test_bicubic_identity_stats(rng):
    """With identity stats (mean 0 / std 1) the bicubic fallback preserves a
    constant field exactly."""
    stats = {f"{k}{d}_{c}": (0.0 if k == "mean" else 1.0)
             for k in ("mean", "std") for d in (10, 20) for c in "uvp"}
    coarse = {c: np.full((10, 10), 0.7, np.float32) for c in "uvp"}
    hr = ml_super_resolution(
        coarse, 10, 20, stats=stats, model=BicubicSR(10, 20), verbose=False
    )
    np.testing.assert_allclose(hr["u"], 0.7, atol=1e-5)


@pytest.mark.slow
def test_hybrid_experiment_end_to_end(tmp_path, rng):
    """Full hybrid driver on tiny grids with the bicubic fallback: the
    warm-started fine solve must converge in fewer iterations than the
    cold start, and centerlines must agree."""
    from sr_for_cfd_tpu.workflow.hybrid import run_hybrid_experiment

    stats_path = str(tmp_path / "stats.txt")
    # physically-plausible stats
    stz.write_stats_file(stats_path, {
        "mean10_u": 0.0, "std10_u": 0.23, "mean10_v": 0.0, "std10_v": 0.15,
        "mean10_p": -0.02, "std10_p": 0.06,
        "mean24_u": 0.0, "std24_u": 0.28, "mean24_v": 0.0, "std24_v": 0.18,
        "mean24_p": -0.02, "std24_p": 0.075,
    })
    results = run_hybrid_experiment(
        Re=100, lr_dim=10, hr_dim=24, dt=2e-3, scheme="UPWIND",
        max_iterations_ml=20000, max_iterations_normal=20000,
        stats_file=stats_path, output_dir=str(tmp_path / "run"),
        verbose=False, save_results=False, dtype="float64", chunk_size=1000,
    )
    assert results["ml_iterations"] < results["normal_iterations"]
    assert results["centerline_diff"]["U"]["max"] < 1e-4
    assert results["centerline_diff"]["V"]["max"] < 1e-4
    # per-phase device-time accounting (SURVEY 5.1)
    for phase in ("coarse", "ml", "normal"):
        assert results["ms_per_iteration"][phase] > 0


def test_aspect_mode_extrapolate(rng):
    """Reference-faithful spline coordinate remap (host, scipy): runs and
    produces finite fields; differs from identity mode on rect domains."""
    coarse = {c: rng.standard_normal((10, 10)).astype(np.float32) for c in "uvp"}
    kw = dict(stats=_make_stats(10, 20), model=BicubicSR(10, 20),
              use_aspect_ratio_correction=True, lx=10.0, ly=3.0,
              out_shape=(20, 20), verbose=False)
    hr_ref = ml_super_resolution(coarse, 10, 20, aspect_mode="extrapolate", **kw)
    hr_id = ml_super_resolution(coarse, 10, 20, aspect_mode="identity", **kw)
    for c in "uvp":
        assert hr_ref[c].shape == (20, 20)
        assert np.all(np.isfinite(hr_ref[c]))
    assert np.abs(hr_ref["u"] - hr_id["u"]).max() > 1e-6


def test_resample_roundtrip_interior():
    """square_to_rect(rect_to_square(f)) reproduces smooth fields in the
    data band (the extrapolated region is discarded by the inverse)."""
    from sr_for_cfd_tpu.sr.resample import rect_to_square, square_to_rect

    ny = nx = 16
    x = np.linspace(0, 10, nx)
    y = np.linspace(0, 3, ny)
    f = np.sin(x)[None, :] * np.cos(y)[:, None]
    sq = rect_to_square({"u": f, "v": f, "p": f}, 10.0, 3.0)
    back = square_to_rect(sq, 10.0, 3.0)
    np.testing.assert_allclose(back["u"], f, atol=2e-2)


def test_srmodel_from_parts(tmp_path, rng):
    """Split encoder/decoder checkpoints (the reference's convention)
    reassemble into the combined model bit-exactly."""
    from sr_for_cfd_tpu.io.checkpoint import save_params

    model = SRModel.create(10, 20, rng_seed=3)
    params = model.params["params"]
    enc_p = str(tmp_path / "enc.msgpack")
    dec_p = str(tmp_path / "dec.msgpack")
    save_params(enc_p, {"params": params["encoder_lr"]})
    save_params(dec_p, {"params": params["decoder_hr"]})
    rebuilt = SRModel.from_parts(enc_p, dec_p, 10, 20)
    x = np.asarray(rng.standard_normal((1, 10, 10, 1)), np.float32)
    np.testing.assert_allclose(
        np.asarray(rebuilt.predict(x)), np.asarray(model.predict(x)), atol=1e-6
    )


def test_loader_fractional_reynolds(tmp_path, rng):
    """Non-integer Re group names (written by our own fmt_re) load cleanly."""
    from sr_for_cfd_tpu.config import MeshParameters
    from sr_for_cfd_tpu.io.hdf5 import load_paired_reynolds_multi, save_fields_hdf5

    path = str(tmp_path / "frac.h5")
    for size in (10, 20):
        mesh = MeshParameters(nx=size, ny=size)
        fields = {c: rng.standard_normal((size, size)).astype(np.float32)
                  for c in "uvp"}
        save_fields_hdf5(path, fields, mesh, 412.5, bc_type="frac")
    x_lr, x_hr, res, comps, bcs = load_paired_reynolds_multi([path], 10, 20)
    assert len(x_lr) == 3
    assert res[0] == 412.5


def test_out_shape_without_aspect_correction(rng):
    """Rectangular fine targets are honored even with aspect correction off
    (regression: warm_start crashed on (hr,hr) fields for ny != nx)."""
    coarse = {c: rng.standard_normal((10, 10)).astype(np.float32) for c in "uvp"}
    hr = ml_super_resolution(
        coarse, 10, 20, stats=_make_stats(10, 20), model=BicubicSR(10, 20),
        out_shape=(14, 20), verbose=False,
    )
    assert hr["u"].shape == (14, 20)


@pytest.mark.slow
def test_hybrid_coarse_overrides(tmp_path):
    """Per-phase solver selection: coarse_overrides settings apply to the
    coarse phase only, and the experiment still completes end-to-end."""
    from sr_for_cfd_tpu.workflow.hybrid import run_hybrid_experiment

    stats_path = str(tmp_path / "stats.txt")
    stz.write_stats_file(stats_path, _make_stats(10, 20))
    results = run_hybrid_experiment(
        Re=100, lr_dim=10, hr_dim=20, dt=2e-3, scheme="UPWIND",
        max_iterations_coarse=3000, max_iterations_ml=3000,
        max_iterations_normal=3000,
        stats_file=stats_path, output_dir=str(tmp_path / "run"),
        verbose=False, save_results=False, dtype="float64",
        chunk_size=1000, pressure_solver="multigrid",
        coarse_overrides={"pressure_solver": "sweeps"},
    )
    assert results["coarse_iterations"] <= 3000
    assert np.isfinite(results["speedup"])


def test_hybrid_per_case_reference_defaults():
    """run_hybrid_experiment resolves dt/scheme per case when not given:
    BFS gets the reference's UPWIND @ 2e-3 (`bfs code given by
    sir.py:810-811`), cavity QUICK @ 1e-3; explicit values still win."""
    import inspect

    from sr_for_cfd_tpu.workflow.hybrid import run_hybrid_experiment

    sig = inspect.signature(run_hybrid_experiment)
    assert sig.parameters["dt"].default is None
    assert sig.parameters["scheme"].default is None


def test_conventional_artifact_names_are_used_as_defaults(tmp_path):
    """Encoder/decoder checkpoints under the reference naming convention
    in model_dir are picked up without explicit paths (previously they
    were computed but ignored, silently degrading to bicubic)."""
    import numpy as np

    from sr_for_cfd_tpu.io.checkpoint import save_params
    from sr_for_cfd_tpu.sr.inference import SRModel
    from sr_for_cfd_tpu.workflow.hybrid import run_ml_accelerated_fine_simulation

    lr, hr = 10, 20
    m = SRModel.create(lr, hr)
    d = str(tmp_path)
    suffix = "testsfx"
    save_params(f"{d}/vanilla_encoder{lr}_to_{hr}_{suffix}.msgpack",
                {"params": m.params["params"]["encoder_lr"]})
    save_params(f"{d}/vanilla_decoder{hr}_from_{lr}_{suffix}.msgpack",
                {"params": m.params["params"]["decoder_hr"]})
    with open(f"{d}/standardization_stats_{lr}to{hr}_{suffix}.txt", "w") as f:
        for c in ("u", "v", "p"):
            f.write(f"mean{lr}_{c} 0.0\nstd{lr}_{c} 1.0\n")
            f.write(f"mean{hr}_{c} 0.0\nstd{hr}_{c} 1.0\n")
    coarse = {c: np.zeros((lr, lr), np.float32) for c in ("u", "v", "p")}
    solver, its, el, hrf = run_ml_accelerated_fine_simulation(
        100.0, hr, hr, coarse, lr_dim=lr, hr_dim=hr,
        model_suffix=suffix, model_dir=d,
        output_name=f"{d}/run", verbose=False, save_results=False,
        dtype="float32", max_iterations=2, chunk_size=2,
    )
    assert hrf["u"].shape == (hr, hr)


def test_hybrid_spmd_fine_phases(tmp_path, rng):
    """The hybrid driver runs its FINE phases domain-decomposed
    (spmd_devices=8 -> SpmdWorkflowAdapter over the 8-device virtual
    mesh) behind the same workflow surface: warm start helps, centerlines
    agree, the artifact suite is written, and the coarse phase stays
    single-device (10 doesn't divide 8)."""
    import os

    from sr_for_cfd_tpu.workflow.hybrid import run_hybrid_experiment

    stats_path = str(tmp_path / "stats.txt")
    stz.write_stats_file(stats_path, {
        "mean10_u": 0.0, "std10_u": 0.23, "mean10_v": 0.0, "std10_v": 0.15,
        "mean10_p": -0.02, "std10_p": 0.06,
        "mean24_u": 0.0, "std24_u": 0.28, "mean24_v": 0.0, "std24_v": 0.18,
        "mean24_p": -0.02, "std24_p": 0.075,
    })
    out = str(tmp_path / "run")
    results = run_hybrid_experiment(
        Re=100, lr_dim=10, hr_dim=24, dt=2e-3, scheme="UPWIND",
        max_iterations_ml=20000, max_iterations_normal=20000,
        stats_file=stats_path, output_dir=out,
        verbose=False, save_results=True, dtype="float64",
        chunk_size=1000, spmd_devices=8,
    )
    assert results["ml_iterations"] < results["normal_iterations"]
    assert results["centerline_diff"]["U"]["max"] < 1e-4
    # decomposed fine runs wrote the same artifact suite
    files = os.listdir(out)
    assert any(f.endswith("_accelerated_centerline.dat") for f in files)
    assert any(f.endswith("_normal_full.dat") for f in files)
