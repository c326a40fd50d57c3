"""Training pipeline tests: loader, splits, standardization, train loop,
evaluation, export - wired end-to-end from a real (tiny) simulation sweep."""

import numpy as np
import pytest

from sr_for_cfd_tpu.io.hdf5 import load_paired_reynolds_multi
from sr_for_cfd_tpu.workflow import training as tr


def test_loader_dummy_fallback(tmp_path):
    """No files -> dummy dataset (random HR avg-pooled to LR), the
    reference's fake-backend behavior (sr-ae-conv.ipynb cell 0)."""
    x_lr, x_hr, res, comps, bcs = load_paired_reynolds_multi(
        [str(tmp_path / "missing.h5")], 10, 20
    )
    assert x_lr.shape[1:] == (10, 10, 1)
    assert x_hr.shape[1:] == (20, 20, 1)
    assert set(np.unique(bcs)) == {"dummy"}
    # LR really is the avg-pool of HR
    pooled = x_hr[0, ..., 0].reshape(10, 2, 10, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(x_lr[0, ..., 0], pooled, rtol=1e-5)


def test_split_by_reynolds_config():
    res = np.array([100, 200, 800, 100, 800])
    bcs = np.array(["a", "a", "a", "b", "b"])
    cfg = {
        "a": {"train": "ALL_EXCEPT_TEST", "test": [800]},
        "b": {"train": [100], "test": [800]},
    }
    train, test = tr.split_by_reynolds_config(res, bcs, cfg)
    np.testing.assert_array_equal(train, [True, True, False, True, False])
    np.testing.assert_array_equal(test, [False, False, True, False, True])


def test_evaluate_for_re_plot_dir_writes_pngs(tmp_path):
    """evaluate_for_re(plot_dir=...) must render the reference's 4-panel
    comparison PNG per sample (sr-ae-conv.ipynb cell 0,
    plot_superres_comparison inside evaluate_for_re). Regression test for
    the r3 NameError: the plot branch used os.makedirs without importing
    os at module scope (VERDICT r3 weak #1)."""
    rng = np.random.default_rng(0)
    x_lr = rng.normal(size=(2, 10, 10, 1)).astype(np.float32)
    x_hr = rng.normal(size=(2, 20, 20, 1)).astype(np.float32)
    res = np.array([300.0, 300.0])
    comps = np.array(["u", "v"])
    stats = {f"{k}{d}_{c}": (0.0 if k == "mean" else 1.0)
             for k in ("mean", "std") for d in (10, 20) for c in ("u", "v", "p")}
    from sr_for_cfd_tpu.models.autoencoder import SuperResolutionAE
    import jax
    import jax.numpy as jnp

    model = SuperResolutionAE(10, 20, 8)
    params = model.init(jax.random.key(0), jnp.zeros((1, 10, 10, 1), jnp.float32))
    plot_dir = tmp_path / "plots"
    ev = tr.evaluate_for_re(
        300, model, params, x_lr, x_hr, res, comps, stats, 10, 20,
        plot_dir=str(plot_dir), verbose=False,
    )
    assert np.isfinite(ev["avg_mae"])
    for comp in ("u", "v"):
        assert (plot_dir / f"sr_Re300_{comp}.png").exists()


@pytest.mark.slow
def test_sweep_to_training_end_to_end(tmp_path):
    """Mini sweep (3 Re x {10, 20}) -> HDF5 -> loader -> standardize ->
    train -> evaluate on held-out Re -> export/load round-trip."""
    from sr_for_cfd_tpu.workflow.sweep import generate_training_data
    from sr_for_cfd_tpu.sr.inference import SRModel

    combined = generate_training_data(
        reynolds_numbers=[100, 200, 300],
        mesh_sizes=[10, 20],
        output_dir=str(tmp_path / "results"),
        double_lid=True,
        dt=2e-3,
        scheme="UPWIND",
        verbose=False,
        dtype="float64",
        max_iterations=60000,
    )
    x_lr, x_hr, res, comps, bcs = load_paired_reynolds_multi([combined], 10, 20)
    assert len(x_lr) == 9  # 3 Re x 3 components
    assert set(np.unique(res)) == {100, 200, 300}

    cfg = {"double_lid(u_top=1,u_bottom=1)": {"train": "ALL_EXCEPT_TEST",
                                              "test": [300]}}
    train_mask, test_mask = tr.split_by_reynolds_config(res, bcs, cfg)
    assert train_mask.sum() == 6 and test_mask.sum() == 3

    x_lr_n, x_hr_n, stats = tr.standardize_train_test(
        x_lr, x_hr, comps, train_mask, 10, 20
    )
    assert f"mean10_u" in stats and f"std20_p" in stats

    result = tr.train_sr_autoencoder(
        x_lr_n[train_mask], x_hr_n[train_mask], 10, 20,
        epochs=60, batch_size=4, verbose=False,
    )
    assert result.loss_history[-1] < result.loss_history[0]

    ev = tr.evaluate_for_re(
        300, result.model, result.params,
        x_lr_n[test_mask], x_hr_n[test_mask], res[test_mask],
        comps[test_mask], stats, 10, 20, verbose=False,
    )
    assert np.isfinite(ev["avg_mae"])
    assert len(ev["per_sample"]) == 3

    # export + reload as an SRModel and predict
    paths = tr.export_models(result, stats, 10, 20, "testrun",
                             out_dir=str(tmp_path / "models"))
    model = SRModel.from_checkpoint(paths["combined"], 10, 20)
    pred = model.predict(x_lr_n[:1])
    assert pred.shape == (1, 20, 20, 1)
    ref_pred = result.model.apply(result.params, x_lr_n[:1])
    np.testing.assert_allclose(np.asarray(pred), np.asarray(ref_pred), atol=1e-6)
