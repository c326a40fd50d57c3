"""SR model family tests: shapes, Keras weight import, standardization."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr_for_cfd_tpu.models.autoencoder import (
    RESOLUTIONS,
    SuperResolutionAE,
    build_decoder,
    build_encoder,
)
from sr_for_cfd_tpu.models import standardize as stz

REFERENCE_ENCODER = (
    "/root/reference/vanilla_encoder10_to_400_swish_trained_upto_700_multiBC.h5"
)


@pytest.mark.parametrize("res", RESOLUTIONS)
def test_encoder_decoder_shapes(res):
    enc, dec = build_encoder(res), build_decoder(res)
    x = jnp.zeros((2, res, res, 1), jnp.float32)
    pe = enc.init(jax.random.key(0), x)
    z = enc.apply(pe, x)
    assert z.shape == (2, 50)
    pd = dec.init(jax.random.key(1), z)
    y = dec.apply(pd, z)
    assert y.shape == (2, res, res, 1)


def test_sr_ae_10_to_400():
    ae = SuperResolutionAE(10, 400)
    x = jnp.zeros((1, 10, 10, 1), jnp.float32)
    params = ae.init(jax.random.key(0), x)
    y = ae.apply(params, x)
    assert y.shape == (1, 400, 400, 1)


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_ENCODER), reason="reference weights absent"
)
def test_keras_encoder_import(rng):
    """Imported reference encoder weights produce finite, non-degenerate
    latents through the Flax encoder (numerical parity vs TF is checked in
    test_keras_parity.py, which requires tensorflow)."""
    from sr_for_cfd_tpu.models.keras_import import (
        load_keras_encoder_params,
        validate_encoder_params,
    )

    variables = load_keras_encoder_params(REFERENCE_ENCODER)
    validate_encoder_params(variables, 10)
    x = rng.standard_normal((4, 10, 10, 1)).astype(np.float32)
    z = build_encoder(10).apply(variables, jnp.asarray(x))
    assert z.shape == (4, 50)
    assert np.all(np.isfinite(z))
    assert np.std(np.asarray(z)) > 1e-3


def test_standardize_roundtrip(rng):
    x = rng.standard_normal((50, 10, 10)).astype(np.float32) * 3 + 1.5
    norm, mean, std = stz.dataset_standardize(x)
    back = stz.inverse_standardize(norm, mean, std)
    np.testing.assert_allclose(back, x, rtol=1e-5)
    # zero-std floor does not divide by zero
    const = np.ones((4, 4))
    out = stz.standardize_with_stats(const, 1.0, 0.0)
    assert np.all(np.isfinite(out))


def test_stats_file_roundtrip(tmp_path, rng):
    x = rng.standard_normal((6, 10, 10))
    comps = np.array(["u", "u", "v", "v", "p", "p"])
    stats = stz.compute_component_stats(x, comps, 10)
    stats.update(stz.compute_component_stats(x, comps, 400))
    path = str(tmp_path / "stats.txt")
    stz.write_stats_file(path, stats)
    loaded = stz.read_stats_file(path)
    assert loaded == pytest.approx(stats)
    cs = stz.component_stats(loaded, 10)
    assert set(cs) == {"u", "v", "p"}
    with pytest.raises(KeyError):
        stz.component_stats(loaded, 99)


def test_reference_stats_file_parses():
    path = (
        "/root/reference/standardization_stats_10to400_swish_trained_upto_700"
        "_multiBC.txt"
    )
    if not os.path.exists(path):
        pytest.skip("reference stats absent")
    stats = stz.read_stats_file(path)
    lr = stz.component_stats(stats, 10)
    hr = stz.component_stats(stats, 400)
    assert lr["u"][1] == pytest.approx(0.23378464769154605)
    assert hr["p"][0] == pytest.approx(-0.0253221584603988)


def test_adaptive_blend():
    field = np.full((10, 10), 5.0)
    mean, std = stz.adaptive_blend(1.0, 2.0, field, 0.3)
    assert mean == pytest.approx(0.7 * 1.0 + 0.3 * 5.0)
    assert std == pytest.approx(0.7 * 2.0 + 0.3 * stz.STD_FLOOR)
