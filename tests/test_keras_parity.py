"""Numerical parity of the Flax encoder vs TF/Keras on the reference's
trained encoder weights (requires tensorflow; skipped otherwise)."""

import os

import numpy as np
import pytest

REFERENCE_ENCODER = (
    "/root/reference/vanilla_encoder10_to_400_swish_trained_upto_700_multiBC.h5"
)


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.exists(REFERENCE_ENCODER), reason="reference weights absent"
)
def test_flax_encoder_matches_tf(rng):
    tf = pytest.importorskip("tensorflow")
    import jax.numpy as jnp

    from sr_for_cfd_tpu.models.autoencoder import build_encoder
    from sr_for_cfd_tpu.models.keras_import import load_keras_encoder_params

    x = rng.standard_normal((5, 10, 10, 1)).astype(np.float32)
    variables = load_keras_encoder_params(REFERENCE_ENCODER)
    z_flax = np.asarray(build_encoder(10).apply(variables, jnp.asarray(x)))
    model = tf.keras.models.load_model(REFERENCE_ENCODER, compile=False)
    z_tf = model.predict(x, verbose=0)
    np.testing.assert_allclose(z_flax, z_tf, atol=5e-6)
