"""Import the reference's surviving Keras .h5 encoder weights into Flax.

The snapshot keeps three trained encoder files
(`vanilla_encoder10_to_400_*.h5`, Keras 3.8.0 legacy-HDF5 layout:
`model_weights/<layer>/<layer>/{kernel,bias}`); the decoders were stripped
(`.MISSING_LARGE_BLOBS`), so decoders must be retrained - but an imported
encoder pins the latent space and lets us verify architectural parity
numerically against TF when available.

Keras and Flax both use HWIO conv kernels and (in, out) dense kernels in
NHWC, so the import is a straight copy; only layer naming differs, and our
Encoder modules reuse the Keras names (conv2d, conv2d_1, ..., dense,
latent_vector).
"""

from __future__ import annotations

from typing import Dict

import h5py
import jax.numpy as jnp
import numpy as np


def load_keras_encoder_params(path: str) -> Dict:
    """Read a reference encoder .h5 into a Flax `params` tree for
    `models.autoencoder.Encoder` (same layer names)."""
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    with h5py.File(path, "r") as f:
        if "model_weights" not in f:
            raise ValueError(
                f"{path} has no 'model_weights' group - not a legacy-HDF5 "
                "Keras checkpoint"
            )
        mw = f["model_weights"]
        for layer_name in mw:
            grp = mw[layer_name]
            # Keras nests <layer>/<layer>/{kernel,bias}
            inner = grp[layer_name] if layer_name in grp else grp
            entry = {}
            if "kernel" in inner:
                entry["kernel"] = jnp.asarray(np.array(inner["kernel"]))
            if "bias" in inner:
                entry["bias"] = jnp.asarray(np.array(inner["bias"]))
            if entry:
                params[layer_name] = entry
    if not params:
        raise ValueError(f"No weight tensors found in {path}")
    return {"params": params}


def validate_encoder_params(variables: Dict, resolution: int, latent_dim: int = 50) -> None:
    """Shape-check an imported tree against the Encoder architecture."""
    from .autoencoder import ENCODER_SPECS

    params = variables["params"]
    for idx, (filters, kernel, _) in enumerate(ENCODER_SPECS[resolution]):
        name = "conv2d" if idx == 0 else f"conv2d_{idx}"
        k = params[name]["kernel"]
        if k.shape[:2] != (kernel, kernel) or k.shape[3] != filters:
            raise ValueError(
                f"{name}: expected ({kernel},{kernel},?,{filters}), got {k.shape}"
            )
    lv = params["latent_vector"]["kernel"]
    if lv.shape[1] != latent_dim:
        raise ValueError(f"latent_vector: expected (*, {latent_dim}), got {lv.shape}")
