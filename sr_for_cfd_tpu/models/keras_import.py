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


def _read_layer_weights(group) -> Dict[str, Dict[str, np.ndarray]]:
    """Flatten one legacy-HDF5 `model_weights`-style group into
    {layer_name: {kernel, bias}} (Keras nests <layer>/<layer>/...)."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for layer_name in group:
        grp = group[layer_name]
        inner = grp[layer_name] if layer_name in grp else grp
        entry = {}
        if "kernel" in inner:
            entry["kernel"] = np.array(inner["kernel"])
        if "bias" in inner:
            entry["bias"] = np.array(inner["bias"])
        if entry:
            out[layer_name] = entry
    return out


def _decoder_tree_from_layers(
    layers: Dict[str, Dict[str, np.ndarray]], path: str
) -> Dict:
    """Map Keras decoder layer weights onto the Flax Decoder param tree.

    Robust to layer naming (the reference notebook used Keras auto-names;
    our exports name layers explicitly): layers are classified by weight
    structure - the 2-D kernel is the latent Dense, 4-D kernels named
    *transpose* are the ConvTranspose ladder (kernel = spatial flip +
    in/out swap of the Flax kernel, inverted here - the exact inverse of
    `keras_export._conv_t_kernel`), and the remaining 4-D kernel is the
    final output conv."""
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    transpose_names = sorted(
        n for n, e in layers.items()
        if "kernel" in e and e["kernel"].ndim == 4 and "transpose" in n
    )
    dense_names = [n for n, e in layers.items()
                   if "kernel" in e and e["kernel"].ndim == 2]
    out_names = [n for n, e in layers.items()
                 if "kernel" in e and e["kernel"].ndim == 4
                 and "transpose" not in n]
    if len(dense_names) != 1 or len(out_names) != 1 or not transpose_names:
        raise ValueError(
            f"{path} does not look like a decoder checkpoint: "
            f"dense={dense_names}, convT={transpose_names}, out={out_names}"
        )
    d = layers[dense_names[0]]
    params["dense"] = {"kernel": jnp.asarray(d["kernel"]),
                       "bias": jnp.asarray(d["bias"])}
    for idx, name in enumerate(transpose_names):
        e = layers[name]
        # Keras Conv2DTranspose kernel (kh, kw, out, in) -> Flax
        # nn.ConvTranspose (kh, kw, in, out), spatially flipped back
        k = np.flip(e["kernel"], axis=(0, 1)).transpose(0, 1, 3, 2)
        params[f"conv_transpose_{idx}"] = {
            "kernel": jnp.asarray(k), "bias": jnp.asarray(e["bias"]),
        }
    o = layers[out_names[0]]
    params["output_conv"] = {"kernel": jnp.asarray(o["kernel"]),
                             "bias": jnp.asarray(o["bias"])}
    return {"params": params}


def load_keras_decoder_params(path: str) -> Dict:
    """Read a Keras decoder .h5 into a Flax `params` tree for
    `models.autoencoder.Decoder` - the inverse of
    `keras_export.export_decoder_h5`, closing the artifact round trip the
    reference's inference shell relies on (`PyCFD_ML_accelerated.py:
    831-833` loads BOTH encoder and decoder from .h5)."""
    with h5py.File(path, "r") as f:
        if "model_weights" not in f:
            raise ValueError(
                f"{path} has no 'model_weights' group - not a legacy-HDF5 "
                "Keras checkpoint"
            )
        layers = _read_layer_weights(f["model_weights"])
    return _decoder_tree_from_layers(layers, path)


def load_keras_combined_params(path: str) -> Dict:
    """Read a combined `superresolution*.h5` (encoder + decoder submodels,
    the reference's third export artifact - `sr-ae-conv.ipynb` export cell)
    into a full SuperResolutionAE variables tree."""
    with h5py.File(path, "r") as f:
        if "model_weights" not in f:
            raise ValueError(
                f"{path} has no 'model_weights' group - not a legacy-HDF5 "
                "Keras checkpoint"
            )
        mw = f["model_weights"]
        enc_groups = [n for n in mw if n.startswith("encoder")]
        dec_groups = [n for n in mw if n.startswith("decoder")]
        if len(enc_groups) != 1 or len(dec_groups) != 1:
            raise ValueError(
                f"{path}: expected one encoder_* and one decoder_* "
                f"submodel, found {sorted(mw)}"
            )
        enc_layers = _read_layer_weights(mw[enc_groups[0]])
        dec_layers = _read_layer_weights(mw[dec_groups[0]])
    encoder = {
        name: {k: jnp.asarray(v) for k, v in entry.items()}
        for name, entry in enc_layers.items()
    }
    decoder = _decoder_tree_from_layers(dec_layers, path)["params"]
    return {"params": {"encoder_lr": encoder, "decoder_hr": decoder}}


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
