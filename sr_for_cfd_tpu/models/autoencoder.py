"""Convolutional super-resolution autoencoder family (Flax).

Re-implements the reference's Keras architectures exactly (sr-ae-conv.ipynb
cell 0: `build_encoder_{10,20,50,80,100,400}` / `build_decoder_*`,
verified against the saved encoder .h5: Keras 3.8.0, silu activations,
HWIO conv kernels). swish == silu. Latent dim 50 by default.

Shape checks (decoder ConvTranspose ladders, VALID k3s2: n -> 2n+1,
VALID k2s2: n -> 2n, SAME s2: n -> 2n):
  dec10 : 5 -> 10                     dec20 : 5 -> 10 -> 20
  dec50 : 3 -> 6 -> 12 -> 25 -> 50    dec80 : 5 -> 10 -> 20 -> 40 -> 80
  dec100: 3 -> 6 -> 12 -> 25 -> 50 -> 100
  dec400: 12 -> 25 -> 50 -> 100 -> 200 -> 400
All are NHWC with a single channel; inference batches are (N, res, res, 1).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

LATENT_DIM = 50

# (filters, kernel, stride) conv ladder per input resolution
ENCODER_SPECS = {
    10: ((64, 3, 2), (128, 3, 1)),
    20: ((64, 3, 2), (128, 3, 2)),
    50: ((64, 3, 2), (128, 3, 2), (256, 3, 2), (512, 3, 2)),
    80: ((32, 3, 2), (64, 3, 2), (128, 3, 2), (256, 3, 2)),
    100: ((32, 3, 2), (64, 3, 2), (128, 3, 2), (256, 3, 2), (512, 3, 2)),
    400: ((16, 3, 2), (32, 3, 2), (64, 3, 2), (128, 3, 2), (256, 3, 2)),
}

# (reshape HWC, ((filters, kernel, stride, padding), ...)) per output res
DECODER_SPECS = {
    10: ((5, 5, 128), ((64, 3, 2, "SAME"),)),
    20: ((5, 5, 128), ((64, 3, 2, "SAME"), (32, 3, 2, "SAME"))),
    50: (
        (3, 3, 512),
        ((256, 3, 2, "SAME"), (128, 3, 2, "SAME"),
         (64, 3, 2, "VALID"), (32, 2, 2, "VALID")),
    ),
    80: (
        (5, 5, 256),
        ((128, 3, 2, "SAME"), (64, 3, 2, "SAME"),
         (32, 3, 2, "SAME"), (16, 3, 2, "SAME")),
    ),
    100: (
        (3, 3, 512),
        ((256, 3, 2, "SAME"), (128, 3, 2, "SAME"), (64, 3, 2, "VALID"),
         (32, 2, 2, "VALID"), (16, 2, 2, "VALID")),
    ),
    400: (
        (12, 12, 256),
        ((128, 3, 2, "VALID"), (64, 2, 2, "VALID"), (32, 2, 2, "VALID"),
         (16, 2, 2, "VALID"), (8, 2, 2, "VALID")),
    ),
}

RESOLUTIONS = tuple(sorted(ENCODER_SPECS))


class Encoder(nn.Module):
    """Conv ladder -> Flatten -> Dense(128, swish) -> Dense(latent, linear).
    Layer names match the Keras weight groups (conv2d, conv2d_1, ...,
    dense, latent_vector) so imported checkpoints line up."""

    resolution: int
    latent_dim: int = LATENT_DIM

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for idx, (filters, kernel, stride) in enumerate(ENCODER_SPECS[self.resolution]):
            name = "conv2d" if idx == 0 else f"conv2d_{idx}"
            x = nn.Conv(
                filters, (kernel, kernel), strides=(stride, stride),
                padding="SAME", name=name,
            )(x)
            x = nn.swish(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.swish(nn.Dense(128, name="dense")(x))
        return nn.Dense(self.latent_dim, name="latent_vector")(x)


class Decoder(nn.Module):
    """Dense -> Reshape -> ConvTranspose ladder (swish) -> Conv(1, 3, SAME,
    linear)."""

    resolution: int
    latent_dim: int = LATENT_DIM

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        shape, ladder = DECODER_SPECS[self.resolution]
        h, w, c = shape
        x = nn.swish(nn.Dense(h * w * c, name="dense")(z))
        x = x.reshape((x.shape[0], h, w, c))
        for idx, (filters, kernel, stride, padding) in enumerate(ladder):
            x = nn.ConvTranspose(
                filters, (kernel, kernel), strides=(stride, stride),
                padding=padding, name=f"conv_transpose_{idx}",
            )(x)
            x = nn.swish(x)
        x = nn.Conv(1, (3, 3), padding="SAME", name="output_conv")(x)
        return x


class SuperResolutionAE(nn.Module):
    """decoder_hr(encoder_lr(x)): LR field in, HR field out
    (reference `SuperResolutionAE`, sr-ae-conv.ipynb cell 0 /
    `PyCFD_ML_accelerated.py:676-689`)."""

    lr_resolution: int
    hr_resolution: int
    latent_dim: int = LATENT_DIM

    def setup(self):
        for res in (self.lr_resolution, self.hr_resolution):
            if res not in ENCODER_SPECS:
                raise ValueError(
                    f"No architecture spec for resolution {res}; "
                    f"available: {RESOLUTIONS}"
                )
        self.encoder_lr = Encoder(self.lr_resolution, self.latent_dim)
        self.decoder_hr = Decoder(self.hr_resolution, self.latent_dim)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decoder_hr(self.encoder_lr(x))

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encoder_lr(x)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder_hr(z)


def build_encoder(resolution: int, latent_dim: int = LATENT_DIM) -> Encoder:
    if resolution not in ENCODER_SPECS:
        raise ValueError(f"No encoder spec for resolution {resolution}; "
                         f"available: {RESOLUTIONS}")
    return Encoder(resolution, latent_dim)


def build_decoder(resolution: int, latent_dim: int = LATENT_DIM) -> Decoder:
    if resolution not in DECODER_SPECS:
        raise ValueError(f"No decoder spec for resolution {resolution}; "
                         f"available: {RESOLUTIONS}")
    return Decoder(resolution, latent_dim)


def param_count(params) -> int:
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(params))
