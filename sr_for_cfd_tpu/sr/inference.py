"""ML super-resolution inference: the coarse -> fine field upsampling stage.

TPU-native rebuild of the reference's `ml_super_resolution`
(`PyCFD_ML_accelerated.py:764-879`; BFS variant with aspect-ratio correction
and adaptive normalization `bfs_ml_accelerated.py:979-1137`). The whole
per-component pipeline - (optional rect->square resample) -> standardize ->
encoder/decoder -> inverse-standardize -> (optional square->rect resample) -
is one jitted function; all three components run as a single batch of 3
through the network, and nothing round-trips to the host between stages.

Aspect-ratio correction comes in two modes (`aspect_mode`): 'identity'
(default) feeds the square-array fields directly to the model -
mathematically a coordinate relabeling, fully on-device; 'extrapolate'
reproduces the reference's SciPy spline remap with its out-of-domain
extrapolation exactly (`bfs_ml_accelerated.py:59-145`; see sr/resample.py
for why that convention extrapolates ~70% of the BFS square).

A `BicubicSR` fallback model makes the hybrid workflow runnable before any
AE is trained (the decoder weights are missing from the reference snapshot,
SURVEY.md section 0).
"""

from __future__ import annotations

import dataclasses
import itertools
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.autoencoder import LATENT_DIM, SuperResolutionAE
from ..models.standardize import (
    COMPONENTS,
    STD_FLOOR,
    component_stats,
    read_stats_file,
)


_model_counter = itertools.count()
# (model.cache_key, static config) -> jitted SR core; models are few and
# long-lived, so this stays tiny while letting repeated SR calls reuse the
# compiled pipeline instead of re-tracing per call
_CORE_CACHE_MAX = 8
_CORE_CACHE: Dict = {}


def _file_key(kind: str, *paths: str):
    """(kind, (abspath, mtime_ns)...): same artifact on disk -> same key
    -> jitted-pipeline cache hit; a rewritten file changes mtime_ns and
    misses."""
    import os

    return (kind,) + tuple(
        (os.path.abspath(p), os.stat(p).st_mtime_ns) for p in paths
    )


@dataclasses.dataclass
class SRModel:
    """A bundled apply-function + params for LR->HR prediction of a single
    (N, lr, lr, 1) batch -> (N, hr, hr, 1).

    Treat `params` as IMMUTABLE: the jitted SR pipeline cache keys on
    `cache_key` and bakes the params in as compile-time constants, so an
    in-place `model.params = new` would silently serve stale weights.
    Swap weights with `dataclasses.replace(model, params=new)` (fresh
    cache key) instead."""

    lr_dim: int
    hr_dim: int
    params: Dict
    module: SuperResolutionAE
    # hashable identity for the jitted-pipeline cache. Fresh in-memory
    # models get a unique counter; file-backed constructors override it
    # with (path, mtime) so re-loading the same artifact HITS the cache
    # (a sweep of hybrid runs previously recompiled the SR pipeline every
    # run because each construction minted a new key).
    cache_key: object = dataclasses.field(
        default_factory=lambda: next(_model_counter))

    @classmethod
    def create(cls, lr_dim: int, hr_dim: int, params: Optional[Dict] = None,
               latent_dim: int = LATENT_DIM, rng_seed: int = 0) -> "SRModel":
        module = SuperResolutionAE(lr_dim, hr_dim, latent_dim)
        if params is None:
            params = module.init(
                jax.random.key(rng_seed), jnp.zeros((1, lr_dim, lr_dim, 1))
            )
        return cls(lr_dim=lr_dim, hr_dim=hr_dim, params=params, module=module)

    @classmethod
    def from_checkpoint(cls, path: str, lr_dim: int, hr_dim: int,
                        latent_dim: int = LATENT_DIM) -> "SRModel":
        from ..io.checkpoint import load_params

        model = cls.create(lr_dim, hr_dim, latent_dim=latent_dim)
        params = load_params(path, model.params)
        return dataclasses.replace(
            model, params=params, cache_key=_file_key("ckpt", path))

    @classmethod
    def from_parts(cls, encoder_file: str, decoder_file: str,
                   lr_dim: int, hr_dim: int,
                   latent_dim: int = LATENT_DIM) -> "SRModel":
        """Assemble from split encoder/decoder checkpoints - the
        reference's artifact convention (`PyCFD_ML_accelerated.py:831-833`
        loads BOTH encoder and decoder from .h5). .msgpack parts are our
        native exports; .h5 parts are Keras checkpoints (the reference's
        surviving encoders, or our own `keras_export` output - the
        ConvTranspose flip+swap is inverted on import)."""
        from ..io.checkpoint import load_params

        model = cls.create(lr_dim, hr_dim, latent_dim=latent_dim)
        params = dict(model.params["params"])
        if encoder_file.endswith(".h5"):
            from ..models.keras_import import load_keras_encoder_params

            params["encoder_lr"] = load_keras_encoder_params(encoder_file)["params"]
        else:
            params["encoder_lr"] = load_params(
                encoder_file, {"params": params["encoder_lr"]}
            )["params"]
        if decoder_file.endswith(".h5"):
            from ..models.keras_import import load_keras_decoder_params

            params["decoder_hr"] = load_keras_decoder_params(decoder_file)["params"]
        else:
            params["decoder_hr"] = load_params(
                decoder_file, {"params": params["decoder_hr"]}
            )["params"]
        return dataclasses.replace(
            model, params={"params": params},
            cache_key=_file_key("parts", encoder_file, decoder_file))

    @classmethod
    def from_combined_h5(cls, path: str, lr_dim: int, hr_dim: int,
                         latent_dim: int = LATENT_DIM) -> "SRModel":
        """Load a combined `superresolution{lr}to{hr}_*.h5` artifact (the
        reference's third export, `sr-ae-conv.ipynb` export cell)."""
        from ..models.keras_import import load_keras_combined_params

        model = cls.create(lr_dim, hr_dim, latent_dim=latent_dim)
        return dataclasses.replace(
            model, params=load_keras_combined_params(path),
            cache_key=_file_key("combined", path),
        )

    def predict(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.module.apply(self.params, x)


class BicubicSR:
    """Weightless fallback: bicubic upsample LR -> HR in standardized space.
    Keeps the hybrid pipeline testable/runnable without trained weights."""

    def __init__(self, lr_dim: int, hr_dim: int):
        self.lr_dim, self.hr_dim = lr_dim, hr_dim
        self.params = None
        # weightless and deterministic: every instance is interchangeable
        self.cache_key = ("bicubic", lr_dim, hr_dim)

    def predict(self, x: jnp.ndarray) -> jnp.ndarray:
        n = x.shape[0]
        return jax.image.resize(
            x, (n, self.hr_dim, self.hr_dim, 1), method="cubic"
        )


def resize_cubic(field: jnp.ndarray, shape) -> jnp.ndarray:
    return jax.image.resize(field, shape, method="cubic")


def _sr_core(
    x_lr: jnp.ndarray,  # (3, src_ny, src_nx) raw fields, component order u,v,p
    mean_lr: jnp.ndarray,  # (3,)
    std_lr: jnp.ndarray,
    mean_hr: jnp.ndarray,
    std_hr: jnp.ndarray,
    predict_fn,
    lr_dim: int,
    hr_dim: int,
    out_shape,  # (ny, nx) of the returned fields
    aspect_correct: bool,
    blend_factor: float,
    adaptive: bool,
):
    """Fused SR pipeline on-device; returns (3, out_ny, out_nx)."""
    x = x_lr
    if aspect_correct:
        x = resize_cubic(x, (3, lr_dim, lr_dim))
    if adaptive:
        in_mean = jnp.mean(x, axis=(1, 2))
        in_std = jnp.std(x, axis=(1, 2))
        mean_lr = (1 - blend_factor) * mean_lr + blend_factor * in_mean
        std_lr = (1 - blend_factor) * std_lr + blend_factor * jnp.maximum(
            in_std, STD_FLOOR
        )
    # floor TINY stds too, not just exact zeros (matches the host-side
    # standardize_with_stats flooring, models/standardize.py): a stats file
    # with a ~1e-20 std would otherwise blow standardized values to ~1e19 -
    # finite garbage the final nan_to_num scrub cannot catch
    std_lr = jnp.maximum(jnp.abs(std_lr), STD_FLOOR)
    std_hr = jnp.maximum(jnp.abs(std_hr), STD_FLOOR)
    x_norm = (x - mean_lr[:, None, None]) / std_lr[:, None, None]
    pred = predict_fn(x_norm[..., None])[..., 0]  # (3, hr, hr)
    pred = pred * std_hr[:, None, None] + mean_hr[:, None, None]
    if pred.shape[1:] != tuple(out_shape):
        # rectangular fine grids: resample the square model output to the
        # requested (ny, nx) regardless of the aspect-correction mode
        pred = resize_cubic(pred, (3,) + tuple(out_shape))
    # NaN/Inf scrub (reference replaces with zeros to protect the solver,
    # `PyCFD_ML_accelerated.py:869-876`)
    pred = jnp.nan_to_num(pred, nan=0.0, posinf=0.0, neginf=0.0)
    return pred


def ml_super_resolution(
    coarse_fields: Dict[str, np.ndarray],
    lr_dim: int,
    hr_dim: int,
    stats_file: Optional[str] = None,
    model=None,
    stats: Optional[Dict[str, float]] = None,
    use_aspect_ratio_correction: bool = False,
    lx: float = 1.0,
    ly: float = 1.0,
    use_adaptive_normalization: bool = False,
    blend_factor: float = 0.3,
    out_shape=None,
    aspect_mode: str = "identity",
    verbose: bool = True,
) -> Dict[str, np.ndarray]:
    """Super-resolve {u, v, p} coarse fields to {u, v, p} fine fields.

    Reference-compatible options: `use_aspect_ratio_correction` resamples
    rectangular-domain fields to square before the model and back after
    (active only when lx != ly, as in the reference); adaptive
    normalization blends training stats with input stats.

    `model` is an SRModel (trained) or BicubicSR (fallback); `stats` may be
    passed directly instead of `stats_file`.
    """
    if stats is None:
        if stats_file is None:
            raise ValueError("need stats_file or stats")
        stats = read_stats_file(stats_file)
    stats_lr = component_stats(stats, lr_dim)
    stats_hr = component_stats(stats, hr_dim)
    if model is None:
        model = BicubicSR(lr_dim, hr_dim)

    aspect = bool(use_aspect_ratio_correction and (lx != ly))
    # 'extrapolate' reproduces the reference's spline coordinate remap on
    # host (sr/resample.py); 'identity' (default) feeds the square arrays
    # directly and stays on device.
    if aspect and aspect_mode == "extrapolate":
        from .resample import rect_to_square

        coarse_fields = rect_to_square(
            {c: np.asarray(coarse_fields[c]) for c in COMPONENTS}, lx, ly
        )
    src = np.stack([np.asarray(coarse_fields[c], np.float32) for c in COMPONENTS])
    if out_shape is None:
        out_shape = (hr_dim, hr_dim)

    if verbose:
        print(f"ML Super-Resolution ({lr_dim}x{lr_dim} -> {hr_dim}x{hr_dim})"
              f" | aspect_correction={'ON' if aspect else 'OFF'}"
              f" | adaptive_norm={'ON' if use_adaptive_normalization else 'OFF'}")

    mean_lr = jnp.asarray([stats_lr[c][0] for c in COMPONENTS], jnp.float32)
    std_lr = jnp.asarray([stats_lr[c][1] for c in COMPONENTS], jnp.float32)
    mean_hr = jnp.asarray([stats_hr[c][0] for c in COMPONENTS], jnp.float32)
    std_hr = jnp.asarray([stats_hr[c][1] for c in COMPONENTS], jnp.float32)

    static = (
        getattr(model, "cache_key", id(model)), lr_dim, hr_dim,
        tuple(out_shape), aspect and aspect_mode != "extrapolate",
        blend_factor, use_adaptive_normalization,
    )
    if static not in _CORE_CACHE:
        while len(_CORE_CACHE) >= _CORE_CACHE_MAX:  # bounded: drop oldest
            _CORE_CACHE.pop(next(iter(_CORE_CACHE)))
        # the entry holds a strong reference to `model`, so an id()-based
        # key can never alias a garbage-collected model's address while
        # its cached pipeline is alive
        _CORE_CACHE[static] = (model, jax.jit(partial(
            _sr_core,
            predict_fn=model.predict,
            lr_dim=lr_dim,
            hr_dim=hr_dim,
            out_shape=tuple(out_shape),
            aspect_correct=aspect and aspect_mode != "extrapolate",
            blend_factor=blend_factor,
            adaptive=use_adaptive_normalization,
        )))
    else:
        # LRU, not FIFO: refresh recency on hit so a workload alternating
        # more than _CORE_CACHE_MAX model/config combos evicts the coldest
        # pipeline instead of potentially the hottest
        _CORE_CACHE[static] = _CORE_CACHE.pop(static)
    pred = _CORE_CACHE[static][1](jnp.asarray(src), mean_lr, std_lr, mean_hr, std_hr)
    pred = np.asarray(pred)

    hr_fields = {c: pred[i] for i, c in enumerate(COMPONENTS)}
    if aspect and aspect_mode == "extrapolate":
        from .resample import square_to_rect

        hr_fields = square_to_rect(hr_fields, lx, ly)
        hr_fields = {
            c: np.nan_to_num(v, nan=0.0, posinf=0.0, neginf=0.0).astype(np.float32)
            for c, v in hr_fields.items()
        }
    if verbose:
        for c in COMPONENTS:
            print(f"  {c.upper()}: {coarse_fields[c].shape} -> "
                  f"{hr_fields[c].shape}, range [{hr_fields[c].min():.6f}, "
                  f"{hr_fields[c].max():.6f}]")
    return hr_fields
