"""Persistence + product integration for the learned denoiser.

Round-5 VERDICT item 6: `learn/` had real TPU numbers but connected to
nothing.  This module gives the trained DnCNN a product surface:

* :func:`save_params` / :func:`load_params` — flax param pytrees as
  flat ``.npz`` archives (path-keyed; architecture meta embedded);
* :func:`load_default_denoiser` — the vendored production checkpoint
  (``learn/weights/dncnn_default.npz``, trained by
  ``tools/train_default_denoiser.py`` at the round-4 bench scale:
  DLIR-class DnCNN features=48 depth=8 on simulated anatomy at 10x
  dose reduction), cached per process;
* :func:`denoise_hu_batch` — batched inference on a stack of HU
  images in ONE device program (one fence), the shape the pipeline
  runner writes through the §2.6 contract extension
  (``recon_denoised_{raw,HU}_float32.bin``).
"""

from __future__ import annotations

import os

import jax
import numpy as np

__all__ = ["save_params", "load_params", "load_default_denoiser",
           "default_weights_path", "denoise_hu_batch"]

_META_PREFIX = "__meta_"
_CACHE = {}


def _flatten(params):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return {jax.tree_util.keystr(path): leaf for path, leaf in flat}


def save_params(path, params, *, features, depth):
    """Write a flax param pytree + architecture meta as one .npz."""
    arrs = {k: np.asarray(v) for k, v in _flatten(params).items()}
    arrs[_META_PREFIX + "features"] = np.asarray(int(features))
    arrs[_META_PREFIX + "depth"] = np.asarray(int(depth))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrs)


def load_params(path):
    """Load a checkpoint -> (model, params) ready for apply/denoise."""
    from .train import init_denoiser

    with np.load(path) as z:
        feats = int(z[_META_PREFIX + "features"])
        depth = int(z[_META_PREFIX + "depth"])
        stored = {k: z[k] for k in z.files
                  if not k.startswith(_META_PREFIX)}
    model, params0 = init_denoiser(jax.random.PRNGKey(0),
                                   features=feats, depth=depth)
    flat0, treedef = jax.tree_util.tree_flatten_with_path(params0)
    leaves = []
    for pathk, leaf in flat0:
        key = jax.tree_util.keystr(pathk)
        if key not in stored:
            raise ValueError(f"checkpoint {path} is missing {key}")
        arr = stored[key]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"checkpoint {path}: {key} has shape {arr.shape}, "
                f"model expects {leaf.shape}")
        leaves.append(arr)
    return model, jax.tree_util.tree_unflatten(treedef, leaves)


def default_weights_path():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "weights", "dncnn_default.npz")


def load_default_denoiser():
    """The vendored production checkpoint, cached per process."""
    path = default_weights_path()
    if path not in _CACHE:
        _CACHE[path] = load_params(path)
    return _CACHE[path]


def denoise_hu_batch(images_hu, *, model=None, params=None):
    """Denoise a [B, H, W] (or [H, W]) HU stack in one device program.

    Uses the vendored default checkpoint unless (model, params) are
    given.  Batching matters on the tunnel: each host fetch costs
    ~25-30 ms, so the runner denoises every image of a DE pair (and
    every slice of a volume) in ONE call.
    """
    from .train import apply_denoiser

    if model is None or params is None:
        model, params = load_default_denoiser()
    return np.asarray(apply_denoiser(model, params,
                                     np.asarray(images_hu, np.float32)))
