"""Residual CNN denoiser (the DLIR-class image restorer).

Clinical CT consoles ship learned image reconstruction/denoising
(GE TrueFidelity, Canon AiCE, Siemens-style deep post-filters) trained on
paired low-dose / reference-dose images.  The reference simulator's dose
studies (plots.py:541-717) produce exactly the data such models train on;
this module closes the loop: a compact residual CNN trained end-to-end on
THIS framework's own simulated scan pairs (`learn/data.py`), on the same
device the physics runs on.

Architecture: DnCNN-style plain residual network (Zhang et al. 2017) —
``depth`` 3x3 convolutions with ReLU, predicting the NOISE residual which
is subtracted from the input.  Deliberate choices for this framework:

* **Residual + zero-initialized output conv** — the network is the exact
  identity at initialization (pinned by test), so training starts from
  "no-op" rather than from a destroyed image; convergence is monotone
  from the noisy-input baseline.
* **No normalization layers** — at these widths batch-norm only adds
  train/eval divergence and jit state; plain conv stacks train fine and
  keep inference a pure function of (params, image).
* **NHWC, channels-last** — the TPU conv layout; every conv lowers onto
  the MXU (a 3x3xCxC conv is a [9C, C] matmul over image tiles).
* **Fully convolutional** — train on small patches (default 32²), apply
  to any image size (FBP noise is locally stationary away from the
  object edge; patch training is the standard and it keeps the train
  step small enough to live comfortably in VMEM).

The model is dimensionless: callers normalize (HU / ``scale``) before and
after — see `learn/train.apply_denoiser`.

Beyond-reference: the reference ships no learned processing; this is the
standard clinical companion of its low-dose studies, and the framework's
simulator is the data engine (SURVEY.md §2 C3 dose-study context).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["DnCNN"]


class DnCNN(nn.Module):
    """Plain residual denoiser: ``y = x - f(x)`` with f a conv stack.

    Parameters: ``features`` channels in the hidden convs, ``depth`` total
    conv layers (>= 2).  ~``(depth-2) * 9 * features^2`` weights — the
    default (features=32, depth=6) is ~38k parameters, deliberately small:
    it trains to the FBP-noise floor in minutes on one chip and runs at
    negligible cost next to the reconstruction itself.
    """

    features: int = 32
    depth: int = 6

    @nn.compact
    def __call__(self, x):
        """x: [batch, H, W, 1] normalized images -> denoised, same shape."""
        if x.ndim != 4:
            raise ValueError(f"expected [N, H, W, C] input, got {x.shape}")
        h = nn.relu(nn.Conv(self.features, (3, 3))(x))
        for _ in range(self.depth - 2):
            h = nn.relu(nn.Conv(self.features, (3, 3))(h))
        # zero-init the residual head: exact identity at initialization
        residual = nn.Conv(x.shape[-1], (3, 3),
                           kernel_init=nn.initializers.zeros)(h)
        return (x - residual).astype(jnp.float32)
