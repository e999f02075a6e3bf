"""Learned image processing trained on the framework's own simulator.

`cnn` — the DnCNN residual denoiser; `data` — paired-scan dataset
generation (clean / high-dose / Noise2Noise targets); `train` — the
jitted training loop and the HU-scaled inference wrapper.
"""

from .cnn import DnCNN
from .data import extract_patches, make_training_set, random_anatomy_phantom
from .train import HU_SCALE, apply_denoiser, init_denoiser, train_denoiser

__all__ = [
    "DnCNN", "extract_patches", "make_training_set",
    "random_anatomy_phantom", "HU_SCALE", "apply_denoiser",
    "init_denoiser", "train_denoiser",
]
