"""Learned image processing trained on the framework's own simulator.

`cnn` — the DnCNN residual denoiser; `data` — paired-scan dataset
generation (clean / high-dose / Noise2Noise targets); `train` — the
jitted training loop and the HU-scaled inference wrapper;
`denoiser_io` — checkpoint persistence + the vendored production
checkpoint the pipeline runner's ``--denoise`` stage consumes.
"""

from .cnn import DnCNN
from .data import extract_patches, make_training_set, random_anatomy_phantom
from .denoiser_io import (denoise_hu_batch, load_default_denoiser,
                          load_params, save_params)
from .train import HU_SCALE, apply_denoiser, init_denoiser, train_denoiser

__all__ = [
    "DnCNN", "extract_patches", "make_training_set",
    "random_anatomy_phantom", "HU_SCALE", "apply_denoiser",
    "init_denoiser", "train_denoiser", "save_params", "load_params",
    "load_default_denoiser", "denoise_hu_batch",
]
