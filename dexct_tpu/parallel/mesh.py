"""Device mesh construction for multi-chip scale-out.

The reference has no distributed execution (SURVEY.md §2.7); its implicit
parallel axes become explicit mesh axes here:

* ``views``  — the sinogram view axis, sharded over ICI.  Projection,
  spectral forward, decomposition, and filtering are all view-local; the
  only collective is the psum of backprojection partial images (the
  ring-accumulation analog noted in SURVEY.md §5).
* ``sweep``  — embarrassingly parallel parameter sweeps (dose/ramp/
  phantom), suited to DCN sharding across pods.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "view_mesh"]


def make_mesh(axis_sizes=None, axis_names=None, devices=None):
    """Build a Mesh.  Default: all devices on one ``views`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_names is None:
        axis_names = ("views",)
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    if int(np.prod(axis_sizes)) != len(devices):
        raise ValueError(
            f"axis sizes {axis_sizes} do not cover {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(axis_sizes)
    return Mesh(arr, axis_names)


def view_mesh(n=None):
    """A 1-D ``views`` mesh over n (default: all) devices."""
    devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return make_mesh((len(devices),), ("views",), devices)
