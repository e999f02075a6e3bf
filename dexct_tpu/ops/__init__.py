"""Core compute ops: projection, spectral forward, FBP, decomposition,
beam-hardening correction."""

from . import (
    bhc,
    fbp,
    fbp_fast,
    filters,
    fourier,
    matdecomp,
    siddon,
    siddon_fast,
    spectral,
)

__all__ = [
    "siddon",
    "siddon_fast",
    "fourier",
    "spectral",
    "fbp",
    "fbp_fast",
    "filters",
    "matdecomp",
    "bhc",
]
