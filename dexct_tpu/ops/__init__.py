"""Core compute ops: projection, spectral forward, FBP, decomposition,
beam-hardening correction, cone-beam/helical 3-D, iterative recon."""

from . import (
    bhc,
    conebeam,
    fbp,
    fbp_fast,
    filters,
    ffs,
    fourier,
    helical_pi,
    iterative,
    katsevich,
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
    "conebeam",
    "ffs",
    "helical_pi",
    "iterative",
    "katsevich",
]
