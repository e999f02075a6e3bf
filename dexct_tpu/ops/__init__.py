"""Core compute ops: projection, spectral forward, FBP, decomposition."""

from . import fbp, filters, matdecomp, siddon, spectral

__all__ = ["siddon", "spectral", "fbp", "filters", "matdecomp"]
