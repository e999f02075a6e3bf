"""Detector/source MTF realism: finite focal spot blur, channel
crosstalk, and Wiener restoration.

The reference's rays are infinitely thin lines from a point source
(xtomosim geometry, SURVEY §2.1 C4).  Two hardware blurs dominate a
real scanner's in-plane MTF besides the sampling itself:

* **Finite focal spot** — the anode spot has ~0.5-1.2 mm extent; each
  detector cell sees the object through a penumbra.  In the sinogram
  the effect is (to first order, for an object near isocenter) a
  channel-axis convolution whose width is the spot size scaled by the
  magnification ratio ``(SDD - SID) / SID`` and expressed in channel
  units on the detector arc ``SDD * dgamma``.
* **Channel crosstalk** — optical/electronic leakage into neighboring
  cells: a short symmetric kernel (e.g. ``[c, 1-2c, c]``), energy
  conserving.

Both are linear shift-invariant along channels, so simulation is one
edge-padded convolution (shared with the scatter machinery) and the
restoration is the standard frequency-domain Wiener filter
``H* / (|H|^2 + NSR)`` applied per view — one rfft/irfft pair, jit-able
inside any pipeline.  Deconvolution amplifies noise at high frequency;
the noise-to-signal ratio ``nsr`` is the regularization knob (0 =
exact inverse, only for noiseless data).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .scatter import _conv_axis

__all__ = ["focal_spot_kernel", "crosstalk_kernel", "apply_detector_mtf",
           "wiener_restore_channels"]


def focal_spot_kernel(geometry, spot_width_cm, dtype=np.float32):
    """Channel-axis blur kernel of a finite focal spot (host).

    Each point of the (rectangular) anode spot images the object as a
    shifted copy, so the kernel IS the rect of full penumbra width
    ``spot * (SDD - SID) / SID`` on the detector, i.e.
    ``width_ch = that / (SDD * dgamma)`` channels — rasterized exactly
    onto the channel grid by bin overlap (review fix: an earlier
    version averaged full-width rects over sub-spot shifts, a
    double-convolution that widened the kernel ~sqrt(2)x and clipped
    its tails).  Sub-channel spots split their mass between the two
    straddled bins.
    """
    width_det = spot_width_cm * (geometry.SDD - geometry.SID) \
        / geometry.SID
    width_ch = width_det / (geometry.SDD * geometry.dgamma)
    hw = max(int(np.ceil((width_ch + 1.0) / 2.0)), 1)
    x = np.arange(-hw, hw + 1, dtype=np.float64)
    k = np.clip(np.minimum(x + 0.5, width_ch / 2.0)
                - np.maximum(x - 0.5, -width_ch / 2.0), 0.0, 1.0)
    if k.sum() <= 0.0:  # degenerate zero-width spot: identity
        k[hw] = 1.0
    return (k / k.sum()).astype(dtype)


def crosstalk_kernel(frac=0.05, dtype=np.float32):
    """Nearest-neighbor crosstalk kernel [frac, 1-2*frac, frac]."""
    if not 0.0 <= frac < 0.5:
        raise ValueError("crosstalk fraction must be in [0, 0.5)")
    return np.asarray([frac, 1.0 - 2.0 * frac, frac], dtype)


def apply_detector_mtf(counts, kernel):
    """Blur the sinogram counts along channels (edge-padded conv;
    composes: apply focal spot then crosstalk, or pre-convolve the two
    kernels)."""
    return _conv_axis(jnp.asarray(counts), jnp.asarray(kernel), -1)


def wiener_restore_channels(sino, kernel, *, nsr=1e-3):
    """Wiener deconvolution along the channel axis.

    sino: [..., C] blurred data (counts or log domain — the blur is
    applied to counts, but for small blur the log-domain correction is
    equivalent to first order and avoids the air-normalization
    round-trip); kernel: the 1-D blur kernel; ``nsr``: noise-to-signal
    power ratio floor.  Zero-phase restoration: the kernel is centered,
    so H is real for symmetric kernels and the filter reduces to
    H / (H^2 + nsr).
    """
    x = jnp.asarray(sino)
    c = x.shape[-1]
    k = np.asarray(kernel, np.float64)
    hw = (len(k) - 1) // 2
    # edge-replicate BOTH sides by the kernel half-width so the
    # circular FFT convolution never wraps object data across the fan
    # edges (review fix: an earlier max(c, len(k)) pad was zero in
    # practice, making the deconvolution circular)
    n = int(c + 2 * hw)
    kpad = np.zeros(n)
    for i, v in enumerate(k):
        kpad[(i - hw) % n] += v
    H = np.fft.rfft(kpad)
    W = np.conj(H) / (np.abs(H) ** 2 + float(nsr))
    # the kernel is symmetric and zero-phase, so H (and W) are real up
    # to rounding; ship W as a REAL float array — complex host->device
    # transfers are UNIMPLEMENTED on this backend and degrade the whole
    # client (CLAUDE.md)
    W = np.real(W).astype(np.float32)
    xp = jnp.concatenate(
        [jnp.repeat(x[..., :1], hw, -1), x,
         jnp.repeat(x[..., -1:], hw, -1)], -1)
    spec = jnp.fft.rfft(xp, axis=-1)
    out = jnp.fft.irfft(spec * jnp.asarray(W), n=n, axis=-1)
    return out[..., hw:hw + c].astype(x.dtype)
