"""Anticorrelated dual-energy basis-noise suppression (KL-line filter).

The two basis estimates of a DE decomposition carry strongly
ANTICORRELATED noise (the CRLB cross term is negative — see
`ops/noisemap.decomposition_covariance`): noise lives almost entirely
along one line in (tissue, bone) space while the orthogonal component
is quiet.  The classic Kalender-style correlated-noise filter exploits
this: smooth ONLY the noisy eigencomponent and keep the quiet one at
full resolution,

    m' = smooth(m) + u u^T (m - smooth(m)),   u ⟂ v_high-noise,

so  u·m' == u·m  exactly (the low-noise component — and any VMI whose
weights align with u — is bit-preserved), while the high-noise
component is low-passed.  Noise drops by the high/low eigenvalue ratio
(typically 3-10x on the basis images) at the cost of resolution only
along the noisy direction.

The eigendirections come from this framework's own ANALYTIC covariance
maps (`ops/noisemap.basis_variance_maps` in the image domain,
`decomposition_covariance` per-ray in the projection domain) — no
ensembles, no tuning.  Everything here is pure jax (separable
convolutions + per-pixel 2x2 eigenrotations) and jit/shard-safe.

Beyond-reference: the reference ships no noise reduction; this is the
standard clinical companion of its VMI-noise-vs-energy study
(plots.py:541-717 context).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .scatter import _conv_axis

__all__ = [
    "gaussian_kernel",
    "smooth_separable",
    "high_noise_direction",
    "anticorrelated_denoise",
    "anticorrelated_denoise_sinos",
]


def gaussian_kernel(sigma, radius=None):
    """Normalized 1-D Gaussian taps (host, float32)."""
    if radius is None:
        radius = max(1, int(np.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / max(sigma, 1e-12)) ** 2)
    return (k / k.sum()).astype(np.float32)


def smooth_separable(img, sigma, axes=(-2, -1)):
    """Separable edge-padded Gaussian blur along ``axes``."""
    k = jnp.asarray(gaussian_kernel(sigma))
    out = jnp.asarray(img)
    for ax in axes:
        out = _conv_axis(out, k, ax)
    return out


def high_noise_direction(var1, var2, cov12):
    """Unit eigenvector of the larger noise eigenvalue, shape [..., 2].

    Closed form for the symmetric 2x2 [[var1, cov12], [cov12, var2]]:
    the principal angle is phi = atan2(2 cov12, var1 - var2) / 2.  The
    sign of the vector is irrelevant (it only enters as v v^T).
    """
    phi = 0.5 * jnp.arctan2(2.0 * jnp.asarray(cov12),
                            jnp.asarray(var1) - jnp.asarray(var2))
    return jnp.stack([jnp.cos(phi), jnp.sin(phi)], axis=-1)


def _filter_pair(m, v, sigma, axes):
    """m [..., 2], v [..., 2] high-noise unit directions."""
    ms = smooth_separable(m, sigma, axes=axes)
    d = m - ms
    # remove the high-frequency content along v only
    return m - v * jnp.sum(d * v, axis=-1, keepdims=True)


def anticorrelated_denoise(m1, m2, var1, var2, cov12, *, sigma_px=2.0):
    """Filter a basis-image pair using analytic covariance maps.

    m1, m2: [N, N] basis-density images; var1/var2/cov12: per-pixel
    covariance maps from `ops/noisemap.basis_variance_maps` (any
    common broadcastable shape).  Returns the filtered pair.  The
    low-noise component u·m is preserved EXACTLY (algebraic identity,
    pinned by test); noise std drops by ~sqrt(lambda_hi/lambda_lo)
    wherever the blur kernel is wider than the noise correlation
    length.
    """
    m = jnp.stack([jnp.asarray(m1), jnp.asarray(m2)], axis=-1)
    v = high_noise_direction(var1, var2, cov12)
    v = jnp.broadcast_to(v, m.shape)
    out = _filter_pair(m, v, sigma_px, axes=(-3, -2))
    return out[..., 0], out[..., 1]


def anticorrelated_denoise_sinos(a_sinos, cov_rays, *, sigma_ch=2.0):
    """Projection-domain variant: filter basis sinograms before FBP.

    a_sinos [V, C, 2]; cov_rays [V, C, 2, 2] from
    `decomposition_covariance`.  Smoothing runs along the CHANNEL axis
    only (views are statistically independent measurements; view-axis
    blur would trade azimuthal resolution for nothing the FBP ramp
    doesn't already shape).  Filtering before backprojection lets the
    recon inherit the noise reduction in both basis images AND every
    VMI synthesized from them.
    """
    a = jnp.asarray(a_sinos)
    v = high_noise_direction(cov_rays[..., 0, 0], cov_rays[..., 1, 1],
                             cov_rays[..., 0, 1])
    ms = _conv_axis(a, jnp.asarray(gaussian_kernel(sigma_ch)), -2)
    d = a - ms
    return a - v * jnp.sum(d * v, axis=-1, keepdims=True)
