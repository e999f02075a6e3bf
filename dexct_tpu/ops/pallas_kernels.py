"""Pallas TPU kernels for the spectral forward model.

Scope note (measured on this hardware, see CLAUDE.md): the framework's two
heaviest ops are gather-rate bound, and Mosaic has no vectorized gather —
so Pallas cannot help there, and the winning designs are the Fourier-slice
projector and packed-gather backprojection in XLA.  Where Pallas DOES pay
is the polyenergetic Beer-Lambert evaluation: XLA materializes the
[rays, energies] attenuation matrix in HBM between the two matmuls and
runs the op once per spectrum/moment; this kernel fuses

    atten = exp(-paths @ [mu_1 | mu_2])          (MXU + VPU, VMEM-resident)
    (counts_1, counts_2, var_1, var_2) = atten @ W

into one pass with the energy axes of BOTH spectra concatenated on the
lane dimension and all four outputs produced by a single block-diagonal
weight matmul.  No HBM round trip for `atten`, one kernel launch instead
of four.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pack_spectral_tables", "beer_lambert_counts"]

_TILE_R = 512
_LANE = 128


def _round_up(x, m):
    return -(-x // m) * m


def pack_spectral_tables(mu_t1, mu_t2, i0_1, i0_2, i2_1=None, i2_2=None):
    """Host-side packing: concatenated-energy mu table + weight matrix.

    mu_t1: [M, E1], mu_t2: [M, E2] linear attenuation per material;
    i0_*: [E*] effective fluences; i2_*: optional second moments.
    Returns (mu_cat [M_pad, E_pad], W [E_pad, 8], m_pad) with the weight
    columns (counts1, counts2, var1, var2, 0...) block-diagonal over the
    two energy segments.
    """
    mu_t1 = np.asarray(mu_t1, np.float32)
    mu_t2 = np.asarray(mu_t2, np.float32)
    m, e1 = mu_t1.shape
    e2 = mu_t2.shape[1]
    m_pad = _round_up(m, 8)
    e_pad = _round_up(e1 + e2, _LANE)
    mu_cat = np.zeros((m_pad, e_pad), np.float32)
    mu_cat[:m, :e1] = mu_t1
    mu_cat[:m, e1:e1 + e2] = mu_t2
    # rays never see the padded energy columns: give them huge attenuation
    mu_cat[:m, e1 + e2:] = 0.0

    w = np.zeros((e_pad, 8), np.float32)
    w[:e1, 0] = np.asarray(i0_1, np.float32)
    w[e1:e1 + e2, 1] = np.asarray(i0_2, np.float32)
    if i2_1 is not None:
        w[:e1, 2] = np.asarray(i2_1, np.float32)
    if i2_2 is not None:
        w[e1:e1 + e2, 3] = np.asarray(i2_2, np.float32)
    return mu_cat, w, m_pad


def _kernel(paths_ref, mu_ref, w_ref, out_ref):
    L = jnp.dot(paths_ref[:], mu_ref[:],
                preferred_element_type=jnp.float32)
    # padded energy columns have mu == 0 -> L == 0 -> atten == 1, but
    # their weight rows are 0, so they contribute nothing
    atten = jnp.exp(jnp.clip(-L, -80.0, 2.0))
    out_ref[:] = jnp.dot(atten, w_ref[:],
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def beer_lambert_counts(paths, mu_cat, w, *, interpret=False):
    """Fused spectral forward for a DE pair.

    paths: [..., M_pad] material path lengths (pad materials with zeros).
    mu_cat, w: from :func:`pack_spectral_tables`.
    Returns [..., 8]: (counts1, counts2, var1, var2, pad...).
    """
    batch = paths.shape[:-1]
    m_pad = paths.shape[-1]
    flat = paths.reshape(-1, m_pad)
    n = flat.shape[0]
    n_pad = _round_up(n, _TILE_R)
    flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)))

    e_pad = mu_cat.shape[1]
    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // _TILE_R,),
        in_specs=[
            pl.BlockSpec((_TILE_R, m_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, e_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e_pad, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_R, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        interpret=interpret,
    )(flat, mu_cat, w)
    return out[:n].reshape(*batch, 8)
