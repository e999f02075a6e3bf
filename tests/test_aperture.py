"""Finite detector aperture (ops/aperture.py): sub-ray quadrature,
Jensen positivity of the NLPV bias, convergence, and the edge-artifact
story."""

import jax.numpy as jnp
import numpy as np

from dexct_tpu.ops.aperture import (aperture_counts,
                                    finite_aperture_paths,
                                    nlpv_bias_sinogram)
from dexct_tpu.ops.siddon import material_path_sinogram
from dexct_tpu.physics.materials import AIR, BONE, WATER, MaterialTable
from dexct_tpu.system import FanBeamGeometry
from dexct_tpu.system.phantom import VoxelPhantom, _ellipse_mask


def _system():
    ct = FanBeamGeometry(N_channels=96, N_proj=32, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0)
    # water cylinder with a sharp dense bone insert: strong edges
    N, dxp = 64, 0.3
    labels = _ellipse_mask(N, dxp, 0.0, 0.0, 0.4 * N * dxp,
                           0.4 * N * dxp).astype(np.uint8)
    labels[_ellipse_mask(N, dxp, 2.0, 2.0, 1.2, 1.2)] = 2
    ph = VoxelPhantom("wb", labels, MaterialTable([AIR, WATER, BONE]),
                      dxp, dxp, dxp)
    mu = jnp.asarray(ph.materials.mu_table(np.array([60.0]))[:, 0],
                     jnp.float32)
    return ct, ph, mu


class TestAperture:
    def test_single_subray_matches_standard(self):
        ct, ph, mu = _system()
        p1 = finite_aperture_paths(ph, ct, n_sub=1)
        p0 = material_path_sinogram(ph, ct)
        np.testing.assert_allclose(np.asarray(p1[0]), np.asarray(p0),
                                   atol=1e-6)

    def test_nlpv_bias_positive_at_edges(self):
        ct, ph, mu = _system()
        paths = finite_aperture_paths(ph, ct, n_sub=8)
        i0 = jnp.asarray([1e6], jnp.float32)
        bias = np.asarray(nlpv_bias_sinogram(
            paths, mu[:, None], i0))
        assert bias.min() > -1e-4  # Jensen: never negative
        assert bias.max() > 1e-3, bias.max()  # real effect at edges

    def test_counts_exceed_center_ray_at_edges(self):
        """Aperture-averaged intensity >= center-line intensity where
        the aperture is heterogeneous (the dark-band mechanism)."""
        from dexct_tpu.ops.spectral import counts_from_paths

        ct, ph, mu = _system()
        i0 = jnp.asarray([1e6], jnp.float32)
        paths = finite_aperture_paths(ph, ct, n_sub=8)
        c_ap = np.asarray(aperture_counts(paths, mu[:, None], i0))
        c_ctr = np.asarray(counts_from_paths(
            material_path_sinogram(ph, ct), mu[:, None], i0))
        # global: aperture can only gain (Jensen w.r.t. sub-ray spread)
        assert (c_ap - c_ctr).max() > 1.0
        # and the mean bias is small away from edges
        assert np.median(np.abs(c_ap - c_ctr) / c_ctr) < 0.01

    def test_quadrature_converges(self):
        ct, ph, mu = _system()
        i0 = jnp.asarray([1e6], jnp.float32)
        c8 = np.asarray(aperture_counts(
            finite_aperture_paths(ph, ct, n_sub=8), mu[:, None], i0))
        c16 = np.asarray(aperture_counts(
            finite_aperture_paths(ph, ct, n_sub=16), mu[:, None], i0))
        rel = np.abs(c8 - c16) / np.maximum(c16, 1.0)
        # uniform quadrature through a step edge converges O(1/S): the
        # worst edge ray sits ~1%; the body converges much faster
        assert np.percentile(rel, 99) < 5e-3, np.percentile(rel, 99)
        assert rel.max() < 3e-2, rel.max()
