"""Detector/source MTF realism (ops/mtf.py): kernel construction,
conservation, and Wiener restoration of the blur-degraded resolution."""

import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops import fbp as fbp_ops
from dexct_tpu.ops.mtf import (apply_detector_mtf, crosstalk_kernel,
                               focal_spot_kernel, wiener_restore_channels)
from dexct_tpu.ops.siddon import material_path_sinogram, mono_sinogram
from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom


def _system():
    # fine channels: 2.1 mm detector cells so a clinical-scale focal
    # spot spans >1 channel (the coarse 96-channel grid has 8.6 mm
    # cells — spot blur is sub-channel there and the kernel correctly
    # degenerates to identity)
    ct = FanBeamGeometry(N_channels=384, N_proj=128,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0)
    ph = contrast_rods_phantom(N=64, dx=0.35)
    mu = np.array([0.0, 0.20, 0.21, 0.45, 0.18, 0.22])
    sino = mono_sinogram(material_path_sinogram(ph, ct, method="dda"), mu)
    return ct, ph, sino


class TestKernels:
    def test_focal_spot_width_scales(self):
        ct, _, _ = _system()
        k1 = focal_spot_kernel(ct, 0.3)
        k2 = focal_spot_kernel(ct, 0.9)
        np.testing.assert_allclose(k1.sum(), 1.0, rtol=1e-6)
        np.testing.assert_allclose(k2.sum(), 1.0, rtol=1e-6)
        # effective widths (second moments) grow with the spot
        x1 = np.arange(len(k1)) - len(k1) // 2
        x2 = np.arange(len(k2)) - len(k2) // 2
        assert (k2 * x2 ** 2).sum() > (k1 * x1 ** 2).sum()

    def test_crosstalk_conserves(self):
        k = crosstalk_kernel(0.08)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-7)
        with pytest.raises(ValueError):
            crosstalk_kernel(0.6)

    def test_blur_conserves_flat_field(self):
        ct, _, _ = _system()
        k = focal_spot_kernel(ct, 0.9)
        flat = jnp.full((8, ct.N_channels), 5.0)
        out = apply_detector_mtf(flat, k)
        np.testing.assert_allclose(np.asarray(out), 5.0, rtol=1e-6)


class TestRestoration:
    def test_wiener_roundtrip_noiseless(self):
        ct, ph, sino = _system()
        k = focal_spot_kernel(ct, 0.9)
        blurred = apply_detector_mtf(sino, k)
        restored = wiener_restore_channels(blurred, k, nsr=1e-6)
        e_blur = float(jnp.sqrt(jnp.mean((blurred - sino) ** 2)))
        e_rest = float(jnp.sqrt(jnp.mean((restored - sino) ** 2)))
        assert e_rest < 0.2 * e_blur, (e_blur, e_rest)

    def test_recon_resolution_restored(self):
        """The blur smears rod edges in the recon; Wiener restoration
        recovers most of the edge response."""
        ct, ph, sino = _system()
        fov = ph.Nx * ph.dx
        k = np.convolve(focal_spot_kernel(ct, 0.9),
                        crosstalk_kernel(0.08))
        blurred = apply_detector_mtf(sino, jnp.asarray(k))
        restored = wiener_restore_channels(blurred, k, nsr=1e-5)
        ref = np.asarray(fbp_ops.fbp_recon(sino, ct, 64, fov)[0])
        rb = np.asarray(fbp_ops.fbp_recon(blurred, ct, 64, fov)[0])
        rr = np.asarray(fbp_ops.fbp_recon(restored, ct, 64, fov)[0])
        e_blur = np.sqrt(np.mean((rb - ref) ** 2))
        e_rest = np.sqrt(np.mean((rr - ref) ** 2))
        assert e_rest < 0.35 * e_blur, (e_blur, e_rest)
