"""Beam-hardening correction tests: cupping removal and bone-induced bias
reduction (the reference's BHC output contract, plots.py:184-195)."""

import numpy as np
import pytest

from dexct_tpu.ops.bhc import (
    apply_water_bhc,
    bone_bhc_recon,
    fit_water_bhc,
    water_bhc_recon,
)
from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.physics.materials import AIR, BONE, MaterialTable, WATER
from dexct_tpu.pipeline import get_recon, get_sino
from dexct_tpu.system import FanBeamGeometry, VoxelPhantom, water_cylinder_phantom


@pytest.fixture(scope="module")
def water_scan():
    ph = water_cylinder_phantom(N=128, dx=0.2)  # 20.5 cm water
    ct = FanBeamGeometry(N_channels=192, N_proj=192, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, eid=True)
    spec = kramers_spectrum(80.0)
    spec.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
    _, sino_log = get_sino(ct, ph, spec)
    return ph, ct, spec, sino_log


class TestWaterBhc:
    def test_linearizes_calibration_curve(self, water_scan):
        ph, ct, spec, sino_log = water_scan
        bhc = fit_water_bhc(spec, ct, t_max=40.0)
        # corrected L is proportional to water thickness
        import jax.numpy as jnp
        from dexct_tpu.ops.bhc import _calibration_curve
        from dexct_tpu.physics import xcom

        t = np.linspace(0.5, 35.0, 40)
        L = _calibration_curve(spec, ct, xcom.mixatten("H(11.2)O(88.8)",
                                                       spec.E), t)
        corr = np.asarray(apply_water_bhc(bhc, jnp.asarray(L)))
        ratio = corr / (bhc.mu_eff * t)
        np.testing.assert_allclose(ratio, 1.0, atol=0.01)

    def test_removes_cupping(self, water_scan):
        """Uncorrected 80 kV water recon cups; water BHC flattens it."""
        ph, ct, spec, sino_log = water_scan
        raw, hu_raw = get_recon(sino_log, ct, spec, 128, 26.0, 0.8)
        _, hu_bhc = water_bhc_recon(sino_log, ct, spec, 128, 26.0, 0.8)
        hu_raw, hu_bhc = np.asarray(hu_raw), np.asarray(hu_bhc)
        # cupping metric: center-vs-mid-radius HU difference inside water
        center = lambda M: M[60:68, 60:68].mean()
        ring = lambda M: M[60:68, 28:36].mean()
        cup_raw = abs(center(hu_raw) - ring(hu_raw))
        cup_bhc = abs(center(hu_bhc) - ring(hu_bhc))
        assert cup_bhc < 0.4 * cup_raw
        # corrected water sits near 0 HU
        assert abs(center(hu_bhc)) < 25.0


class TestScanCalibratedBhc:
    """fit_water_bhc_from_scan: the spectrum-free scanner-style
    calibration (measured scan of a known water cylinder), round 3."""

    @pytest.fixture(scope="class")
    def cal_scan(self):
        from dexct_tpu.system.analytic import water_cylinder_analytic

        ph = water_cylinder_analytic(extent_cm=25.6, radius_cm=10.24)
        ct = FanBeamGeometry(N_channels=192, N_proj=192,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        spec = kramers_spectrum(80.0)
        spec.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
        _, sino_log = get_sino(ct, ph, spec)
        return ct, spec, np.asarray(sino_log)

    def test_matches_spectrum_calibration(self, cal_scan):
        """Noiseless parity: the data-driven fit agrees with the
        analytic spectrum-model fit over the sampled path range."""
        import jax.numpy as jnp

        from dexct_tpu.ops.bhc import fit_water_bhc_from_scan
        from dexct_tpu.ops.bhc import _calibration_curve
        from dexct_tpu.physics import xcom

        ct, spec, sino_log = cal_scan
        b_scan = fit_water_bhc_from_scan(sino_log, ct, 10.24)
        b_ana = fit_water_bhc(spec, ct, t_max=21.0)
        assert abs(b_scan.mu_eff / b_ana.mu_eff - 1.0) < 0.005
        t = np.linspace(1.0, 19.5, 32)
        L = _calibration_curve(spec, ct,
                               xcom.mixatten("H(11.2)O(88.8)", spec.E), t)
        c_scan = np.asarray(apply_water_bhc(b_scan, jnp.asarray(L)))
        c_ana = np.asarray(apply_water_bhc(b_ana, jnp.asarray(L)))
        np.testing.assert_allclose(c_scan, c_ana, rtol=5e-3, atol=5e-3)

    def test_corrects_independent_object(self, cal_scan, water_scan):
        """A scan-calibrated polynomial transfers: it flattens the
        cupping of a DIFFERENT (voxelized) water scan as well as the
        spectrum-calibrated one does."""
        from dexct_tpu.ops.bhc import fit_water_bhc_from_scan
        from dexct_tpu.ops.fbp import hu_image

        ct_cal, _, cal_log = cal_scan
        b_scan = fit_water_bhc_from_scan(cal_log, ct_cal, 10.24)
        ph, ct, spec, sino_log = water_scan
        raw, hu_raw = get_recon(sino_log, ct, spec, 128, 26.0, 0.8)
        corr, _ = get_recon(apply_water_bhc(b_scan, sino_log), ct, None,
                            128, 26.0, 0.8)
        hu_bhc = np.asarray(hu_image(corr, b_scan.mu_eff))
        hu_raw = np.asarray(hu_raw)
        center = lambda M: M[60:68, 60:68].mean()
        ring = lambda M: M[60:68, 28:36].mean()
        assert (abs(center(hu_bhc) - ring(hu_bhc))
                < 0.4 * abs(center(hu_raw) - ring(hu_raw)))
        assert abs(center(hu_bhc)) < 25.0

    def test_noise_robust(self, cal_scan):
        """1%-transmission-noise calibration scan: the fitted mapping
        moves < 1% (least squares over ~28k object rays)."""
        import jax.numpy as jnp

        from dexct_tpu.ops.bhc import fit_water_bhc_from_scan

        ct, spec, sino_log = cal_scan
        rng = np.random.default_rng(0)
        noisy = sino_log + rng.normal(0.0, 0.01, sino_log.shape)
        b0 = fit_water_bhc_from_scan(sino_log, ct, 10.24)
        bn = fit_water_bhc_from_scan(noisy, ct, 10.24)
        assert abs(bn.mu_eff / b0.mu_eff - 1.0) < 0.01
        L = np.linspace(0.2, 4.0, 32)
        c0 = np.asarray(apply_water_bhc(b0, jnp.asarray(L)))
        cn = np.asarray(apply_water_bhc(bn, jnp.asarray(L)))
        np.testing.assert_allclose(cn, c0, rtol=0.01, atol=0.01)

    def test_no_intersecting_rays_raises(self):
        from dexct_tpu.ops.bhc import fit_water_bhc_from_scan

        ct = FanBeamGeometry(N_channels=16, N_proj=8,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        with pytest.raises(ValueError, match="no ray intersects"):
            fit_water_bhc_from_scan(np.zeros((8, 16)), ct, 1e-4)


class TestBoneBhc:
    def test_reduces_bone_bias(self):
        """Water+two-bone-rod phantom: bone BHC reduces the dark band
        between the rods (classic inter-bone beam-hardening artifact)."""
        N = 128
        labels = np.zeros((N, N), np.uint8)
        yy, xx = np.mgrid[0:N, 0:N]
        r = np.hypot(yy - 63.5, xx - 63.5) * 0.2
        labels[r < 11.0] = 1
        for cx in (40, 88):
            rb = np.hypot(yy - 63.5, xx - cx) * 0.2
            labels[rb < 2.2] = 2
        ph = VoxelPhantom("bones", labels,
                          MaterialTable([AIR, WATER, BONE]), 0.2, 0.2, 0.2)
        ct = FanBeamGeometry(N_channels=192, N_proj=192,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=True)
        spec = kramers_spectrum(80.0)
        spec.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
        _, sino_log = get_sino(ct, ph, spec)

        _, hu_w = water_bhc_recon(sino_log, ct, spec, N, 26.0, 0.8)
        _, hu_b = bone_bhc_recon(sino_log, ct, spec, N, 26.0, 0.8,
                                 n_theta=512)
        hu_w, hu_b = np.asarray(hu_w), np.asarray(hu_b)
        # water ROI away from the bone axis as the unbiased reference
        ref_w = hu_w[34:42, 60:68].mean()
        ref_b = hu_b[34:42, 60:68].mean()
        # between-rods ROI (on the bone axis)
        mid_w = hu_w[60:68, 60:68].mean()
        mid_b = hu_b[60:68, 60:68].mean()
        bias_w = abs(mid_w - ref_w)
        bias_b = abs(mid_b - ref_b)
        assert bias_b < 0.6 * bias_w
        # bone still reads dense
        assert hu_b[60:68, 37:43].max() > 500.0
