"""Detector-gain rings: simulation, air calibration, residual
correction (ops/rings.py — the scanner calibration subsystem beyond the
reference's uniform-detector model).

Contract under test: AIR CALIBRATION is the primary gain fix (precision
1/sqrt(V*i0) — it removes the rings outright); the sinogram-domain
corrector targets post-calibration drift and is bounded by the window
median leak (~0.45 sigma for white gains), so it is asserted at its
measured modest factor, on a rotating object (its estimator premise)."""

import jax
import jax.numpy as jnp
import numpy as np

from dexct_tpu.ops.rings import (air_calibration_gains,
                                 apply_channel_gains,
                                 ring_correct_sinogram,
                                 sample_channel_gains)
from dexct_tpu.pipeline.api import get_recon, get_sino
from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.system import (FanBeamGeometry, contrast_rods_phantom,
                              water_cylinder_phantom)


def _system(phantom=water_cylinder_phantom):
    ct = FanBeamGeometry(N_channels=96, N_proj=128,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=True)
    ph = phantom(N=64, dx=0.35)
    s = kramers_spectrum(80.0)
    s.rescale_counts(ct.A_iso * 10.0 / ct.N_proj)
    return ct, ph, s


def _radial_profile(img, n=64):
    yy, xx = np.mgrid[0:n, 0:n]
    r = np.hypot(yy - n / 2 + 0.5, xx - n / 2 + 0.5).astype(int)
    prof = np.bincount(r.ravel(), img.ravel(),
                       minlength=r.max() + 1) / np.bincount(
        r.ravel(), minlength=r.max() + 1)
    return prof[3:20]  # inside the water cylinder


def _ring_power(img, clean, n=64):
    """Ring metric vs the clean reference: std of the radial-profile
    difference (isolates the gain artifact from the object's own
    structure)."""
    return float(np.std(_radial_profile(img, n)
                        - _radial_profile(clean, n)))


class TestAirCalibration:
    def test_recovers_gains(self):
        ct, ph, s = _system()
        from dexct_tpu.ops import spectral as sp_ops

        i0 = float(np.sum(sp_ops.effective_fluence(s, ct)))
        gains = sample_channel_gains(0, ct.N_channels, sigma=0.01)
        key = jax.random.PRNGKey(7)
        lam = i0 * jnp.broadcast_to(gains, (ct.N_proj, ct.N_channels))
        # Gaussian limit of Poisson at air-scan rates (CLAUDE.md:
        # jax.random.poisson is wrong at EID-scale lambda)
        air = lam + jnp.sqrt(lam) * jax.random.normal(key, lam.shape)
        got = air_calibration_gains(air.astype(jnp.float32), i0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(gains),
                                   atol=5e-3)

    def test_calibration_removes_rings(self):
        # the production workflow: gains corrupt the scan, an air scan
        # calibrates them out, the recon is ring-free
        ct, ph, s = _system()
        raw, log = get_sino(ct, ph, s)
        gains = sample_channel_gains(1, ct.N_channels, sigma=0.01)
        raw_g = apply_channel_gains(raw, gains)
        log_g = log - jnp.log(gains)[None, :]

        rec_clean, _ = get_recon(log, ct, s, 64, 20.0, 0.8)
        rec_ring, _ = get_recon(log_g, ct, s, 64, 20.0, 0.8)
        clean = np.asarray(rec_clean)
        p_ring = _ring_power(np.asarray(rec_ring), clean)
        assert p_ring > 1e-3  # the gains DO produce rings

        # noiseless air scan -> exact gains -> exact correction
        from dexct_tpu.ops import spectral as sp_ops

        i0 = float(np.sum(sp_ops.effective_fluence(s, ct)))
        air_scan = i0 * jnp.broadcast_to(gains,
                                         (ct.N_proj, ct.N_channels))
        g_hat = air_calibration_gains(air_scan, i0)
        log_cal = log_g + jnp.log(g_hat)[None, :]
        rec_cal, _ = get_recon(log_cal, ct, s, 64, 20.0, 0.8)
        p_cal = _ring_power(np.asarray(rec_cal), clean)
        assert p_cal < 0.05 * p_ring
        # counts-domain correction is the same operation
        np.testing.assert_allclose(
            np.asarray(raw_g / g_hat), np.asarray(raw), rtol=1e-5)


class TestResidualCorrector:
    def test_estimates_drift_on_rotating_object(self):
        # the estimator premise: object structure moves across channels
        # while the gain offset stays put — a rods phantom, not the
        # rotation-symmetric cylinder
        ct, ph, s = _system(contrast_rods_phantom)
        _, log = get_sino(ct, ph, s)
        gains = sample_channel_gains(2, ct.N_channels, sigma=0.01)
        h = -jnp.log(gains)
        log_g = log + h[None, :]
        fixed = ring_correct_sinogram(log_g)
        h_resid = np.asarray(jnp.mean(fixed - log, axis=0))
        # captures enough of the white drift to halve the ring POWER
        assert np.std(h_resid) < 0.8 * float(jnp.std(h))

    def test_preserves_clean_data(self):
        ct, ph, s = _system(contrast_rods_phantom)
        _, log = get_sino(ct, ph, s)
        fixed = ring_correct_sinogram(log)
        # the view-median rejects the object's moving structure
        assert float(jnp.abs(fixed - log).max()) < 0.02

    def test_clip_bounds_the_correction(self):
        ct, ph, s = _system()
        _, log = get_sino(ct, ph, s)
        g = sample_channel_gains(4, ct.N_channels, sigma=0.2)  # huge
        fixed = ring_correct_sinogram(log - jnp.log(g)[None, :],
                                      clip=0.05)
        corr = np.asarray((log - jnp.log(g)[None, :]) - fixed)
        assert np.abs(corr).max() <= 0.05 + 1e-6


class TestGainModel:
    def test_drift_gains_shape(self):
        g = sample_channel_gains(3, 128, sigma=0.0, drift=0.02)
        g = np.asarray(g)
        assert g.shape == (128,)
        assert 0.97 < g.min() and g.max() < 1.03


class TestDefectiveChannels:
    """Dead + flickering channels: detection from an air scan, MAR-bridge
    inpainting.  Measured: exact detection, 124x ring-rms suppression."""

    def _scan(self):
        from dexct_tpu.ops import spectral as sp_ops
        from dexct_tpu.system.phantom import water_cylinder_phantom

        ct = FanBeamGeometry(N_channels=128, N_proj=128, gamma_fan=0.9,
                             SID=60.0, SDD=100.0, eid=False)
        ph = water_cylinder_phantom(N=96, dx=0.2, radius_cm=7.0)
        s = kramers_spectrum(100.0)
        s.rescale_counts(
            1e5 / float(np.sum(sp_ops.effective_fluence(s, ct))))
        air0 = float(np.sum(sp_ops.effective_fluence(s, ct)))
        raw, slog = get_sino(ct, ph, s)
        return ct, s, air0, jnp.asarray(raw), jnp.asarray(slog)

    def test_detection_is_exact(self):
        from dexct_tpu.ops import spectral as sp_ops
        from dexct_tpu.ops.rings import (apply_channel_defects,
                                         detect_defective_channels)

        ct, s, air0, raw, _ = self._scan()
        dead = np.array([40, 41, 90])
        flick = np.array([64])
        air = jnp.broadcast_to(jnp.asarray(air0, jnp.float32), raw.shape)
        air_meas = apply_channel_defects(
            sp_ops.sample_noise(jax.random.PRNGKey(9), air, "poisson"),
            dead=dead, flicker=flick, key=jax.random.PRNGKey(6))
        bad = np.asarray(detect_defective_channels(air_meas))
        assert set(np.nonzero(bad)[0]) == {40, 41, 64, 90}

    def test_inpainting_removes_the_ring(self):
        from dexct_tpu.ops import spectral as sp_ops
        from dexct_tpu.ops.fbp import fbp_recon
        from dexct_tpu.ops.rings import (apply_channel_defects,
                                         inpaint_defective_channels)

        ct, s, air0, raw, slog = self._scan()
        dead = np.array([40, 41, 90])
        meas = apply_channel_defects(raw, dead=dead,
                                     flicker=np.array([64]),
                                     key=jax.random.PRNGKey(5))
        bad = np.zeros(128, bool)
        bad[[40, 41, 64, 90]] = True
        slog_bad = sp_ops.log_sinogram(meas, air0)
        slog_fix = inpaint_defective_channels(slog_bad, jnp.asarray(bad))
        n, fov = 96, 19.2
        r_bad, _ = fbp_recon(jnp.clip(slog_bad, -1.0, 20.0), ct, n, fov,
                             0.8)
        r_fix, _ = fbp_recon(slog_fix, ct, n, fov, 0.8)
        r_ref, _ = fbp_recon(slog, ct, n, fov, 0.8)
        y = (np.arange(n) + 0.5 - n / 2) * 0.2
        sel = np.hypot(y[None, :], y[:, None]) < 6.0
        eb = np.sqrt(((np.asarray(r_bad) - np.asarray(r_ref))[sel] ** 2)
                     .mean())
        ef = np.sqrt(((np.asarray(r_fix) - np.asarray(r_ref))[sel] ** 2)
                     .mean())
        assert eb > 30.0 * ef  # measured 124x
        assert ef < 2e-3  # interpolation floor (measured 3.1e-4)

    def test_healthy_scan_untouched(self):
        from dexct_tpu.ops.rings import inpaint_defective_channels

        _, _, _, _, slog = self._scan()
        out = inpaint_defective_channels(slog, jnp.zeros(128, bool))
        np.testing.assert_allclose(np.asarray(out), np.asarray(slog),
                                   atol=1e-6)
