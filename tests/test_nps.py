"""NPS / MTF-measurement / NEQ / detectability metrology tests."""

import numpy as np
import pytest

from dexct_tpu.analysis.nps import (
    detectability_index,
    disk_task,
    mtf_from_disk_edge,
    neq,
    noise_power_spectrum,
    radial_average,
    radial_frequencies,
)

RNG = np.random.default_rng(7)


class TestNps:
    def test_white_noise_flat_and_parseval(self):
        """iid noise: NPS == sigma^2 dx^2 everywhere, and the integral
        over frequency recovers the pixel variance (the module's pinned
        normalization)."""
        sigma, dx, n = 3.0, 0.1, 64
        x = RNG.normal(0.0, sigma, (400, n, n))
        nps, df = noise_power_spectrum(x, dx)
        assert nps.shape == (n, n) and df == pytest.approx(1.0 / (n * dx))
        np.testing.assert_allclose(nps.mean(), sigma**2 * dx**2, rtol=0.05)
        # flat to ensemble fluctuation
        assert nps.std() / nps.mean() < 0.2
        var = nps.sum() * df * df
        np.testing.assert_allclose(var, sigma**2, rtol=0.05)

    def test_structure_removed(self):
        """A deterministic object common to all realizations must not
        leak into the NPS (ensemble and pairs detrending)."""
        dx, n = 0.1, 64
        y = np.linspace(-1, 1, n)
        obj = 50.0 * np.exp(-(y[None, :] ** 2 + y[:, None] ** 2) * 8.0)
        x = obj[None] + RNG.normal(0.0, 1.0, (64, n, n))
        for mode in ("ensemble", "pairs"):
            nps, df = noise_power_spectrum(x, dx, detrend=mode)
            var = nps.sum() * df * df
            np.testing.assert_allclose(var, 1.0, rtol=0.15)

    def test_correlated_noise_shape(self):
        """Smoothing concentrates the NPS at low frequency; Parseval
        still holds for the total variance."""
        dx, n = 0.1, 64
        x = RNG.normal(0.0, 1.0, (200, n, n))
        k = np.ones(5) / 5.0
        sm = np.apply_along_axis(
            lambda r: np.convolve(np.concatenate([r, r]), k, "same")[:n],
            -1, x)
        nps, df = noise_power_spectrum(sm, dx)
        f, curve = radial_average(nps, dx)
        lo = curve[f < 0.2 / dx / n * 8].mean()
        hi = curve[f > 0.4 / dx].mean()
        assert lo > 5.0 * hi
        np.testing.assert_allclose(nps.sum() * df * df, sm.var(),
                                   rtol=0.1)

    def test_radial_average_isotropic(self):
        n, dx = 64, 0.1
        fr = radial_frequencies(n, dx)
        f, curve = radial_average(fr**2, dx, n_bins=16)
        # first bins hold few pixels and f^2 is convex, so the in-bin
        # mean sits above the bin-center value there — compare beyond
        np.testing.assert_allclose(curve[2:], f[2:] ** 2, rtol=0.05)

    def test_radial_average_oversampled_bins_dropped(self):
        """n_bins finer than the frequency grid: empty bins are dropped,
        not returned as spurious zeros (review finding)."""
        n, dx = 16, 0.1
        fr = radial_frequencies(n, dx)
        f, curve = radial_average(fr**2 + 1.0, dx, n_bins=256)
        assert len(f) == len(curve) and len(f) < 256
        assert np.all(curve >= 1.0)  # no zero-filled bins
        np.testing.assert_allclose(curve, f**2 + 1.0, rtol=0.01)


class TestMtfMeasurement:
    def _blurred_disk(self, n=256, dx=0.05, radius=2.0, sigma_cm=0.08):
        y = (np.arange(n) + 0.5 - n / 2.0) * dx
        ss = 4
        yf = (np.arange(n * ss) + 0.5 - n * ss / 2.0) * (dx / ss)
        img = ((yf[None, :] ** 2 + yf[:, None] ** 2) <= radius**2)
        img = img.reshape(n, ss, n, ss).mean((1, 3)) * 100.0
        # Gaussian blur via FFT (periodic is fine: the disk is interior)
        f = np.fft.fftfreq(n, d=dx)
        h = np.exp(-2.0 * (np.pi * sigma_cm) ** 2
                   * (f[None, :] ** 2 + f[:, None] ** 2))
        out = np.fft.ifft2(np.fft.fft2(img) * h).real
        return out, h

    def test_recovers_gaussian_mtf(self):
        n, dx, radius, sigma = 256, 0.05, 2.0, 0.08
        img, _ = self._blurred_disk(n, dx, radius, sigma)
        f, mtf = mtf_from_disk_edge(img, dx, (0.0, 0.0), radius,
                                    band_cm=0.5)
        truth = np.exp(-2.0 * (np.pi * sigma * f) ** 2)
        band = f < 4.0  # up to ~MTF 0.6
        assert np.max(np.abs(mtf[band] - truth[band])) < 0.05

    def test_sharp_edge_near_unity_mtf(self):
        """An unblurred (pixel-sampled) disk edge keeps MTF ~ the pixel
        sinc at low frequency."""
        n, dx, radius = 256, 0.05, 2.0
        img, _ = self._blurred_disk(n, dx, radius, sigma_cm=1e-6)
        f, mtf = mtf_from_disk_edge(img, dx, (0.0, 0.0), radius,
                                    band_cm=0.5)
        pix = np.sinc(f * dx)
        band = f < 5.0
        assert np.max(np.abs(mtf[band] - np.abs(pix[band]))) < 0.08


class TestDetectability:
    def test_white_noise_matched_filter_anchor(self):
        """Flat NPS, MTF = 1: both observers equal the matched-filter
        SNR sqrt(sum s^2)/sigma."""
        sigma, dx, n = 2.0, 0.1, 64
        x = RNG.normal(0.0, sigma, (600, n, n))
        nps, _ = noise_power_spectrum(x, dx)
        nps_flat = np.full_like(nps, nps.mean())  # kill ensemble ripple
        task = disk_task(n, dx, contrast=5.0, radius_cm=0.4)
        truth = np.sqrt(np.sum(task**2)) / sigma
        d_pw = detectability_index(nps_flat, dx, task, observer="pw")
        d_npw = detectability_index(nps_flat, dx, task, observer="npw")
        np.testing.assert_allclose(d_pw, truth, rtol=0.05)
        np.testing.assert_allclose(d_npw, truth, rtol=0.05)

    def test_dose_scaling(self):
        """Halving noise variance (2x dose) raises d' by sqrt(2) and
        NEQ by 2."""
        dx, n = 0.1, 64
        x = RNG.normal(0.0, 1.0, (300, n, n))
        nps1, _ = noise_power_spectrum(x, dx)
        nps2, _ = noise_power_spectrum(x / np.sqrt(2.0), dx)
        task = disk_task(n, dx, 5.0, 0.5)
        d1 = detectability_index(nps1, dx, task)
        d2 = detectability_index(nps2, dx, task)
        np.testing.assert_allclose(d2 / d1, np.sqrt(2.0), rtol=0.02)
        f = np.linspace(0.1, 4.0, 32)
        mtf = np.ones_like(f)
        f1, c1 = radial_average(nps1, dx)
        f2, c2 = radial_average(nps2, dx)
        n1 = neq(f, mtf, np.interp(f, f1, c1), 100.0)
        n2 = neq(f, mtf, np.interp(f, f2, c2), 100.0)
        np.testing.assert_allclose(n2 / n1, 2.0, rtol=1e-6)

    def test_pw_beats_npw_in_correlated_noise(self):
        """With structured noise the ideal (prewhitening) observer is
        at least as good as NPW — strictly better when the task band
        overlaps the noise peak."""
        dx, n = 0.1, 64
        x = RNG.normal(0.0, 1.0, (200, n, n))
        k = np.ones(7) / 7.0
        sm = np.apply_along_axis(
            lambda r: np.convolve(np.concatenate([r, r]), k, "same")[:n],
            -1, x)
        nps, _ = noise_power_spectrum(sm, dx)
        task = disk_task(n, dx, 5.0, 0.8)  # low-f task vs low-f noise
        d_pw = detectability_index(nps, dx, task, observer="pw")
        d_npw = detectability_index(nps, dx, task, observer="npw")
        assert d_pw >= d_npw * 0.999
        assert d_pw > 1.05 * d_npw

    def test_mtf_blur_lowers_dprime(self):
        dx, n = 0.1, 64
        x = RNG.normal(0.0, 1.0, (200, n, n))
        nps, _ = noise_power_spectrum(x, dx)
        task = disk_task(n, dx, 5.0, 0.2)  # small, high-frequency task
        f = np.linspace(0.0, 6.0, 64)
        blur = (f, np.exp(-(f / 1.5) ** 2))
        d_sharp = detectability_index(nps, dx, task)
        d_blur = detectability_index(nps, dx, task, mtf=blur)
        assert d_blur < 0.8 * d_sharp


class TestCtIntegration:
    """NPS/d' measured through the real sim + FBP pipeline."""

    def _noise_recons(self, dose, n_real=12, seed=0):
        import jax

        from dexct_tpu.physics import kramers_spectrum
        from dexct_tpu.pipeline.api import get_recon, get_sino
        from dexct_tpu.system import FanBeamGeometry, water_cylinder_phantom

        ph = water_cylinder_phantom(N=64, dx=0.2)
        ct = FanBeamGeometry(N_channels=64, N_proj=96, gamma_fan=0.5,
                             SID=40.0, SDD=70.0, eid=True)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(ct.A_iso * dose / ct.N_proj)
        from dexct_tpu.ops.siddon import material_path_sinogram

        paths = material_path_sinogram(ph, ct)
        keys = jax.random.split(jax.random.PRNGKey(seed), n_real)
        recs = []
        for k in keys:
            _, slog = get_sino(ct, ph, spec, noise="poisson", key=k,
                               paths=paths)
            hu = get_recon(slog, ct, spec, 64, 10.0, 0.9)[1]
            recs.append(np.asarray(hu))
        return np.stack(recs), 10.0 / 64

    def test_fbp_noise_spectrum_is_ramp_shaped(self):
        """FBP noise is NOT white: the ramp filter suppresses low
        frequencies, so the radial NPS rises from near zero, peaks in
        the mid band, and rolls off under the apodization window — the
        textbook CT noise texture the scalar ROI variance cannot see."""
        recs, dx = self._noise_recons(dose=0.02, n_real=12)
        nps, _ = noise_power_spectrum(recs, dx)
        f, curve = radial_average(nps, dx, n_bins=16)
        assert curve[0] < 0.3 * curve.max()  # low-f suppressed
        peak = int(np.argmax(curve))
        assert 2 <= peak <= 13  # mid-band peak
        assert curve[-1] < 0.8 * curve.max()  # windowed roll-off

    def test_dose_raises_detectability(self):
        """4x dose quarters the NPS and doubles d' (noise-limited,
        linear recon)."""
        lo, dx = self._noise_recons(dose=0.02, n_real=12, seed=1)
        hi, _ = self._noise_recons(dose=0.08, n_real=12, seed=2)
        nps_lo, _ = noise_power_spectrum(lo, dx)
        nps_hi, _ = noise_power_spectrum(hi, dx)
        task = disk_task(64, dx, contrast=10.0, radius_cm=0.5)
        d_lo = detectability_index(nps_lo, dx, task)
        d_hi = detectability_index(nps_hi, dx, task)
        assert 1.6 < d_hi / d_lo < 2.6, (d_lo, d_hi)
