"""Analytic FBP variance maps vs Monte Carlo ensembles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexct_tpu.ops.noisemap import fbp_variance_map, log_variance
from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.pipeline.api import get_sino
from dexct_tpu.ops import spectral as sp_ops
from dexct_tpu.ops.fbp import fbp_recon
from dexct_tpu.system.geometry import FanBeamGeometry, ParallelBeamGeometry
from dexct_tpu.system.phantom import water_cylinder_phantom


class TestLogVariance:
    def test_poisson_default(self):
        c = jnp.asarray([100.0, 1e4])
        np.testing.assert_allclose(np.asarray(log_variance(c)),
                                   [1e-2, 1e-4], rtol=1e-6)

    def test_explicit_variance(self):
        c = jnp.asarray([100.0])
        v = jnp.asarray([400.0])
        np.testing.assert_allclose(np.asarray(log_variance(c, v)), [0.04])


class TestEnsembleAgreement:
    def test_predicted_vs_ensemble_std(self):
        """Predicted std map vs a 160-realization Poisson ensemble of
        the actual FBP pipeline: interior agreement within ~8 %
        (ensemble std of std is ~6 % at n=160)."""
        ct = FanBeamGeometry(N_channels=96, N_proj=96, gamma_fan=0.9,
                             SID=60.0, SDD=100.0, h_iso=0.1, eid=False)
        ph = water_cylinder_phantom(N=64, dx=0.25, radius_cm=5.0)
        spec = kramers_spectrum(100.0)
        # calibrate so the AIR ray carries ~2e4 photons: sigma_log ~1%,
        # far above the pipeline's f32 quantization (~1e-7) that would
        # otherwise dominate an ensemble of near-noiseless recons
        air0 = float(np.sum(sp_ops.effective_fluence(spec, ct)))
        spec.rescale_counts(2e4 / air0)
        raw, _ = get_sino(ct, ph, spec)
        counts = jnp.asarray(raw)
        air = float(np.sum(sp_ops.effective_fluence(spec, ct)))
        n, fov = 64, 16.0

        var_pred = np.asarray(fbp_variance_map(counts, ct, n, fov, 0.8))

        def one(key):
            noisy = sp_ops.sample_noise(key, counts, "poisson")
            slog = sp_ops.log_sinogram(noisy, air)
            img, _ = fbp_recon(slog, ct, n, fov, 0.8)
            return img

        keys = jax.random.split(jax.random.PRNGKey(0), 160)
        imgs = np.asarray(jax.lax.map(one, keys))
        var_emp = imgs.var(0)
        # interior comparison (edges carry interpolation/edge effects)
        ys = (np.arange(n) + 0.5 - n / 2) * 0.25
        rr = np.hypot(ys[None, :], ys[:, None])
        sel = rr < 3.5
        ratio = var_pred[sel] / var_emp[sel]
        assert abs(np.median(ratio) - 1.0) < 0.08
        # tap covariance matters: dropping it would shift the map by
        # far more than the tolerance (pinned implicitly by the bound)

    def test_variance_scales_inverse_with_dose(self):
        ct = FanBeamGeometry(N_channels=64, N_proj=48, gamma_fan=0.9,
                             SID=60.0, SDD=100.0, h_iso=0.1, eid=False)
        ph = water_cylinder_phantom(N=48, dx=0.3, radius_cm=5.0)
        s1 = kramers_spectrum(100.0)
        air0 = float(np.sum(sp_ops.effective_fluence(s1, ct)))
        s1.rescale_counts(1e4 / air0)
        raw1, _ = get_sino(ct, ph, s1)
        v1 = np.asarray(fbp_variance_map(jnp.asarray(raw1), ct, 48, 14.0))
        v4 = np.asarray(fbp_variance_map(4.0 * jnp.asarray(raw1), ct, 48,
                                         14.0))
        np.testing.assert_allclose(v4, v1 / 4.0, rtol=1e-4)

    def test_unsupported_geometry(self):
        ct = ParallelBeamGeometry(N_channels=32, N_proj=16, h_iso=0.1,
                                  eid=False, detector_width=10.0)
        with pytest.raises(ValueError, match="fan-beam"):
            fbp_variance_map(jnp.ones((16, 32)), ct, 32, 10.0)


class TestDecompositionNoise:
    def _setup(self):
        from dexct_tpu.physics import linac_spectrum

        ct = FanBeamGeometry(N_channels=64, N_proj=64, gamma_fan=0.9,
                             SID=60.0, SDD=100.0, h_iso=0.1, eid=False)
        ph = water_cylinder_phantom(N=48, dx=0.25, radius_cm=4.5)
        s1 = linac_spectrum()
        s2 = kramers_spectrum(80.0)
        for s, target in ((s1, 3e4), (s2, 3e4)):
            air0 = float(np.sum(sp_ops.effective_fluence(s, ct)))
            s.rescale_counts(target / air0)
        raw1, _ = get_sino(ct, ph, s1)
        raw2, _ = get_sino(ct, ph, s2)
        return ct, ph, s1, s2, jnp.asarray(raw1), jnp.asarray(raw2)

    def test_crlb_properties(self):
        from dexct_tpu.ops.matdecomp import decompose_sinograms
        from dexct_tpu.ops.noisemap import decomposition_covariance

        ct, ph, s1, s2, c1, c2 = self._setup()
        m1, m2 = decompose_sinograms(ct, c1, c2, s1, s2, n_iters=20)
        a = jnp.stack([m1, m2], -1)
        cov = np.asarray(decomposition_covariance(a, ct, s1, s2))
        mid = cov[:, 28:36]
        # classic DE anticorrelation of the basis estimates
        assert (mid[..., 0, 1] < 0).all()
        # valid covariance: positive variances, |corr| < 1
        assert (mid[..., 0, 0] > 0).all() and (mid[..., 1, 1] > 0).all()
        corr = mid[..., 0, 1] / np.sqrt(mid[..., 0, 0] * mid[..., 1, 1])
        assert (np.abs(corr) < 1.0).all()
        # doubling dose halves every covariance entry
        cov2 = np.asarray(decomposition_covariance(a, ct, s1, s2))
        s1.rescale_counts(2.0)
        s2.rescale_counts(2.0)
        cov_hi = np.asarray(decomposition_covariance(a, ct, s1, s2))
        np.testing.assert_allclose(cov_hi, cov2 / 2.0, rtol=1e-3)

    def test_vmi_noise_vs_ensemble(self):
        """Predicted VMI std (CRLB -> correlated FBP propagation) vs a
        48-realization ensemble of the REAL chain (Poisson counts -> GN
        decomposition -> FBP basis recons -> VMI)."""
        import jax as J
        from dexct_tpu.analysis import make_vmi
        from dexct_tpu.ops.matdecomp import decompose_sinograms
        from dexct_tpu.ops.noisemap import (basis_variance_maps,
                                            decomposition_covariance,
                                            vmi_variance_map)

        ct, ph, s1, s2, c1, c2 = self._setup()
        n, fov = 48, 12.0
        m1, m2 = decompose_sinograms(ct, c1, c2, s1, s2, n_iters=20)
        a = jnp.stack([m1, m2], -1)
        cov = decomposition_covariance(a, ct, s1, s2)
        v1, v2, c12 = basis_variance_maps(cov, ct, n, fov, 0.8)
        var_pred = np.asarray(vmi_variance_map(v1, v2, c12, 70.0))

        def one(key):
            k1, k2 = J.random.split(key)
            n1 = sp_ops.sample_noise(k1, c1, "poisson")
            n2 = sp_ops.sample_noise(k2, c2, "poisson")
            b1, b2 = decompose_sinograms(ct, n1, n2, s1, s2, n_iters=20)
            r1, _ = fbp_recon(b1, ct, n, fov, 0.8)
            r2, _ = fbp_recon(b2, ct, n, fov, 0.8)
            return r1, r2

        keys = J.random.split(J.random.PRNGKey(1), 48)
        b1s, b2s = J.lax.map(one, keys)
        vmis = np.stack([np.asarray(make_vmi(70.0, np.asarray(x),
                                             np.asarray(y)))
                         for x, y in zip(b1s, b2s)])
        var_emp = vmis.var(0)
        ys = (np.arange(n) + 0.5 - n / 2) * 0.25
        rr = np.hypot(ys[None, :], ys[:, None])
        sel = rr < 3.0
        ratio = np.median(var_pred[sel] / var_emp[sel])
        # 48 realizations: ensemble var-of-var ~ 20%
        assert abs(ratio - 1.0) < 0.25, ratio

    def test_vmi_noise_curve_has_interior_minimum(self):
        from dexct_tpu.ops.matdecomp import decompose_sinograms
        from dexct_tpu.ops.noisemap import (basis_variance_maps,
                                            decomposition_covariance,
                                            vmi_variance_map)

        ct, ph, s1, s2, c1, c2 = self._setup()
        m1, m2 = decompose_sinograms(ct, c1, c2, s1, s2, n_iters=20)
        a = jnp.stack([m1, m2], -1)
        cov = decomposition_covariance(a, ct, s1, s2)
        v1, v2, c12 = basis_variance_maps(cov, ct, 48, 12.0, 0.8)
        center = []
        for e0 in (40.0, 70.0, 140.0):
            vm = np.asarray(vmi_variance_map(v1, v2, c12, e0))
            center.append(vm[24, 24])
        # classic U-shape: the 70 keV VMI is quieter than 40 and 140
        assert center[1] < center[0]
        assert center[1] < center[2]
