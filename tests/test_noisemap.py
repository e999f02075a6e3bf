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
