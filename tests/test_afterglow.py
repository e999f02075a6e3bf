"""Detector afterglow / lag (ops/afterglow.py): impulse response, DC
gain, exact inversion, and the azimuthal-blur artifact story on a
rotating scan."""

import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops import fbp as fbp_ops
from dexct_tpu.ops.afterglow import (apply_afterglow, correct_afterglow,
                                     decay_per_view, lag_impulse_response)
from dexct_tpu.ops.siddon import material_path_sinogram, mono_sinogram
from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom

A = np.array([0.06, 0.02])          # trap fractions
B = decay_per_view([2.0, 20.0], 1.0)  # 2 ms and 20 ms traps, 1 ms views


class TestModel:
    def test_impulse_response_matches_scan(self):
        x = np.zeros((24, 3))
        x[0] = 1.0
        m = np.asarray(apply_afterglow(jnp.asarray(x), A, B))
        h = lag_impulse_response(A, B, 24)
        np.testing.assert_allclose(m[:, 0], h, rtol=1e-5, atol=1e-7)

    def test_dc_gain_one(self):
        x = jnp.full((400, 2), 7.0)
        m = np.asarray(apply_afterglow(x, A, B, warm_start=True))
        np.testing.assert_allclose(m, 7.0, rtol=1e-5)
        # cold start converges to the same steady state
        m2 = np.asarray(apply_afterglow(x, A, B))
        np.testing.assert_allclose(m2[-1], 7.0, rtol=1e-3)

    def test_kernel_sums_to_one(self):
        h = lag_impulse_response(A, B, 2000)
        np.testing.assert_allclose(h.sum(), 1.0, atol=1e-8)

    def test_invalid_params_rejected(self):
        with pytest.raises(ValueError):
            apply_afterglow(jnp.ones((4, 2)), [0.7, 0.4], [0.5, 0.5])
        with pytest.raises(ValueError):
            apply_afterglow(jnp.ones((4, 2)), [0.1], [1.0])


class TestInversion:
    @pytest.mark.parametrize("warm", [False, True])
    def test_roundtrip_exact(self, warm):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(10.0, 100.0, (64, 16)))
        m = apply_afterglow(x, A, B, warm_start=warm)
        back = correct_afterglow(m, A, B, warm_start=warm)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   rtol=1e-4)


class TestArtifact:
    def test_azimuthal_blur_removed(self):
        """Lag on a rotating fan scan blurs the recon azimuthally; the
        recursive correction restores it to the clean recon."""
        ct = FanBeamGeometry(N_channels=96, N_proj=128,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        ph = contrast_rods_phantom(N=64, dx=0.35)
        mu = np.array([0.0, 0.20, 0.21, 0.45, 0.18, 0.22])
        sino = mono_sinogram(material_path_sinogram(ph, ct, method="dda"),
                             mu)
        counts = jnp.exp(-sino) * 1e5  # transmission-domain signal
        lagged = apply_afterglow(counts, A, B, warm_start=True)
        fixed = correct_afterglow(lagged, A, B, warm_start=True)
        fov = ph.Nx * ph.dx

        def recon(c):
            return np.asarray(fbp_ops.fbp_recon(
                -jnp.log(c / 1e5), ct, 64, fov)[0])

        ref = recon(counts)
        e_bad = np.sqrt(np.mean((recon(lagged) - ref) ** 2))
        e_fix = np.sqrt(np.mean((recon(fixed) - ref) ** 2))
        assert e_bad > 20.0 * e_fix, (e_bad, e_fix)
        assert e_fix < 1e-4, e_fix


class TestDtypeRobustness:
    def test_integer_counts_lag_correctly(self):
        """Integer count arrays must NOT truncate the trap fractions
        (review finding: the float cast has to happen before the
        parameter cast, else the model degenerates to a pure gain)."""
        x = np.zeros((24, 2), np.int64)
        x[0] = 1000
        m = np.asarray(apply_afterglow(jnp.asarray(x), A, B))
        h = lag_impulse_response(A, B, 24)
        np.testing.assert_allclose(m[:, 0], 1000.0 * h, rtol=1e-5,
                                   atol=1e-4)


class TestLagCalibration:
    def test_prony_recovers_model(self):
        """Shutter-off calibration: Prony on the decay tail recovers
        the trap fractions and decay constants exactly (noiseless)."""
        from dexct_tpu.ops.afterglow import fit_lag_parameters

        h = lag_impulse_response(A, B, 40)
        a_hat, b_hat = fit_lag_parameters(h[1:], n_exp=2)
        order = np.argsort(B)
        np.testing.assert_allclose(b_hat, np.sort(B), rtol=1e-6)
        np.testing.assert_allclose(a_hat, np.asarray(A)[order],
                                   rtol=1e-5)

    def test_calibrated_correction_roundtrip(self):
        from dexct_tpu.ops.afterglow import fit_lag_parameters

        h = lag_impulse_response(A, B, 40)
        a_hat, b_hat = fit_lag_parameters(h[1:], n_exp=2)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(10.0, 100.0, (48, 8)))
        m = apply_afterglow(x, A, B)
        back = correct_afterglow(m, a_hat, b_hat)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   rtol=1e-4)

    def test_too_short_tail_rejected(self):
        from dexct_tpu.ops.afterglow import fit_lag_parameters

        with pytest.raises(ValueError):
            fit_lag_parameters(np.ones(4), n_exp=2)
