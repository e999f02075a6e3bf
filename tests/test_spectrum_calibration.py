"""EM spectrum estimation: functional recovery from wedge transmissions."""

import numpy as np
import pytest

from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.physics.materials import WATER, Material
from dexct_tpu.physics.spectrum import Spectrum
from dexct_tpu.physics.spectrum_calibration import (
    estimate_spectrum_em,
    wedge_transmissions,
)
from dexct_tpu.system.geometry import FanBeamGeometry

ALUMINUM = Material("aluminum", 2.699, "Al(100.0)")


def _geometry(eid=True):
    return FanBeamGeometry(N_channels=16, N_proj=8, gamma_fan=0.9,
                           SID=60.0, SDD=100.0, h_iso=0.1, eid=eid)


class TestEmEstimation:
    def test_transmission_curve_recovery(self):
        """The estimate reproduces the wedge transmission function —
        including thicknesses NOT in the calibration set — to <0.5 %."""
        ct = _geometry()
        true = kramers_spectrum(120.0)
        t_cal = np.concatenate([[0.0], np.geomspace(0.2, 30.0, 12)])
        T_cal = wedge_transmissions(true, ct, WATER, t_cal)
        est = estimate_spectrum_em(T_cal, t_cal, WATER,
                                   np.arange(15.0, 121.0, 1.0),
                                   n_iters=8000)
        # held-out thicknesses
        t_test = np.array([0.5, 3.7, 11.0, 24.0])
        T_true = wedge_transmissions(true, ct, WATER, t_test)
        mu_e = WATER.linear_atten(est.E)
        T_est = np.exp(-np.outer(t_test, mu_e)) @ (est.I0 / est.I0.sum())
        # deep-attenuation points (T ~ 1e-2) converge slowest: absolute
        # floor covers them, relative bound covers the rest
        np.testing.assert_allclose(T_est, T_true, rtol=5e-3, atol=2e-4)

    def test_effective_water_mu_recovery(self):
        """Downstream physics: the effective water attenuation (the HU
        reference) from the estimated spectrum matches the truth to
        <1 % — spectrum calibration closes the HU-scale loop."""
        from dexct_tpu.pipeline.api import effective_water_mu

        ct = _geometry()
        true = kramers_spectrum(100.0)
        t_cal = np.concatenate([[0.0], np.geomspace(0.3, 25.0, 10)])
        T_cal = wedge_transmissions(true, ct, WATER, t_cal)
        est = estimate_spectrum_em(T_cal, t_cal, WATER,
                                   np.arange(15.0, 101.0, 1.0),
                                   detector=ct)
        mu_true = effective_water_mu(true, ct, 10.0)
        mu_est = effective_water_mu(est, ct, 10.0)
        assert abs(mu_est - mu_true) / mu_true < 0.01

    def test_cross_material_generalization(self):
        """Calibrate on an aluminum wedge, predict WATER transmission:
        the estimate carries real spectral information, not just a fit
        of the calibration curve."""
        ct = _geometry()
        true = kramers_spectrum(120.0)
        t_al = np.concatenate([[0.0], np.geomspace(0.05, 8.0, 12)])
        T_al = wedge_transmissions(true, ct, ALUMINUM, t_al)
        est = estimate_spectrum_em(T_al, t_al, ALUMINUM,
                                   np.arange(15.0, 121.0, 1.0))
        t_w = np.array([2.0, 8.0, 20.0])
        T_true = wedge_transmissions(true, ct, WATER, t_w)
        mu_w = WATER.linear_atten(est.E)
        T_est = np.exp(-np.outer(t_w, mu_w)) @ (est.I0 / est.I0.sum())
        np.testing.assert_allclose(T_est, T_true, rtol=0.03)

    def test_validation_errors(self):
        with pytest.raises(ValueError, match="t=0"):
            estimate_spectrum_em(np.array([0.5]), np.array([5.0]), WATER,
                                 np.arange(20.0, 100.0))
        with pytest.raises(ValueError, match="matching"):
            estimate_spectrum_em(np.array([1.0, 0.5]), np.array([0.0]),
                                 WATER, np.arange(20.0, 100.0))
