"""Empirical (wedge-calibrated) dual-energy decomposition.

Pins the measured bounds from the module's design study: held-out wedge
inversion <0.25 % of range at degree 5, and full-pipeline agreement
with the Poisson-MLE path at the 1e-3-of-max level (the residual is
shared between the polynomial and the MLE's own union-grid/pruning
quantization).
"""

import numpy as np
import pytest

from dexct_tpu.ops.empirical import (
    apply_empirical_de,
    fit_empirical_de,
    wedge_log_measurements,
)
from dexct_tpu.ops.matdecomp import air_mask, decompose_sinograms
from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.pipeline.api import get_sino
from dexct_tpu.system import FanBeamGeometry, pelvis_phantom


@pytest.fixture(scope="module")
def setup():
    ct = FanBeamGeometry(N_channels=128, N_proj=96, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, eid=True)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    return ct, s1, s2


class TestWedgeInversion:
    def test_heldout_midpoints(self, setup):
        ct, s1, s2 = setup
        model = fit_empirical_de(ct, s1, s2)
        g1 = np.linspace(0.0, 50.0, 14)
        g2 = np.linspace(0.0, 35.0, 14)
        T1, T2 = np.meshgrid((g1[:-1] + g1[1:]) / 2,
                             (g2[:-1] + g2[1:]) / 2, indexing="ij")
        L = wedge_log_measurements(ct, s1, s2, T1, T2)
        t = np.asarray(apply_empirical_de(model, L[0], L[1]))
        # measured 6.0e-4 / 8.6e-4 of range at degree 5
        assert np.abs(t[0] - T1).max() / 50.0 < 2.5e-3
        assert np.abs(t[1] - T2).max() / 35.0 < 2.5e-3

    def test_air_maps_to_exactly_zero(self, setup):
        ct, s1, s2 = setup
        model = fit_empirical_de(ct, s1, s2)
        t = np.asarray(apply_empirical_de(model, 0.0, 0.0))
        assert t[0] == 0.0 and t[1] == 0.0  # no constant term by design

    def test_degree5_beats_degree3(self, setup):
        ct, s1, s2 = setup
        T1, T2 = np.meshgrid(np.linspace(2, 48, 9), np.linspace(1, 33, 9),
                             indexing="ij")
        L = wedge_log_measurements(ct, s1, s2, T1, T2)
        errs = {}
        for deg in (3, 5):
            m = fit_empirical_de(ct, s1, s2, degree=deg)
            t = np.asarray(apply_empirical_de(m, L[0], L[1]))
            errs[deg] = np.abs(t[0] - T1).max() + np.abs(t[1] - T2).max()
        assert errs[5] < 0.3 * errs[3]

    def test_measured_calibration_branch(self, setup):
        ct, s1, s2 = setup
        # a "measured" calibration: the same wedge data passed in
        # explicitly must reproduce the simulated-calibration model
        g = np.linspace(0.0, 50.0, 14)
        h = np.linspace(0.0, 35.0, 14)
        T1, T2 = np.meshgrid(g, h, indexing="ij")
        L = wedge_log_measurements(ct, s1, s2, T1, T2)
        m_data = fit_empirical_de(ct, s1, s2, L_meas=L,
                                  T_grid=np.stack([T1, T2]))
        m_sim = fit_empirical_de(ct, s1, s2)
        np.testing.assert_allclose(m_data.coeffs, m_sim.coeffs, rtol=1e-8)

    def test_mismatched_calibration_args_raise(self, setup):
        ct, s1, s2 = setup
        with pytest.raises(ValueError):
            fit_empirical_de(ct, s1, s2, L_meas=np.zeros((2, 4)))


class TestPipelineAgreement:
    def test_matches_mle_on_pelvis(self, setup):
        ct, s1, s2 = setup
        ph = pelvis_phantom(N=96, dx=0.5)
        r1, l1 = get_sino(ct, ph, s1)
        r2, l2 = get_sino(ct, ph, s2)
        m1, m2 = decompose_sinograms(ct, r1, r2, s1, s2)
        model = fit_empirical_de(ct, s1, s2)
        t = np.asarray(apply_empirical_de(model, l1, l2))
        sel = ~np.asarray(air_mask(r1))
        m1, m2 = np.asarray(m1), np.asarray(m2)
        rms1 = np.sqrt(np.mean((t[0] - m1)[sel] ** 2))
        rms2 = np.sqrt(np.mean((t[1] - m2)[sel] ** 2))
        # measured 5.2e-4 / 9.4e-4 of max (cfg 128x96, N=96)
        assert rms1 / m1.max() < 3e-3
        assert rms2 / m2.max() < 3e-3
        assert np.abs(t[0] - m1)[sel].max() < 1.0  # measured 0.081
        assert np.abs(t[1] - m2)[sel].max() < 1.5  # measured 0.39

    def test_noisy_stays_close_to_mle(self, setup):
        import jax

        ct, s1, s2 = setup
        ph = pelvis_phantom(N=96, dx=0.5)
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        r1, l1 = get_sino(ct, ph, s1, noise="poisson", key=k1)
        r2, l2 = get_sino(ct, ph, s2, noise="poisson", key=k2)
        m1, m2 = decompose_sinograms(ct, r1, r2, s1, s2)
        model = fit_empirical_de(ct, s1, s2)
        t = np.asarray(apply_empirical_de(model, l1, l2))
        sel = ~np.asarray(air_mask(r1))
        m1, m2 = np.asarray(m1), np.asarray(m2)
        assert np.all(np.isfinite(t))
        # both estimators see the same noise realization and invert the
        # same forward: they track each other far inside the noise level
        noise1 = np.std(m1[sel])
        rms1 = np.sqrt(np.mean((t[0] - m1)[sel] ** 2))
        assert rms1 < 0.05 * max(noise1, 1e-9) + 0.1
