"""PCD spectral response (physics/pcd_response.py): column
stochasticity, tail/escape structure, bin-weight folding, and the
end-to-end consistency + conditioning story with the multibin
decomposition."""

import numpy as np
import pytest

from dexct_tpu.ops.matdecomp import (gauss_newton_solve,
                                     pcd_bin_fluences)
from dexct_tpu.physics import kramers_spectrum, xcom
from dexct_tpu.physics.detector import photon_counting_response
from dexct_tpu.physics.materials import BONE, TISSUE
from dexct_tpu.physics.pcd_response import (bin_weights_from_response,
                                            pcd_bin_fluences_realistic,
                                            pcd_response_matrix)
from dexct_tpu.system import FanBeamGeometry

E = np.arange(10.0, 141.0)
THRESH = [20.0, 34.0, 50.0, 70.0]


class TestResponseMatrix:
    def test_columns_stochastic(self):
        for kw in ({}, {"share_frac": 0.2},
                   {"sensor": "CdTe", "escape_frac": 0.15},
                   {"share_frac": 0.15, "sensor": "CdTe"}):
            r = pcd_response_matrix(E, **kw)
            np.testing.assert_allclose(r.sum(axis=0), 1.0, atol=1e-9)
            assert (r >= 0.0).all()

    def test_ideal_limit_is_diagonalish(self):
        r = pcd_response_matrix(E, sigma_e_keV=0.3, share_frac=0.0)
        assert np.diag(r).min() > 0.9

    def test_sharing_fills_low_tail(self):
        r = pcd_response_matrix(E, share_frac=0.3)
        col = np.searchsorted(E, 100.0)
        low = r[E < 60.0, col].sum()
        # the tail spans the grid (10..99 keV), renormalized there:
        # share * (60-10)/(100-10) = 0.3 * 50/90
        assert abs(low - 0.3 * 50.0 / 90.0) < 0.02, low

    def test_kescape_peak_position(self):
        r = pcd_response_matrix(E, sigma_e_keV=1.0, share_frac=0.0,
                                sensor="CdTe", escape_frac=0.2)
        col = np.searchsorted(E, 100.0)
        # escape peaks at ~100-23.2 and ~100-27.5 keV
        win = (E > 66.0) & (E < 82.0)
        assert abs(r[win, col].sum() - 0.2) < 0.02
        # mean recorded energy drops below the true energy
        assert (E * r[:, col]).sum() < 100.0 - 0.15 * 23.0

    def test_subthreshold_events_uncounted(self):
        r = pcd_response_matrix(E, share_frac=0.3)
        w = bin_weights_from_response(r, E, THRESH)
        tot = w.sum(axis=0)
        assert (tot <= 1.0 + 1e-9).all()
        # high-energy photons lose some sharing events below 20 keV
        assert tot[np.searchsorted(E, 120.0)] < 0.99


class TestRealisticBins:
    def _setup(self):
        ct = FanBeamGeometry(N_channels=16, N_proj=4, gamma_fan=0.8,
                             SID=60.0, SDD=100.0, eid=False,
                             detector=photon_counting_response())
        s = kramers_spectrum(140.0)
        s.rescale_counts(ct.A_iso * 10.0 / ct.N_proj)
        return ct, s

    def test_ideal_response_matches_ideal_bins(self):
        ct, s = self._setup()
        i0_ideal = pcd_bin_fluences(ct, s, THRESH)
        i0_real = pcd_bin_fluences_realistic(
            ct, s, THRESH, sigma_e_keV=0.05, share_frac=0.0)
        # near-delta response: totals per bin agree to the blur leakage
        np.testing.assert_allclose(i0_real.sum(1), i0_ideal.sum(1),
                                   rtol=0.01)

    def test_consistent_model_decomposes_exactly(self):
        """When simulation and decomposition share the realistic bins,
        basis recovery stays exact — the response degrades
        conditioning, not consistency."""
        ct, s = self._setup()
        i0 = pcd_bin_fluences_realistic(ct, s, THRESH, sigma_e_keV=3.0,
                                        share_frac=0.15)
        mus = np.stack([xcom.mixatten(m.matcomp, s.E)
                        for m in (TISSUE, BONE)])
        rng = np.random.default_rng(0)
        a_true = np.stack([rng.uniform(0, 20, 120),
                           rng.uniform(0, 5, 120)], -1)
        counts = (np.exp(-np.clip(a_true @ mus, -700, 700)) @ i0.T).T
        import jax.numpy as jnp

        a = np.asarray(gauss_newton_solve(
            jnp.asarray(counts, jnp.float32), jnp.asarray(i0, jnp.float32),
            jnp.asarray(mus, jnp.float32), n_iters=50))
        rel = np.abs(a - a_true) / np.maximum(np.abs(a_true), 1.0)
        assert rel.max() < 2e-3, rel.max()

    def test_model_mismatch_biases(self):
        """Simulating WITH the response but decomposing with ideal bins
        biases the basis estimates — the quantitative cost of ignoring
        the detector spectrum model."""
        ct, s = self._setup()
        i0_real = pcd_bin_fluences_realistic(ct, s, THRESH,
                                             sigma_e_keV=3.0,
                                             share_frac=0.15)
        i0_ideal = pcd_bin_fluences(ct, s, THRESH)
        mus = np.stack([xcom.mixatten(m.matcomp, s.E)
                        for m in (TISSUE, BONE)])
        a_true = np.array([[15.0, 3.0]] * 50)
        counts = (np.exp(-np.clip(a_true @ mus, -700, 700)) @ i0_real.T).T
        import jax.numpy as jnp

        a = np.asarray(gauss_newton_solve(
            jnp.asarray(counts, jnp.float32),
            jnp.asarray(i0_ideal, jnp.float32),
            jnp.asarray(mus, jnp.float32), n_iters=50))
        bias = np.abs(a - a_true).mean(0)
        assert bias.max() > 0.1, bias  # the mismatch matters

    def test_response_degrades_conditioning(self):
        """Charge sharing mixes the bins and worsens the decomposition
        conditioning (larger noise amplification), quantified by the
        condition number of the bin-energy sensitivity matrix."""
        ct, s = self._setup()
        mus = np.stack([xcom.mixatten(m.matcomp, s.E)
                        for m in (TISSUE, BONE)])

        def cond(i0):
            a0 = np.array([10.0, 2.0])
            t = np.exp(-a0 @ mus)  # transmission [E]
            lam = i0 @ t  # [M]
            # d lam / d a = -i0 @ (mu_k * t): [M, K] sensitivity
            J = -np.stack([i0 @ (mus[k] * t) for k in range(2)], -1)
            Jw = J / np.sqrt(lam)[:, None]  # Poisson-whitened
            return np.linalg.cond(Jw)

        c_ideal = cond(pcd_bin_fluences(ct, s, THRESH))
        c_real = cond(pcd_bin_fluences_realistic(
            ct, s, THRESH, sigma_e_keV=3.0, share_frac=0.2))
        assert c_real > 1.2 * c_ideal, (c_ideal, c_real)
