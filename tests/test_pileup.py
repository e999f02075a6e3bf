"""PCD pulse pileup (physics/pileup.py): dead-time curves and their
inversion, sum-energy bin redistribution, roundtrip correction, and the
decomposition-level bias/correction story.

Contracts: recorded totals follow the dead-time model exactly; the bin
model is identity as tau -> 0; correction inverts the distortion to
<1e-3 relative at rho = 0.2; uncorrected pileup biases the multibin
basis decomposition and the correction removes that bias.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops.matdecomp import gauss_newton_solve, pcd_bin_fluences
from dexct_tpu.physics import kramers_spectrum, xcom
from dexct_tpu.physics.detector import photon_counting_response
from dexct_tpu.physics.materials import BONE, TISSUE
from dexct_tpu.physics.pileup import (apply_pileup_bins, bin_mean_energies,
                                      bin_sum_redistribution,
                                      correct_pileup_bins, recorded_rate,
                                      true_rate)
from dexct_tpu.system import FanBeamGeometry

THRESHOLDS = [20.0, 34.0, 50.0, 70.0]


@pytest.fixture(scope="module")
def pcd_setup():
    det = photon_counting_response()
    ct = FanBeamGeometry(N_channels=32, N_proj=4, gamma_fan=0.8,
                         SID=60.0, SDD=100.0, eid=False, detector=det)
    spec = kramers_spectrum(140.0)
    spec.rescale_counts(ct.A_iso * 10.0 / ct.N_proj)
    i0s = pcd_bin_fluences(ct, spec, THRESHOLDS)
    mean_e = bin_mean_energies(i0s, spec.E)
    s = bin_sum_redistribution(THRESHOLDS, mean_e)
    return ct, spec, i0s, mean_e, s


class TestDeadTime:
    def test_low_rate_limit(self):
        n = jnp.asarray([1e-6, 1e-4])
        for model in ("paralyzable", "nonparalyzable"):
            np.testing.assert_allclose(np.asarray(recorded_rate(n, model)),
                                       np.asarray(n), rtol=2e-4)

    def test_paralyzable_inversion(self):
        n = jnp.linspace(1e-4, 0.8, 40)
        m = recorded_rate(n, "paralyzable")
        np.testing.assert_allclose(np.asarray(true_rate(m, "paralyzable")),
                                   np.asarray(n), rtol=1e-5, atol=1e-7)

    def test_nonparalyzable_inversion_exact(self):
        n = jnp.linspace(1e-4, 3.0, 40)
        m = recorded_rate(n, "nonparalyzable")
        np.testing.assert_allclose(
            np.asarray(true_rate(m, "nonparalyzable")), np.asarray(n),
            rtol=1e-5)

    def test_paralyzable_saturates_at_peak(self):
        """Recorded rates at/above the 1/e peak invert to the peak
        rate, not to garbage."""
        n = float(true_rate(jnp.asarray(0.5), "paralyzable"))
        assert 0.9 < n < 1.1


class TestRedistribution:
    def test_rows_route_once(self, pcd_setup):
        *_, s = pcd_setup
        np.testing.assert_allclose(s.sum(axis=2), 1.0)

    def test_sum_energies_go_up(self, pcd_setup):
        ct, spec, i0s, mean_e, s = pcd_setup
        m = len(mean_e)
        for i in range(m):
            for j in range(m):
                b = int(np.argmax(s[i, j]))
                assert b >= max(i, j)  # sum of two >= either one
        assert int(np.argmax(s[m - 1, m - 1])) == m - 1  # open last bin

    def test_identity_at_zero_tau(self, pcd_setup):
        *_, s = pcd_setup
        c = jnp.asarray(np.random.default_rng(0).uniform(
            10.0, 100.0, (4, 3, 5)))
        out = apply_pileup_bins(c, 1e-12, s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(c),
                                   rtol=1e-6)

    def test_total_follows_deadtime_model(self, pcd_setup):
        *_, s = pcd_setup
        rng = np.random.default_rng(1)
        c = jnp.asarray(rng.uniform(100.0, 1000.0, (4, 6)))
        tau = 1e-4
        out = apply_pileup_bins(c, tau, s)
        n_tot = np.asarray(c).sum(0)
        expect = n_tot * np.exp(-n_tot * tau)
        np.testing.assert_allclose(np.asarray(out).sum(0), expect,
                                   rtol=1e-6)

    def test_counts_move_up_in_energy(self, pcd_setup):
        *_, s = pcd_setup
        c = jnp.asarray([400.0, 300.0, 200.0, 100.0])[:, None]
        out = np.asarray(apply_pileup_bins(c, 2e-4, s))[:, 0]
        frac_in = np.asarray(c)[:, 0] / 1000.0
        frac_out = out / out.sum()
        assert frac_out[-1] > frac_in[-1]  # top bin gains share
        assert frac_out[0] < frac_in[0]  # bottom bin loses share


class TestCorrection:
    def test_roundtrip(self, pcd_setup):
        *_, s = pcd_setup
        rng = np.random.default_rng(2)
        c = jnp.asarray(rng.uniform(100.0, 800.0, (4, 8, 8)))
        tau = 0.2 / float(np.asarray(c).sum(0).max())  # rho <= 0.2
        rec = apply_pileup_bins(c, tau, s)
        back = correct_pileup_bins(rec, tau, s, n_iters=8)
        np.testing.assert_allclose(np.asarray(back), np.asarray(c),
                                   rtol=1e-3)

    def test_decomposition_bias_and_fix(self, pcd_setup):
        """Pileup at rho ~ 0.15 biases the tissue/bone decomposition;
        correct_pileup_bins restores it (>10x error reduction)."""
        ct, spec, i0s, mean_e, s = pcd_setup
        ee = spec.E
        mus = np.stack([xcom.mixatten(m.matcomp, ee)
                        for m in (TISSUE, BONE)])
        rng = np.random.default_rng(3)
        a_true = np.stack([rng.uniform(0, 15, 150),
                           rng.uniform(0, 4, 150)], -1)
        L = a_true @ mus
        counts = (np.exp(-np.clip(L, -700, 700)) @ i0s.T).T  # [M, P]
        tau = 0.15 / counts.sum(0).max()
        rec = np.asarray(apply_pileup_bins(jnp.asarray(counts), tau, s))
        fixed = np.asarray(correct_pileup_bins(jnp.asarray(rec), tau, s))

        def solve(cts):
            return np.asarray(gauss_newton_solve(
                jnp.asarray(cts, jnp.float32), jnp.asarray(i0s, jnp.float32),
                jnp.asarray(mus, jnp.float32), n_iters=50))

        err_rec = np.abs(solve(rec) - a_true).mean()
        err_fix = np.abs(solve(fixed) - a_true).mean()
        assert err_fix < err_rec / 10.0, (err_rec, err_fix)
        assert err_fix < 0.05, err_fix
