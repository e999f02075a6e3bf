"""Synthetic dose reduction (ops/lowdose.py): statistics must match a
directly simulated low-dose scan, not just scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops.lowdose import quantum_var_ratio, synthesize_low_dose
from dexct_tpu.ops.siddon import material_path_sinogram
from dexct_tpu.ops.spectral import (
    counts_from_paths,
    effective_fluence,
    forward_counts,
    second_moment_fluence,
)
from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.system import FanBeamGeometry, water_cylinder_phantom


def _setup(eid=True, dose=5.0):
    ph = water_cylinder_phantom(N=64, dx=0.2)
    ct = FanBeamGeometry(N_channels=64, N_proj=24, gamma_fan=0.5,
                         SID=40.0, SDD=70.0, eid=eid)
    spec = kramers_spectrum(120.0)
    spec.rescale_counts(ct.A_iso * dose / ct.N_proj)
    return ph, ct, spec


class TestPoissonThinning:
    def test_exact_distribution_small_counts(self):
        # thinning a Poisson(800) ensemble at f=0.25 must BE Poisson(200)
        lam, f, n = 800.0, 0.25, 40000
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        y0 = jax.random.poisson(k1, lam, (n,)).astype(jnp.float32)
        y = np.asarray(synthesize_low_dose(k2, y0, f))
        assert abs(y.mean() - f * lam) < 3.0 * np.sqrt(f * lam / n) * 1.5
        assert abs(y.var() / (f * lam) - 1.0) < 0.05
        # third moment too (Poisson skewness 1/sqrt(lam)) — thinning is
        # exact in distribution, not just second-moment matched
        skew = ((y - y.mean()) ** 3).mean() / y.var() ** 1.5
        assert abs(skew - 1.0 / np.sqrt(f * lam)) < 0.03

    def test_gaussian_branch_large_counts(self):
        lam, f, n = 1e7, 0.5, 20000
        k = jax.random.PRNGKey(1)
        y0 = lam + np.sqrt(lam) * np.asarray(
            jax.random.normal(k, (n,), jnp.float32))
        y = np.asarray(synthesize_low_dose(jax.random.PRNGKey(2),
                                           jnp.asarray(y0), f))
        assert abs(y.mean() / (f * lam) - 1.0) < 1e-3
        # total var of the synthesized ensemble: f^2 var(y0) + f(1-f)E[y0]
        # = f*lam for Poisson input — the true low-dose variance
        assert abs(y.var() / (f * lam) - 1.0) < 0.05

    def test_f_one_identity(self):
        y0 = jnp.asarray([3.0, 50.0, 2e6, 0.0], jnp.float32)
        y = synthesize_low_dose(jax.random.PRNGKey(3), y0, 1.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y0), rtol=0,
                                   atol=0)

    def test_rejects_bad_fraction_and_electronic(self):
        y = jnp.ones(4)
        with pytest.raises(ValueError, match="fraction"):
            synthesize_low_dose(jax.random.PRNGKey(0), y, 1.5)
        with pytest.raises(ValueError, match="compound"):
            synthesize_low_dose(jax.random.PRNGKey(0), y, 0.5, sigma_e=1.0)


class TestCompoundEid:
    def test_matches_direct_low_dose_simulation(self):
        """Ensemble variance of synthesized quarter-dose EID scans ==
        variance of directly simulated quarter-dose scans, per ray."""
        ph, ct, spec = _setup(eid=True)
        paths = material_path_sinogram(ph, ct)
        e = spec.E
        mu = jnp.asarray(ph.materials.mu_table(e), jnp.float32)
        i0 = jnp.asarray(effective_fluence(spec, ct), jnp.float32)
        i2 = jnp.asarray(second_moment_fluence(spec, ct), jnp.float32)
        mean0 = counts_from_paths(paths, mu, i0)
        var_q0 = counts_from_paths(paths, mu, i2)
        f, n_rep = 0.25, 96
        keys = jax.random.split(jax.random.PRNGKey(4), n_rep)

        def one_input(k):
            y0 = mean0 + jnp.sqrt(var_q0) * jax.random.normal(
                k, mean0.shape, jnp.float32)
            return synthesize_low_dose(jax.random.fold_in(k, 7), y0, f,
                                       mode="compound", var_q=var_q0)

        syn = np.asarray(jax.vmap(one_input)(keys))
        # direct: mean f*mean0, var f*var_q0
        v_syn = syn.var(0)
        v_true = f * np.asarray(var_q0)
        ratio = v_syn / v_true
        # interior rays (non-air) where the variance is well resolved
        sel = np.asarray(mean0) > 0.1 * np.asarray(mean0).max()
        med = np.median(ratio[sel])
        assert abs(med - 1.0) < 0.25  # 96-rep chi2 width ~ 20%
        assert abs(syn.mean(0)[sel] / (f * np.asarray(mean0)[sel])
                   - 1.0).max() < 0.05

    def test_electronic_floor_added(self):
        """The target scan's electronic floor survives dose reduction:
        at tiny f the synthesized variance flattens at sigma_e^2."""
        k = jax.random.PRNGKey(5)
        mean0, var_q0, s_e = 1e6, 5e7, 1500.0
        n = 30000
        y0 = mean0 + np.sqrt(var_q0 + s_e ** 2) * np.asarray(
            jax.random.normal(k, (n,), jnp.float32))
        f = 0.01  # quantum var f*var_q0 = 5e5 << s_e^2 = 2.25e6, and
        # the synthesized mean (1e4) stays >> std (~1.7e3): no zero-clamp
        # truncation distorting the ensemble variance
        y = np.asarray(synthesize_low_dose(
            jax.random.PRNGKey(6), jnp.asarray(y0), f, mode="compound",
            var_q=jnp.full((n,), var_q0), sigma_e=s_e, sigma_e0=s_e))
        target = f * var_q0 + s_e ** 2
        assert abs(y.var() / target - 1.0) < 0.05
        # and WITHOUT the floor bookkeeping the variance would be ~9x off
        y_naive = np.asarray(synthesize_low_dose(
            jax.random.PRNGKey(6), jnp.asarray(y0), f, mode="compound",
            var_q=jnp.full((n,), var_q0)))
        assert y_naive.var() < 0.2 * target

    def test_sigma_consistency_f1(self):
        # f=1 and unchanged detector: zero added variance
        y0 = jnp.asarray([1e5, 2e5], jnp.float32)
        y = synthesize_low_dose(jax.random.PRNGKey(7), y0, 1.0,
                                mode="compound",
                                var_q=jnp.asarray([1e4, 1e4]),
                                sigma_e=50.0, sigma_e0=50.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y0), rtol=0,
                                   atol=0)


class TestVarRatio:
    def test_pcd_unity_eid_energy_scale(self):
        ph, ct_e, spec = _setup(eid=True)
        _, ct_p, _ = _setup(eid=False)
        r_eid = quantum_var_ratio(spec, ct_e)
        r_pcd = quantum_var_ratio(spec, ct_p)
        np.testing.assert_allclose(r_pcd, 1.0, rtol=1e-12)
        # EID weights are photon energies [keV]: the ratio is the
        # fluence-weighted mean detected energy, O(60-100) for 120 kVp
        assert 40.0 < r_eid < 120.0

    def test_hardening_raises_true_ratio(self):
        """The documented bias: through water the true var/mean ratio
        exceeds the air ratio (mean photon weight hardens up)."""
        ph, ct, spec = _setup(eid=True)
        paths = material_path_sinogram(ph, ct)
        e = spec.E
        mu = jnp.asarray(ph.materials.mu_table(e), jnp.float32)
        i0 = jnp.asarray(effective_fluence(spec, ct), jnp.float32)
        i2 = jnp.asarray(second_moment_fluence(spec, ct), jnp.float32)
        mean0 = np.asarray(counts_from_paths(paths, mu, i0))
        var_q0 = np.asarray(counts_from_paths(paths, mu, i2))
        r_air = quantum_var_ratio(spec, ct)
        central = var_q0[:, 32] / mean0[:, 32]  # most attenuated rays
        assert central.min() > r_air
