"""Pallas spectral-kernel parity tests (interpret mode on the CPU suite;
compiled path exercised by bench on hardware)."""

import jax.numpy as jnp
import numpy as np

from dexct_tpu.ops.pallas_kernels import beer_lambert_counts, pack_spectral_tables


class TestBeerLambertKernel:
    def test_matches_reference_math(self):
        rng = np.random.default_rng(0)
        m, e1, e2 = 6, 100, 140
        paths = rng.uniform(0, 10, (37, 11, m)).astype(np.float32)
        mu1 = rng.uniform(0.01, 0.5, (m, e1))
        mu2 = rng.uniform(0.01, 0.5, (m, e2))
        i01 = rng.uniform(1e3, 1e5, e1)
        i02 = rng.uniform(1e3, 1e5, e2)
        i21 = rng.uniform(1e3, 1e5, e1)
        i22 = rng.uniform(1e3, 1e5, e2)
        mu_cat, w, m_pad = pack_spectral_tables(mu1, mu2, i01, i02, i21,
                                                i22)
        pp = np.zeros(paths.shape[:-1] + (m_pad,), np.float32)
        pp[..., :m] = paths
        out = np.asarray(beer_lambert_counts(
            jnp.asarray(pp), jnp.asarray(mu_cat), jnp.asarray(w),
            interpret=True))
        ref1 = np.exp(-(paths @ mu1)) @ i01
        ref2 = np.exp(-(paths @ mu2)) @ i02
        refv1 = np.exp(-(paths @ mu1)) @ i21
        refv2 = np.exp(-(paths @ mu2)) @ i22
        np.testing.assert_allclose(out[..., 0], ref1, rtol=2e-4)
        np.testing.assert_allclose(out[..., 1], ref2, rtol=2e-4)
        np.testing.assert_allclose(out[..., 2], refv1, rtol=2e-4)
        np.testing.assert_allclose(out[..., 3], refv2, rtol=2e-4)

    def test_padding_inert(self):
        """Ray counts are independent of material/energy padding."""
        rng = np.random.default_rng(1)
        m, e1, e2 = 3, 17, 29  # deliberately unaligned
        paths = rng.uniform(0, 5, (5, m)).astype(np.float32)
        mu1 = rng.uniform(0.05, 0.3, (m, e1))
        mu2 = rng.uniform(0.05, 0.3, (m, e2))
        i01 = rng.uniform(1.0, 2.0, e1)
        i02 = rng.uniform(1.0, 2.0, e2)
        mu_cat, w, m_pad = pack_spectral_tables(mu1, mu2, i01, i02)
        pp = np.zeros((5, m_pad), np.float32)
        pp[:, :m] = paths
        out = np.asarray(beer_lambert_counts(
            jnp.asarray(pp), jnp.asarray(mu_cat), jnp.asarray(w),
            interpret=True))
        np.testing.assert_allclose(out[:, 0], np.exp(-(paths @ mu1)) @ i01,
                                   rtol=2e-4)
        assert np.all(out[:, 4:] == 0.0)
