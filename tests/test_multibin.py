"""Multi-bin photon-counting / three-material decomposition tests —
the spectral-CT generalization of the reference's two-spectra solver."""

import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops.matdecomp import (
    decompose_multibin_grid,
    gauss_newton_solve,
    pcd_bin_fluences,
)
from dexct_tpu.physics import kramers_spectrum, xcom
from dexct_tpu.physics.detector import photon_counting_response
from dexct_tpu.physics.materials import BONE, Material, TISSUE
from dexct_tpu.system import FanBeamGeometry

IODINE = Material("iodine solution", 1.1, "H(10.0)O(85.0)I(5.0)")


@pytest.fixture(scope="module")
def pcd_setup():
    det = photon_counting_response()
    ct = FanBeamGeometry(N_channels=64, N_proj=8, gamma_fan=0.8,
                         SID=60.0, SDD=100.0, eid=False, detector=det)
    spec = kramers_spectrum(140.0)
    spec.rescale_counts(ct.A_iso * 10.0 / ct.N_proj)
    # bin edges straddle the iodine K-edge (~33 keV): essential for the
    # conditioning of 3-material decomposition (bins that bury the edge
    # inside one bin leave some pixels unrecoverable even in float64)
    i0s = pcd_bin_fluences(ct, spec, [20.0, 34.0, 50.0, 70.0])
    return ct, spec, i0s


class TestPcdBins:
    def test_bins_partition_fluence(self, pcd_setup):
        ct, spec, i0s = pcd_setup
        assert i0s.shape[0] == 4
        from dexct_tpu.ops.spectral import effective_fluence

        base = effective_fluence(spec, ct)
        inband = base * (spec.E >= 20.0)
        np.testing.assert_allclose(i0s.sum(0), inband, rtol=1e-12)
        assert np.all(i0s.sum(1) > 0)


class TestMultibinRecovery:
    def synth(self, i0s, mus, a_true):
        L = a_true @ mus
        return (np.exp(-np.clip(L, -700, 700)) @ i0s.T).T

    def test_4bin_2mat_recovery(self, pcd_setup):
        ct, spec, i0s = pcd_setup
        ee = spec.E
        mus = np.stack([xcom.mixatten(m.matcomp, ee)
                        for m in (TISSUE, BONE)])
        rng = np.random.default_rng(0)
        a_true = np.stack([rng.uniform(0, 30, 300),
                           rng.uniform(0, 8, 300)], -1)
        counts = self.synth(i0s, mus, a_true)
        a = np.asarray(gauss_newton_solve(
            jnp.asarray(counts, jnp.float32), jnp.asarray(i0s, jnp.float32),
            jnp.asarray(mus, jnp.float32), n_iters=50))
        rel = np.abs(a - a_true) / np.maximum(np.abs(a_true), 1.0)
        assert rel.max() < 1e-3

    def test_4bin_3mat_recovery(self, pcd_setup):
        """Three-material (tissue/bone/iodine) decomposition from 4 PCD
        bins — needs the K-edge-ish spectral structure of iodine."""
        ct, spec, i0s = pcd_setup
        ee = spec.E
        basis = (TISSUE, BONE, IODINE)
        mus = np.stack([xcom.mixatten(m.matcomp, ee) for m in basis])
        rng = np.random.default_rng(1)
        a_true = np.stack([
            rng.uniform(5, 25, 200),
            rng.uniform(0, 5, 200),
            rng.uniform(0, 2, 200),
        ], -1)
        counts = self.synth(i0s, mus, a_true)
        a = np.asarray(gauss_newton_solve(
            jnp.asarray(counts, jnp.float32), jnp.asarray(i0s, jnp.float32),
            jnp.asarray(mus, jnp.float32), n_iters=200, step_max=2.0))
        err = np.abs(a - a_true)
        assert np.median(err) < 1e-4
        assert err.max() < 1e-2

    def test_sinogram_level_api(self, pcd_setup):
        ct, spec, i0s = pcd_setup
        ee = spec.E
        mus = np.stack([xcom.mixatten(m.matcomp, ee)
                        for m in (TISSUE, BONE)])
        v, c = 8, 64
        rng = np.random.default_rng(2)
        a1 = rng.uniform(0, 20, (v, c))
        a2 = rng.uniform(0, 5, (v, c))
        a1[0, 0] = a2[0, 0] = 0.0  # air ray
        a_true = np.stack([a1.ravel(), a2.ravel()], -1)
        counts = self.synth(i0s, mus, a_true).reshape(4, v, c)
        mats, mask = decompose_multibin_grid(
            counts, ee, i0s, (TISSUE, BONE), n_iters=40)
        mats = np.asarray(mats)
        assert mats.shape == (2, v, c)
        assert mats[0, 0, 0] == 0.0  # masked air
        keep = ~np.asarray(mask)
        np.testing.assert_allclose(mats[0][keep], a1[keep], atol=5e-3)

    def test_underdetermined_rejected(self, pcd_setup):
        ct, spec, i0s = pcd_setup
        with pytest.raises(ValueError):
            gauss_newton_solve(
                jnp.zeros((2, 4)), jnp.zeros((2, 10)), jnp.zeros((3, 10)))


class TestPhotonStarvation:
    def test_zero_count_bins_stay_finite(self, pcd_setup):
        """Rays with zero-count bins (photon starvation) must produce
        FINITE (railed) estimates, never NaN: the round-3 fix zeroes
        the Newton step when H underflows entirely and floors nu at the
        float32 overflow boundary of the MLE weights."""
        ct, spec, i0s = pcd_setup
        ee = spec.E
        mus = np.stack([xcom.mixatten(m.matcomp, ee)
                        for m in (TISSUE, BONE)])
        a_true = np.array([[5.7, 3.0], [3.0, 1.0], [0.0, 0.0],
                           [20.0, 8.0]])
        counts = self_synth(i0s, mus, a_true)  # [M, P]
        counts[0, 0] = 0.0   # one starved bin of ray 0
        counts[:, 3] = 0.0   # fully starved ray 3
        a = np.asarray(gauss_newton_solve(
            jnp.asarray(counts, jnp.float32), jnp.asarray(i0s, jnp.float32),
            jnp.asarray(mus, jnp.float32), n_iters=40))
        assert np.isfinite(a).all()
        # the healthy rays stay accurate
        np.testing.assert_allclose(a[1], a_true[1], atol=0.05)
        np.testing.assert_allclose(a[2], a_true[2], atol=0.05)


def self_synth(i0s, mus, a_true):
    L = a_true @ mus
    return ((np.exp(-np.clip(L, -700, 700)) @ i0s.T).T).copy()


class TestFourMaterial:
    """K = 4 decomposition (tissue/bone + two K-edge agents) — exercises
    the closed-form symmetric 4x4 adjugate solve in _solve_spd."""

    GD = Material("gadolinium solution", 1.05, "H(10.5)O(88.5)Gd(1.0)")

    def test_solve_spd_4x4_matches_lapack(self):
        from dexct_tpu.ops.matdecomp import _solve_spd, _tri_pairs

        rng = np.random.default_rng(7)
        X = rng.normal(size=(128, 4, 4))
        for shift in (0.0, 3.0):  # SPD and indefinite (full-Newton path)
            H = X @ X.transpose(0, 2, 1) + (0.1 - shift) * np.eye(4)
            dF = rng.normal(size=(128, 4))
            tri = _tri_pairs(4)
            H_tri = np.stack([H[:, i, j] for i, j in tri], -1)
            x = np.asarray(_solve_spd(jnp.asarray(H_tri), jnp.asarray(dF),
                                      4))
            xr = np.linalg.solve(H, dF[..., None])[..., 0]
            np.testing.assert_allclose(x, xr, rtol=2e-5, atol=1e-7)

    def test_6bin_4mat_recovery(self):
        """Noiseless 6-bin PCD counts from known (tissue, bone, I, Gd)
        area densities must be recovered: bins straddle BOTH K-edges
        (I 33.2 keV, Gd 50.2 keV)."""
        det = photon_counting_response()
        ct = FanBeamGeometry(N_channels=64, N_proj=8, gamma_fan=0.8,
                             SID=60.0, SDD=100.0, eid=False, detector=det)
        spec = kramers_spectrum(140.0)
        spec.rescale_counts(ct.A_iso * 20.0 / ct.N_proj)
        i0s = pcd_bin_fluences(ct, spec,
                               [20.0, 34.0, 45.0, 52.0, 65.0, 85.0])
        ee = spec.E
        basis = (TISSUE, BONE, IODINE, self.GD)
        mus = np.stack([xcom.mixatten(m.matcomp, ee) for m in basis])
        rng = np.random.default_rng(3)
        a_true = np.stack([
            rng.uniform(5, 25, 200),
            rng.uniform(0, 5, 200),
            rng.uniform(0, 2, 200),
            rng.uniform(0, 2, 200),
        ], -1)
        counts = self_synth(i0s, mus, a_true)
        a = np.asarray(gauss_newton_solve(
            jnp.asarray(counts, jnp.float32), jnp.asarray(i0s, jnp.float32),
            jnp.asarray(mus, jnp.float32), n_iters=200, step_max=2.0))
        err = np.abs(a - a_true)
        assert np.median(err) < 1e-3, np.median(err, axis=0)
        assert err.max() < 5e-2, err.max(axis=0)

    def test_grid_api_4mat(self):
        """decompose_multibin_grid routes K = 4 end-to-end."""
        from dexct_tpu.ops.matdecomp import decompose_multibin_grid

        det = photon_counting_response()
        ct = FanBeamGeometry(N_channels=32, N_proj=4, gamma_fan=0.8,
                             SID=60.0, SDD=100.0, eid=False, detector=det)
        spec = kramers_spectrum(140.0)
        spec.rescale_counts(ct.A_iso * 20.0 / ct.N_proj)
        i0s = pcd_bin_fluences(ct, spec,
                               [20.0, 34.0, 45.0, 52.0, 65.0, 85.0])
        ee = spec.E
        basis = (TISSUE, BONE, IODINE, self.GD)
        mus = np.stack([xcom.mixatten(m.matcomp, ee) for m in basis])
        rng = np.random.default_rng(4)
        v, c = 4, 32
        a_true = np.stack([rng.uniform(5, 20, v * c),
                           rng.uniform(0, 4, v * c),
                           rng.uniform(0, 1.5, v * c),
                           rng.uniform(0, 1.5, v * c)], -1)
        a_true[0] = 0.0  # air ray
        counts = self_synth(i0s, mus, a_true).reshape(6, v, c)
        mats, mask = decompose_multibin_grid(counts, ee, i0s, basis,
                                             n_iters=120)
        mats = np.asarray(mats)
        assert mats.shape == (4, v, c)
        assert mats[:, 0, 0].max() == 0.0  # masked air
        keep = ~np.asarray(mask).ravel()
        for k in range(4):
            np.testing.assert_allclose(mats[k].ravel()[keep],
                                       a_true[:, k][keep], atol=2e-2)
