"""Dual-layer and fast kV-switching DE acquisition modes.

Both map onto the framework's existing two-measurement machinery: the
dual layer as virtual spectra (Poisson thinning into disjoint layers —
physics/duallayer.py), kV-switching as alternating views + ring-interp
onto the common grid (pipeline/kvswitch.py).  The reference only ships
dual-scan DE (/root/reference/main.py:101-176); these are the two other
clinically deployed DE acquisition geometries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.physics import (dual_layer_spectra, kramers_spectrum,
                               layer_absorptions, linac_spectrum)
from dexct_tpu.pipeline.api import simulate_dect
from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom


def _system(n_proj=64):
    ct = FanBeamGeometry(N_channels=96, N_proj=n_proj,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=True)
    ph = contrast_rods_phantom(N=64, dx=0.35)
    return ct, ph


class TestDualLayer:
    def test_absorptions_partition_the_beam(self):
        E = np.arange(10.0, 150.0)
        a_f, a_b = layer_absorptions(E)
        assert np.all(a_f > 0) and np.all(a_b > 0)
        assert np.all(a_f + a_b <= 1.0 + 1e-12)  # disjoint events

    def test_spectral_separation(self):
        # the front layer's mean detected energy must sit clearly below
        # the back layer's — that separation is the DE signal
        s = kramers_spectrum(120.0)
        s.rescale_counts(1e6)
        sf, sb = dual_layer_spectra(s)
        e_f = np.sum(sf.E * sf.I0) / np.sum(sf.I0)
        e_b = np.sum(sb.E * sb.I0) / np.sum(sb.I0)
        assert e_b - e_f > 8.0  # keV

    def test_counts_conserved(self):
        s = kramers_spectrum(120.0)
        s.rescale_counts(1e6)
        sf, sb = dual_layer_spectra(s)
        # layers absorb at most the incident counts, and most of them
        # (a sandwich detector is built to stop the beam)
        tot = float(np.sum(sf.I0) + np.sum(sb.I0))
        assert tot <= float(np.sum(s.I0)) * (1 + 1e-12)
        assert tot > 0.5 * float(np.sum(s.I0))

    def test_decomposition_recovers_basis(self):
        # one 120 kV scan through the sandwich detector must produce a
        # usable basis decomposition (water rod ~ its density)
        ct, ph = _system()
        s = kramers_spectrum(120.0)
        s.rescale_counts(ct.A_iso * 10.0 / ct.N_proj)
        sf, sb = dual_layer_spectra(s)
        out = simulate_dect(ct, ph, sf, sb, 64, 20.0, 0.8, n_iters=20)
        m1 = np.asarray(out.mat_recons[0])  # tissue basis [g/cm^3]
        c = m1[28:36, 28:36].mean()  # center water region
        assert 0.8 < c < 1.2

    def test_simulate_wrapper(self):
        from dexct_tpu.physics import simulate_dual_layer_dect

        ct, ph = _system(n_proj=48)
        s = kramers_spectrum(120.0)
        s.rescale_counts(ct.A_iso * 10.0 / ct.N_proj)
        out = simulate_dual_layer_dect(ct, ph, s, 64, 20.0, 0.8,
                                       n_iters=10)
        assert np.asarray(out.mat_recons[0]).shape == (64, 64)


class TestKvSwitch:
    def test_acquired_views_pass_through(self):
        from dexct_tpu.pipeline.kvswitch import interp_skipped_views

        rng = np.random.default_rng(0)
        sino = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
        filled = interp_skipped_views(sino, 0)
        np.testing.assert_array_equal(np.asarray(filled)[0::2],
                                      np.asarray(sino)[0::2])
        # skipped views = ring-wrapped neighbor mean
        want = 0.5 * (np.asarray(sino)[0:-1:2]
                      + np.roll(np.asarray(sino), -2, 0)[0:-1:2])
        np.testing.assert_allclose(np.asarray(filled)[1::2], want,
                                   rtol=1e-6)

    def test_matches_dual_scan_noiseless(self):
        # on a smooth object the interpolation error is small: the
        # kV-switching basis images must track the full dual-scan truth
        from dexct_tpu.pipeline.kvswitch import simulate_kvswitch_dect

        ct, ph = _system(n_proj=96)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        full = simulate_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=15)
        sw = simulate_kvswitch_dect(ct, ph, s1, s2, 64, 20.0, 0.8,
                                    n_iters=15)
        # the tissue basis dominates this phantom and must track
        # tightly; the near-zero bone basis amplifies the relative
        # view-interpolation error at the sharp rod edges (the mode's
        # characteristic artifact) — bound it looser
        for k, bound in ((0, 0.10), (1, 0.20)):
            a = np.asarray(sw.mat_recons[k])
            b = np.asarray(full.mat_recons[k])
            rms = np.sqrt(np.mean((a - b) ** 2))
            scale = np.sqrt(np.mean(b ** 2)) + 1e-9
            assert rms / scale < bound, (k, rms / scale)

    def test_acquired_mask_zeroes_skipped_views(self):
        from dexct_tpu.pipeline.kvswitch import simulate_kvswitch_dect

        ct, ph = _system(n_proj=32)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        out = simulate_kvswitch_dect(ct, ph, s1, s2, 64, 20.0, 0.8,
                                     n_iters=5, do_recon=False)
        ra, rb = (np.asarray(x) for x in out.sino_raw)
        assert np.all(ra[1::2] == 0) and np.all(ra[0::2] > 0)
        assert np.all(rb[0::2] == 0) and np.all(rb[1::2] > 0)

    def test_odd_view_count_rejected(self):
        from dexct_tpu.pipeline.kvswitch import simulate_kvswitch_dect

        ct, ph = _system(n_proj=63)
        s = kramers_spectrum(80.0)
        s.rescale_counts(ct.A_iso / ct.N_proj)
        with pytest.raises(ValueError, match="even view count"):
            simulate_kvswitch_dect(ct, ph, s, s, 64, 20.0, 0.8)

    def test_noise_keys_independent(self):
        # the two spectra must draw INDEPENDENT noise: if the same key
        # reached both get_sino calls, the (Gaussian-limit) residuals
        # would be near-perfectly correlated ray for ray
        from dexct_tpu.pipeline.kvswitch import simulate_kvswitch_dect

        ct, ph = _system(n_proj=32)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        noisy = simulate_kvswitch_dect(ct, ph, s1, s2, 64, 20.0, 0.8,
                                       n_iters=5, noise="poisson",
                                       key=jax.random.PRNGKey(3),
                                       do_recon=False)
        clean = simulate_kvswitch_dect(ct, ph, s1, s2, 64, 20.0, 0.8,
                                       n_iters=5, do_recon=False)
        ra, rb = (np.asarray(x) for x in noisy.sino_raw)
        ca, cb = (np.asarray(x) for x in clean.sino_raw)
        assert ra[0::2].std() > 0
        # standardized residuals on each spectrum's acquired views
        res_a = (ra[0::2] - ca[0::2]) / np.sqrt(np.maximum(ca[0::2], 1))
        res_b = (rb[1::2] - cb[1::2]) / np.sqrt(np.maximum(cb[1::2], 1))
        r = np.corrcoef(res_a.ravel(), res_b.ravel())[0, 1]
        assert abs(r) < 0.1, r


class TestDualSource:
    """Dual-source DECT (pipeline/dualsource.py): exact angular
    alignment, equivalence to dual-scan without cross-scatter, and the
    cross-scatter artifact + coupled correction."""

    def _specs(self, ct):
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        return s1, s2

    def test_matches_dual_scan_exactly_without_crosstalk(self):
        """Alignment is a pure ring roll: with no cross-scatter and no
        noise, dual-source decomposition equals the dual-scan result to
        float tolerance (not just statistically)."""
        from dexct_tpu.pipeline.dualsource import simulate_dualsource_dect

        ct, ph = _system(n_proj=96)
        s1, s2 = self._specs(ct)
        full = simulate_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=15)
        ds = simulate_dualsource_dect(ct, ph, s1, s2, 64, 20.0, 0.8,
                                      n_iters=15)
        np.testing.assert_allclose(np.asarray(ds.mat_sinos[0]),
                                   np.asarray(full.mat_sinos[0]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(ds.mat_recons[1]),
                                   np.asarray(full.mat_recons[1]),
                                   atol=1e-5)

    def test_alignment_roundtrip(self):
        from dexct_tpu.pipeline.dualsource import align_tube_b

        x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)))
        y = align_tube_b(jnp.roll(x, -4, axis=0), 4)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))

    def test_short_scan_rejected(self):
        from dexct_tpu.pipeline.dualsource import simulate_dualsource_dect

        ct, ph = _system()
        import dataclasses

        ct = dataclasses.replace(ct, rotation_total=np.pi)
        s1, s2 = self._specs(ct)
        with pytest.raises(ValueError):
            simulate_dualsource_dect(ct, ph, s1, s2, 64, 20.0, 0.8)

    def test_cross_scatter_bias_and_correction(self):
        """Cross-scatter biases the basis images; the coupled
        fixed-point correction recovers most of it (>=3x)."""
        from dexct_tpu.pipeline.dualsource import simulate_dualsource_dect

        ct, ph = _system(n_proj=96)
        s1, s2 = self._specs(ct)
        kw = dict(n_iters=15, cross_spr=0.15)
        ref = simulate_dualsource_dect(ct, ph, s1, s2, 64, 20.0, 0.8,
                                       n_iters=15)
        bad = simulate_dualsource_dect(ct, ph, s1, s2, 64, 20.0, 0.8,
                                       correct=False, **kw)
        fix = simulate_dualsource_dect(ct, ph, s1, s2, 64, 20.0, 0.8,
                                       **kw)
        r = np.asarray(ref.mat_recons[0])
        e_bad = np.sqrt(np.mean((np.asarray(bad.mat_recons[0]) - r) ** 2))
        e_fix = np.sqrt(np.mean((np.asarray(fix.mat_recons[0]) - r) ** 2))
        assert e_bad > 3.0 * e_fix, (e_bad, e_fix)
        assert e_bad > 0.01  # the artifact is material

    def test_motion_temporal_resolution_advantage(self):
        """The mode's raison d'etre: under patient motion, the DE pair
        of a given ray is measured a quarter-turn apart (dual-source)
        instead of a full rotation apart (dual-scan).  The COMMON-MODE
        motion blur is identical for both protocols (measured: whole-
        image basis rms vs static truth is ~equal), so the advantage is
        isolated on the PAIR-MISMATCH term: decompose each protocol's
        pair against the pose-consistent baseline (both spectra on the
        first track) and compare the residuals."""
        from dexct_tpu.ops.motion import (MotionProfile,
                                          material_path_sinogram_motion)
        from dexct_tpu.pipeline.api import get_basismat_sinos, get_sino

        ct, ph = _system(n_proj=96)
        s1, s2 = self._specs(ct)
        V = ct.N_proj
        k = V // 4
        # a monotonic half breathing cycle over the TWO-rotation
        # dual-scan protocol (slow drift: the pair gap scales ~linearly
        # with the measurement time separation)
        full_track = MotionProfile.breathing(2 * V, amplitude_cm=0.5,
                                             cycles=0.5,
                                             direction=(1.0, 0.3))
        m1 = MotionProfile(full_track.phi[:V], full_track.disp[:V])
        m2 = MotionProfile(full_track.phi[V:], full_track.disp[V:])
        # dual-source: tube B's pose at angular index w is the pose a
        # quarter turn of TIME earlier (simulate_dualsource_dect's roll)
        m_ds = MotionProfile(np.roll(m1.phi, k), np.roll(m1.disp, k,
                                                         axis=0))

        p1 = material_path_sinogram_motion(ph, ct, m1)
        raw1, _ = get_sino(ct, ph, s1, paths=p1)

        def mat1_for(track2):
            p2 = material_path_sinogram_motion(ph, ct, track2)
            raw2, _ = get_sino(ct, ph, s2, paths=p2)
            m, _ = get_basismat_sinos(ct, raw1, raw2, s1, s2, n_iters=15)
            return np.asarray(m)

        base = mat1_for(m1)          # pose-consistent pair
        e_scan = np.sqrt(np.mean((mat1_for(m2) - base) ** 2))
        e_ds = np.sqrt(np.mean((mat1_for(m_ds) - base) ** 2))
        assert e_ds < 0.5 * e_scan, (e_scan, e_ds)
