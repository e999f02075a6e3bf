"""Tube current modulation (pipeline/tcm.py): noiseless invariance,
dose conservation, and the noise-equalization payoff on an eccentric
object (the reason scanners modulate)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.pipeline.api import simulate_dect
from dexct_tpu.pipeline.tcm import auto_tcm_profile, simulate_tcm_dect
from dexct_tpu.system import FanBeamGeometry, water_cylinder_phantom


def _ellipse_phantom(N=64, dx=0.35):
    """Eccentric water ellipse: TCM pays only on non-round objects."""
    ph = water_cylinder_phantom(N=N, dx=dx)
    yy, xx = np.mgrid[0:N, 0:N]
    cy = cx = (N - 1) / 2
    ell = (((xx - cx) / (0.45 * N)) ** 2
           + ((yy - cy) / (0.18 * N)) ** 2) <= 1.0
    labels = np.where(ell, 1, 0).astype(np.uint8)[None]
    return dataclasses.replace(ph, labels=labels)


def _system():
    ct = FanBeamGeometry(N_channels=96, N_proj=128,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=True)
    ph = _ellipse_phantom()
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 2.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 0.3 / ct.N_proj)
    return ct, ph, s1, s2


class TestTcm:
    def test_profile_follows_attenuation(self):
        # the 80 kV beam (s2) sees the ellipse's eccentricity; the MV
        # beam barely attenuates and would modulate ~1%
        ct, ph, _, s2 = _system()
        m = np.asarray(auto_tcm_profile(ct, ph, s2))
        assert m.shape == (ct.N_proj,)
        np.testing.assert_allclose(m.mean(), 1.0, rtol=1e-5)
        # the ellipse's long axis (side views) must draw more current
        assert m.max() / m.min() > 1.2

    def test_noiseless_matches_unmodulated(self):
        ct, ph, s1, s2 = _system()
        base = simulate_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=8)
        tcm = simulate_tcm_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=8)
        np.testing.assert_allclose(np.asarray(tcm.recon_raw[0]),
                                   np.asarray(base.recon_raw[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(tcm.mat_sinos[0]),
                                   np.asarray(base.mat_sinos[0]),
                                   atol=1e-4)

    def test_total_output_conserved(self):
        ct, ph, _, s2 = _system()
        m = np.asarray(auto_tcm_profile(ct, ph, s2, strength=1.0))
        np.testing.assert_allclose(m.sum(), ct.N_proj, rtol=1e-5)

    def test_noise_equalization_payoff(self):
        # at the SAME total tube output, attenuation-following TCM must
        # reduce the noise in the reconstruction of an eccentric object
        ct, ph, s1, s2 = _system()
        roi = (slice(28, 36), slice(24, 40))

        def roi_noise(m, seed):
            outs = []
            for k in range(4):
                r = simulate_tcm_dect(
                    ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=6,
                    m=m, noise="poisson",
                    key=jax.random.PRNGKey(seed + k))
                # the 80 kV image carries the noise the TCM targets
                outs.append(np.asarray(r.recon_raw[1]))
            outs = np.stack(outs)
            # noise = std across realizations, averaged over the ROI
            return float(outs.std(axis=0)[roi].mean())

        m_flat = jnp.ones(ct.N_proj)
        m_tcm = auto_tcm_profile(ct, ph, s2, strength=1.0)
        n_flat = roi_noise(m_flat, 10)
        n_tcm = roi_noise(m_tcm, 10)
        assert n_tcm < 0.95 * n_flat, (n_tcm, n_flat)


class TestAecExtensions:
    """Round-3 extensions: ROI-targeted potential, noise-normalized
    dose saving, exact count normalization, dose accounting via
    dose_map(view_weights), longitudinal (z) modulation seed."""

    def _eccentric(self):
        ct = FanBeamGeometry(N_channels=96, N_proj=96,
                             gamma_fan=0.9, SID=60.0, SDD=100.0,
                             eid=False)
        import dataclasses as dc

        N, dx, a, b = 64, 0.25, 7.5, 2.0
        ph = water_cylinder_phantom(N=N, dx=dx)
        ys = (np.arange(N) + 0.5 - N / 2) * dx
        xx, yy = np.meshgrid(ys, ys, indexing="xy")
        lab = ((xx / a) ** 2 + (yy / b) ** 2 <= 1.0).astype(np.uint8)
        ph = dc.replace(ph, labels=lab[None])
        spec = kramers_spectrum(100.0)
        spec.rescale_counts(ct.A_iso * 20.0 / ct.N_proj)
        return ct, ph, spec

    def test_sqrt_rule_is_the_optimum(self):
        """Any other same-dose profile (uniform, linear-in-W,
        perturbed) predicts HIGHER variance — the Lagrange optimality
        of m ∝ sqrt(W)."""
        ct, ph, spec = self._eccentric()
        m, info = auto_tcm_profile(ct, ph, spec, m_min=1e-6, m_max=1e6,
                                   channel_window=0.05, report=True)
        m = np.asarray(m)
        W = info["potential"]

        def predicted_var(mm):
            mm = mm / mm.mean()  # same total output
            return np.mean(W / mm)

        v_opt = predicted_var(m)
        rng = np.random.default_rng(0)
        for alt in (np.ones_like(W), W / W.mean(),
                    m * np.exp(0.1 * rng.standard_normal(len(W)))):
            assert v_opt <= predicted_var(alt) * (1 + 1e-9)
        assert info["var_ratio"] < 0.92  # ~10% variance cut, same dose

    def test_equal_dose_variance_drops_in_fbp_variance_model(self):
        """The package's analytic FBP variance map (ensemble-validated
        in test_noisemap) confirms the predicted center-ROI cut."""
        from dexct_tpu.ops.noisemap import fbp_variance_map
        from dexct_tpu.pipeline.api import get_sino

        ct, ph, spec = self._eccentric()
        m, info = auto_tcm_profile(ct, ph, spec, m_min=0.3, m_max=3.0,
                                   channel_window=0.05, report=True)
        m = np.asarray(m)
        raw, _ = get_sino(ct, ph, spec)
        raw = np.asarray(raw)
        n, fov = 64, 16.0
        v_uni = np.asarray(fbp_variance_map(jnp.asarray(raw), ct, n, fov))
        v_tcm = np.asarray(fbp_variance_map(
            jnp.asarray(raw * m[:, None]), ct, n, fov))
        c = slice(n // 2 - 4, n // 2 + 4)
        ratio = v_tcm[c, c].mean() / v_uni[c, c].mean()
        assert ratio < 0.94
        assert abs(ratio - info["var_ratio"]) < 0.15

    def test_equal_noise_dose_drops(self):
        """normalize='noise': predicted variance matches uniform while
        the measured dose (dose_map with view_weights) drops at least
        as much as the fluence-sum prediction."""
        from dexct_tpu.ops.dose import dose_map

        ct, ph, spec = self._eccentric()
        m, info = auto_tcm_profile(ct, ph, spec, m_min=0.3, m_max=3.0,
                                   channel_window=0.05,
                                   normalize="noise", report=True)
        m = np.asarray(m)
        assert abs(info["var_ratio"] - 1.0) < 1e-6
        assert info["dose_ratio"] < 0.95
        d_uni = dose_map(ph, ct, spec)
        d_tcm = dose_map(ph, ct, spec, view_weights=m)
        ratio = d_tcm.deposited_J / d_uni.deposited_J
        # the fluence-sum prediction is conservative here: high-mA
        # (long-path) views illuminate the ellipse's NARROW
        # cross-section, so their extra fluence deposits less energy
        # per unit than average
        assert ratio <= info["dose_ratio"] + 0.01
        assert abs(ratio - info["dose_ratio"]) < 0.10

    def test_forward_counts_tcm_invariance_and_normalization(self):
        """Tube output modulation changes statistics, not line
        integrals: the noiseless tcm= log sinogram equals the
        unmodulated one, and normalize_counts restores the exact
        decomposition input."""
        from dexct_tpu.pipeline.api import get_sino
        from dexct_tpu.pipeline.tcm import normalize_counts

        ct, ph, spec = self._eccentric()
        raw0, slog0 = get_sino(ct, ph, spec)
        m = np.linspace(0.5, 2.0, ct.N_proj)
        raw1, slog1 = get_sino(ct, ph, spec, tcm=m)
        np.testing.assert_allclose(np.asarray(raw1),
                                   np.asarray(raw0) * m[:, None],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(slog1), np.asarray(slog0),
                                   rtol=0, atol=2e-6)
        back = np.asarray(normalize_counts(jnp.asarray(raw1), m))
        np.testing.assert_allclose(back, np.asarray(raw0), rtol=1e-6)

    def test_view_weights_linear(self):
        from dexct_tpu.ops.dose import dose_map

        ct = FanBeamGeometry(N_channels=48, N_proj=16, gamma_fan=0.9,
                             SID=60.0, SDD=100.0, h_iso=0.1, eid=True)
        ph = water_cylinder_phantom(N=48, dx=0.25)
        spec = kramers_spectrum(100.0)
        spec.rescale_counts(ct.A_iso * 20.0 / ct.N_proj)
        d1 = dose_map(ph, ct, spec)
        d2 = dose_map(ph, ct, spec, view_weights=np.full(ct.N_proj, 2.0))
        np.testing.assert_allclose(d2.dose_mGy, 2.0 * d1.dose_mGy,
                                   rtol=1e-6)
        np.testing.assert_allclose(d2.deposited_J, 2.0 * d1.deposited_J,
                                   rtol=1e-6)

    def test_z_profile_tracks_water_equivalent_diameter(self):
        from dexct_tpu.pipeline.tcm import z_profile_from_volume
        from dexct_tpu.physics.materials import AIR, WATER, MaterialTable
        from dexct_tpu.system.geometry import HelicalConeBeamGeometry
        from dexct_tpu.system.phantom import VoxelPhantom

        nz, N = 24, 32
        ys = (np.arange(N) + 0.5 - N / 2) * 0.5
        xx, yy = np.meshgrid(ys, ys, indexing="xy")
        lab = np.zeros((nz, N, N), np.uint8)
        for k in range(nz):
            r = 2.0 + 4.0 * k / (nz - 1)  # thin head -> wide belly
            lab[k] = (np.hypot(xx, yy) <= r).astype(np.uint8)
        ph = VoxelPhantom("zcone", lab, MaterialTable([AIR, WATER]),
                          0.5, 0.5, 0.5)
        ct = HelicalConeBeamGeometry(
            N_channels=32, N_proj=64, N_rows=4, gamma_fan=0.9, SID=60.0,
            SDD=100.0, h_iso=0.25, eid=True, pitch=6.0,
            rotation_total=4.0 * np.pi)
        W_view, d_weq = z_profile_from_volume(ph, ct)
        assert d_weq[-1] > d_weq[0] * 1.5
        assert W_view[-1] > W_view[0]
        assert np.all(np.diff(W_view) >= -1e-9)
