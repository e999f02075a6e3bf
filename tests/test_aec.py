"""Automatic exposure control (tube-current modulation): the sqrt rule
derived from the package's own noise model, its exactness under the
log normalization / decomposition, and the dose accounting.

Reference anchor: generalizes the reference's single global fluence
scale (params.txt N_photons_per_cm2_per_scan) to a per-view profile —
the clinical dose-reduction feature its dose studies (plots.py dose
panels) sweep uniformly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dexct_tpu.ops.aec import (
    aec_profile,
    normalize_counts,
    view_noise_potential,
    z_profile_from_volume,
)
from dexct_tpu.ops.noisemap import fbp_variance_map
from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.physics.materials import AIR, WATER, MaterialTable
from dexct_tpu.pipeline.api import get_sino
from dexct_tpu.system.geometry import FanBeamGeometry
from dexct_tpu.system.phantom import VoxelPhantom, water_cylinder_phantom


def _geometry(nch=96, nproj=96):
    return FanBeamGeometry(N_channels=nch, N_proj=nproj, gamma_fan=0.9,
                           SID=60.0, SDD=100.0, h_iso=0.1, eid=False)


def _ellipse_phantom(N=64, dx=0.25, a_cm=7.5, b_cm=2.0):
    """Eccentric water ellipse — the canonical angular-AEC beneficiary
    (lateral rays see 2a, AP rays see 2b)."""
    ys = (np.arange(N) + 0.5 - N / 2) * dx
    xx, yy = np.meshgrid(ys, ys, indexing="xy")
    lab = ((xx / a_cm) ** 2 + (yy / b_cm) ** 2 <= 1.0).astype(np.uint8)
    return VoxelPhantom("ellipse", lab[None], MaterialTable([AIR, WATER]),
                        dx, dx, dx)


def _planning(ct, ph, spec):
    raw, slog = get_sino(ct, ph, spec)
    return np.asarray(raw), np.asarray(slog)


class TestProfile:
    def test_centered_cylinder_flat(self):
        """A centered cylinder sees the same attenuation from every
        angle: the optimal profile is flat."""
        ct = _geometry()
        ph = water_cylinder_phantom(N=64, dx=0.25, radius_cm=5.0)
        spec = kramers_spectrum(100.0)
        spec.rescale_counts(ct.A_iso * 20.0 / ct.N_proj)
        _, slog = _planning(ct, ph, spec)
        s, info = aec_profile(slog)
        assert np.abs(s - 1.0).max() < 0.02
        assert abs(info["var_ratio"] - 1.0) < 1e-3

    def test_ellipse_modulates_laterally(self):
        """The profile peaks where the rays are longest (lateral views,
        source on the y axis for an x-major ellipse) and bottoms at AP
        views — and respects the clip bounds."""
        ct = _geometry()
        ph = _ellipse_phantom()
        spec = kramers_spectrum(100.0)
        spec.rescale_counts(ct.A_iso * 20.0 / ct.N_proj)
        _, slog = _planning(ct, ph, spec)
        s, info = aec_profile(slog, floor=0.3, ceil=3.0)
        betas = np.asarray(ct.betas)
        # source at +-x shoots its central rays ALONG x — through the
        # 2a major axis (long path); source at +-y sees the short 2b
        long_path = np.abs(np.cos(betas)) > 0.95
        short_path = np.abs(np.sin(betas)) > 0.95
        assert s[long_path].mean() > 1.2 * s[short_path].mean()
        assert s.min() >= 0.3 - 1e-12 and s.max() <= 3.0 + 1e-12
        assert abs(s.mean() - 1.0) < 1e-6  # normalize='dose'
        assert info["var_ratio"] < 0.92  # ~11% variance cut, same dose

    def test_sqrt_rule_is_the_optimum(self):
        """Any other normalized profile (uniform, linear-in-V,
        perturbed) predicts HIGHER variance at the same dose — the
        Lagrange optimality of s ∝ sqrt(V)."""
        ct = _geometry()
        ph = _ellipse_phantom()
        spec = kramers_spectrum(100.0)
        spec.rescale_counts(ct.A_iso * 20.0 / ct.N_proj)
        _, slog = _planning(ct, ph, spec)
        V = view_noise_potential(slog)
        s_opt, info = aec_profile(slog, floor=1e-6, ceil=1e6)

        def predicted_var(s):
            s = s / s.mean()  # same total dose
            return np.mean(V / s)

        v_opt = predicted_var(s_opt)
        rng = np.random.default_rng(0)
        for s_alt in (np.ones_like(V), V / V.mean(),
                      s_opt * np.exp(0.1 * rng.standard_normal(len(V)))):
            assert v_opt <= predicted_var(s_alt) * (1 + 1e-9)


class TestExactness:
    def test_noiseless_log_sino_invariant(self):
        """Tube-current modulation changes statistics, not line
        integrals: the noiseless AEC log sinogram equals the
        unmodulated one."""
        ct = _geometry(nch=64, nproj=48)
        ph = _ellipse_phantom(N=48)
        spec = kramers_spectrum(100.0)
        spec.rescale_counts(ct.A_iso * 20.0 / ct.N_proj)
        raw0, slog0 = get_sino(ct, ph, spec)
        s = np.linspace(0.5, 2.0, ct.N_proj)
        raw1, slog1 = get_sino(ct, ph, spec, aec=s)
        np.testing.assert_allclose(np.asarray(raw1),
                                   np.asarray(raw0) * s[:, None],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(slog1), np.asarray(slog0),
                                   rtol=0, atol=2e-6)

    def test_normalize_counts_restores_decomposition_input(self):
        ct = _geometry(nch=64, nproj=48)
        ph = _ellipse_phantom(N=48)
        spec = kramers_spectrum(100.0)
        spec.rescale_counts(ct.A_iso * 20.0 / ct.N_proj)
        raw0, _ = get_sino(ct, ph, spec)
        s = np.linspace(0.5, 2.0, ct.N_proj)
        raw1, _ = get_sino(ct, ph, spec, aec=s)
        back = np.asarray(normalize_counts(jnp.asarray(raw1), s))
        np.testing.assert_allclose(back, np.asarray(raw0), rtol=1e-6)


class TestNoiseAndDose:
    def test_equal_dose_variance_drops_in_real_fbp_model(self):
        """The package's own analytic FBP variance map (validated
        against ensembles in test_noisemap) confirms the predicted
        variance cut: AEC at the same total dose lowers the center-ROI
        variance."""
        ct = _geometry()
        ph = _ellipse_phantom()
        spec = kramers_spectrum(100.0)
        air0 = ct.A_iso * 2e3 / ct.N_proj
        spec.rescale_counts(air0)
        raw, slog = _planning(ct, ph, spec)
        s, info = aec_profile(slog, floor=0.3, ceil=3.0)
        n, fov = 64, 16.0
        v_uni = np.asarray(fbp_variance_map(jnp.asarray(raw), ct, n, fov))
        v_aec = np.asarray(fbp_variance_map(
            jnp.asarray(raw * s[:, None]), ct, n, fov))
        c = slice(n // 2 - 4, n // 2 + 4)
        ratio = v_aec[c, c].mean() / v_uni[c, c].mean()
        assert ratio < 0.94
        # the model prediction is averaged over the image; the center
        # ROI should agree to ~15%
        assert abs(ratio - info["var_ratio"]) < 0.15

    def test_equal_noise_dose_drops(self):
        """normalize='noise': predicted variance matches uniform while
        the measured dose (dose_map with view_weights) drops by the
        advertised ratio."""
        from dexct_tpu.ops.dose import dose_map

        ct = _geometry(nch=64, nproj=48)
        ph = _ellipse_phantom(N=48)
        spec = kramers_spectrum(100.0)
        spec.rescale_counts(ct.A_iso * 20.0 / ct.N_proj)
        _, slog = _planning(ct, ph, spec)
        s, info = aec_profile(slog, normalize="noise", floor=0.3, ceil=3.0)
        assert abs(info["var_ratio"] - 1.0) < 1e-9
        assert info["dose_ratio"] < 0.95
        d_uni = dose_map(ph, ct, spec)
        d_aec = dose_map(ph, ct, spec, view_weights=s)
        ratio = d_aec.deposited_J / d_uni.deposited_J
        # the fluence-sum prediction sum(s)/V is conservative here:
        # the high-mA (long-path) views illuminate the ellipse's NARROW
        # cross-section, so their extra fluence deposits less energy
        # per unit than average — the measured saving is at least the
        # advertised one (measured 0.84 vs predicted 0.89 at this
        # config), never materially worse
        assert ratio <= info["dose_ratio"] + 0.01
        assert abs(ratio - info["dose_ratio"]) < 0.10

    def test_view_weights_linear(self):
        """Per-view weighting is exactly linear in the kernel."""
        from dexct_tpu.ops.dose import dose_map

        ct = _geometry(nch=48, nproj=16)
        ph = water_cylinder_phantom(N=48, dx=0.25, radius_cm=4.0)
        spec = kramers_spectrum(100.0)
        spec.rescale_counts(ct.A_iso * 20.0 / ct.N_proj)
        d1 = dose_map(ph, ct, spec)
        d2 = dose_map(ph, ct, spec,
                      view_weights=np.full(ct.N_proj, 2.0))
        np.testing.assert_allclose(d2.dose_mGy, 2.0 * d1.dose_mGy,
                                   rtol=1e-6)
        np.testing.assert_allclose(d2.deposited_J, 2.0 * d1.deposited_J,
                                   rtol=1e-6)


class TestZProfile:
    def test_tracks_water_equivalent_diameter(self):
        """Longitudinal modulation seed: the per-slice water-equivalent
        diameter of a z-varying stack orders the per-view potential."""
        from dexct_tpu.system.geometry import HelicalConeBeamGeometry

        nz, N = 24, 32
        ys = (np.arange(N) + 0.5 - N / 2) * 0.5
        xx, yy = np.meshgrid(ys, ys, indexing="xy")
        lab = np.zeros((nz, N, N), np.uint8)
        for k in range(nz):
            r = 2.0 + 4.0 * k / (nz - 1)  # cone: thin head -> wide belly
            lab[k] = (np.hypot(xx, yy) <= r).astype(np.uint8)
        ph = VoxelPhantom("zcone", lab, MaterialTable([AIR, WATER]),
                          0.5, 0.5, 0.5)
        ct = HelicalConeBeamGeometry(
            N_channels=32, N_proj=64, N_rows=4, gamma_fan=0.9, SID=60.0,
            SDD=100.0, h_iso=0.25, eid=True, pitch=6.0,
            rotation_total=4.0 * np.pi)
        V_view, d_weq = z_profile_from_volume(ph, ct)
        assert d_weq[-1] > d_weq[0] * 1.5
        # the source moves monotonically in z, so the per-view potential
        # must be (weakly) increasing alongside it
        assert V_view[-1] > V_view[0]
        assert np.all(np.diff(V_view) >= -1e-9)
