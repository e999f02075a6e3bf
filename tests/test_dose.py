"""Dose-deposition maps: energy conservation, analytic anchors, CTDI."""

import numpy as np
import pytest

from dexct_tpu.ops.dose import (
    beam_energy_removed,
    ctdi_metrics,
    dose_map,
)
from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.physics.materials import AIR, WATER, MaterialTable
from dexct_tpu.system.geometry import FanBeamGeometry
from dexct_tpu.system.phantom import VoxelPhantom, water_cylinder_phantom
from dexct_tpu.physics.spectrum import Spectrum


def _geometry(nch=96, nproj=48):
    return FanBeamGeometry(N_channels=nch, N_proj=nproj, gamma_fan=0.9,
                           SID=60.0, SDD=100.0, h_iso=0.1, eid=True)


class TestConservation:
    def test_deposited_equals_beam_energy_removed(self):
        """Local-deposition scoring integrates to exactly the energy the
        Beer-Lambert forward model removes from the beam (the module's
        defining invariant); tolerance covers polar-grid discretization
        vs the exact-Siddon reference paths."""
        ph = water_cylinder_phantom(N=64, dx=0.2, radius_cm=4.0)
        ct = _geometry()
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(ct.A_iso * 50.0 / ct.N_proj)
        res = dose_map(ph, ct, spec, oversample=3)
        removed = beam_energy_removed(ph, ct, spec)
        assert removed > 0
        assert abs(res.deposited_J - removed) / removed < 0.05

    def test_dose_linear_in_counts(self):
        ph = water_cylinder_phantom(N=48, dx=0.25, radius_cm=4.0)
        ct = _geometry(nch=64, nproj=24)
        # rescale_counts is multiplicative in place: use fresh spectra
        s1 = kramers_spectrum(100.0)
        s1.rescale_counts(ct.A_iso * 10.0 / ct.N_proj)
        d1 = dose_map(ph, ct, s1).dose_mGy
        s3 = kramers_spectrum(100.0)
        s3.rescale_counts(ct.A_iso * 30.0 / ct.N_proj)
        d3 = dose_map(ph, ct, s3).dose_mGy
        np.testing.assert_allclose(d3, 3.0 * d1, rtol=1e-4, atol=1e-12)


class TestAnalyticAnchors:
    def test_mono_center_dose(self):
        """Center of a water cylinder, single-energy beam: every view
        contributes phi(SID) e^{-mu R} mu E / rho."""
        R, E0, n_ph = 4.0, 60.0, 1e8
        ph = water_cylinder_phantom(N=64, dx=0.2, radius_cm=R)
        ct = _geometry()
        spec = Spectrum(np.array([E0]), np.array([n_ph]), "mono60")
        res = dose_map(ph, ct, spec, oversample=3)
        from dexct_tpu.physics import xcom

        mu_w = float(xcom.mixatten("H(11.2)O(88.8)", np.array([E0]))[0])
        # photons per channel = I0 * dE with the single bin spanning
        # 0..E0 (spectrum.bin_widths convention)
        n_photons = n_ph * E0
        phi_iso = n_photons * ct.SID / (ct.dgamma * ct.h_iso * ct.SID**2)
        expect = (ct.N_proj * phi_iso * np.exp(-mu_w * R) * mu_w * E0
                  / 1.0)  # keV/g (rho_water = 1)
        expect_mGy = expect * 1.602176634e-16 / 1e-3 * 1e3
        n = res.dose_mGy.shape[0]
        c = res.dose_mGy[n // 2 - 2:n // 2 + 2, n // 2 - 2:n // 2 + 2]
        np.testing.assert_allclose(c.mean(), expect_mGy, rtol=0.05)

    def test_air_iso_inverse_square(self):
        """Empty (air) scan: dose at isocenter follows the unattenuated
        inverse-square fluence to sub-percent."""
        E0, n_ph = 60.0, 1e8
        mats = MaterialTable([AIR, WATER])
        ph = VoxelPhantom("air", np.zeros((48, 48), np.uint8), mats,
                          0.25, 0.25, 0.25)
        ct = _geometry(nch=64, nproj=16)
        spec = Spectrum(np.array([E0]), np.array([n_ph]), "mono60")
        res = dose_map(ph, ct, spec, oversample=3)
        mu_air = AIR.linear_atten(np.array([E0]))[0]
        n_photons = n_ph * E0  # single bin spans 0..E0
        phi_iso = n_photons * ct.SID / (ct.dgamma * ct.h_iso * ct.SID**2)
        expect = (ct.N_proj * phi_iso * mu_air * E0 / AIR.density
                  * 1.602176634e-10)  # keV/g -> mGy; air attenuation ~0
        n = res.dose_mGy.shape[0]
        got = res.dose_mGy[n // 2 - 1:n // 2 + 1, n // 2 - 1:n // 2 + 1]
        np.testing.assert_allclose(got.mean(), expect, rtol=0.02)


class TestCtdi:
    def test_depth_dose_and_weighting(self):
        """Surface dose exceeds center dose in an attenuating cylinder,
        and ctdi_w applies the 1/3-2/3 IEC weighting."""
        ph = water_cylinder_phantom(N=64, dx=0.25, radius_cm=7.0)
        ct = _geometry()
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(ct.A_iso * 50.0 / ct.N_proj)
        res = dose_map(ph, ct, spec, oversample=3)
        m = ctdi_metrics(res.dose_mGy, ph.dx, phantom_radius_cm=7.0)
        assert m["periphery"] > m["center"] > 0
        np.testing.assert_allclose(
            m["ctdi_w"], m["center"] / 3 + 2 * m["periphery"] / 3,
            rtol=1e-12)

    def test_roi_validation(self):
        with pytest.raises(ValueError, match="ROI"):
            ctdi_metrics(np.ones((16, 16)), 1.0, phantom_radius_cm=40.0,
                         roi_radius_cm=0.01)
