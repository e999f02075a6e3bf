"""Tests for spectrum, detector, and material-table models."""

import numpy as np
import pytest

from dexct_tpu.physics import (
    AIR,
    BONE,
    DetectorResponse,
    MaterialTable,
    Spectrum,
    TISSUE,
    WATER,
    kramers_spectrum,
    linac_spectrum,
    photon_counting_response,
    scintillator_response,
    xRaySpectrum,
)


class TestSpectrum:
    def test_kramers_layout_matches_reference_format(self):
        # kV spectra: 140 bins, E = 1..140 keV, zero above kVp (SURVEY §2.4)
        s = kramers_spectrum(80.0)
        assert len(s.E) == 140
        np.testing.assert_allclose(s.E, np.arange(1.0, 141.0))
        assert np.all(s.I0[s.E > 80.0] == 0.0)
        assert abs(s.total_counts - 7.8e11) / 7.8e11 < 1e-6

    def test_linac_layout(self):
        s = linac_spectrum()
        assert len(s.E) == 100
        assert s.E[0] == 100.0 and s.E[-1] == 6000.0
        assert abs(s.total_counts - 7.4e6) / 7.4e6 < 1e-6

    def test_rescale_counts_is_multiplicative(self):
        s = kramers_spectrum(120.0)
        before = s.I0.copy()
        s.rescale_counts(0.5)
        np.testing.assert_allclose(s.I0, 0.5 * before)

    def test_bin_widths_first_bin_convention(self):
        # dE[0] = E[0] (reference convention, matdecomp.py:142)
        s = Spectrum(np.array([2.0, 4.0, 7.0]), np.ones(3))
        np.testing.assert_allclose(s.bin_widths(), [2.0, 2.0, 3.0])

    def test_file_roundtrip(self, tmp_path):
        s = kramers_spectrum(120.0)
        f = tmp_path / "120kV_1mGy_float32.bin"
        s.to_file(f)
        s2 = xRaySpectrum(f, "120kV")
        np.testing.assert_allclose(s2.E, s.E, rtol=1e-6)
        np.testing.assert_allclose(
            s2.I0, s.I0, rtol=1e-6, atol=s.I0.max() * 1e-12
        )
        assert s2.name == "120kV"

    def test_effective_water_mu_plausible(self):
        # fluence-weighted effective water mu for a lightly filtered 120 kV
        # beam lands between the 140 keV (0.15) and ~20 keV (0.8) extremes;
        # the shipped reference spectra are even softer (mean E ~ 43 keV).
        mu = kramers_spectrum(120.0).effective_water_mu()
        assert 0.16 < mu < 0.45

    def test_reference_spectrum_files_load(self):
        import os

        path = "/root/reference/input/spectrum/80kV_1mGy_float32.bin"
        if not os.path.exists(path):
            pytest.skip("reference data not mounted")
        s = xRaySpectrum(path, "80kV")
        assert len(s.E) == 140
        assert abs(s.total_counts - 7.8e11) / 7.8e11 < 0.05


class TestDetector:
    def test_scintillator_shape(self):
        d = scintillator_response()
        assert d.eta.min() > 0.0 and d.eta.max() <= 1.0
        # falls from ~1 at low E to a small value at 6 MeV (SURVEY §2.4)
        assert d.response(10.0) > 0.95
        assert d.response(6000.0) < 0.5

    def test_pcd_response(self):
        d = photon_counting_response()
        assert d.response(20.0) > 0.8
        assert d.response(6000.0) < 0.3

    def test_eid_weighting(self):
        d = DetectorResponse.ideal()
        e = np.array([50.0, 100.0])
        np.testing.assert_allclose(d.response(e, eid=True), e)
        np.testing.assert_allclose(d.response(e, eid=False), 1.0)

    def test_file_roundtrip(self, tmp_path):
        d = scintillator_response()
        f = tmp_path / "eta.bin"
        d.to_file(f)
        d2 = DetectorResponse.from_file(f)
        np.testing.assert_allclose(d2.eta, d.eta, rtol=1e-6)

    def test_reference_detector_files_load(self):
        import os

        path = "/root/reference/input/detector/eta_eid_mv.bin"
        if not os.path.exists(path):
            pytest.skip("reference data not mounted")
        d = DetectorResponse.from_file(path)
        assert len(d.E) == 6000
        assert d.eta.max() <= 1.0 + 1e-6


class TestMaterialTable:
    def test_csv_roundtrip(self, tmp_path):
        t = MaterialTable([AIR, WATER, TISSUE, BONE])
        f = tmp_path / "materials.csv"
        t.to_csv(f)
        t2 = MaterialTable.from_csv(f)
        assert t2.names == t.names
        np.testing.assert_allclose(t2.densities, t.densities)
        assert t2[3].matcomp == BONE.matcomp

    def test_csv_from_text(self):
        text = (
            "label,name,density,matcomp\n"
            "1,water,1.0,H(11.2)O(88.8)\n"
            "0,air,0.001205,N(75.5)O(23.2)Ar(1.3)\n"
        )
        t = MaterialTable.from_csv(text)
        assert t.names == ["air", "water"]

    def test_csv_rejects_gaps(self):
        text = "label,name,density,matcomp\n0,air,0.001,N(100)\n2,w,1,O(100)\n"
        with pytest.raises(ValueError):
            MaterialTable.from_csv(text)

    def test_mu_table_shape_and_values(self):
        t = MaterialTable([AIR, WATER, BONE])
        e = np.linspace(20.0, 140.0, 13)
        lut = t.mu_table(e)
        assert lut.shape == (3, 13)
        assert np.all(lut[0] < 1e-3)  # air is nearly transparent
        assert np.all(lut[2] > lut[1])  # bone > water
        # water linear attenuation at 60 keV ~ 0.206 /cm
        mid = t.mu_table(np.array([60.0]))[1, 0]
        assert abs(mid - 0.2059) / 0.2059 < 0.02
