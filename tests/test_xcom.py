"""Known-value physics tests for the xcom attenuation module.

Mirrors SURVEY.md §4 item 2: mu/rho mixtures vs anchor values, spectrum
integral conventions, composition-string parsing.
"""

import numpy as np
import pytest

from dexct_tpu.physics import xcom
from dexct_tpu.physics.materials import BONE, TISSUE, WATER


WATER_ANCHORS = {  # NIST liquid-water grid values [keV] -> [cm^2/g]
    10.0: 5.329, 20.0: 0.8096, 30.0: 0.3756, 40.0: 0.2683, 50.0: 0.2269,
    60.0: 0.2059, 80.0: 0.1837, 100.0: 0.1707, 150.0: 0.1505, 200.0: 0.1370,
    300.0: 0.1186, 500.0: 0.09687, 1000.0: 0.07072, 2000.0: 0.04942,
    6000.0: 0.02770,
}


class TestParse:
    def test_simple(self):
        out = xcom.parse_matcomp("H(11.2)O(88.8)")
        assert [s for s, _ in out] == ["H", "O"]
        np.testing.assert_allclose([w for _, w in out], [0.112, 0.888])

    def test_reference_tissue_string(self):
        # /root/reference/matdecomp.py:13
        out = xcom.parse_matcomp(
            "H(10.2)C(14.3)N(3.4)O(70.8)Na(0.2)P(0.3)S(0.3)Cl(0.2)K(0.3)"
        )
        assert len(out) == 9
        assert abs(sum(w for _, w in out) - 1.0) < 1e-12

    def test_two_letter_symbols(self):
        out = xcom.parse_matcomp("Ti(90)Al(6)V(4)")
        assert [s for s, _ in out] == ["Ti", "Al", "V"]

    def test_rejects_junk(self):
        with pytest.raises(ValueError):
            xcom.parse_matcomp("not a composition")
        with pytest.raises(ValueError):
            xcom.parse_matcomp("H(50)Xx(50)")
        with pytest.raises(ValueError):
            xcom.parse_matcomp("H(50) garbage O(50)")


class TestWaterAnchors:
    def test_water_matches_nist_grid(self):
        e = np.array(sorted(WATER_ANCHORS))
        ref = np.array([WATER_ANCHORS[x] for x in e])
        got = xcom.mixatten("H(11.2)O(88.8)", e)
        # Water is anchored by construction; the only slack is the 11.2/88.8
        # vs 11.19/88.81 mass split and grid interpolation.
        np.testing.assert_allclose(got, ref, rtol=0.02)

    def test_scalar_and_shape(self):
        v = xcom.mixatten("H(11.2)O(88.8)", 60.0)
        assert v.shape == ()
        assert abs(float(v) - 0.2059) / 0.2059 < 0.02
        grid = xcom.mixatten("H(11.2)O(88.8)", np.ones((3, 4)) * 60.0)
        assert grid.shape == (3, 4)

    def test_float64_output(self):
        assert xcom.mixatten("O(100)", np.array([60.0])).dtype == np.float64


class TestPhysicsShape:
    def test_monotone_decreasing_diagnostic_range(self):
        e = np.linspace(10.0, 200.0, 50)
        for mat in ["H(11.2)O(88.8)", TISSUE.matcomp, BONE.matcomp, "Fe(100)"]:
            mu = xcom.mixatten(mat, e)
            assert np.all(np.diff(mu) < 0.0), mat

    def test_bone_exceeds_tissue(self):
        e = np.array([40.0, 60.0, 80.0, 100.0, 150.0])
        bone = BONE.linear_atten(e)
        tissue = TISSUE.linear_atten(e)
        assert np.all(bone > tissue)
        # photoelectric Z-dependence: ratio larger at low energy
        ratio = bone / tissue
        assert ratio[0] > ratio[-1] > 1.0

    def test_klein_nishina_thomson_limit(self):
        sigma = xcom.klein_nishina_cross_section(np.array([0.01]))
        thomson = 8.0 * np.pi / 3.0 * xcom.ELECTRON_RADIUS_CM**2
        np.testing.assert_allclose(sigma, thomson, rtol=1e-3)

    def test_klein_nishina_100keV(self):
        sigma = float(xcom.klein_nishina_cross_section(100.0))
        assert abs(sigma - 4.927e-25) / 4.927e-25 < 0.05

    def test_iron_anchor(self):
        # Fe @ 100 keV was a calibration anchor (~0.372 cm^2/g).
        got = float(xcom.element_mu("Fe", 100.0))
        assert abs(got - 0.372) / 0.372 < 0.15

    def test_tungsten_k_edge_jump(self):
        ek = float(xcom.k_edge_keV(74))
        assert 65.0 < ek < 74.0
        below = float(xcom.element_mu("W", ek - 2.0))
        above = float(xcom.element_mu("W", ek + 2.0))
        assert above / below > 2.0

    def test_pair_production_rise_high_z(self):
        # Pair production makes high-Z mu/rho rise again above a few MeV.
        pb = xcom.element_mu("Pb", np.array([3000.0, 6000.0, 10000.0]))
        assert pb[2] > pb[0]
        w = xcom.mixatten("H(11.2)O(88.8)", np.array([3000.0, 10000.0]))
        assert w[1] < w[0]  # water keeps falling

    def test_cortical_bone_vs_nist(self):
        # ICRU-44 cortical bone: the hardest mixture the reference pipeline
        # depends on (basis material 2, matdecomp.py:15-17).
        e = np.array([30.0, 40.0, 50.0, 60.0, 80.0, 100.0, 150.0])
        nist = np.array([1.331, 0.6655, 0.4242, 0.3148, 0.2229, 0.186, 0.148])
        got = BONE.mass_atten(e)
        # rtol tightened 0.06 -> 0.01 with the round-3 vendored Ca/P tables
        np.testing.assert_allclose(got, nist, rtol=0.01)

    def test_soft_tissue_vs_nist(self):
        got = float(TISSUE.mass_atten(np.array([60.0]))[0])
        assert abs(got - 0.2048) / 0.2048 < 0.02

    def test_mv_energy_metal_anchors(self):
        """MV-beam metal attenuation (the reference study's regime):
        pair-production region anchors within a few percent."""
        for el, e, nist in [("Fe", 2000.0, 0.0425), ("Fe", 6000.0, 0.0305),
                            ("Pb", 6000.0, 0.04391), ("W", 6000.0, 0.04210)]:
            got = float(xcom.element_mu(el, e))
            assert abs(got - nist) / nist < 0.05, (el, e, got)

    def test_mixture_rule_linearity(self):
        e = np.linspace(20.0, 150.0, 20)
        mix = xcom.mixatten("O(50)Ca(50)", e)
        manual = 0.5 * xcom.element_mu("O", e) + 0.5 * xcom.element_mu("Ca", e)
        np.testing.assert_allclose(mix, manual, rtol=1e-12)


class TestRegistry:
    def test_register_override(self):
        e = np.array([1.0, 10000.0])
        try:
            xcom.register_element_table("Be", e, np.array([7.0, 7.0]))
            np.testing.assert_allclose(
                xcom.element_mu("Be", np.array([50.0, 500.0])), 7.0
            )
        finally:
            xcom._REGISTERED.clear()
            xcom._element_table_cached.cache_clear()

    def test_register_rejects_bad(self):
        with pytest.raises(ValueError):
            xcom.register_element_table("Xx", [1, 2], [1, 2])
        with pytest.raises(ValueError):
            xcom.register_element_table("Be", [1, 2, 3], [1, 2])


class TestFullPeriodicTable:
    """Round-5 VERDICT item 7: mixatten tabulated for Z = 1-92 — the
    frozen bracket construction (nist_data_full.py) with held-out-anchor
    uncertainty, live interpolation retired to fallback."""

    def test_every_element_resolves_from_tables(self):
        from dexct_tpu.physics.nist_data_full import FULL_TABLES, UNCERTAINTY

        es = np.array([10.0, 30.0, 60.0, 100.0, 500.0, 1250.0, 6000.0])
        n_frozen = 0
        for sym in xcom.ELEMENT_Z:
            mu = np.asarray(xcom.element_mu(sym, es))
            assert np.all(mu > 0) and np.all(np.isfinite(mu)), sym
            if sym in FULL_TABLES:
                n_frozen += 1
                assert sym in UNCERTAINTY
        assert n_frozen == 62 and len(FULL_TABLES) == 62

    def test_frozen_matches_live_construction(self):
        """The frozen tables sample the validated construction; away
        from edges the two must agree closely (the table is denser than
        the live grid only, never different physics)."""
        for sym in ("Ag", "Cd", "Nd", "Pt", "U", "Zn", "Sr"):
            ek = xcom.K_EDGE_KEV.get(sym, 0.0)
            es = np.geomspace(max(1.2 * ek, 15.0), 6000.0, 40)
            frozen = np.asarray(xcom.element_mu(sym, es))
            live = np.asarray(xcom._interp_element_mu(sym, es))
            np.testing.assert_allclose(frozen, live, rtol=0.02,
                                       err_msg=sym)

    def test_exact_k_edges_in_frozen_tables(self):
        """Edge positions are exact by construction: the jump sits at
        the element's own K edge, not at a warped anchor edge."""
        for sym, ek in (("Au", 80.7249), ("Ag", 25.514), ("U", 115.606)):
            lo = float(xcom.element_mu(sym, ek * (1 - 1e-6)))
            hi = float(xcom.element_mu(sym, ek * (1 + 1e-6)))
            assert hi / lo > 2.0, (sym, lo, hi)
            # and no jump just outside the edge bracket
            a = float(xcom.element_mu(sym, ek * 0.97))
            b = float(xcom.element_mu(sym, ek * 0.99))
            assert abs(b / a - 1.0) < 0.15, (sym, a, b)

    def test_uncertainty_bounds_are_honest(self):
        """CT-relevant brackets carry few-percent bounds; the H-C
        bracket (He..B, no CT relevance) is honestly large."""
        from dexct_tpu.physics.nist_data_full import UNCERTAINTY

        for sym in ("Zn", "Sr", "Ag", "Cs", "Pt", "U"):
            assert UNCERTAINTY[sym][0] < 0.04, (sym, UNCERTAINTY[sym])
        assert UNCERTAINTY["Be"][0] > 0.05

    def test_registered_table_still_wins(self):
        e = np.array([40.0, 60.0, 100.0])
        base = np.asarray(xcom.element_mu("Zn", e))
        try:
            xcom.register_element_table("Zn", e, base * 2.0)
            np.testing.assert_allclose(
                np.asarray(xcom.element_mu("Zn", e)), base * 2.0)
        finally:
            xcom._REGISTERED.pop("Zn", None)
            xcom._element_table_cached.cache_clear()
