"""Fidelity tests for the vendored NIST attenuation data (nist_data.py).

VERDICT.md round-1 item 2: the reference's ``xcompy`` is real NIST XCOM data
(/root/reference/matdecomp.py:7); the MV-kV metal-implant study
(plots.py:485-534) depends on absolute accuracy for every constituent of the
implant alloys.  These tests pin: anchor spot values, exact edge energies,
physics self-consistency (Klein-Nishina floor, Z^2 pair scaling), the
bracket-interpolation error bound (leave-one-out), and compound values
against independently known NIST mixture data (ICRU-44 tissue/bone).
"""

import numpy as np
import pytest

from dexct_tpu.physics import xcom
from dexct_tpu.physics.nist_data import ANCHOR_TABLES, K_EDGE_KEV

# every element appearing in the reference study's materials
# (tissue/bone constituents matdecomp.py:12-17; implant alloys
# plots.py:487-498) plus the contrast agents I/Ba/Gd
STUDY_ELEMENTS = (
    "H C N O Na Mg Al Si P S Cl K Ca Ti V Cr Mn Fe Co Ni Cu Nb Mo "
    "I Ba Gd W Pb"
).split()


class TestAnchors:
    def test_anchor_spot_values(self):
        """High-confidence NIST grid values reproduced exactly."""
        for sym, e, val in [
            ("C", 100.0, 0.1514), ("N", 50.0, 0.1980), ("O", 10.0, 5.952),
            ("Al", 30.0, 1.128), ("Si", 10.0, 33.89), ("Ti", 50.0, 1.213),
            ("Fe", 50.0, 1.958), ("Fe", 100.0, 0.3717), ("Cu", 60.0, 1.593),
            ("W", 100.0, 4.438), ("Pb", 100.0, 5.549), ("Pb", 1000.0, 0.07102),
        ]:
            assert float(xcom.element_mu(sym, e)) == pytest.approx(
                val, rel=1e-6), sym

    def test_water_mixture_consistency(self):
        """0.1119 H + 0.8881 O must reproduce the independent liquid-water
        NIST curve (<= 0.5 % everywhere on the grid)."""
        e, mu_w = ANCHOR_TABLES["water"]
        mix = (0.1119 * xcom.element_mu("H", e)
               + 0.8881 * xcom.element_mu("O", e))
        assert np.abs(mix / mu_w - 1.0).max() < 5e-3

    def test_anchor_edges_sharp(self):
        """Vendored anchors carry their absorption edges as discontinuities
        at the exact tabulated energies."""
        for sym, jump_min in [("Ti", 7.0), ("Fe", 7.0), ("Cu", 6.5),
                              ("W", 4.0), ("Pb", 3.5)]:
            ek = K_EDGE_KEV[sym]
            lo = float(xcom.element_mu(sym, ek * 0.999))
            hi = float(xcom.element_mu(sym, ek * 1.001))
            assert hi / lo > jump_min, sym

    def test_pair_production_z2_consistency(self):
        """At 6 MeV the non-Compton residual is pair-dominated and must
        scale as Z^2 per atom across Fe -> W -> Pb (within the ~5 %
        Coulomb correction)."""
        def tau(sym):
            z, a = xcom.ELEMENT_Z[sym], xcom.ATOMIC_WEIGHT[sym]
            kn = z * xcom.klein_nishina_cross_section(6000.0)
            return (float(xcom.element_mu(sym, 6000.0)) * a / xcom.AVOGADRO
                    - kn)

        for s1, s2 in [("Fe", "W"), ("W", "Pb"), ("Fe", "Pb")]:
            z1, z2 = xcom.ELEMENT_Z[s1], xcom.ELEMENT_Z[s2]
            ratio = tau(s2) / tau(s1)
            assert abs(ratio / (z2 / z1) ** 2 - 1.0) < 0.08, (s1, s2, ratio)


class TestInterpolatedElements:
    def test_kn_floor(self):
        """mu/rho >= Klein-Nishina Compton for every study element over
        10 keV - 6 MeV (attenuation can't fall below free-electron
        scattering by more than the binding correction)."""
        e = np.logspace(1.0, np.log10(6000.0), 120)
        for sym in STUDY_ELEMENTS:
            mu = xcom.element_mu(sym, e)
            z, a = xcom.ELEMENT_Z[sym], xcom.ATOMIC_WEIGHT[sym]
            kn = z / a * xcom.AVOGADRO * xcom.klein_nishina_cross_section(e)
            assert (mu / kn).min() > 0.97, sym

    def test_exact_edge_positions(self):
        """Interpolated elements get their K edge at the exact tabulated
        energy (the round-1 Moseley fit was off by up to ~10 %)."""
        for sym in ["Ca", "V", "Cr", "Mn", "Co", "Ni", "Nb", "Mo", "I",
                    "Ba", "Gd"]:
            ek = K_EDGE_KEV[sym]
            lo = float(xcom.element_mu(sym, ek * 0.995))
            hi = float(xcom.element_mu(sym, ek * 1.005))
            assert hi / lo > 3.5, sym
            # no discontinuity of that size anywhere nearby
            off = float(xcom.element_mu(sym, ek * 1.10))
            assert off < hi, sym

    def test_leave_one_out_bound(self):
        """Rebuilding a vendored anchor from its neighbors bounds the
        interpolation error for the truly interpolated elements: <= 8 %
        over 10 keV - 6 MeV."""
        from dexct_tpu.physics.xcom import (
            ATOMIC_WEIGHT, AVOGADRO, ELEMENT_Z, _anchor_tau, _edge_for_warp,
            klein_nishina_cross_section)

        def interp_from(sym, lo, hi, e):
            z, a = ELEMENT_Z[sym], ATOMIC_WEIGHT[sym]
            z1, z2 = ELEMENT_Z[lo], ELEMENT_Z[hi]
            w = (np.log(z) - np.log(z1)) / (np.log(z2) - np.log(z1))

            def tau_at(warp):
                ekx = _edge_for_warp(sym) if warp else None
                ps = []
                for s2 in (lo, hi):
                    eka = _edge_for_warp(s2) if warp else None
                    ee = e * (eka / ekx) if (ekx and eka) else e
                    ps.append(np.log(_anchor_tau(s2, ee)))
                return np.exp((1 - w) * ps[0] + w * ps[1])

            s = np.clip((np.log(400.0) - np.log(e))
                        / (np.log(400.0) - np.log(200.0)), 0, 1)
            tau = np.exp(s * np.log(tau_at(True))
                         + (1 - s) * np.log(tau_at(False)))
            return AVOGADRO / a * (z * klein_nishina_cross_section(e) + tau)

        e = np.logspace(1.0, np.log10(6000.0), 80)
        for sym, lo, hi in [("Ti", "Si", "Fe"), ("Fe", "Ti", "Cu"),
                            ("Si", "Al", "Ti"), ("Al", "O", "Si"),
                            ("Cu", "Fe", "W")]:
            pred = interp_from(sym, lo, hi, e)
            true = xcom.element_mu(sym, e)
            assert np.abs(pred / true - 1.0).max() < 0.08, sym


class TestExtensionTables:
    """Round-3 vendored tables (nist_data_ext): the VERDICT round-2 item-1
    'done' bar — every study-critical element tabulated, <=2 % vs NIST over
    10 keV - 6 MeV, iodine K edge position and jump exact."""

    def test_every_study_element_is_tabulated(self):
        for sym in STUDY_ELEMENTS:
            if sym in ("Nb", "Ba", "Gd"):  # not in any reference material
                continue
            assert sym in ANCHOR_TABLES, sym

    def test_extension_spot_values(self):
        """Pinned published NIST grid values reproduced exactly by the
        frozen tables (regression against accidental re-generation)."""
        for sym, e, val in [
            ("Ca", 30.0, 4.078), ("Ca", 50.0, 1.019), ("Ca", 100.0, 0.2568),
            ("P", 50.0, 0.4918), ("P", 100.0, 0.1863),
            ("Na", 50.0, 0.2804), ("Mg", 50.0, 0.3292),
            ("I", 50.0, 12.32), ("I", 100.0, 1.942), ("I", 1000.0, 0.05841),
        ]:
            assert float(xcom.element_mu(sym, e)) == pytest.approx(
                val, rel=1e-3), sym

    def test_iodine_k_edge_exact(self):
        """K edge at exactly 33.1694 keV with the XCOM jump 6.553->35.82."""
        assert float(xcom.element_mu("I", 33.1694 * (1 - 1e-6))) == \
            pytest.approx(6.553, rel=1e-3)
        assert float(xcom.element_mu("I", 33.1694 * (1 + 1e-6))) == \
            pytest.approx(35.82, rel=1e-3)

    def test_compton_band_exact(self):
        """600-2000 keV is Compton-dominated: every extension element must
        sit on exact Klein-Nishina plus a positive residual that shrinks
        with 1/Z^-ish physics (photo tail ~ Z^4.5/A, e.g. iodine keeps a
        ~24 % photoelectric share at 600 keV)."""
        e = np.array([800.0, 1000.0, 1250.0])  # below the pair threshold
        for sym in ["Na", "Mg", "P", "S", "Cl", "K", "Ca", "V", "Cr", "Mn",
                    "Co", "Ni", "Mo", "I"]:
            z, a = xcom.ELEMENT_Z[sym], xcom.ATOMIC_WEIGHT[sym]
            kn = z / a * xcom.AVOGADRO * xcom.klein_nishina_cross_section(e)
            r = xcom.element_mu(sym, e) / kn
            # photo-tail cap calibrated on the trusted anchors (Fe ~+1.7 %,
            # Cu ~+2.3 % at 800 keV; tail ~ Z^3.5)
            cap = 1.01 + 0.03 * (z / 26.0) ** 3.5
            assert (r > 0.995).all(), (sym, r)
            assert (r < cap).all(), (sym, r, cap)

    def test_z_monotone_above_edges(self):
        """At fixed E above every K edge, mu/rho * A/Z must increase with Z
        across the transition-metal run (photoelectric Z-scaling)."""
        for e in [40.0, 60.0, 100.0]:
            per_e = []
            for sym in ["Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu"]:
                z, a = xcom.ELEMENT_Z[sym], xcom.ATOMIC_WEIGHT[sym]
                per_e.append(float(xcom.element_mu(sym, e)) * a / z)
            assert np.all(np.diff(per_e) > 0.0), (e, per_e)

    def test_alloy_constituents_consistent(self):
        """Every implant-alloy constituent (plots.py:487-498) now resolves
        from a vendored table and sits within 2 % of ln-Z triangulation
        between its neighbors (the independent-construction cross-check)."""
        for sym, lo, hi in [("V", "Ti", "Cr"), ("Cr", "V", "Mn"),
                            ("Mn", "Cr", "Fe"), ("Co", "Fe", "Ni"),
                            ("Ni", "Co", "Cu")]:
            for e in [30.0, 60.0, 100.0, 200.0]:
                z, a = xcom.ELEMENT_Z[sym], xcom.ATOMIC_WEIGHT[sym]
                kn_s = xcom.klein_nishina_cross_section(e)

                def tau(s):
                    zz, aa = xcom.ELEMENT_Z[s], xcom.ATOMIC_WEIGHT[s]
                    return (float(xcom.element_mu(s, e))
                            - zz / aa * xcom.AVOGADRO * kn_s) * aa \
                        / xcom.AVOGADRO

                z1, z2 = xcom.ELEMENT_Z[lo], xcom.ELEMENT_Z[hi]
                w = (np.log(z) - np.log(z1)) / (np.log(z2) - np.log(z1))
                t = np.exp((1 - w) * np.log(tau(lo)) + w * np.log(tau(hi)))
                pred = xcom.AVOGADRO / a * (z * kn_s + t)
                got = float(xcom.element_mu(sym, e))
                assert abs(got / pred - 1.0) < 0.02, (sym, e, got, pred)


class TestRound4Tables:
    """Round-4 vendored contrast/filter tables (nist_data_r4): VERDICT
    round-3 item-2 'done' bar — Gd K-edge position and jump exact, each
    new element within the construction's validated error envelope, the
    advertised contrast/filter elements tabulated rather than
    interpolated."""

    R4 = ["Zr", "Sn", "Ba", "Ce", "Gd"]

    def test_advertised_elements_are_tabulated(self):
        for sym in self.R4:
            assert sym in ANCHOR_TABLES, sym

    def test_k_edges_exact_with_physical_jumps(self):
        """K edges at the exact booklet energies; jump ratios smooth and
        monotone-decreasing in Z across the full heavy-anchor run."""
        jumps = {}
        for sym in ["Mo", "I", "W"] + self.R4:
            ek = K_EDGE_KEV[sym]
            lo = float(xcom.element_mu(sym, ek * (1 - 1e-6)))
            hi = float(xcom.element_mu(sym, ek * (1 + 1e-6)))
            jumps[sym] = hi / lo
        order = ["Zr", "Mo", "Sn", "I", "Ba", "Ce", "Gd", "W"]
        seq = [jumps[s] for s in order]
        assert np.all(np.diff(seq) < 0.0), dict(zip(order, seq))
        # frozen regression values (re-generation guard)
        for sym, j in [("Zr", 6.26), ("Sn", 5.64), ("Ba", 5.31),
                       ("Ce", 5.21), ("Gd", 4.90)]:
            assert jumps[sym] == pytest.approx(j, rel=5e-3), sym

    def test_frozen_spot_values(self):
        """Frozen-table regression, including the three independently
        recalled NIST 100-keV values (freeze agreement 0.25-0.58 %)."""
        for sym, e, val in [
            ("Sn", 100.0, 1.672), ("Ba", 100.0, 2.203), ("Gd", 100.0, 3.127),
            ("Zr", 50.0, 5.962), ("Sn", 50.0, 10.66), ("Ba", 50.0, 13.86),
            ("Gd", 60.0, 11.82), ("Ce", 100.0, 2.457),
        ]:
            assert float(xcom.element_mu(sym, e)) == pytest.approx(
                val, rel=2e-3), sym

    def test_gd_k_edge_band(self):
        """The dual-contrast feature's operating band: Gd's K edge at
        exactly 50.2391 keV with a ~4.9x jump, and mu(Gd) crossing
        mu(I) between their K edges (the K-edge-imaging contrast
        mechanism)."""
        ek = 50.2391
        below = float(xcom.element_mu("Gd", ek * (1 - 1e-6)))
        above = float(xcom.element_mu("Gd", ek * (1 + 1e-6)))
        assert above / below == pytest.approx(4.90, rel=5e-3)
        # iodine (above its own K) beats Gd below Gd's K, and vice versa
        assert float(xcom.element_mu("I", 45.0)) > \
            float(xcom.element_mu("Gd", 45.0))
        assert float(xcom.element_mu("Gd", 55.0)) > \
            float(xcom.element_mu("I", 55.0))

    def test_gd_l_edges_present(self):
        """L3 edge at exactly 7.2428 keV with a physical (2-4x) jump."""
        l3 = 7.2428
        below = float(xcom.element_mu("Gd", l3 * (1 - 1e-6)))
        above = float(xcom.element_mu("Gd", l3 * (1 + 1e-6)))
        assert 1.8 < above / below < 4.5

    def test_compton_band_exact(self):
        e = np.array([800.0, 1000.0, 1250.0])
        for sym in self.R4:
            z, a = xcom.ELEMENT_Z[sym], xcom.ATOMIC_WEIGHT[sym]
            kn = z / a * xcom.AVOGADRO * xcom.klein_nishina_cross_section(e)
            r = xcom.element_mu(sym, e) / kn
            cap = 1.01 + 0.03 * (z / 26.0) ** 3.5
            assert (r > 0.995).all(), (sym, r)
            assert (r < cap).all(), (sym, r, cap)

    def test_z_monotone_above_edges(self):
        """Per-electron attenuation must increase with Z at fixed E above
        every K edge across the full heavy run Cu..Pb."""
        for e in [100.0, 150.0, 300.0]:
            per_e = []
            for sym in ["Cu", "Zr", "Mo", "Sn", "I", "Ba", "Ce", "Gd",
                        "W", "Pb"]:
                z, a = xcom.ELEMENT_Z[sym], xcom.ATOMIC_WEIGHT[sym]
                per_e.append(float(xcom.element_mu(sym, e)) * a / z)
            assert np.all(np.diff(per_e) > 0.0), (e, per_e)

    def test_triangulation_consistency(self):
        """Each new table within 2.5 % of fixed-E ln-Z triangulation
        between its nearest VENDORED neighbors at energies above both
        neighbors' K edges (independent-construction cross-check, same
        bar the round-3 alloy set meets)."""
        cases = [("Zr", "Cu", "Mo", [30.0, 60.0, 100.0, 200.0]),
                 ("Sn", "Mo", "I", [40.0, 60.0, 100.0, 200.0]),
                 ("Ba", "I", "Ce", [50.0, 80.0, 150.0]),
                 ("Ce", "Ba", "Gd", [60.0, 100.0, 200.0]),
                 ("Gd", "Ce", "W", [80.0, 150.0, 300.0])]
        for sym, lo, hi, es in cases:
            for e in es:
                z, a = xcom.ELEMENT_Z[sym], xcom.ATOMIC_WEIGHT[sym]
                kn_s = xcom.klein_nishina_cross_section(e)

                def tau(s):
                    zz, aa = xcom.ELEMENT_Z[s], xcom.ATOMIC_WEIGHT[s]
                    return (float(xcom.element_mu(s, e))
                            - zz / aa * xcom.AVOGADRO * kn_s) * aa \
                        / xcom.AVOGADRO

                z1, z2 = xcom.ELEMENT_Z[lo], xcom.ELEMENT_Z[hi]
                w = (np.log(z) - np.log(z1)) / (np.log(z2) - np.log(z1))
                t = np.exp((1 - w) * np.log(tau(lo)) + w * np.log(tau(hi)))
                pred = xcom.AVOGADRO / a * (z * kn_s + t)
                got = float(xcom.element_mu(sym, e))
                assert abs(got / pred - 1.0) < 0.025, (sym, e, got, pred)


class TestCompounds:
    def test_icru_tissue_bone(self):
        """ICRU-44 compound values (independent NIST mixture data) within
        1 % — tightened from 2 % once the Ca/P/Na/Mg/S/Cl/K columns became
        vendored tables (round-3 VERDICT item 1; measured worst 0.31 %)."""
        tissue = "H(10.2)C(14.3)N(3.4)O(70.8)Na(0.2)P(0.3)S(0.3)Cl(0.2)K(0.3)"
        bone = "H(3.4)C(15.5)N(4.2)O(43.5)Na(0.1)Mg(0.2)P(10.3)S(0.3)Ca(22.5)"
        # NIST ICRU-44 soft tissue / cortical bone mu/rho [cm^2/g]
        for comp, e, nist in [
            (tissue, 50.0, 0.2264), (tissue, 60.0, 0.2048),
            (tissue, 100.0, 0.1688), (tissue, 1250.0, 0.06265),
            (bone, 30.0, 1.331), (bone, 40.0, 0.6655), (bone, 50.0, 0.4242),
            (bone, 60.0, 0.3148), (bone, 80.0, 0.2229), (bone, 100.0, 0.1855),
            (bone, 150.0, 0.1480), (bone, 1250.0, 0.05871),
        ]:
            got = float(xcom.mixatten(comp, e))
            assert abs(got / nist - 1.0) < 0.01, (comp[:12], e, got)

    def test_implant_alloys_physical(self):
        """The reference's implant alloys (plots.py:487-498): linear
        attenuation ordered CoCr > steel > Ti at 100 keV, and every curve
        within 10 % of its dominant element's scaled value."""
        alloys = [
            ("Ti(100.0)", 4.5, "Ti"),
            ("Al(6)Ti(90)V(4)", 4.43, "Ti"),
            ("C(0.5)N(0.1)P(0.0025)S(0.01)Fe(64.335)Cr(17.0)Ni(13.0)"
             "Mo(2.25)Mn(2.0)Si(0.75)Cu(0.5)", 8.0, "Fe"),
            ("Co(66)Cr(28)Mo(6)", 8.5, "Co"),
        ]
        mu100 = []
        for comp, rho, dom in alloys:
            mu = float(xcom.mixatten(comp, 100.0)) * rho
            mu_dom = float(xcom.element_mu(dom, 100.0)) * rho
            assert abs(mu / mu_dom - 1.0) < 0.12, comp[:12]
            mu100.append(mu)
        ti, ti64, steel, cocr = mu100
        assert cocr > steel > ti64 > 0.8 * ti

    def test_contrast_agents_k_edge_band(self):
        """I/Ba/Gd K-edge jumps land in the imaging band with physically
        ordered magnitudes (ADVICE round-1: I was +83 % off at 60 keV)."""
        mu_i = float(xcom.element_mu("I", 60.0))
        mu_gd = float(xcom.element_mu("Gd", 60.0))
        # above both K edges; Gd (Z=64) must exceed I (Z=53) there
        assert mu_gd > mu_i > 3.0
        # iodine just above its K edge: the classic ~30 cm^2/g
        assert 24.0 < float(xcom.element_mu("I", 33.5)) < 38.0


class TestEnergyAbsorption:
    """mu_en/rho: water anchored on the vendored NIST table; other media
    by the per-process transfer construction (KN recoil fraction +
    Z^2-scaled coherent calibrated on water)."""

    def test_water_exact_at_anchors(self):
        from dexct_tpu.physics.materials import (WATER,
                                                 WATER_MUEN_ANCHORS)

        e = np.array([a[0] for a in WATER_MUEN_ANCHORS])
        v = np.array([a[1] for a in WATER_MUEN_ANCHORS])
        # exact below ~400 keV; at 0.5-1.25 MeV the free-KN transfer
        # slightly exceeds NIST mu_en (binding + radiative g-factor)
        # and the photo term clips to zero -> <=0.7% there
        np.testing.assert_allclose(WATER.mass_energy_absorption(e), v,
                                   rtol=7e-3)
        ct_band = e <= 300.0
        np.testing.assert_allclose(
            WATER.mass_energy_absorption(e[ct_band]), v[ct_band],
            rtol=1e-10)

    def test_air_tracks_nist(self):
        """Air is an INDEPENDENT check of the construction (different
        composition, same calibration): NIST air mu_en/rho at the
        classic CT energies, 2% bar."""
        from dexct_tpu.physics.materials import AIR

        e = np.array([30.0, 50.0, 60.0, 80.0, 100.0, 150.0])
        nist = np.array([0.1537, 0.04098, 0.03041, 0.02407, 0.02325,
                         0.02496])
        got = AIR.mass_energy_absorption(e)
        np.testing.assert_allclose(got, nist, rtol=0.02)

    def test_transfer_fraction_physics(self):
        from dexct_tpu.physics import xcom

        e = np.array([10.0, 30.0, 60.0, 100.0, 300.0, 1000.0, 6000.0])
        f = xcom.klein_nishina_transfer_fraction(e)
        assert np.all((f > 0) & (f < 1))
        assert np.all(np.diff(f) > 0)  # rises with energy
        # Thomson limit: elastic, f -> 0
        assert xcom.klein_nishina_transfer_fraction(0.1) < 2e-4
        # exact-quadrature values at the textbook shape: ~0.34 at
        # m_e c^2, ~0.53 at 2 MeV, ~0.64 at 6 MeV
        assert abs(xcom.klein_nishina_transfer_fraction(511.0) - 0.344) \
            < 0.005
        assert abs(xcom.klein_nishina_transfer_fraction(2000.0) - 0.531) \
            < 0.005

    def test_mu_en_bounded_by_mu(self):
        from dexct_tpu.physics.materials import (BONE, TISSUE, TITANIUM,
                                                 WATER)

        e = np.logspace(1, 3.7, 64)
        for m in (WATER, TISSUE, BONE, TITANIUM):
            muen = m.mass_energy_absorption(e)
            mu = m.mass_atten(e)
            assert np.all(muen <= mu + 1e-12), m.name
            assert np.all(muen >= 0), m.name

    def test_compton_limit_at_high_energy(self):
        """Where Compton dominates (water ~1 MeV), mu_en/mu approaches
        the KN transfer fraction."""
        from dexct_tpu.physics import xcom
        from dexct_tpu.physics.materials import TISSUE

        e = np.array([800.0])
        ratio = (TISSUE.mass_energy_absorption(e)
                 / TISSUE.mass_atten(e))[0]
        f = xcom.klein_nishina_transfer_fraction(800.0)
        assert abs(ratio - f) < 0.05
