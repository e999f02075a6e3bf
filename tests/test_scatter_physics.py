"""Single-scatter physics: analytic anchor, MC cross-validation, scaling."""

import numpy as np

from dexct_tpu.ops.scatter_physics import (
    compton_energy,
    electron_density_image,
    klein_nishina_differential,
    mc_single_scatter_reference,
    scatter_to_primary_ratio,
    single_scatter_sinogram,
)
from dexct_tpu.physics import kramers_spectrum, xcom
from dexct_tpu.physics.materials import (
    AIR,
    Material,
    MaterialTable,
    WATER,
)
from dexct_tpu.physics.spectrum import Spectrum
from dexct_tpu.system.geometry import FanBeamGeometry
from dexct_tpu.system.phantom import VoxelPhantom, water_cylinder_phantom

VACUUM = Material("vacuum", 0.0, "H(100.0)")


def _geometry(nch=48, nproj=8, h_iso=0.1):
    return FanBeamGeometry(N_channels=nch, N_proj=nproj, gamma_fan=0.9,
                           SID=60.0, SDD=100.0, h_iso=h_iso, eid=True)


class TestCrossSections:
    def test_kn_integrates_to_total(self):
        """Integrating dSigma/dOmega over 4pi reproduces the exact total
        KN cross-section (xcom.klein_nishina_cross_section)."""
        for e0 in (30.0, 60.0, 140.0, 1000.0):
            c = np.linspace(-1.0, 1.0, 20001)
            d = klein_nishina_differential(e0, c)
            total = 2.0 * np.pi * np.trapezoid(d, c)
            ref = xcom.klein_nishina_cross_section(e0)
            np.testing.assert_allclose(total, ref, rtol=1e-6)

    def test_compton_energy_limits(self):
        np.testing.assert_allclose(compton_energy(60.0, 1.0), 60.0)
        # backscatter at E >> mc^2 approaches mc^2/2 from below
        e_b = compton_energy(5e4, -1.0)
        assert 250.0 < e_b < 255.5

    def test_electron_density_water(self):
        ph = water_cylinder_phantom(N=16, dx=0.5, radius_cm=3.0)
        ne = electron_density_image(ph).max()
        # water: 3.343e23 electrons/cm^3
        np.testing.assert_allclose(ne, 3.343e23, rtol=1e-3)


class TestAnalyticAnchor:
    def test_single_voxel_vacuum(self):
        """One water voxel in vacuum: the deterministic estimator equals
        the closed-form [n_e KN(theta) resp(E') + F2 Rayleigh resp(E)]
        V phi dOmega at every channel (residual = half-voxel
        self-attenuation marching)."""
        N, dx = 33, 0.25
        lab = np.zeros((N, N), np.uint8)
        lab[N // 2, N // 2] = 1
        ph = VoxelPhantom("one", lab, MaterialTable([VACUUM, WATER]),
                          dx, dx, dx)
        ct = _geometry()
        e0 = 60.0
        spec = Spectrum(np.array([e0]), np.array([1e6]), "mono60")
        s = single_scatter_sinogram(ph, ct, spec, coarse=1, n_energy=1,
                                    s_in=256, s_out=64,
                                    views=np.array([0.0]))[0]
        ne = electron_density_image(ph)[N // 2, N // 2]
        n_ph = 1e6 * e0  # single bin spans 0..E0
        phi = n_ph * ct.SID / (ct.dgamma * ct.h_iso * ct.SID**2)
        vol_w = ne * dx * dx * ct.h_iso
        src = np.array([ct.SID, 0.0])
        det = src[None, :] - ct.SDD * np.stack(
            [np.cos(ct.gammas), np.sin(ct.gammas)], -1)
        r_d = np.linalg.norm(det, axis=-1)
        u_out = det / r_d[:, None]
        cos_t = u_out @ np.array([-1.0, 0.0])
        e_p = compton_energy(e0, cos_t)
        kn = klein_nishina_differential(e0, cos_t)
        nrm = (src[None, :] - det) / ct.SDD
        cos_inc = np.abs(np.einsum("cd,cd->c", u_out, nrm))
        a_det = ct.SDD * ct.dgamma * (ct.h_iso * ct.SDD / ct.SID)
        mu0 = WATER.linear_atten(np.array([e0]))[0]
        mu_p = WATER.linear_atten(e_p)
        self_att = np.exp(-0.5 * dx * mu0) * np.exp(-0.5 * dx * mu_p)
        ana = (vol_w * phi * kn * a_det * cos_inc / r_d**2
               * ct.detector_response(e_p) * self_att)
        # coherent: elastic, F^2-weighted, detector responds at E
        from dexct_tpu.physics import formfactor as ff
        q = ff.momentum_transfer(e0, cos_t)
        f2_vol = ff.material_f2_per_volume(WATER, WATER.density, q)
        ray = 0.5 * xcom.ELECTRON_RADIUS_CM**2 * (1 + cos_t**2) * f2_vol
        self_att_c = np.exp(-dx * mu0)
        ana = ana + (ray * dx * dx * ct.h_iso * phi * a_det * cos_inc
                     / r_d**2 * ct.detector_response(np.full_like(e_p, e0))
                     * self_att_c)
        r = s / ana
        assert abs(np.median(r) - 1.0) < 0.04
        assert r.max() - r.min() < 0.03  # channel shape exact


class TestMonteCarloCrossValidation:
    def test_water_cylinder_polyenergetic(self):
        """Deterministic (coarse grid + compressed energies + fixed-step
        marching) vs the f64 MC (random vertices, exact geometry, full
        spectrum): independent discretizations, same physics."""
        ct = _geometry()
        ph = water_cylinder_phantom(N=48, dx=0.33333, radius_cm=6.0)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(1e6)
        s = single_scatter_sinogram(ph, ct, spec, coarse=2, n_energy=16,
                                    views=np.array([0.0]))[0]
        mc, err = mc_single_scatter_reference(ph, ct, spec, 0.0, 60000,
                                              seed=6)
        assert abs(s.sum() / mc.sum() - 1.0) < 0.03
        sel = mc > 0.05 * mc.max()
        rel = (s[sel] - mc[sel]) / mc[sel]
        assert abs(np.median(rel)) < 0.02
        assert np.percentile(np.abs(rel), 90) < 0.06


class TestScaling:
    def test_spr_linear_in_collimation(self):
        """S/P is exactly linear in the slice collimation h_iso in the
        thin-fan model (the classic reason single-slice CT is scatter-
        immune and wide-cone CT is not)."""
        ph = water_cylinder_phantom(N=32, dx=0.5, radius_cm=6.0)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(1e5)
        v = np.array([0.0])
        s1 = single_scatter_sinogram(ph, _geometry(h_iso=0.1), spec,
                                     coarse=2, n_energy=8, views=v)
        s4 = single_scatter_sinogram(ph, _geometry(h_iso=0.4), spec,
                                     coarse=2, n_energy=8, views=v)
        np.testing.assert_allclose(s4, 4.0 * s1, rtol=1e-4)

    def test_spr_magnitude_and_diagnostic(self):
        """Narrow-collimation fan-beam SPR is well below a percent, and
        the scatter profile is broader than the primary (tails beyond
        the object shadow)."""
        from dexct_tpu.pipeline.api import get_sino

        ct = _geometry()
        ph = water_cylinder_phantom(N=32, dx=0.5, radius_cm=6.0)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(1e6)
        v = np.asarray(ct.betas[:1])
        s = single_scatter_sinogram(ph, ct, spec, coarse=2, n_energy=8,
                                    views=v)
        raw, _ = get_sino(ct, ph, spec)
        spr = scatter_to_primary_ratio(s[0], np.asarray(raw)[0])
        assert 0.0 < spr < 0.01
        # scatter extends outside the object's shadow
        shadow = np.asarray(raw)[0] > 0.9 * np.asarray(raw)[0].max()
        assert s[0][shadow].mean() > 0


class TestGeometryGates:
    def test_fan_collimation_gate(self):
        """Tissue outside the collimated fan is not illuminated and must
        not scatter (review finding: truncation-style wide phantoms)."""
        N, dx = 48, 0.5
        ct = FanBeamGeometry(N_channels=32, N_proj=4, gamma_fan=0.2,
                             SID=60.0, SDD=100.0, h_iso=0.1, eid=True)
        # fan half-width at iso: 60*sin(0.1) ~ 6 cm; blob at y=+9 cm is
        # fully outside the fan of the beta=0 view
        lab_out = np.zeros((N, N), np.uint8)
        ys = (np.arange(N) + 0.5 - N / 2) * dx
        rr_out = np.hypot(ys[None, :], (ys - 9.0)[:, None])
        lab_out[rr_out <= 2.0] = 1
        lab_in = np.zeros((N, N), np.uint8)
        rr_in = np.hypot(ys[None, :], ys[:, None])
        lab_in[rr_in <= 2.0] = 1
        mats = MaterialTable([VACUUM, WATER])
        spec = Spectrum(np.array([60.0]), np.array([1e6]), "mono60")
        v = np.array([0.0])
        s_out = single_scatter_sinogram(
            VoxelPhantom("o", lab_out, mats, dx, dx, dx), ct, spec,
            coarse=2, n_energy=1, views=v)
        s_in = single_scatter_sinogram(
            VoxelPhantom("i", lab_in, mats, dx, dx, dx), ct, spec,
            coarse=2, n_energy=1, views=v)
        assert s_in.max() > 0
        assert s_out.max() < 1e-6 * s_in.max()

    def test_channel_subsampling_consistent(self):
        """channel_sub=4 + interpolation matches the full evaluation
        (Compton is smooth across channels; the coherent forward peak
        has ~0.03 rad angular width, so its bar reflects this coarse
        64-channel test's 0.056 rad interpolation step — production
        800-channel protocols at sub=4 step 0.0045 rad and resolve it)."""
        ct = _geometry(nch=64)
        ph = water_cylinder_phantom(N=32, dx=0.5, radius_cm=6.0)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(1e5)
        v = np.array([0.0])
        for coh, bar in ((False, 0.02), (True, 0.15)):
            full = single_scatter_sinogram(ph, ct, spec, coarse=2,
                                           n_energy=8, views=v,
                                           coherent=coh)
            sub = single_scatter_sinogram(ph, ct, spec, coarse=2,
                                          n_energy=8, views=v,
                                          channel_sub=4, coherent=coh)
            rel = np.abs(sub - full) / full.max()
            assert rel.max() < bar, (coh, rel.max())

    def test_odd_grid_not_cropped(self):
        """Phantom N not divisible by coarse: the edge strip must still
        scatter (review finding: silent crop)."""
        N, dx = 50, 0.4
        lab = np.zeros((N, N), np.uint8)
        lab[:, -2:] = 1  # water strip on the padded edge
        ph = VoxelPhantom("edge", lab, MaterialTable([VACUUM, WATER]),
                          dx, dx, dx)
        ct = _geometry(nch=32)
        spec = Spectrum(np.array([60.0]), np.array([1e6]), "mono60")
        s = single_scatter_sinogram(ph, ct, spec, coarse=4, n_energy=1,
                                    views=np.array([0.0]))
        assert s.max() > 0


class TestConeBeam:
    def _cyl3d(self, N=32, nzv=16, dx=0.5, dz=0.5, radius=4.0):
        ys = (np.arange(N) + 0.5 - N / 2) * dx
        rr = np.hypot(ys[None, :], ys[:, None])
        lab = np.broadcast_to((rr <= radius).astype(np.uint8),
                              (nzv, N, N)).copy()
        return VoxelPhantom("c3", lab, MaterialTable([VACUUM, WATER]),
                            dx, dx, dz)

    def test_thin_collimation_matches_fan(self):
        """N_rows=1 cone: the 3-D estimator reduces to the MC-validated
        fan-beam one (same beam slab, same detector band)."""
        from dexct_tpu.ops.scatter_physics import single_scatter_conebeam
        from dexct_tpu.system.geometry import ConeBeamGeometry

        ph3 = self._cyl3d()
        ph2 = VoxelPhantom("c2", ph3.labels[8], ph3.materials,
                           ph3.dx, ph3.dy, ph3.dz)
        ct3 = ConeBeamGeometry(N_channels=32, N_proj=4, gamma_fan=0.9,
                               SID=60.0, SDD=100.0, h_iso=0.5, eid=True,
                               N_rows=1)
        ct2 = FanBeamGeometry(N_channels=32, N_proj=4, gamma_fan=0.9,
                              SID=60.0, SDD=100.0, h_iso=0.5, eid=True)
        spec = Spectrum(np.array([60.0]), np.array([1e6]), "mono60")
        v = np.array([0.0])
        s3 = single_scatter_conebeam(ph3, ct3, spec, coarse=2,
                                     n_energy=1, channel_sub=1,
                                     row_sub=1, views=v)[0, 0]
        s2 = single_scatter_sinogram(ph2, ct2, spec, coarse=2,
                                     n_energy=1, views=v)[0]
        sel = s2 > 0.2 * s2.max()
        rel = np.abs(s3[sel] - s2[sel]) / s2[sel]
        # 3-D vertices sample the slab at +-h/2 vs the 2-D mid-plane
        assert np.median(rel) < 0.05

    def test_spr_grows_with_collimation(self):
        """Wide-cone scatter: total detected scatter per row grows as
        rows are added (the scatter a thin fan never sees)."""
        from dexct_tpu.ops.scatter_physics import single_scatter_conebeam
        from dexct_tpu.system.geometry import ConeBeamGeometry

        ph3 = self._cyl3d(nzv=24)
        spec = Spectrum(np.array([60.0]), np.array([1e6]), "mono60")
        v = np.array([0.0])
        per_row = []
        for nrows in (1, 4, 8):
            ct = ConeBeamGeometry(N_channels=32, N_proj=4, gamma_fan=0.9,
                                  SID=60.0, SDD=100.0, h_iso=0.5,
                                  eid=True, N_rows=nrows)
            s = single_scatter_conebeam(ph3, ct, spec, coarse=3,
                                        n_energy=1, channel_sub=2,
                                        row_sub=2, views=v)
            mid = s[0, nrows // 2]
            per_row.append(mid.sum())
        assert per_row[1] > 1.5 * per_row[0]
        assert per_row[2] > per_row[1]

    def test_row_symmetry(self):
        """Symmetric phantom + central view: scatter symmetric across
        the central row."""
        from dexct_tpu.ops.scatter_physics import single_scatter_conebeam
        from dexct_tpu.system.geometry import ConeBeamGeometry

        ph3 = self._cyl3d(nzv=16)
        ct = ConeBeamGeometry(N_channels=32, N_proj=4, gamma_fan=0.9,
                              SID=60.0, SDD=100.0, h_iso=0.5, eid=True,
                              N_rows=6)
        spec = Spectrum(np.array([60.0]), np.array([1e6]), "mono60")
        s = single_scatter_conebeam(ph3, ct, spec, coarse=3, n_energy=1,
                                    channel_sub=2, row_sub=1,
                                    views=np.array([0.0]))[0]
        np.testing.assert_allclose(s, s[::-1], rtol=0.02)


class TestCoherent:
    """Rayleigh term (round-4 realism extension, VERDICT r3 item 6)."""

    def test_coherent_fraction_magnitude(self):
        """Detected coherent scatter is a large forward-peaked fraction
        in the independent-atom model: at q -> 0 the per-volume weight
        Sum n_i Z_i^2 exceeds Compton's n_e ~6.6x for water, and the
        fan detector sits in the forward lobe.  (Molecular interference
        in liquids suppresses the true forward peak somewhat; the
        independent-atom form is the XCOM-consistent baseline.)"""
        ct = _geometry()
        ph = water_cylinder_phantom(N=48, dx=0.33333, radius_cm=6.0)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(1e6)
        v = np.array([0.0])
        s_c = single_scatter_sinogram(ph, ct, spec, coarse=2,
                                      n_energy=8, views=v,
                                      coherent=False)[0]
        s_t = single_scatter_sinogram(ph, ct, spec, coarse=2,
                                      n_energy=8, views=v)[0]
        frac = (s_t.sum() - s_c.sum()) / s_t.sum()
        assert 0.25 < frac < 0.65

    def test_cone_coherent_matches_fan(self):
        """N_rows=1 cone with coherent on still reduces to the fan
        estimator (the coherent branches share their math)."""
        from dexct_tpu.ops.scatter_physics import single_scatter_conebeam
        from dexct_tpu.system.geometry import ConeBeamGeometry

        N, dx = 32, 0.5
        ys = (np.arange(N) + 0.5 - N / 2) * dx
        rr = np.hypot(ys[None, :], ys[:, None])
        lab3 = np.broadcast_to((rr <= 4.0).astype(np.uint8),
                               (16, N, N)).copy()
        mats = MaterialTable([VACUUM, WATER])
        ph3 = VoxelPhantom("c3", lab3, mats, dx, dx, dx)
        ph2 = VoxelPhantom("c2", lab3[8], mats, dx, dx, dx)
        ct3 = ConeBeamGeometry(N_channels=32, N_proj=4, gamma_fan=0.9,
                               SID=60.0, SDD=100.0, h_iso=0.5, eid=True,
                               N_rows=1)
        ct2 = FanBeamGeometry(N_channels=32, N_proj=4, gamma_fan=0.9,
                              SID=60.0, SDD=100.0, h_iso=0.5, eid=True)
        spec = Spectrum(np.array([60.0]), np.array([1e6]), "mono60")
        v = np.array([0.0])
        s3 = single_scatter_conebeam(ph3, ct3, spec, coarse=2,
                                     n_energy=1, channel_sub=1,
                                     row_sub=1, views=v)[0, 0]
        s2 = single_scatter_sinogram(ph2, ct2, spec, coarse=2,
                                     n_energy=1, views=v)[0]
        sel = s2 > 0.2 * s2.max()
        rel = np.abs(s3[sel] - s2[sel]) / s2[sel]
        assert np.median(rel) < 0.05


class TestMultipleScatter:
    """Second-order MC + the multiplicative tail closure."""

    def _setup(self):
        ct = _geometry()
        ph = water_cylinder_phantom(N=48, dx=0.33333, radius_cm=6.0)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(1e6)
        return ph, ct, spec

    def test_second_order_magnitude(self):
        """2nd-to-1st ratio for a 12-cm water cylinder at 120 kV:
        O(10-30%) — the size of the tail the single-scatter model was
        missing (VERDICT r3 weak #4)."""
        from dexct_tpu.ops.scatter_physics import multiple_to_single_factor

        ph, ct, spec = self._setup()
        m = multiple_to_single_factor(ph, ct, spec, n_samples=30000,
                                      seed=3)
        assert 0.05 < m < 0.45

    def test_second_order_smooth(self):
        """The 2nd-order channel profile is broad and structureless —
        the justification for the flat multiplicative closure."""
        from dexct_tpu.ops.scatter_physics import mc_second_order_reference

        ph, ct, spec = self._setup()
        s2, _ = mc_second_order_reference(ph, ct, spec, 0.0, 30000,
                                          seed=4)
        assert s2.min() > 0
        # smooth: adjacent-channel jumps are MC noise, not structure
        prof = np.convolve(s2, np.ones(5) / 5, mode="valid")
        assert prof.max() / prof.min() < 4.0

    def test_grows_with_collimation(self):
        """Wider collimation feeds the second generation more than the
        first: m(8 rows) > m(1 row)."""
        from dexct_tpu.ops.scatter_physics import mc_second_order_reference

        ph, ct, spec = self._setup()
        s2_1, _ = mc_second_order_reference(ph, ct, spec, 0.0, 20000,
                                            seed=5, n_rows=1)
        s2_8, _ = mc_second_order_reference(ph, ct, spec, 0.0, 20000,
                                            seed=5, n_rows=8)
        assert s2_8.sum() > 4.0 * s2_1.sum()

    def test_multiple_factor_applied(self):
        ph, ct, spec = self._setup()
        v = np.array([0.0])
        s0 = single_scatter_sinogram(ph, ct, spec, coarse=2, n_energy=4,
                                     views=v)
        s1 = single_scatter_sinogram(ph, ct, spec, coarse=2, n_energy=4,
                                     views=v, multiple_factor=0.25)
        np.testing.assert_allclose(s1, 1.25 * s0, rtol=1e-6)


class TestDeepOrderMC:
    """Round-5 VERDICT item 3: the deep-order Compton walk that
    CONVERGES the multiple-scatter tail instead of extrapolating it
    from order 2."""

    def _setup(self):
        ct = _geometry()
        ph = water_cylinder_phantom(N=48, dx=0.33333, radius_cm=6.0)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(1e6)
        return ph, ct, spec

    def test_orders_1_2_match_references(self):
        """One consistent sampler: the walk's first two orders must
        reproduce the dedicated order-1/order-2 references within MC
        error (the totals' seed spread is ~5-10% at this n; the quoted
        per-channel stderr underestimates it because vertex weights
        are shared across channels)."""
        from dexct_tpu.ops.scatter_physics import (
            mc_multi_order_reference, mc_second_order_reference,
            mc_single_scatter_reference)

        ph, ct, spec = self._setup()
        tot, err = mc_multi_order_reference(ph, ct, spec, 0.0, 12000,
                                            orders=2, seed=7)
        s1, _ = mc_single_scatter_reference(ph, ct, spec, 0.0, 12000,
                                            seed=8, coherent=False)
        s2, _ = mc_second_order_reference(ph, ct, spec, 0.0, 12000,
                                          seed=9)
        assert 0.7 < tot[0] / s1.sum() < 1.4, (tot[0], s1.sum())
        assert 0.6 < tot[1] / s2.sum() < 1.6, (tot[1], s2.sum())

    def test_series_decays_and_factor_converges(self):
        """For a 12-cm water cylinder the order series decays
        geometrically; the converged factor exceeds the order-2 ratio
        and the extrapolated remainder is a small stated fraction."""
        from dexct_tpu.ops.scatter_physics import multiple_to_single_factor

        ph, ct, spec = self._setup()
        diag = {}
        m_conv = multiple_to_single_factor(ph, ct, spec,
                                           n_samples=12000, seed=11,
                                           orders=6, tail_bound=diag)
        m2 = float(diag["series"][1] / diag["series"][0])
        assert m_conv > m2  # orders >= 3 only add
        # geometric-ish decay after the peak
        s = diag["series"]
        assert s[3] < s[1] and s[5] < s[3]
        assert 0.0 <= diag["tail_fraction"] < 0.35
        assert 0.0 <= diag["r_last"] < 1.0

    def test_energy_cut_only_lowers(self):
        from dexct_tpu.ops.scatter_physics import mc_multi_order_reference

        ph, ct, spec = self._setup()
        lo, _ = mc_multi_order_reference(ph, ct, spec, 0.0, 4000,
                                         orders=3, seed=13,
                                         e_cut_keV=40.0)
        hi, _ = mc_multi_order_reference(ph, ct, spec, 0.0, 4000,
                                         orders=3, seed=13,
                                         e_cut_keV=10.0)
        # same seed: identical first-order; deep orders can only lose
        np.testing.assert_allclose(lo[0], hi[0], rtol=1e-12)
        assert lo[2] <= hi[2] * 1.05
