"""Clinical DE products: VNC, iodine map, electron density, Z_eff."""

import numpy as np
import pytest

from dexct_tpu.analysis.products import (
    WATER_ELECTRON_DENSITY,
    WATER_I_EV,
    electron_density_map,
    iodine_map,
    mean_excitation_energy,
    proton_spr,
    spr_image,
    vnc_image,
    zeff_image,
)
from dexct_tpu.physics.materials import BONE, TISSUE, Material, WATER


def _basis_images():
    """2x2 toy: [water-only, water+iodine; tissue, empty] in a
    (water, iodine) basis."""
    a_w = np.array([[1.0, 1.0], [1.06, 0.0]])
    a_i = np.array([[0.0, 0.005], [0.0, 0.0]])  # 5 mg/mL in one pixel
    return [a_w, a_i], [WATER, Material("iodine", 4.93, "I(100.0)")]


class TestProducts:
    def test_vnc_removes_iodine(self):
        a, mats = _basis_images()
        vnc = vnc_image(a, mats, 70.0)
        # iodine pixel's VNC equals the plain-water pixel's HU
        np.testing.assert_allclose(vnc[0, 1], vnc[0, 0], atol=1e-9)
        assert abs(vnc[0, 0]) < 1.0  # water ~ 0 HU
        # while a VMI at 70 keV would show strong enhancement
        mu_i = float(mats[1].mass_atten(np.array([70.0]))[0])
        assert 0.005 * mu_i > 0.01  # the removed contrast is real

    def test_iodine_map_units(self):
        a, mats = _basis_images()
        im = iodine_map(a, mats)
        np.testing.assert_allclose(im[0, 1], 5.0)
        assert im[0, 0] == 0.0

    def test_iodine_identification_error(self):
        with pytest.raises(ValueError, match="iodine"):
            iodine_map([np.ones((2, 2))], [WATER])

    def test_electron_density_water_unity(self):
        rho_e = electron_density_map([np.ones((2, 2))], [WATER])
        np.testing.assert_allclose(rho_e, 1.0, rtol=2e-3)

    def test_zeff_known_materials(self):
        # water Z_eff ~ 7.42-7.45 (power-law, m=2.94); cortical bone
        # ~ 13-14
        z_w = zeff_image([np.ones((1, 1))], [WATER])[0, 0]
        assert 7.3 < z_w < 7.6
        z_b = zeff_image([np.ones((1, 1)) * BONE.density], [BONE])[0, 0]
        assert 12.0 < z_b < 14.5
        # air pixel -> 0 (below the electron-density floor)
        z_air = zeff_image([np.zeros((1, 1))], [WATER])[0, 0]
        assert z_air == 0.0

    def test_zeff_mixture_monotone(self):
        # adding bone to water raises Z_eff monotonically
        fracs = np.linspace(0, 1, 5)
        zs = [zeff_image([np.array([[1 - f]]), np.array([[f * 1.92]])],
                         [WATER, BONE])[0, 0] for f in fracs]
        assert all(b > a for a, b in zip(zs, zs[1:]))


class TestProtonSpr:
    def test_mean_excitation_energies(self):
        # the famous water additivity defect: Bragg additivity over H/O
        # gives ~71 eV vs the ICRU 37 compound value 75 eV
        i_w = mean_excitation_energy(WATER.matcomp)
        assert 67.0 < i_w < 73.0
        # tissue I slightly below water's additivity value (more H/C);
        # cortical bone well above (Ca/P)
        assert mean_excitation_energy(TISSUE.matcomp) < 75.0
        assert 95.0 < mean_excitation_energy(BONE.matcomp) < 125.0

    def test_water_spr_unity_self_consistent(self):
        np.testing.assert_allclose(proton_spr(WATER), 1.0, rtol=1e-12)
        # with the ICRU compound I the additivity defect shows up as a
        # ~1 % L-ratio offset — small but nonzero
        s = proton_spr(WATER, i_water_eV=WATER_I_EV)
        assert 1.0 < s < 1.02

    def test_known_material_values(self):
        # literature anchors (PSTAR/clinical): ICRU tissue ~1.04-1.07,
        # cortical bone (rho 1.92) ~1.6-1.75 at 100 MeV
        assert 1.03 < proton_spr(TISSUE) < 1.08
        assert 1.55 < proton_spr(BONE) < 1.80

    def test_energy_dependence_weak(self):
        # SPR is nearly energy-independent over the therapeutic range
        for m in (TISSUE, BONE):
            s70 = proton_spr(m, energy_MeV=70.0)
            s250 = proton_spr(m, energy_MeV=250.0)
            assert abs(s70 - s250) / s70 < 0.01

    def test_spr_image_pure_voxels_exact(self):
        # a voxel holding exactly one basis material at nominal density
        # must reproduce proton_spr of that material exactly
        a_t = np.array([[TISSUE.density, 0.0]])
        a_b = np.array([[0.0, BONE.density]])
        img = spr_image([a_t, a_b], [TISSUE, BONE])
        np.testing.assert_allclose(img[0, 0], proton_spr(TISSUE),
                                   rtol=1e-12)
        np.testing.assert_allclose(img[0, 1], proton_spr(BONE),
                                   rtol=1e-12)

    def test_spr_image_air_floor(self):
        img = spr_image([np.zeros((1, 1)), np.zeros((1, 1))],
                        [TISSUE, BONE])
        assert img[0, 0] == 0.0

    def test_spr_image_mixture_between_endpoints(self):
        # 50/50 tissue/bone voxel sits between the pure values
        a_t = np.array([[0.5 * TISSUE.density]])
        a_b = np.array([[0.5 * BONE.density]])
        s = spr_image([a_t, a_b], [TISSUE, BONE])[0, 0]
        assert proton_spr(TISSUE) * 0.5 < s < proton_spr(BONE)


class TestSprEndToEnd:
    def test_dect_spr_map(self):
        """Noiseless toy DECT scan -> GN decomposition -> SPR map vs the
        per-label Bethe truth."""
        from dexct_tpu.ops.matdecomp import DEFAULT_BASIS
        from dexct_tpu.physics.spectrum import kramers_spectrum
        from dexct_tpu.pipeline.api import simulate_dect
        from dexct_tpu.system.geometry import FanBeamGeometry
        from dexct_tpu.system.phantom import pelvis_phantom

        ph = pelvis_phantom(N=64, dx=0.4)
        ct = FanBeamGeometry(N_channels=96, N_proj=96,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             h_iso=1.0, eid=True)
        s1 = kramers_spectrum(140.0, name="140kV", filtration_mm_al=6.0)
        s2 = kramers_spectrum(80.0, name="80kV", filtration_mm_al=6.0)
        for s in (s1, s2):
            s.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
        res = simulate_dect(ct, ph, s1, s2, 64, 25.6, 0.8, n_iters=20)
        spr = spr_image([np.asarray(r) for r in res.mat_recons],
                        list(DEFAULT_BASIS))
        # truth: per-label SPR on the phantom grid
        truth = np.zeros_like(spr)
        labels = np.asarray(ph.labels)[0]
        for lbl in np.unique(labels):
            m = ph.materials[int(lbl)]
            if m.density < 0.05:
                continue
            truth[labels == lbl] = proton_spr(m)
        # compare away from edges: erode the support a little
        yy, xx = np.mgrid[:64, :64]
        interior = ((yy - 32) ** 2 + (xx - 32) ** 2) < 24 ** 2
        ok = interior & (truth > 0.5) & (spr > 0.5)
        assert ok.sum() > 200
        err = np.abs(spr[ok] - truth[ok]) / truth[ok]
        assert np.median(err) < 0.03
        # soft-tissue voxels (the proton-range-dominant class) tighter
        soft = ok & (truth < 1.2)
        assert np.median(np.abs(spr[soft] - truth[soft])
                         / truth[soft]) < 0.03
