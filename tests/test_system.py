"""Tests for geometry, phantom, and config (SURVEY.md §2.3 API surface)."""

import json

import numpy as np
import pytest

from dexct_tpu.physics.materials import AIR, MaterialTable, WATER
from dexct_tpu.system import (
    FanBeamGeometry,
    ParallelBeamGeometry,
    VoxelPhantom,
    contrast_rods_phantom,
    pelvis_phantom,
    read_parameter_file,
    water_cylinder_phantom,
)


def reference_geometry(**kw):
    """The plots.py:109-111 construction."""
    args = dict(N_channels=800, N_proj=1200, gamma_fan=0.8230337,
                SID=60.0, SDD=100.0, h_iso=1.0, eid=True)
    args.update(kw)
    return FanBeamGeometry(**args)


class TestFanBeamGeometry:
    def test_a_iso(self):
        ct = reference_geometry()
        # SID * gamma_fan / N_channels * h_iso ~ 0.0617 cm^2 (SURVEY §2.3)
        assert abs(ct.A_iso - 60.0 * 0.8230337 / 800.0) < 1e-12

    def test_fov_radius_covers_50cm_fov(self):
        ct = reference_geometry()
        assert 23.0 < ct.fov_radius < 25.0

    def test_angles(self):
        ct = reference_geometry()
        assert len(ct.betas) == 1200
        assert ct.betas[0] == 0.0
        np.testing.assert_allclose(np.diff(ct.betas), 2 * np.pi / 1200)
        g = ct.gammas
        assert len(g) == 800
        np.testing.assert_allclose(g[-1], -g[0])  # symmetric fan
        np.testing.assert_allclose(g.max(), 0.8230337 / 2, rtol=2e-3)

    def test_ray_geometry_shapes_and_units(self):
        ct = reference_geometry(N_channels=16, N_proj=8)
        src, dirs = ct.ray_geometry()
        assert src.shape == (8, 16, 2) and dirs.shape == (8, 16, 2)
        np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0)
        np.testing.assert_allclose(np.linalg.norm(src, axis=-1), 60.0)

    def test_central_ray_hits_isocenter(self):
        ct = reference_geometry(N_channels=3, N_proj=4, gamma_fan=0.3)
        src, dirs = ct.ray_geometry()
        # central channel (index 1) passes through the origin
        t = np.einsum("vc,vc->v", -src[:, 1], dirs[:, 1])
        closest = src[:, 1] + t[:, None] * dirs[:, 1]
        np.testing.assert_allclose(closest, 0.0, atol=1e-12)

    def test_detector_attrs_reference_surface(self):
        ct = reference_geometry()
        # matdecomp.py:146-148 attribute surface
        assert ct.det_E.shape == ct.det_eta_E.shape
        assert ct.eid is True
        r = ct.detector_response(np.array([100.0]))
        assert r.shape == (1,)

    def test_parallel_beam(self):
        ct = ParallelBeamGeometry(N_channels=32, N_proj=16,
                                  detector_width=10.0)
        src, dirs = ct.ray_geometry()
        assert src.shape == (16, 32, 2)
        # all rays of a view share a direction
        np.testing.assert_allclose(dirs[:, 0], dirs[:, -1])
        assert abs(ct.rotation_total - np.pi) < 1e-12


class TestVoxelPhantom:
    def test_water_cylinder(self):
        ph = water_cylinder_phantom(N=64, dx=0.2)
        assert ph.labels.shape == (1, 64, 64)
        assert ph.labels[0, 32, 32] == 1  # water at center
        assert ph.labels[0, 0, 0] == 0  # air at corner
        frac = (ph.slice_labels() == 1).mean()
        assert abs(frac - np.pi * 0.4**2) < 0.02  # area of r=0.4*W circle

    def test_m_mono_oracle(self):
        ph = water_cylinder_phantom(N=32)
        hu = ph.M_mono(80.0)
        assert abs(hu[16, 16]) < 1.0  # water ~ 0 HU at any energy
        assert hu[0, 0] < -990.0  # air ~ -1000 HU

    def test_mu_image_energy_axis(self):
        ph = water_cylinder_phantom(N=16)
        img = ph.mu_image(np.array([60.0, 80.0]))
        assert img.shape == (2, 16, 16)
        assert img[0, 8, 8] > img[1, 8, 8]  # mu falls with E

    def test_file_roundtrip_reference_format(self, tmp_path):
        ph = contrast_rods_phantom(N=64)
        bin_f = tmp_path / "rods_uint8_64_64_1_1mm.bin"
        csv_f = tmp_path / "materials.csv"
        ph.to_file(bin_f, csv_f)
        # reference-compatible constructor signature (plots.py:124-126)
        ph2 = VoxelPhantom.from_file("rods", bin_f, csv_f, 64, 64, 1)
        np.testing.assert_array_equal(ph2.labels, ph.labels)
        assert ph2.materials.names == ph.materials.names

    def test_multislice_file_and_z_index(self, tmp_path):
        """Nz>1 volumes: reference file layout + z_index slice selection
        (params.txt:16)."""
        rng = np.random.default_rng(5)
        vol = rng.integers(0, 2, (3, 16, 16)).astype(np.uint8)
        f = tmp_path / "vol_uint8_16_16_3_1mm.bin"
        csv = tmp_path / "m.csv"
        ph = VoxelPhantom("vol", vol, MaterialTable([AIR, WATER]))
        ph.to_file(f, csv)
        ph2 = VoxelPhantom.from_file("vol", f, csv, 16, 16, 3, z_index=2)
        assert ph2.Nz == 3
        np.testing.assert_array_equal(ph2.slice_labels(), vol[2])
        np.testing.assert_array_equal(ph2.slice_labels(0), vol[0])
        # M_mono follows the active slice
        hu2 = ph2.M_mono(80.0)
        hu0 = ph2.M_mono(80.0, z_index=0)
        assert (hu2 != hu0).any() or (vol[2] == vol[0]).all()

    def test_label_bounds_checked(self):
        with pytest.raises(ValueError):
            VoxelPhantom("bad", np.full((4, 4), 7, np.uint8),
                         MaterialTable([AIR, WATER]))

    def test_pelvis_variants(self):
        ph = pelvis_phantom(N=128)
        assert ph.n_materials == 6
        assert set(np.unique(ph.labels)) == {0, 1, 2, 3, 4, 5}
        ph_ti = pelvis_phantom(N=128, implant="titanium")
        assert ph_ti.name == "pelvis_titanium"
        assert 6 in np.unique(ph_ti.labels)
        assert ph_ti.materials[6].name == "titanium"
        # metal is the densest material present
        assert ph_ti.density_image().max() == 4.5


class TestConfig:
    def _write_assets(self, tmp_path):
        ph = water_cylinder_phantom(N=32)
        ph.to_file(tmp_path / "ph_uint8_32_32_1_1mm.bin",
                   tmp_path / "materials.csv")
        return {
            "RUN_ID": "testrun",
            "forward_project": True,
            "back_project": True,
            "phantom_type": "voxel",
            "phantom_id": "water",
            "phantom_filename": str(tmp_path / "ph_uint8_32_32_1_1mm.bin"),
            "matcomp_filename": str(tmp_path / "materials.csv"),
            "Nx": 32, "Ny": 32, "Nz": 1,
            "dx": 0.1, "dy": 0.1, "dz": 0.1, "z_index": 0,
            "scanner_geometry": "fan_beam",
            "SID": 60.0, "SDD": 100.0,
            "N_channels": 64, "N_projections": 96,
            "fan_angle_total": 0.8230337,
            "rotation_angle_total": 6.283185,
            "detector_px_height": 1.0,
            "detector_mode": "eid",
            "detector_filename": "NA",
            "spectrum_id": "NA",
            "spectrum_filename": "NA",
            "N_photons_per_cm2_per_scan": "NA",
            "N_recon_matrix": 128,
            "FOV_recon": 50.0,
            "ramp_filter_percent_Nyquist": 0.8,
        }

    def test_reference_tuple_unpacking(self, tmp_path):
        cfg = self._write_assets(tmp_path)
        pfile = tmp_path / "params.txt"
        pfile.write_text(json.dumps(cfg))
        all_params = read_parameter_file(pfile)
        assert len(all_params) == 1
        params = all_params[0]
        # exact main.py:91-94 unpacking pattern
        run_id, do_fp, do_bp = params[:3]
        ct, phantom, spec = params[3:6]
        N_matrix, FOV, ramp = params[6:9]
        assert run_id == "testrun" and do_fp and do_bp
        assert ct.N_channels == 64 and ct.N_proj == 96
        assert phantom.Nx == 32
        assert spec is None  # "NA" -> assigned in DECT loop (main.py:92)
        assert (N_matrix, FOV, ramp) == (128, 50.0, 0.8)

    def test_config_with_spectrum_file(self, tmp_path):
        """Non-NA spectrum entries load and rescale
        (params.txt:29-31 keys)."""
        from dexct_tpu.physics import kramers_spectrum

        cfg = self._write_assets(tmp_path)
        spec = kramers_spectrum(120.0)
        sf = tmp_path / "120kV_1mGy_float32.bin"
        spec.to_file(sf)
        cfg.update({
            "spectrum_id": "120kV",
            "spectrum_filename": str(sf),
            "N_photons_per_cm2_per_scan": 1e6,
        })
        pfile = tmp_path / "params.txt"
        pfile.write_text(json.dumps(cfg))
        rc = read_parameter_file(pfile)[0]
        assert rc.spectrum is not None
        assert abs(rc.spectrum.total_counts - 1e6) / 1e6 < 1e-6

    def test_list_of_configs(self, tmp_path):
        cfg = self._write_assets(tmp_path)
        cfg2 = dict(cfg, RUN_ID="second")
        pfile = tmp_path / "params.txt"
        pfile.write_text(json.dumps([cfg, cfg2]))
        runs = read_parameter_file(pfile)
        assert [r.run_id for r in runs] == ["testrun", "second"]

    def test_named_access(self, tmp_path):
        cfg = self._write_assets(tmp_path)
        pfile = tmp_path / "params.txt"
        pfile.write_text(json.dumps(cfg))
        rc = read_parameter_file(pfile)[0]
        assert rc.N_matrix == 128
        assert rc.ct.eid is True
        assert len(rc) == 9

    def test_reference_params_file_geometry(self, tmp_path):
        """Parse the actual shipped params.txt geometry section (phantom
        files are absent from the snapshot, so substitute local ones)."""
        import os

        ref = "/root/reference/input/params.txt"
        if not os.path.exists(ref):
            pytest.skip("reference not mounted")
        cfg = json.loads(open(ref).read())
        local = self._write_assets(tmp_path)
        for k in ("phantom_filename", "matcomp_filename", "Nx", "Ny", "Nz",
                  "detector_filename"):
            cfg[k] = local[k]
        cfg["detector_filename"] = "/root/reference/input/detector/eta_eid_mv.bin"
        cfg["Nx"] = cfg["Ny"] = 32
        pfile = tmp_path / "params.txt"
        pfile.write_text(json.dumps(cfg))
        rc = read_parameter_file(pfile)[0]
        assert rc.ct.N_channels == 800
        assert rc.ct.N_proj == 1200
        assert abs(rc.ct.gamma_fan - 0.8230337) < 1e-9
        assert rc.ct.detector.E.shape == (6000,)
        assert rc.ramp == 0.8


class TestHeadPhantom:
    """Round-3 anthropomorphic head slice (system.phantom.head_phantom):
    skull tables + diploe, petrous ridges, ventricles, sinus."""

    def test_labels_and_mono_anchors(self):
        import numpy as np

        from dexct_tpu.system.phantom import head_phantom

        ph = head_phantom(N=256, dx=0.1)
        lab = ph.slice_labels()
        # all six tissue classes present
        assert set(np.unique(lab)) == {0, 1, 2, 3, 4, 5}
        m = np.asarray(ph.M_mono(70.0))
        c = slice(118, 138)
        assert 0.0 < m[c, c].mean() < 60.0       # brain ~ +20 HU
        assert m.max() > 1200.0                  # cortical skull
        assert m[0, 0] < -990.0                  # air
        # CSF ventricles sit below brain
        vent = lab == 5
        brain = lab == 4
        assert m[vent].mean() < m[brain].mean()

    def test_implant_variant_and_pipeline_smoke(self):
        import numpy as np

        from dexct_tpu.pipeline.api import get_recon, get_sino
        from dexct_tpu.physics.spectrum import kramers_spectrum
        from dexct_tpu.system import FanBeamGeometry
        from dexct_tpu.system.phantom import head_phantom

        ph = head_phantom(N=128, dx=0.2, implant="titanium")
        assert ph.n_materials == 7
        ct = FanBeamGeometry(N_channels=96, N_proj=96,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=True)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        _, slog = get_sino(ct, ph, spec)
        _, hu = get_recon(slog, ct, spec, 128, 26.0, 0.8)
        hu = np.asarray(hu)
        # brain interior reconstructs near water, skull strongly bright
        assert -120.0 < hu[58:70, 58:70].mean() < 120.0
        assert hu.max() > 700.0

    def test_head_phantom_3d_vault(self):
        import numpy as np

        from dexct_tpu.system.phantom import head_phantom_3d

        ph = head_phantom_3d(N=128, nz=24, dx=0.2, dz=0.3)
        lab = np.asarray(ph.labels)
        assert lab.shape == (24, 128, 128)
        # head area shrinks toward the vertex; top slices are air
        areas = (lab > 0).sum(axis=(1, 2))
        mid, top = areas[12], areas[-2]
        assert top < 0.6 * mid
        assert areas[-1] <= areas[-2]
        # brain exists mid-head but not in the vault cap
        assert (lab[10] == 4).sum() > 0
        cap = np.nonzero(areas > 0)[0][-1]
        assert (lab[cap] == 4).sum() == 0
        # petrous ridges only at the base: more cortical bone fraction
        base_bone = (lab[1] == 2).sum() / max(areas[1], 1)
        mid_bone = (lab[12] == 2).sum() / max(areas[12], 1)
        assert base_bone > mid_bone
        # cone scan traces it (exact 3-D) and FDK reconstructs finite
        import jax.numpy as jnp

        from dexct_tpu.ops.conebeam import (cone_material_paths,
                                            fdk_reconstruct)
        from dexct_tpu.system import ConeBeamGeometry

        ct = ConeBeamGeometry(N_channels=64, N_proj=48, N_rows=8,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                              h_iso=0.9)
        mu = ph.materials.mu_table(np.array([70.0]))[:, 0]
        sino = jnp.einsum("vrcm,m->vrc", cone_material_paths(ph, ct),
                          jnp.asarray(mu, jnp.float32))
        vol = np.asarray(fdk_reconstruct(sino, ct, 64, 26.0, 0.8))
        assert np.isfinite(vol).all() and vol.max() > 0.1


class TestThoraxPhantom:
    """Round-3 anthropomorphic thorax (system.phantom.thorax_phantom):
    lungs, ribs/spine/sternum, heart + aorta, diaphragm dome in 3-D."""

    def test_labels_and_mono_anchors(self):
        import numpy as np

        from dexct_tpu.system.phantom import thorax_phantom

        ph = thorax_phantom(N=256, dx=0.15)
        lab = ph.slice_labels()
        assert set(np.unique(lab)) == {0, 1, 2, 3, 4, 5, 6}
        m = np.asarray(ph.M_mono(70.0))
        lung = m[lab == 5]
        assert -820.0 < lung.mean() < -650.0     # inflated parenchyma
        assert m[lab == 6].mean() > 20.0         # blood pool
        assert m[lab == 4].mean() > 900.0        # cortical bone
        assert m[lab == 1].mean() < -40.0        # subcutaneous fat
        # ribs: bone exists in the chest wall away from spine/sternum
        yy, xx = np.mgrid[:256, :256]
        lateral = np.abs(xx - 128) > 80
        assert ((lab == 4) & lateral).sum() > 50

    def test_implant_and_pipeline_smoke(self):
        import numpy as np

        from dexct_tpu.pipeline.api import get_recon, get_sino
        from dexct_tpu.physics.spectrum import kramers_spectrum
        from dexct_tpu.system import FanBeamGeometry
        from dexct_tpu.system.phantom import thorax_phantom

        ph = thorax_phantom(N=128, dx=0.3, implant="titanium")
        assert ph.n_materials == 8
        ct = FanBeamGeometry(N_channels=96, N_proj=96,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=True)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        _, slog = get_sino(ct, ph, spec)
        _, hu = get_recon(slog, ct, spec, 128, 38.4, 0.8)
        hu = np.asarray(hu)
        lab = ph.slice_labels()
        # lungs reconstruct strongly negative (same grid by construction)
        assert hu[lab == 5].mean() < -500.0
        assert hu.max() > 500.0  # ribs/metal

    def test_thorax_3d_structure(self):
        import numpy as np

        from dexct_tpu.system.phantom import thorax_phantom_3d

        ph = thorax_phantom_3d(N=128, nz=24, dx=0.3)
        lab = np.asarray(ph.labels)
        assert lab.shape == (24, 128, 128)
        lung = (lab == 5).sum(axis=(1, 2))
        # lungs are an ellipsoid: apex/base slices well below the middle
        assert lung[1] < 0.5 * lung[12] and lung[-2] < 0.5 * lung[12]
        # diaphragm dome: in the lung-base band the RIGHT side (positive
        # x = columns > center) has less lung than the left
        base = 4
        right = (lab[base, :, 64:] == 5).sum()
        left = (lab[base, :, :64] == 5).sum()
        assert right < 0.8 * left, (right, left)
        # ribs alternate along z: bone counts vary band to band
        bone = (lab == 4).sum(axis=(1, 2)).astype(float)
        assert bone.max() > 1.3 * bone.min()
        # heart is z-limited
        heart = (lab == 6).sum(axis=(1, 2))
        assert heart[0] < heart[8]
