"""Cone-beam projection + FDK reconstruction (ops/conebeam.py).

The 3-D extension is anchored to the validated 2-D fan pipeline: a
cone-beam scan of a z-uniform phantom must reproduce the fan results in
every plane (the geometry's central row IS the fan geometry), and the
3-D DDA must agree with the 2-D tracer on in-plane rays.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dexct_tpu.ops.conebeam import (
    cone_material_paths,
    cone_sinogram,
    fdk_reconstruct,
    trace_paths_3d,
)
from dexct_tpu.ops.siddon import trace_paths
from dexct_tpu.system import ConeBeamGeometry, FanBeamGeometry
from dexct_tpu.system.phantom import water_cylinder_phantom


class TestTracePaths3D:
    def test_in_plane_rays_match_2d(self):
        rng = np.random.default_rng(5)
        lab2 = rng.integers(0, 4, (24, 24)).astype(np.int32)
        lab3 = np.broadcast_to(lab2, (8, 24, 24)).copy()
        n = 300
        ang = rng.uniform(0, 2 * np.pi, n)
        src2 = 30.0 * np.stack([np.cos(ang), np.sin(ang)], -1)
        tgt = rng.uniform(-2.0, 2.0, (n, 2))
        d2 = tgt - src2
        d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
        # lift into z=0 (mid-volume plane; dz*Nz/2 = 0 center)
        src3 = np.concatenate([src2, np.zeros((n, 1))], -1)
        d3 = np.concatenate([d2, np.zeros((n, 1))], -1)
        p2 = np.asarray(trace_paths(
            jnp.asarray(lab2), jnp.asarray(src2, jnp.float32),
            jnp.asarray(d2, jnp.float32), 0.25, 0.25, n_materials=4))
        p3 = np.asarray(trace_paths_3d(
            jnp.asarray(lab3), jnp.asarray(src3, jnp.float32),
            jnp.asarray(d3, jnp.float32), 0.25, 0.25, 0.25,
            n_materials=4))
        np.testing.assert_allclose(p3, p2, atol=2e-4)

    def test_axis_and_diagonal_chords(self):
        lab = np.zeros((4, 4, 4), np.int32)
        # +x axis ray through the center, cube side 4*0.5=2
        src = np.array([[-10.0, 0.1, 0.1],
                        [-10.0, -10.0, -10.0]], np.float32)
        d_diag = np.ones(3) / np.sqrt(3.0)
        dirs = np.array([[1.0, 0.0, 0.0], d_diag], np.float32)
        got = np.asarray(trace_paths_3d(
            jnp.asarray(lab), jnp.asarray(src), jnp.asarray(dirs),
            0.5, 0.5, 0.5, n_materials=1))
        assert abs(got[0, 0] - 2.0) < 1e-4  # axis chord
        assert abs(got[1, 0] - 2.0 * np.sqrt(3.0)) < 1e-3  # body diagonal

    def test_miss_is_zero(self):
        lab = np.zeros((4, 4, 4), np.int32)
        got = np.asarray(trace_paths_3d(
            jnp.asarray(lab),
            jnp.asarray([[10.0, 10.0, 10.0]], jnp.float32),
            jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
            0.5, 0.5, 0.5, n_materials=1))
        assert np.all(got == 0.0)


@pytest.fixture(scope="module")
def cone_system():
    ct = ConeBeamGeometry(N_channels=64, N_proj=96, N_rows=8,
                          gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                          h_iso=0.5)
    ph2 = water_cylinder_phantom(N=48, dx=0.5)
    import dataclasses
    lab3 = np.broadcast_to(ph2.labels[0], (8, 48, 48)).copy()
    ph3 = dataclasses.replace(ph2, labels=lab3, dz=0.5)
    return ct, ph2, ph3


class TestConeForward:
    def test_central_rows_match_fan(self, cone_system):
        ct, ph2, ph3 = cone_system
        fan = FanBeamGeometry(N_channels=64, N_proj=96,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        paths3 = np.asarray(cone_material_paths(ph3, ct))  # [V, R, C, M]
        src, dirs = fan.ray_geometry()
        p2 = np.asarray(trace_paths(
            jnp.asarray(ph2.slice_labels().astype(np.int32)),
            jnp.asarray(src, jnp.float32), jnp.asarray(dirs, jnp.float32),
            ph2.dx, ph2.dy, n_materials=ph2.n_materials))
        # central rows (3, 4) bracket z=0 at ±h/2: cone angle ~0.004 —
        # their in-plane content matches the fan trace to ~cos(kappa)
        mid = 0.5 * (paths3[:, 3] + paths3[:, 4])
        assert np.abs(mid - p2).max() < 0.05 * max(1.0, p2.max())

    def test_sinogram_shapes_and_air(self, cone_system):
        ct, _, ph3 = cone_system
        from dexct_tpu.physics.spectrum import kramers_spectrum

        s = kramers_spectrum(80.0)
        s.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        counts, slog = cone_sinogram(ph3, ct, s)
        assert counts.shape == (96, 8, 64) and slog.shape == (96, 8, 64)
        # corner channels at the widest fan angles miss the cylinder
        assert float(np.asarray(slog)[:, :, 0].max()) < 1e-3
        assert float(np.asarray(slog).max()) > 1.0


class TestFDK:
    def test_z_uniform_matches_fan_fbp(self, cone_system):
        ct, ph2, ph3 = cone_system
        from dexct_tpu.ops.fbp import fan_backproject, filter_sinogram
        from dexct_tpu.ops.siddon import material_path_sinogram, mono_sinogram

        fan = FanBeamGeometry(N_channels=64, N_proj=96,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        mu60 = ph2.materials.mu_table(np.array([60.0]))[:, 0]
        sino2 = mono_sinogram(material_path_sinogram(ph2, fan),
                              jnp.asarray(mu60, jnp.float32))
        img2 = np.asarray(fan_backproject(
            filter_sinogram(sino2, fan, 0.8), jnp.asarray(fan.betas,
            jnp.float32), fan.SID, fan.dgamma, 48, 20.0))

        mu = ph2.materials.mu_table(np.array([60.0]))[:, 0]
        sino3 = jnp.einsum(
            "vrcm,m->vrc",
            cone_material_paths(ph3, ct), jnp.asarray(mu, jnp.float32))
        vol = np.asarray(fdk_reconstruct(sino3, ct, 48, 20.0, 0.8))
        assert vol.shape == (8, 48, 48)
        # central slices of a z-uniform object = the fan reconstruction
        mid = 0.5 * (vol[3] + vol[4])
        interior = np.hypot(*np.meshgrid(*[np.arange(48) - 23.5] * 2)) < 18
        assert np.abs((mid - img2))[interior].max() < 0.02 * img2.max()
        # off-center slices stay close for this small cone angle (slice 1
        # at z=-1.25 — slice 0 sits at the detector's axial coverage edge
        # where magnified rays clip, the classic circular-orbit limit)
        assert np.abs((vol[1] - img2))[interior].max() < 0.06 * img2.max()

    def test_cone_dect_decomposition(self, cone_system):
        # the GN decomposition is per-ray and geometry-agnostic: a
        # dual-energy cone acquisition decomposes row-by-row with the
        # same solver the fan pipeline uses (ops/matdecomp.py)
        ct, _, ph3 = cone_system
        from dexct_tpu.ops import matdecomp as md
        from dexct_tpu.physics.spectrum import (kramers_spectrum,
                                                linac_spectrum)

        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        c1, _ = cone_sinogram(ph3, ct, s1)
        c2, _ = cone_sinogram(ph3, ct, s2)
        _, dec_i0, dec_mus = md.prepare_decomposition(ct, s1, s2)
        flat = jnp.stack([jnp.asarray(c1).reshape(-1),
                          jnp.asarray(c2).reshape(-1)])
        ab = np.asarray(md.gauss_newton_solve(
            flat, jnp.asarray(dec_i0, jnp.float32),
            jnp.asarray(dec_mus, jnp.float32), n_iters=10))
        a_sino = ab[:, 0].reshape(c1.shape)  # tissue-basis g/cm^2
        # central ray through 2*9.6 cm of water ~ 19 g/cm^2 of ~tissue
        mid = a_sino[:, 3:5, 32]
        assert abs(mid.mean() - 19.2) < 1.5
        # air rays decompose to ~0
        assert np.abs(a_sino[:, :, 0]).max() < 0.5

    def test_config_builds_cone_geometry(self, tmp_path):
        import json

        from dexct_tpu.system import read_parameter_file

        ph = water_cylinder_phantom(N=16, dx=0.5)
        ph.to_file(str(tmp_path / "p.bin"), str(tmp_path / "p.csv"))
        cfg = {
            "RUN_ID": "cone", "scanner_geometry": "cone_beam",
            "N_rows": 8, "N_channels": 32, "N_projections": 16,
            "SID": 60.0, "SDD": 100.0, "detector_px_height": 0.5,
            "phantom_filename": str(tmp_path / "p.bin"),
            "matcomp_filename": str(tmp_path / "p.csv"),
            "Nx": 16, "Ny": 16,
        }
        (tmp_path / "params.txt").write_text(json.dumps(cfg))
        run = read_parameter_file(tmp_path / "params.txt")[0]
        assert isinstance(run.ct, ConeBeamGeometry)
        assert run.ct.N_rows == 8 and run.ct.h_iso == 0.5
        assert run.ct.ray_geometry_3d()[0].shape == (16, 8, 32, 3)

    def test_water_mu_recovered(self, cone_system):
        ct, ph2, ph3 = cone_system
        mu = ph2.materials.mu_table(np.array([60.0]))[:, 0]
        mu_w = float(mu[1])  # label 1 = water
        sino3 = jnp.einsum(
            "vrcm,m->vrc",
            cone_material_paths(ph3, ct), jnp.asarray(mu, jnp.float32))
        vol = np.asarray(fdk_reconstruct(sino3, ct, 48, 20.0, 0.8))
        center = vol[3:5, 22:26, 22:26].mean()
        assert abs(center - mu_w) < 0.03 * mu_w


class TestHelical:
    def _system(self):
        import dataclasses

        from dexct_tpu.system import HelicalConeBeamGeometry

        ct = HelicalConeBeamGeometry(
            N_channels=64, N_proj=192, N_rows=8, gamma_fan=0.8230337,
            SID=60.0, SDD=100.0, h_iso=0.5, pitch=2.0,
            rotation_total=4.0 * np.pi)
        ph2 = water_cylinder_phantom(N=48, dx=0.5)
        lab3 = np.broadcast_to(ph2.labels[0], (16, 48, 48)).copy()
        ph3 = dataclasses.replace(ph2, labels=lab3, dz=0.5)
        return ct, ph2, ph3

    def test_source_travel_centered(self):
        ct, _, _ = self._system()
        sz = ct.source_z
        assert abs(sz[0] + sz[-1]) < 0.05  # symmetric about z=0
        np.testing.assert_allclose(sz[-1] - sz[0],
                                   2.0 * ct.pitch * (191 / 192), rtol=1e-6)

    def test_pitch_zero_delegates_to_circular(self):
        import dataclasses

        from dexct_tpu.ops.conebeam import helical_fdk_reconstruct
        from dexct_tpu.system import HelicalConeBeamGeometry

        ct0 = HelicalConeBeamGeometry(
            N_channels=64, N_proj=96, N_rows=8, gamma_fan=0.8230337,
            SID=60.0, SDD=100.0, h_iso=0.5, pitch=0.0)
        ph2 = water_cylinder_phantom(N=48, dx=0.5)
        lab3 = np.broadcast_to(ph2.labels[0], (8, 48, 48)).copy()
        ph3 = dataclasses.replace(ph2, labels=lab3, dz=0.5)
        mu = ph2.materials.mu_table(np.array([60.0]))[:, 0]
        sino = jnp.einsum("vrcm,m->vrc", cone_material_paths(ph3, ct0),
                          jnp.asarray(mu, jnp.float32))
        v_h = np.asarray(helical_fdk_reconstruct(sino, ct0, 48, 20.0, 0.8))
        v_c = np.asarray(fdk_reconstruct(sino, ct0, 48, 20.0, 0.8))
        np.testing.assert_array_equal(v_h, v_c)

    def test_z_uniform_matches_fan(self):
        from dexct_tpu.ops.conebeam import helical_fdk_reconstruct
        from dexct_tpu.ops.fbp import fan_backproject, filter_sinogram
        from dexct_tpu.ops.siddon import (material_path_sinogram,
                                          mono_sinogram)

        ct, ph2, ph3 = self._system()
        mu = ph2.materials.mu_table(np.array([60.0]))[:, 0]
        sino = jnp.einsum("vrcm,m->vrc", cone_material_paths(ph3, ct),
                          jnp.asarray(mu, jnp.float32))
        vol = np.asarray(helical_fdk_reconstruct(sino, ct, 48, 20.0, 0.8))
        assert vol.shape[0] >= 4 and vol.shape[1:] == (48, 48)

        fan = FanBeamGeometry(N_channels=64, N_proj=96,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        img2 = np.asarray(fan_backproject(
            filter_sinogram(
                mono_sinogram(material_path_sinogram(ph2, fan),
                              jnp.asarray(mu, jnp.float32)),
                fan, 0.8),
            jnp.asarray(fan.betas, jnp.float32), fan.SID, fan.dgamma,
            48, 20.0))
        interior = np.hypot(*np.meshgrid(*[np.arange(48) - 23.5] * 2)) < 16
        mid = vol[vol.shape[0] // 2]
        # helical scan of a z-uniform object reproduces the fan recon.
        # Round-3: tightened 0.06 -> 0.005 (the round-2 bound was a
        # loose assert; measured error is ~1e-6 — the 2*pi window
        # average is exact when all conjugate copies agree)
        assert np.abs(mid - img2)[interior].max() < 0.005 * img2.max()

    def test_z_varying_interior_error(self):
        """Round-3 helical-accuracy pin (VERDICT item 6): a z-varying
        sphere phantom reconstructs with bounded interior error vs the
        per-slice 2-D fan truth.  Measured study (ROADMAP/VALIDATION):
        'full' windowing is the best of {full, feather, short, pair,
        cosz, td}; the ~4% max error is the sloped-boundary z-sampling
        artifact of the gFDK class (pitch- and row-count-invariant),
        with rms ~1.3%."""
        import dataclasses

        from dexct_tpu.ops.conebeam import helical_fdk_reconstruct
        from dexct_tpu.ops.fbp import fan_backproject, filter_sinogram
        from dexct_tpu.ops.siddon import (material_path_sinogram,
                                          mono_sinogram)
        from dexct_tpu.physics.materials import (AIR, BONE, WATER,
                                                 MaterialTable)
        from dexct_tpu.system import HelicalConeBeamGeometry
        from dexct_tpu.system.phantom import VoxelPhantom

        N, NZ, dx = 48, 16, 0.5
        ph2 = water_cylinder_phantom(N=N, dx=dx)
        lab3 = np.broadcast_to(ph2.labels[0], (NZ, N, N)).copy()
        cz = (np.arange(NZ) + 0.5 - NZ / 2) * dx
        cy = (np.arange(N) + 0.5 - N / 2) * dx
        Z, Y, X = np.meshgrid(cz, cy, cy, indexing="ij")
        mt = MaterialTable([AIR, WATER, BONE])
        lab3[(X ** 2 + (Y - 2.0) ** 2 + Z ** 2) < 9.0] = 2
        ph3 = VoxelPhantom("zvar", lab3, mt, dx, dx, dx)
        ct = HelicalConeBeamGeometry(
            N_channels=64, N_proj=384, N_rows=8, gamma_fan=0.8230337,
            SID=60.0, SDD=100.0, h_iso=0.5, pitch=2.0,
            rotation_total=8.0 * np.pi)
        mu = mt.mu_table(np.array([60.0]))[:, 0]
        sino = jnp.einsum("vrcm,m->vrc", cone_material_paths(ph3, ct),
                          jnp.asarray(mu, jnp.float32))
        fan = FanBeamGeometry(N_channels=64, N_proj=96,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        interior = np.hypot(
            *np.meshgrid(*[np.arange(N) - 23.5] * 2)) < 16
        z_out = cz[5:11]
        vol = np.asarray(helical_fdk_reconstruct(
            sino, ct, N, 20.0, 0.8, z_out=z_out))
        for i, iz in enumerate(range(5, 11)):
            ph_s = VoxelPhantom("s", lab3[iz][None], mt, dx, dx, dx)
            g = np.asarray(fan_backproject(
                filter_sinogram(
                    mono_sinogram(material_path_sinogram(ph_s, fan),
                                  jnp.asarray(mu, jnp.float32)),
                    fan, 0.8),
                jnp.asarray(fan.betas, jnp.float32), fan.SID,
                fan.dgamma, N, 20.0))
            err = np.abs(vol[i] - g)[interior]
            assert err.max() < 0.05 * g.max(), (iz, err.max() / g.max())
            assert np.sqrt((err ** 2).mean()) < 0.02 * g.max(), iz


class TestIterative3D:
    def _geom(self):
        return ConeBeamGeometry(N_channels=32, N_proj=48, N_rows=4,
                                gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                                h_iso=0.5)

    def test_projector_matches_material_paths(self):
        # continuous projector of mu-from-labels == paths @ mu
        import dataclasses

        ct = self._geom()
        ph2 = water_cylinder_phantom(N=24, dx=1.0)
        lab3 = np.broadcast_to(ph2.labels[0], (4, 24, 24)).copy()
        ph3 = dataclasses.replace(ph2, labels=lab3, dz=1.0)
        mu = ph2.materials.mu_table(np.array([60.0]))[:, 0]
        ref = np.asarray(jnp.einsum(
            "vrcm,m->vrc", cone_material_paths(ph3, ct),
            jnp.asarray(mu, jnp.float32)))
        from dexct_tpu.ops.conebeam import project_volume_3d

        vol = jnp.asarray(mu, jnp.float32)[lab3]
        src, dirs = ct.ray_geometry_3d()
        got = np.asarray(project_volume_3d(
            vol, jnp.asarray(src, jnp.float32),
            jnp.asarray(dirs, jnp.float32), 1.0, 1.0, 1.0))
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_adjoint_dot_product(self):
        # <A x, y> == <x, A^T y> to float precision — the exact-adjoint
        # guarantee of jax.linear_transpose on the linear DDA operator
        import jax

        from dexct_tpu.ops.conebeam import project_volume_3d

        ct = self._geom()
        src, dirs = ct.ray_geometry_3d()
        src = jnp.asarray(src, jnp.float32)
        dirs = jnp.asarray(dirs, jnp.float32)

        def A(v):
            return project_volume_3d(v, src, dirs, 1.0, 1.0, 1.0)

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(4, 24, 24)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(48, 4, 32)), jnp.float32)
        at = jax.linear_transpose(A, x)
        lhs = float(jnp.vdot(A(x), y))
        rhs = float(jnp.vdot(x, at(y)[0]))
        assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), 1.0)

    def test_cg_recovers_cylinder(self):
        import dataclasses

        from dexct_tpu.ops.conebeam import cone_cg_recon, project_volume_3d

        ct = self._geom()
        ph2 = water_cylinder_phantom(N=24, dx=1.0)
        lab3 = np.broadcast_to(ph2.labels[0], (4, 24, 24)).copy()
        mu = ph2.materials.mu_table(np.array([60.0]))[:, 0]
        mu_w = float(mu[1])
        vol_true = jnp.asarray(mu, jnp.float32)[lab3]
        src, dirs = ct.ray_geometry_3d()
        sino = project_volume_3d(
            vol_true, jnp.asarray(src, jnp.float32),
            jnp.asarray(dirs, jnp.float32), 1.0, 1.0, 1.0)
        vol, hist = cone_cg_recon(sino, ct, (4, 24, 24), (1.0, 1.0, 1.0),
                                  n_iters=25)
        vol = np.asarray(vol)
        center = vol[1:3, 10:14, 10:14].mean()
        assert abs(center - mu_w) < 0.05 * mu_w
        assert float(hist[-1]) < float(hist[0]) * 1e-3


class TestConeDominant:
    def test_matches_dda_on_cone_geometry(self):
        from dexct_tpu.ops.conebeam import trace_cone_dominant

        rng = np.random.default_rng(9)
        nz, N = 8, 32
        labels = rng.integers(0, 5, (nz, N, N)).astype(np.int32)
        ct = ConeBeamGeometry(N_channels=48, N_proj=40, N_rows=6,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                              h_iso=0.4)
        src, dirs = ct.ray_geometry_3d()
        dda = np.asarray(trace_paths_3d(
            jnp.asarray(labels), jnp.asarray(src, jnp.float32),
            jnp.asarray(dirs, jnp.float32), 0.4, 0.4, 0.4, n_materials=5))
        fast = np.asarray(trace_cone_dominant(
            labels, np.asarray(src, np.float32),
            np.asarray(dirs, np.float32), 0.4, 0.4, 0.4, n_materials=5))
        np.testing.assert_allclose(fast, dda, atol=2e-3)

    def test_steep_slope_rejected(self):
        from dexct_tpu.ops.conebeam import trace_cone_dominant

        labels = np.zeros((4, 32, 32), np.int32)
        src = np.array([[0.0, 40.0, 0.0]], np.float32)
        d = np.array([[0.0, -0.9, 0.44]], np.float32)  # steep cone ray
        with pytest.raises(ValueError, match="slope"):
            trace_cone_dominant(labels, src, d, 0.4, 0.4, 0.4,
                                n_materials=1)

    def test_auto_path_selects_dominant(self):
        # cone_material_paths('auto') must agree with forced 'dda'
        import dataclasses

        ct = ConeBeamGeometry(N_channels=48, N_proj=32, N_rows=4,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                              h_iso=0.4)
        ph2 = water_cylinder_phantom(N=32, dx=0.4)
        lab3 = np.broadcast_to(ph2.labels[0], (8, 32, 32)).copy()
        ph3 = dataclasses.replace(ph2, labels=lab3, dz=0.4)
        a = np.asarray(cone_material_paths(ph3, ct, method="auto"))
        b = np.asarray(cone_material_paths(ph3, ct, method="dda"))
        np.testing.assert_allclose(a, b, atol=2e-3)


class TestConeBundled:
    """Bundled-gather cone tracing: same-(view,row) channel bundles
    share one anchor+layer gather per 16-row group.  Exactness
    contract: bit-identical to the per-ray cone kernel for every ray —
    the planner's double window contract (column cover AND shared
    {L, L+1} z-layer bracket) guarantees it."""

    def _system(self):
        rng = np.random.default_rng(3)
        nz, N = 16, 64
        labels = rng.integers(0, 6, (nz, N, N)).astype(np.int32)
        ct = ConeBeamGeometry(N_channels=64, N_proj=24, N_rows=8,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                              h_iso=0.25)
        src, dirs = ct.ray_geometry_3d()
        return labels, np.asarray(src), np.asarray(dirs), 25.6 / N, 0.4

    def test_matches_per_ray_bit_exact(self):
        from dexct_tpu.ops.conebeam import (_trace_cone_dominant,
                                            build_cone_pack,
                                            plan_cone_dominant_bundled,
                                            trace_cone_dominant)

        labels, src, dirs, dxy, dz = self._system()
        nzl = labels.shape[0]
        N = labels.shape[1]
        plan = plan_cone_dominant_bundled(src, dirs, labels.shape,
                                          dxy, dxy, dz)
        assert plan["frac_bundled"] > 0.4  # z bracket rejects some
        ref = np.asarray(trace_cone_dominant(
            labels, src, dirs, dxy, dxy, dz, n_materials=6))
        lab = jnp.asarray(labels)
        g, w, lb, B = (plan["group"], plan["words"], plan["lbits"],
                       plan["bundle"])
        pk_y = build_cone_pack(lab, g, lb, words=w)
        pk_x = build_cone_pack(lab.transpose(0, 2, 1), g, lb, words=w)
        s2 = jnp.asarray(src.reshape(-1, 3))
        d2 = jnp.asarray(dirs.reshape(-1, 3))
        swap = jnp.asarray([1, 0, 2])
        outs = []
        for pk, sw, bun, rest in (
                (pk_y, None, plan["bun_y"], plan["rest_y"]),
                (pk_x, swap, plan["bun_x"], plan["rest_x"])):
            for ind, bb in ((bun, B), (rest, 1)):
                si, di = s2[jnp.asarray(ind)], d2[jnp.asarray(ind)]
                if sw is not None:
                    si, di = si[:, sw], di[:, sw]
                outs.append(_trace_cone_dominant(
                    pk, (nzl, N, N), si, di, dxy, dxy, dz,
                    n_materials=6, group=g, lbits=lb, words=w,
                    bundle=bb))
        got = np.asarray(jnp.concatenate(outs, 0)[
            jnp.asarray(plan["inv"])]).reshape(ref.shape)
        np.testing.assert_array_equal(got, ref)

    def test_plan_is_a_permutation(self):
        from dexct_tpu.ops.conebeam import plan_cone_dominant_bundled

        _, src, dirs, dxy, dz = self._system()
        plan = plan_cone_dominant_bundled(src, dirs, (16, 64, 64),
                                          dxy, dxy, dz)
        r = src.reshape(-1, 3).shape[0]
        placed = ((plan["nb_y"] + plan["nb_x"]) * plan["bundle"]
                  + plan["n_rest_y"] + plan["n_rest_x"])
        assert placed == r
        assert len(np.unique(plan["inv"])) == r

    def test_public_api_routes_bundled(self):
        # round-4: cone_material_paths(method="dominant") must run the
        # SAME bundled kernel the fused cone pipeline uses (VERDICT r3
        # item 1, cone side), with plans/packs cached on the objects,
        # bit-identical to the per-ray plan
        import dataclasses

        from dexct_tpu.ops.conebeam import trace_cone_dominant
        from dexct_tpu.system import pelvis_phantom

        ct = ConeBeamGeometry(N_channels=64, N_proj=24, N_rows=8,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                              h_iso=0.25)
        ph = pelvis_phantom(N=64, dx=0.4)
        ph = dataclasses.replace(
            ph, labels=np.broadcast_to(ph.labels[0], (16, 64, 64)).copy(),
            dz=0.4)
        got = np.asarray(cone_material_paths(ph, ct, method="dominant"))
        cache = ct.__dict__.get("_dexct_trace_cache", {})
        bplans = [v for k, v in cache.items() if k[0] == "cone_bplan"]
        assert bplans and bplans[0]["frac_bundled"] >= 0.25, \
            "public cone API did not take the bundled plan"
        src, dirs = ct.ray_geometry_3d()
        ref = np.asarray(trace_cone_dominant(
            np.asarray(ph.labels).astype(np.int32),
            np.asarray(src, np.float32), np.asarray(dirs, np.float32),
            ph.dx, ph.dy, ph.dz, n_materials=ph.n_materials))
        np.testing.assert_array_equal(got, ref)
        again = np.asarray(cone_material_paths(ph, ct, method="dominant"))
        np.testing.assert_array_equal(again, got)

    def test_fused_cone_step_parity(self):
        # the production wiring: pack_cone_dect(trace_bundle=8) must be
        # bit-identical to the per-ray plan end-to-end
        import dataclasses

        from dexct_tpu.physics import kramers_spectrum, linac_spectrum
        from dexct_tpu.pipeline.cone import (make_jitted_cone_step,
                                             pack_cone_dect)
        from dexct_tpu.system import pelvis_phantom

        ct = ConeBeamGeometry(N_channels=64, N_proj=48, N_rows=8,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                              h_iso=0.5, eid=True)
        ph = pelvis_phantom(N=64, dx=0.4)
        ph = dataclasses.replace(
            ph, labels=np.broadcast_to(ph.labels[0], (16, 64, 64)).copy(),
            dz=0.4)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        outs = {}
        for tb in (8, 0):
            a, m = pack_cone_dect(ct, ph, s1, s2, 64, 20.0, 0.8,
                                  n_iters=4, trace_bundle=tb)
            assert (m.bundle == 8) == bool(tb)
            outs[tb] = make_jitted_cone_step(m)(a)
        import jax

        for k, v in outs[8].items():
            jax.tree.map(
                lambda x, y: np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y)), v, outs[0][k])


def test_simulate_cone_dect_end_to_end(cone_system):
    # full 3-D DE pipeline: trace once, decompose, FDK all four volumes
    from dexct_tpu.ops.conebeam import simulate_cone_dect
    from dexct_tpu.physics.spectrum import kramers_spectrum, linac_spectrum

    ct, ph2, ph3 = cone_system
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    out = simulate_cone_dect(ct, ph3, s1, s2, 48, 20.0, 0.8)
    assert out["sino_raw"][0].shape == (96, 8, 64)
    assert out["recon_HU"][0].shape == (8, 48, 48)
    hu = out["recon_HU"][1]  # 80 kV
    mid = 0.5 * (hu[3] + hu[4])
    # water center near 0 HU (noiseless, single-energy-effective beam
    # hardening of the synthetic raw-tube 80 kV: tolerate the BH dip)
    assert -200.0 < mid[22:26, 22:26].mean() < 60.0
    assert mid[:4, :4].mean() < -900.0  # air
    t = out["mat_recons"][0]
    assert abs(0.5 * (t[3] + t[4])[22:26, 22:26].mean() - 1.0) < 0.12


def test_fused_cone_pipeline_matches_stateless(cone_system):
    # pack-once fused path == the stateless simulate_cone_dect
    from dexct_tpu.ops.conebeam import simulate_cone_dect
    from dexct_tpu.physics.spectrum import kramers_spectrum, linac_spectrum
    from dexct_tpu.pipeline.cone import make_jitted_cone_step, pack_cone_dect

    ct, _, ph3 = cone_system
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    ref = simulate_cone_dect(ct, ph3, s1, s2, 48, 20.0, 0.8)
    arrays, meta = pack_cone_dect(ct, ph3, s1, s2, 48, 20.0, 0.8)
    out = make_jitted_cone_step(meta)(arrays)
    np.testing.assert_allclose(np.asarray(out["sino_log"][0]),
                               np.asarray(ref["sino_log"][0]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["recon_HU"][1]),
                               np.asarray(ref["recon_HU"][1]), atol=2.0)
    np.testing.assert_allclose(np.asarray(out["mat_recons"][0]),
                               np.asarray(ref["mat_recons"][0]), atol=5e-3)


class TestReviewRegressions:
    """Round-2 self-review findings (helical/circular routing, compound
    noise, capability-error scoping)."""

    def test_circular_fdk_rejects_helical_geometry(self):
        from dexct_tpu.system import HelicalConeBeamGeometry

        ct = HelicalConeBeamGeometry(N_channels=32, N_proj=16, N_rows=4,
                                     pitch=2.0)
        with pytest.raises(ValueError, match="helical"):
            fdk_reconstruct(jnp.zeros((16, 4, 32)), ct, 16, 10.0, 0.8)

    def test_fused_cone_pack_rejects_ffs(self):
        # helical became a SUPPORTED fused orbit in round 3
        # (TestFusedHelical); flying-focal-spot geometries still route
        # to simulate_cone_dect (per-view row grids)
        import dataclasses

        from dexct_tpu.physics.spectrum import kramers_spectrum
        from dexct_tpu.pipeline.cone import pack_cone_dect
        from dexct_tpu.system import ConeBeamGeometry

        ct = ConeBeamGeometry(N_channels=32, N_proj=16, N_rows=4,
                              ffs="z")
        ph2 = water_cylinder_phantom(N=32, dx=0.4)
        lab3 = np.broadcast_to(ph2.labels[0], (4, 32, 32)).copy()
        ph3 = dataclasses.replace(ph2, labels=lab3, dz=0.4)
        s = kramers_spectrum(80.0)
        with pytest.raises(ValueError, match="f(ocal|lying)"):
            pack_cone_dect(ct, ph3, s, s, 32, 10.0, 0.8)

    def test_simulate_auto_routes_helical(self):
        import dataclasses

        from dexct_tpu.ops.conebeam import simulate_cone_dect
        from dexct_tpu.physics.spectrum import (kramers_spectrum,
                                                linac_spectrum)
        from dexct_tpu.system import HelicalConeBeamGeometry

        ct = HelicalConeBeamGeometry(
            N_channels=32, N_proj=64, N_rows=4, gamma_fan=0.8230337,
            SID=60.0, SDD=100.0, h_iso=0.4, pitch=1.0,
            rotation_total=4.0 * np.pi)
        ph2 = water_cylinder_phantom(N=32, dx=0.4)
        lab3 = np.broadcast_to(ph2.labels[0], (8, 32, 32)).copy()
        ph3 = dataclasses.replace(ph2, labels=lab3, dz=0.4)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        out = simulate_cone_dect(ct, ph3, s1, s2, 32, 10.0, 0.8)
        # helical Feldkamp output (z grid from the source travel, not
        # the row count) — the circular path would return N_rows slices
        assert out["recon_HU"][0].shape[1:] == (32, 32)
        assert np.isfinite(out["recon_HU"][0]).all()

    def test_compound_noise_on_cone_paths(self, cone_system):
        import jax

        from dexct_tpu.ops.conebeam import simulate_cone_dect
        from dexct_tpu.physics.spectrum import (kramers_spectrum,
                                                linac_spectrum)
        from dexct_tpu.pipeline.cone import (make_jitted_cone_step,
                                             pack_cone_dect)

        ct, _, ph3 = cone_system
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        out = simulate_cone_dect(ct, ph3, s1, s2, 48, 20.0, 0.8,
                                 noise="compound",
                                 key=jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(out["recon_HU"][0])).all()
        arrays, meta = pack_cone_dect(ct, ph3, s1, s2, 48, 20.0, 0.8,
                                      noise="compound", seed=1)
        out2 = make_jitted_cone_step(meta)(arrays)
        assert np.isfinite(np.asarray(out2["recon_HU"][0])).all()

    def test_dominant_fallback_only_on_capability_errors(self):
        # a genuine input error must NOT be silently swallowed into the
        # DDA path
        import dataclasses

        from dexct_tpu.ops.conebeam import ConeDominantUnsupported

        ph2 = water_cylinder_phantom(N=30, dx=0.4)  # 30 % 16 != 0
        lab3 = np.broadcast_to(ph2.labels[0], (4, 30, 30)).copy()
        ph3 = dataclasses.replace(ph2, labels=lab3, dz=0.4)
        ct = ConeBeamGeometry(N_channels=32, N_proj=16, N_rows=4,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                              h_iso=0.4)
        with pytest.raises(ConeDominantUnsupported):
            from dexct_tpu.ops.conebeam import trace_cone_dominant

            src, dirs = ct.ray_geometry_3d()
            trace_cone_dominant(lab3, np.asarray(src, np.float32),
                                np.asarray(dirs, np.float32),
                                0.4, 0.4, 0.4, n_materials=2)
        # auto still succeeds via the DDA
        p = cone_material_paths(ph3, ct, method="auto")
        assert np.isfinite(np.asarray(p)).all()


def test_sharded_cone_pipeline_matches_single_device(cone_system):
    # view-sharded cone DE on the virtual mesh == the single-device
    # fused result; the only collectives are pmax (mask) + psum (vols)
    import numpy as _np

    from dexct_tpu.parallel.mesh import view_mesh
    from dexct_tpu.physics.spectrum import kramers_spectrum, linac_spectrum
    from dexct_tpu.pipeline.cone import (
        make_jitted_cone_step,
        make_sharded_cone_step,
        pack_cone_dect,
        pack_cone_dect_sharded,
    )

    ct, _, ph3 = cone_system
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)

    arrays0, meta0 = pack_cone_dect(ct, ph3, s1, s2, 48, 20.0, 0.8)
    ref = make_jitted_cone_step(meta0)(arrays0)

    mesh = view_mesh(4)
    arrays, meta, perm = pack_cone_dect_sharded(
        ct, ph3, s1, s2, 48, 20.0, 0.8, n_devices=4)
    out = make_sharded_cone_step(mesh, meta, tuple(arrays))(arrays)

    _np.testing.assert_allclose(
        _np.asarray(out["recon_HU"][0]),
        _np.asarray(ref["recon_HU"][0]), atol=0.02)
    _np.testing.assert_allclose(
        _np.asarray(out["mat_recons"][0]),
        _np.asarray(ref["mat_recons"][0]), atol=1e-4)
    # sinograms return in permuted view order
    nat = _np.asarray(out["sino_log"][0])[_np.argsort(perm)]
    _np.testing.assert_allclose(nat, _np.asarray(ref["sino_log"][0]),
                                atol=2e-3)


def test_fdk_pair_mode_matches_per_slice():
    # the z-pair windowed gather must equal the per-slice 2-row path on
    # the SAME data (pins the 4-row window select chain and the
    # _fdk_pair_ok spacing bound)
    from dexct_tpu.ops.conebeam import _fdk_backproject_multi, _fdk_pair_ok

    rng = np.random.default_rng(3)
    K, V, R, C = 2, 24, 8, 48
    qs = jnp.asarray(rng.normal(size=(K, V, R, C)).astype(np.float32))
    betas = jnp.asarray(np.arange(V) * (2 * np.pi / V), jnp.float32)
    sid, dgamma, row_h = 60.0, 0.8230337 / C, 0.5
    for dz_out in (0.5, 0.75):  # spacing 1.2 and 1.8 (bound: 1.9)
        assert _fdk_pair_ok(sid, 20.0, row_h, dz_out, 8, R)
        args = (qs, betas, sid, dgamma, row_h, R, 32, 8, 20.0, dz_out,
                2 * np.pi / V)
        a = np.asarray(_fdk_backproject_multi(*args, pair_mode=True))
        b = np.asarray(_fdk_backproject_multi(*args, pair_mode=False))
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_fdk_orbit4_matches_plain():
    # round-3 symmetry packing: the quarter-turn orbit fold (views
    # {i, i+V/4, i+V/2, i+3V/4} share one gather, legs recompose by
    # rot90) must reproduce the plain path on the same data.  Only
    # float-rounding differences are allowed (trig of beta vs
    # beta + l*pi/2).
    from dexct_tpu.ops.conebeam import _fdk_backproject_multi

    rng = np.random.default_rng(5)
    K, V, R, C = 2, 24, 8, 48
    qs = jnp.asarray(rng.normal(size=(K, V, R, C)).astype(np.float32))
    betas = jnp.asarray(np.arange(V) * (2 * np.pi / V), jnp.float32)
    sid, dgamma, row_h = 60.0, 0.8230337 / C, 0.5
    for pair in (True, False):
        args = (qs, betas, sid, dgamma, row_h, R, 32, 8, 20.0, 0.5,
                2 * np.pi / V)
        a = np.asarray(_fdk_backproject_multi(*args, pair_mode=pair))
        b = np.asarray(_fdk_backproject_multi(*args, pair_mode=pair,
                                              orbit4=True))
        np.testing.assert_allclose(a, b, rtol=2e-4,
                                   atol=2e-5 * np.abs(a).max())
    # sequenced z-pairs are arithmetically identical to the vmap
    args = (qs, betas, sid, dgamma, row_h, R, 32, 8, 20.0, 0.5,
            2 * np.pi / V)
    a = np.asarray(_fdk_backproject_multi(*args, pair_mode=True,
                                          orbit4=True, pair_seq=False))
    c = np.asarray(_fdk_backproject_multi(*args, pair_mode=True,
                                          orbit4=True, pair_seq=True))
    np.testing.assert_allclose(a, c, atol=1e-6 * np.abs(a).max())
    # bf16 rows stay within bf16 rounding of the f32 path
    d = np.asarray(_fdk_backproject_multi(*args, pair_mode=True,
                                          orbit4=True, bf16_taps=True))
    np.testing.assert_allclose(a, d, atol=2e-2 * np.abs(a).max())


def test_zslab_sharded_cone_matches_single_device(cone_system):
    # round-3 VERDICT item 8: composite views x zslab mesh — the FDK
    # accumulation z-splits over the second axis (each shard holds a
    # volume slab, not the full volume) and must reproduce the single-
    # device result exactly up to float reassociation.
    import numpy as _np

    from dexct_tpu.parallel.mesh import make_mesh
    from dexct_tpu.physics.spectrum import kramers_spectrum, linac_spectrum
    from dexct_tpu.pipeline.cone import (
        make_jitted_cone_step,
        make_sharded_cone_step,
        pack_cone_dect,
        pack_cone_dect_sharded,
    )

    ct, _, ph3 = cone_system
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)

    arrays0, meta0 = pack_cone_dect(ct, ph3, s1, s2, 48, 20.0, 0.8)
    ref = make_jitted_cone_step(meta0)(arrays0)

    mesh = make_mesh((4, 2), ("views", "zslab"))
    arrays, meta, perm = pack_cone_dect_sharded(
        ct, ph3, s1, s2, 48, 20.0, 0.8, n_devices=4, n_zslab=2)
    assert meta.n_zslab == 2 and meta.nz_out % 2 == 0
    out = make_sharded_cone_step(mesh, meta, tuple(arrays),
                                 zslab_axis="zslab")(arrays)

    for key_name in ("recon_HU", "mat_recons"):
        got = _np.asarray(out[key_name][0])
        want = _np.asarray(ref[key_name][0])
        assert got.shape == want.shape  # slabs reassemble the full grid
        atol = 0.02 if key_name == "recon_HU" else 1e-4
        _np.testing.assert_allclose(got, want, atol=atol)


def test_pelvis3d_cone_pipeline():
    """Round-3 anthropomorphic 3-D phantom (cortical/marrow split,
    z-varying anatomy, interior gas cavity) runs through the fused cone
    DE pipeline and the basis images separate bone from marrow."""
    from dexct_tpu.physics.spectrum import kramers_spectrum, linac_spectrum
    from dexct_tpu.pipeline.cone import make_jitted_cone_step, pack_cone_dect
    from dexct_tpu.system import ConeBeamGeometry, pelvis_phantom_3d

    ph = pelvis_phantom_3d(N=96, nz=16, dx=0.5, dz=0.5)
    # h_iso=0.5 keeps the packed-cone slope bound (group*dx*slope<=dz);
    # the 8-row detector covers the central +-2 cm of the volume
    ct = ConeBeamGeometry(N_channels=128, N_proj=96, N_rows=8,
                          gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                          h_iso=0.5, eid=True)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    arrays, meta = pack_cone_dect(ct, ph, s1, s2, 96, 40.0, 0.8,
                                  n_iters=10)
    out = make_jitted_cone_step(meta)(arrays)
    m2 = np.asarray(out["mat_recons"][1])  # bone-basis volume [nz,N,N]
    assert np.isfinite(m2).all()
    mid = m2[m2.shape[0] // 2]
    # cortical shells must carry clearly more bone-basis density than
    # the marrow interiors: compare the phantom's own label regions
    z_sel = ph.labels[ph.labels.shape[0] // 2]
    # recon grid == phantom grid here (96 @ dx=0.5 -> fov 48 vs recon
    # fov 40: resample by central crop is inexact; use robust stats)
    cort = float(np.percentile(mid, 99.5))
    soft = float(np.median(mid[np.isfinite(mid)]))
    assert cort > 0.5 and abs(soft) < 0.3
    assert (z_sel == 6).sum() > 0 and (z_sel == 4).sum() > 0


class TestHelicalPI:
    """Cone-parallel PI path (ops/helical_pi.py): the measured
    alternative helical reconstruction (module docstring has the
    gFDK-vs-PI study verdict)."""

    def _system(self):
        import dataclasses

        from dexct_tpu.system import HelicalConeBeamGeometry

        ct = HelicalConeBeamGeometry(
            N_channels=64, N_proj=384, N_rows=8, gamma_fan=0.8230337,
            SID=60.0, SDD=100.0, h_iso=0.5, pitch=2.0,
            rotation_total=8.0 * np.pi)
        ph2 = water_cylinder_phantom(N=48, dx=0.5)
        lab3 = np.broadcast_to(ph2.labels[0], (16, 48, 48)).copy()
        ph3 = dataclasses.replace(ph2, labels=lab3, dz=0.5)
        return ct, ph2, ph3

    def test_z_uniform_matches_fan(self):
        from dexct_tpu.ops.fbp import fan_backproject, filter_sinogram
        from dexct_tpu.ops.helical_pi import helical_pi_reconstruct
        from dexct_tpu.ops.siddon import (material_path_sinogram,
                                          mono_sinogram)

        ct, ph2, ph3 = self._system()
        mu = ph2.materials.mu_table(np.array([60.0]))[:, 0]
        sino = jnp.einsum("vrcm,m->vrc", cone_material_paths(ph3, ct),
                          jnp.asarray(mu, jnp.float32))
        vol = np.asarray(helical_pi_reconstruct(
            sino, ct, 48, 20.0, 0.8, z_out=np.array([0.25])))
        fan = FanBeamGeometry(N_channels=64, N_proj=96,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        img2 = np.asarray(fan_backproject(
            filter_sinogram(
                mono_sinogram(material_path_sinogram(ph2, fan),
                              jnp.asarray(mu, jnp.float32)), fan, 0.8),
            jnp.asarray(fan.betas, jnp.float32), fan.SID, fan.dgamma,
            48, 20.0))
        interior = np.hypot(
            *np.meshgrid(*[np.arange(48) - 23.5] * 2)) < 16
        e = np.abs(vol[0] - img2)[interior]
        # the PI resampling floor (azimuthal rebin + pi coverage)
        assert e.max() < 0.05 * img2.max()
        # quantitative scale: partition-of-unity weights keep the DC
        # gain exact
        ratio = vol[0][interior].mean() / img2[interior].mean()
        assert abs(ratio - 1.0) < 0.01, ratio

    def test_rejects_pitch_zero(self):
        import dataclasses

        from dexct_tpu.ops.helical_pi import helical_pi_reconstruct

        ct, ph2, ph3 = self._system()
        ct0 = dataclasses.replace(ct, pitch=0.0)
        with pytest.raises(ValueError):
            helical_pi_reconstruct(jnp.zeros((384, 8, 64)), ct0, 48,
                                   20.0, 0.8)


def test_cone_pwls_low_dose(cone_system):
    """3-D PWLS: noisy low-dose cone scan reconstructs with flat-region
    noise well below FDK at matched mean (the volumetric statistical-
    recon check, mirroring tests/test_iterative.py::TestPwls)."""
    from dexct_tpu.ops.conebeam import (cone_material_paths,
                                        cone_pwls_recon, fdk_reconstruct)

    ct, ph2, ph3 = cone_system
    mu = ph2.materials.mu_table(np.array([60.0]))[:, 0]
    sino = jnp.einsum("vrcm,m->vrc", cone_material_paths(ph3, ct),
                      jnp.asarray(mu, jnp.float32))
    rng = np.random.default_rng(5)
    n0 = 1500.0
    counts = np.maximum(
        rng.poisson(n0 * np.exp(-np.asarray(sino))), 1)
    y = -np.log(counts / n0)
    nz, nyx = ph3.labels.shape[0], ph3.labels.shape[1]
    fdk = np.asarray(fdk_reconstruct(
        jnp.asarray(y, jnp.float32), ct, nyx, 20.0, 0.8,
        nz_out=nz, dz_out=float(ph3.dz)))
    x = np.asarray(cone_pwls_recon(
        y, counts, ct, (nz, nyx, nyx),
        (float(ph3.dx), float(ph3.dy), float(ph3.dz)),
        n_iters=60, beta=3e-2,
        x0=jnp.maximum(jnp.asarray(fdk), 0.0)))
    mid = nz // 2
    flat = (slice(26, 36), slice(26, 36))
    mu_w = float(mu[1])
    assert abs(x[mid][flat].mean() - mu_w) / mu_w < 0.05
    assert x[mid][flat].std() < 0.6 * fdk[mid][flat].std(), (
        x[mid][flat].std(), fdk[mid][flat].std())


class TestFusedHelical:
    """Round-3: helical orbits in the pack-once fused cone pipeline
    (pipeline/cone.py) — the recon stage dispatches to the multi-volume
    generalized-Feldkamp backprojector (all four volumes' bilinear taps
    in one 16-float gather row), every other stage is orbit-agnostic."""

    @staticmethod
    def _system(rotation_total, pitch):
        import dataclasses

        from dexct_tpu.physics.spectrum import (kramers_spectrum,
                                                linac_spectrum)
        from dexct_tpu.system import HelicalConeBeamGeometry

        ct = HelicalConeBeamGeometry(
            N_channels=64, N_proj=96, N_rows=8, gamma_fan=0.8230337,
            SID=60.0, SDD=100.0, h_iso=0.5, eid=True,
            rotation_total=rotation_total, pitch=pitch)
        ph2 = water_cylinder_phantom(N=48, dx=0.5)
        lab3 = np.broadcast_to(ph2.labels[0], (16, 48, 48)).copy()
        ph3 = dataclasses.replace(ph2, labels=lab3, dz=0.5)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        return ct, ph3, s1, s2

    def test_multi_volume_bp_matches_per_volume(self):
        # the stacked [M, V, R, C] path is bit-identical to M separate
        # helical_fdk_reconstruct calls (same taps, same weights)
        from dexct_tpu.ops.conebeam import helical_fdk_reconstruct
        from dexct_tpu.system import HelicalConeBeamGeometry

        ct = HelicalConeBeamGeometry(
            N_channels=48, N_proj=96, N_rows=8, gamma_fan=0.8,
            SID=60.0, SDD=100.0, h_iso=0.5, rotation_total=4 * np.pi,
            pitch=2.0)
        rng = np.random.default_rng(0)
        s = rng.standard_normal((3, 96, 8, 48)).astype(np.float32)
        multi = np.asarray(
            helical_fdk_reconstruct(jnp.asarray(s), ct, 32, 20.0, 0.8))
        for k in range(3):
            one = np.asarray(helical_fdk_reconstruct(
                jnp.asarray(s[k]), ct, 32, 20.0, 0.8))
            np.testing.assert_array_equal(multi[k], one)

    def test_fused_matches_stateless_multiturn(self):
        # 2-turn helical scan, bundled trace: fused pipeline == the
        # stateless simulate_cone_dect(recon='helical') at float rounding
        from dexct_tpu.ops.conebeam import simulate_cone_dect
        from dexct_tpu.pipeline.cone import (make_jitted_cone_step,
                                             pack_cone_dect)

        ct, ph3, s1, s2 = self._system(4.0 * np.pi, 2.0)
        ref = simulate_cone_dect(ct, ph3, s1, s2, 48, 20.0, 0.8)
        arrays, meta = pack_cone_dect(ct, ph3, s1, s2, 48, 20.0, 0.8)
        assert meta.pitch == 2.0 and not meta.fdk_orbit4
        out = make_jitted_cone_step(meta)(arrays)
        assert out["recon_HU"][0].shape == ref["recon_HU"][0].shape
        np.testing.assert_allclose(
            np.asarray(out["recon_raw"][0]),
            np.asarray(ref["recon_raw"][0]), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out["mat_recons"][0]),
            np.asarray(ref["mat_recons"][0]), atol=1e-4)

    def test_sharded_fused_helical_matches_single_device(self):
        # single-turn helical: view sharding (psum of num/den INSIDE
        # the BP, before the coverage normalization) and the composite
        # views x zslab mesh both reproduce the single-device volumes
        from jax.sharding import Mesh

        from dexct_tpu.pipeline.cone import (
            make_jitted_cone_step,
            make_sharded_cone_step,
            pack_cone_dect,
            pack_cone_dect_sharded,
        )

        ct, ph3, s1, s2 = self._system(2.0 * np.pi, 3.0)
        arrays0, meta0 = pack_cone_dect(ct, ph3, s1, s2, 48, 20.0, 0.8)
        ref = make_jitted_cone_step(meta0)(arrays0)

        from dexct_tpu.parallel.mesh import view_mesh

        mesh = view_mesh(4)
        arrays, meta, perm = pack_cone_dect_sharded(
            ct, ph3, s1, s2, 48, 20.0, 0.8, n_devices=4)
        out = make_sharded_cone_step(mesh, meta, tuple(arrays))(arrays)
        np.testing.assert_allclose(
            np.asarray(out["recon_raw"][0]),
            np.asarray(ref["recon_raw"][0]), atol=1e-5)
        nat = np.asarray(out["sino_log"][0])[np.argsort(perm)]
        np.testing.assert_allclose(
            nat, np.asarray(ref["sino_log"][0]), atol=2e-3)

        import jax

        nz = meta0.nz_out
        if nz % 2 == 0:
            mesh2 = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                         ("views", "zslab"))
            za, zm, _ = pack_cone_dect_sharded(
                ct, ph3, s1, s2, 48, 20.0, 0.8, n_devices=4,
                n_zslab=2)
            zout = make_sharded_cone_step(
                mesh2, zm, tuple(za), zslab_axis="zslab")(za)
            np.testing.assert_allclose(
                np.asarray(zout["mat_recons"][0]),
                np.asarray(ref["mat_recons"][0]), atol=1e-4)

    def test_sharded_windowed_helical_matches_single_device(self):
        # wide z grid on a single-turn scan: the slice-windowed gFDK
        # scan is ACTIVE (L < npad) and must survive the paired-quarter
        # sharded view layout — pack_cone_dect_sharded aligns
        # fdk_view_block to the quarter-run length so every view block
        # stays contiguous in beta (the windowing contract)
        from dexct_tpu.parallel.mesh import view_mesh
        from dexct_tpu.pipeline.cone import (
            make_jitted_cone_step,
            make_sharded_cone_step,
            pack_cone_dect,
            pack_cone_dect_sharded,
        )

        ct, ph3, s1, s2 = self._system(2.0 * np.pi, 3.0)
        kw = dict(nz_out=16, dz_out=0.4)
        arrays0, meta0 = pack_cone_dect(ct, ph3, s1, s2, 48, 20.0, 0.8,
                                        **kw)
        ref = make_jitted_cone_step(meta0)(arrays0)

        mesh = view_mesh(4)
        arrays, meta, perm = pack_cone_dect_sharded(
            ct, ph3, s1, s2, 48, 20.0, 0.8, n_devices=4, **kw)
        assert (96 // 16) % meta.fdk_view_block == 0
        out = make_sharded_cone_step(mesh, meta, tuple(arrays))(arrays)
        np.testing.assert_allclose(
            np.asarray(out["recon_raw"][0]),
            np.asarray(ref["recon_raw"][0]), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out["mat_recons"][0]),
            np.asarray(ref["mat_recons"][0]), atol=1e-4)

    def test_pair_mode_matches_per_slice(self):
        # z-pair window gathers == the per-slice path on every
        # weighting, at odd AND even slice counts (the odd tail rides
        # one_pair with itself duplicated)
        from dexct_tpu.ops.conebeam import _helical_backproject
        from dexct_tpu.system import HelicalConeBeamGeometry

        ct = HelicalConeBeamGeometry(
            N_channels=48, N_proj=96, N_rows=8, gamma_fan=0.8,
            SID=60.0, SDD=100.0, h_iso=0.5, rotation_total=4 * np.pi,
            pitch=2.0)
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((4, 96, 8, 48))
                        .astype(np.float32))
        for nzv, dzv in ((7, 0.45), (6, 0.5)):
            zv = (np.arange(nzv) + 0.5) * dzv - nzv * dzv / 2
            bc = (0.5 * ct.rotation_total
                  + 2.0 * np.pi * zv / ct.pitch)
            args = (q, jnp.asarray(ct.betas, jnp.float32),
                    jnp.asarray(ct.source_z, jnp.float32),
                    jnp.zeros(96, jnp.float32),
                    jnp.asarray(bc, jnp.float32),
                    60.0, ct.dgamma, 0.5, 8, 2.0, 32, nzv, 20.0, dzv,
                    float(zv[0]))
            for wgt in ("full", "pair", "td"):
                a = np.asarray(_helical_backproject(
                    *args, weighting=wgt, pair_mode=False))
                b = np.asarray(_helical_backproject(
                    *args, weighting=wgt, pair_mode=True))
                assert np.abs(a - b).max() < 1e-6 * max(
                    np.abs(a).max(), 1e-30), (nzv, wgt)

    def test_slice_windowed_scan_matches_full(self):
        # the dbeta-enabled slice-windowed scan (each view block only
        # processes the L = O(pitch/dz) slices inside its hard-zero
        # view window) is bit-identical to the full nz scan on every
        # weighting, both pair modes, odd AND even slice counts
        from dexct_tpu.ops.conebeam import _helical_backproject
        from dexct_tpu.system import HelicalConeBeamGeometry

        ct = HelicalConeBeamGeometry(
            N_channels=48, N_proj=144, N_rows=8, gamma_fan=0.8,
            SID=60.0, SDD=100.0, h_iso=0.5, rotation_total=6 * np.pi,
            pitch=2.0)
        db = float(ct.betas[1] - ct.betas[0])
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal((4, 144, 8, 48))
                        .astype(np.float32))
        for nzv in (17, 16):
            zv = (np.arange(nzv) + 0.5) * 0.5 - nzv * 0.25
            bc = (0.5 * ct.rotation_total
                  + 2.0 * np.pi * zv / ct.pitch)
            args = (q, jnp.asarray(ct.betas, jnp.float32),
                    jnp.asarray(ct.source_z, jnp.float32),
                    jnp.zeros(144, jnp.float32),
                    jnp.asarray(bc, jnp.float32),
                    60.0, ct.dgamma, 0.5, 8, 2.0, 32, nzv, 20.0, 0.5,
                    float(zv[0]))
            for wgt in ("full", "short", "feather"):
                for pm in (False, True):
                    a = np.asarray(_helical_backproject(
                        *args, weighting=wgt, pair_mode=pm))
                    b = np.asarray(_helical_backproject(
                        *args, weighting=wgt, pair_mode=pm, dbeta=db))
                    assert np.abs(a - b).max() <= 1e-7 * max(
                        np.abs(a).max(), 1e-30), (nzv, wgt, pm)


class TestTiltedGantry:
    """Gantry-tilted circular cone beam (TiltedConeBeamGeometry +
    fdk_tilted_reconstruct): a tilted scan is a standard scan of the
    rigidly rotated patient, reconstructed in the gantry frame and
    shear-resampled back."""

    @staticmethod
    def _cyl(N=48, nz=16):
        import dataclasses

        ph2 = water_cylinder_phantom(N=N, dx=0.5, radius_cm=8.0)
        lab3 = np.broadcast_to(ph2.labels[0], (nz, N, N)).copy()
        return dataclasses.replace(ph2, labels=lab3, dz=0.5)

    def test_rays_are_rotated_parent_rays(self):
        from dexct_tpu.system import (ConeBeamGeometry,
                                      TiltedConeBeamGeometry)

        kw = dict(N_channels=32, N_proj=24, N_rows=8, gamma_fan=0.8,
                  SID=60.0, SDD=100.0, h_iso=0.5)
        tau = 0.3
        ct0 = ConeBeamGeometry(**kw)
        ctt = TiltedConeBeamGeometry(tilt=tau, **kw)
        s0, d0 = ct0.ray_geometry_3d()
        st, dt = ctt.ray_geometry_3d()
        c, s = np.cos(tau), np.sin(tau)
        rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)
        np.testing.assert_allclose(st, s0 @ rot.T, atol=1e-12)
        np.testing.assert_allclose(dt, d0 @ rot.T, atol=1e-12)
        # untilted() recovers the parent geometry's rays
        su, du = ctt.untilted().ray_geometry_3d()
        np.testing.assert_allclose(su, s0, atol=1e-12)

    def test_tilt_zero_matches_fdk(self):
        from dexct_tpu.ops.conebeam import (cone_sinogram,
                                            fdk_reconstruct,
                                            fdk_tilted_reconstruct)
        from dexct_tpu.physics import kramers_spectrum
        from dexct_tpu.system import TiltedConeBeamGeometry

        ct = TiltedConeBeamGeometry(
            N_channels=48, N_proj=48, N_rows=8, gamma_fan=0.8,
            SID=60.0, SDD=100.0, h_iso=0.5, tilt=0.0, eid=True)
        ph = self._cyl(N=32, nz=8)
        sp = kramers_spectrum(120.0)
        sp.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
        _, sino = cone_sinogram(ph, ct, sp)
        a = np.asarray(fdk_reconstruct(sino, ct.untilted(), 32, 14.0,
                                       0.8))
        b = np.asarray(fdk_tilted_reconstruct(sino, ct, 32, 14.0, 0.8))
        np.testing.assert_array_equal(a, b)

    def test_tilted_cylinder_matches_untilted(self):
        # a z-uniform water cylinder is invariant under the gantry
        # tilt, so the tilted reconstruction must match the untilted
        # one in the fully-covered interior
        from dexct_tpu.ops.conebeam import (cone_sinogram,
                                            fdk_reconstruct,
                                            fdk_tilted_reconstruct)
        from dexct_tpu.physics import kramers_spectrum
        from dexct_tpu.system import (ConeBeamGeometry,
                                      TiltedConeBeamGeometry)

        kw = dict(N_channels=64, N_proj=64, N_rows=12, gamma_fan=0.8,
                  SID=60.0, SDD=100.0, h_iso=0.4, eid=True)
        ph = self._cyl(N=48, nz=16)
        sp = kramers_spectrum(120.0)

        ct0 = ConeBeamGeometry(**kw)
        sp.rescale_counts(ct0.A_iso * 5.0 / ct0.N_proj)
        _, sino0 = cone_sinogram(ph, ct0, sp)
        ref = np.asarray(fdk_reconstruct(sino0, ct0, 48, 18.0, 0.8,
                                         nz_out=6, dz_out=0.4))

        ctt = TiltedConeBeamGeometry(tilt=np.deg2rad(15.0), **kw)
        _, sinot = cone_sinogram(ph, ctt, sp)
        tilted = np.asarray(fdk_tilted_reconstruct(
            sinot, ctt, 48, 18.0, 0.8, nz_out=6, dz_out=0.4))
        assert tilted.shape == ref.shape
        # central region (fully covered at this tilt); the ~4% point
        # bound is FDK-class: the rotated cylinder is oblique to the
        # gantry z-axis (cone artifact) and the shear resample is
        # trilinear (measured 4.4% max / 0.6% mean at 15 degrees)
        c = np.s_[2:4, 18:30, 18:30]
        scale = np.abs(ref[c]).max()
        assert np.abs(tilted[c] - ref[c]).max() < 0.06 * scale
        # recovered water mu in the center within 2%
        mu_ref = ref[c].mean()
        assert abs(tilted[c].mean() / mu_ref - 1.0) < 0.02

    def test_simulate_routes_and_registry_parses(self):
        from dexct_tpu.ops.conebeam import (fdk_reconstruct,
                                            simulate_cone_dect)
        from dexct_tpu.physics import kramers_spectrum, linac_spectrum
        from dexct_tpu.system import TiltedConeBeamGeometry
        from dexct_tpu.system.geometry import GEOMETRY_REGISTRY

        assert GEOMETRY_REGISTRY["tilted_cone_beam"] \
            is TiltedConeBeamGeometry
        ct = TiltedConeBeamGeometry(
            N_channels=32, N_proj=24, N_rows=8, gamma_fan=0.8,
            SID=60.0, SDD=100.0, h_iso=0.5, tilt=0.2, eid=True)
        ph = self._cyl(N=24, nz=8)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        out = simulate_cone_dect(ct, ph, s1, s2, 24, 10.0, 0.8,
                                 nz_out=4, dz_out=0.5)
        assert out["recon_HU"][0].shape == (4, 24, 24)
        assert np.isfinite(out["recon_HU"][0]).all()
        # the plain FDK refuses tilted geometries
        import pytest

        with pytest.raises(ValueError, match="tilt"):
            fdk_reconstruct(out["sino_log"][0], ct, 24, 10.0, 0.8)

    def test_edge_x_coverage_thin_volume(self):
        # regression: the gantry grid must keep the FULL patient fov in
        # x (the tilt leaves x unchanged) — fov*cos(tau) + small-z
        # terms undershot it for thin volumes and zeroed a ring of
        # fully-measured voxels near |x| = fov/2.
        # Config pins the bug: tilt 30 deg, 2-slice output (z_half =
        # 0.5 cm), fov 20 @ 40 px (px 0.5): the old fov_g =
        # 20*cos(30) + 2*0.5*sin(30) + 2*0.5 = 18.82 -> n_g 38, half-
        # extent 9.5 cm — the probe voxels at |x| = 9.75 cm sampled
        # OUTSIDE the gantry grid and read ~0 despite being fully
        # measured water; the fixed grid (half-extent >= 10 cm) keeps
        # them.
        import dataclasses

        from dexct_tpu.ops.conebeam import (cone_sinogram,
                                            fdk_tilted_reconstruct)
        from dexct_tpu.physics import kramers_spectrum
        from dexct_tpu.system import TiltedConeBeamGeometry

        ph2 = water_cylinder_phantom(N=32, dx=0.75, radius_cm=11.5)
        lab3 = np.broadcast_to(ph2.labels[0], (8, 32, 32)).copy()
        ph = dataclasses.replace(ph2, labels=lab3, dz=0.75)
        ct = TiltedConeBeamGeometry(
            N_channels=96, N_proj=48, N_rows=8, gamma_fan=0.8,
            SID=60.0, SDD=100.0, h_iso=0.5, eid=True,
            tilt=np.deg2rad(30.0))
        sp = kramers_spectrum(120.0)
        sp.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
        _, sino = cone_sinogram(ph, ct, sp)
        vol = np.asarray(fdk_tilted_reconstruct(
            sino, ct, 40, 20.0, 0.8, nz_out=2, dz_out=0.5))
        mid = vol[0]
        # last/first pixel centers sit at x = +-9.75 cm, y ~ +-0.25:
        # 1.75 cm inside the water cylinder and inside the 10-cm fov
        c = mid[19:21, 18:22].mean()
        assert c > 0.1  # sanity: water ~0.2 /cm
        assert mid[20, 39] > 0.75 * c, (mid[20, 39], c)
        assert mid[20, 0] > 0.75 * c, (mid[20, 0], c)
