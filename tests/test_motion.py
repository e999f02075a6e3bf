"""Rigid patient motion (ops/motion.py): exact simulation equivalences,
motion-compensated FBP, and the sinogram-domain translation estimator.

Contracts pinned here:
* zero motion is EXACTLY the static path (same tracer, same BP ops);
* a constant rotation about isocenter over a uniform full scan is a
  pure view roll of the static sinogram (the simulation's exactness
  witness — no interpolation anywhere);
* MC-FBP with the true profile removes the artifact (>=4x rms vs
  uncorrected against the static recon);
* the centroid-track Gauss-Newton estimator recovers a smooth
  translation to a fraction of its amplitude, and reconstructing with
  the ESTIMATED profile beats no correction.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops import fbp as fbp_ops
from dexct_tpu.ops.motion import (MotionProfile, estimate_translation,
                                  fan_backproject_motion, fbp_recon_motion,
                                  material_path_sinogram_motion)
from dexct_tpu.ops.siddon import material_path_sinogram, mono_sinogram
from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom, \
    water_cylinder_phantom

MU = {"water_cyl": np.array([0.0, 0.20]),
      "contrast_rods": np.array([0.0, 0.20, 0.21, 0.45, 0.18, 0.22])}


def _system(N=64, n_ch=96, n_proj=128, phantom=water_cylinder_phantom):
    ct = FanBeamGeometry(N_channels=n_ch, N_proj=n_proj,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0)
    ph = phantom(N=N, dx=0.35 * 64 / N)
    return ct, ph


def _mono_sino(ph, ct, motion=None, method="dda"):
    if motion is None:
        paths = material_path_sinogram(ph, ct, method=method)
    else:
        paths = material_path_sinogram_motion(ph, ct, motion, method=method)
    return mono_sinogram(paths, MU[ph.name][:ph.n_materials])


class TestSimulation:
    def test_static_profile_matches_static_paths(self):
        ct, ph = _system()
        p0 = material_path_sinogram(ph, ct, method="dda")
        pm = material_path_sinogram_motion(
            ph, ct, MotionProfile.static(ct.N_proj), method="dda")
        np.testing.assert_allclose(np.asarray(pm), np.asarray(p0),
                                   atol=1e-6)

    def test_constant_rotation_is_view_roll(self):
        """Object rotated by k view-spacings == sinogram rolled by k
        views (uniform 2-pi scan) — exactness witness for the ray
        transform."""
        ct, ph = _system(phantom=contrast_rods_phantom)
        k = 5
        dbeta = 2.0 * np.pi / ct.N_proj
        motion = MotionProfile(np.full(ct.N_proj, k * dbeta),
                               np.zeros((ct.N_proj, 2)))
        p0 = np.asarray(material_path_sinogram(ph, ct, method="dda"))
        pm = np.asarray(material_path_sinogram_motion(ph, ct, motion,
                                                      method="dda"))
        np.testing.assert_allclose(pm, np.roll(p0, k, axis=0),
                                   atol=1e-5)

    def test_dominant_matches_dda_under_motion(self):
        ct, ph = _system()
        motion = MotionProfile.breathing(ct.N_proj, amplitude_cm=0.6,
                                         cycles=2.0)
        pd = np.asarray(material_path_sinogram_motion(ph, ct, motion,
                                                      method="dda"))
        pf = np.asarray(material_path_sinogram_motion(ph, ct, motion,
                                                      method="dominant"))
        np.testing.assert_allclose(pf, pd, atol=5e-4)


class TestMotionCompensatedFBP:
    def test_zero_motion_matches_static_bp(self):
        ct, ph = _system()
        sino = _mono_sino(ph, ct)
        q = fbp_ops.filter_sinogram(sino, ct, 0.8, "sinc", jnp.float32)
        betas = jnp.asarray(ct.betas, jnp.float32)
        img0 = fbp_ops.fan_backproject(q, betas, ct.SID, ct.dgamma, 64,
                                       22.4)
        imgm = fan_backproject_motion(
            q, betas, ct.SID, ct.dgamma, 64, 22.4,
            jnp.zeros((ct.N_proj,)), jnp.zeros((ct.N_proj, 2)))
        np.testing.assert_allclose(np.asarray(imgm), np.asarray(img0),
                                   atol=1e-6)

    def test_true_profile_removes_artifact(self):
        ct, ph = _system(phantom=contrast_rods_phantom)
        fov = ph.Nx * ph.dx
        motion = MotionProfile.breathing(ct.N_proj, amplitude_cm=0.8,
                                         cycles=1.5, direction=(1.0, 0.4))
        clean = _mono_sino(ph, ct)
        moved = _mono_sino(ph, ct, motion)
        ref, _ = fbp_ops.fbp_recon(clean, ct, 64, fov)
        bad, _ = fbp_ops.fbp_recon(moved, ct, 64, fov)
        fixed, _ = fbp_recon_motion(moved, ct, 64, fov, motion)
        e_bad = float(np.sqrt(np.mean((np.asarray(bad)
                                       - np.asarray(ref)) ** 2)))
        e_fix = float(np.sqrt(np.mean((np.asarray(fixed)
                                       - np.asarray(ref)) ** 2)))
        assert e_fix < e_bad / 4.0, (e_bad, e_fix)

    def test_rotation_compensation(self):
        """Zero-net rotations (constant offset, oscillation) compensate
        to near the resampling floor; a NET drift is limited by its
        uncovered object-frame wedge (module docstring) — pin the
        measured ratios for all three."""
        ct, ph = _system(phantom=contrast_rods_phantom)
        fov = ph.Nx * ph.dx
        V = ct.N_proj
        clean = _mono_sino(ph, ct)
        ref = np.asarray(fbp_ops.fbp_recon(clean, ct, 64, fov)[0])
        cases = [
            (MotionProfile(np.full(V, 0.15), np.zeros((V, 2))), 4.0),
            (MotionProfile(0.15 * np.sin(2 * np.pi * np.arange(V) / V),
                           np.zeros((V, 2))), 2.5),
            (MotionProfile.rotation_drift(V, total_rad=0.15), 1.4),
        ]
        for motion, min_ratio in cases:
            moved = _mono_sino(ph, ct, motion)
            bad, _ = fbp_ops.fbp_recon(moved, ct, 64, fov)
            fixed, _ = fbp_recon_motion(moved, ct, 64, fov, motion)
            e_bad = float(np.sqrt(np.mean((np.asarray(bad) - ref) ** 2)))
            e_fix = float(np.sqrt(np.mean((np.asarray(fixed) - ref) ** 2)))
            assert e_fix < e_bad / min_ratio, (min_ratio, e_bad, e_fix)


class TestEstimator:
    @pytest.fixture(scope="class")
    def fitted(self):
        ct, ph = _system(N=64, n_proj=192, phantom=contrast_rods_phantom)
        motion = MotionProfile.breathing(ct.N_proj, amplitude_cm=0.6,
                                         cycles=1.5, direction=(0.3, 1.0))
        sino = np.asarray(_mono_sino(ph, ct, motion))
        est, c0 = estimate_translation(sino, ct, n_modes=6)
        return ct, ph, motion, sino, est, c0

    def test_recovers_track(self, fitted):
        ct, ph, motion, sino, est, c0 = fitted
        err = np.sqrt(np.mean((est.disp - motion.disp) ** 2))
        amp = np.sqrt(np.mean(motion.disp ** 2))
        # measured bound: the extended-object centroid bias leaves ~0.3x
        # rms amplitude (module docstring); pin it with headroom
        assert err < 0.4 * amp, (err, amp)

    def test_static_scan_fits_near_zero(self):
        ct, ph = _system(phantom=contrast_rods_phantom)
        sino = np.asarray(_mono_sino(ph, ct))
        est, c0 = estimate_translation(sino, ct, n_modes=6)
        assert np.max(np.abs(est.disp)) < 0.05
        assert np.max(np.abs(c0)) < 0.2  # phantom is centered

    def test_estimated_profile_improves_recon(self, fitted):
        ct, ph, motion, sino, est, c0 = fitted
        fov = ph.Nx * ph.dx
        clean = _mono_sino(ph, ct)
        ref, _ = fbp_ops.fbp_recon(clean, ct, 64, fov)
        bad, _ = fbp_ops.fbp_recon(jnp.asarray(sino), ct, 64, fov)
        fixed, _ = fbp_recon_motion(jnp.asarray(sino), ct, 64, fov, est)
        e_bad = float(np.sqrt(np.mean((np.asarray(bad)
                                       - np.asarray(ref)) ** 2)))
        e_fix = float(np.sqrt(np.mean((np.asarray(fixed)
                                       - np.asarray(ref)) ** 2)))
        assert e_fix < 0.6 * e_bad, (e_bad, e_fix)


class TestConeMotion:
    """3-D rigid motion: exact simulation equivalences and MC-FDK."""

    def _system(self):
        from dexct_tpu.physics.materials import (AIR, BONE, WATER,
                                                 MaterialTable)
        from dexct_tpu.system import ConeBeamGeometry
        from dexct_tpu.system.phantom import VoxelPhantom

        N, NZ, dx = 48, 16, 0.5
        lab3 = np.broadcast_to(
            water_cylinder_phantom(N=N, dx=dx).labels[0],
            (NZ, N, N)).copy()
        cz = (np.arange(NZ) + 0.5 - NZ / 2) * dx
        cy = (np.arange(N) + 0.5 - N / 2) * dx
        Z, Y, X = np.meshgrid(cz, cy, cy, indexing="ij")
        lab3[(X ** 2 + (Y - 2.0) ** 2 + Z ** 2) < 9.0] = 2
        mt = MaterialTable([AIR, WATER, BONE])
        ph3 = VoxelPhantom("zvar", lab3, mt, dx, dx, dx)
        ct = ConeBeamGeometry(N_channels=64, N_proj=96, N_rows=16,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                              h_iso=0.5)
        mu = mt.mu_table(np.array([60.0]))[:, 0]
        return ct, ph3, mu

    def test_static_profile_matches_static_paths(self):
        from dexct_tpu.ops.conebeam import cone_material_paths
        from dexct_tpu.ops.motion import (MotionProfile3D,
                                          cone_material_paths_motion)

        ct, ph3, mu = self._system()
        p0 = np.asarray(cone_material_paths(ph3, ct, method="dda"))
        pm = np.asarray(cone_material_paths_motion(
            ph3, ct, MotionProfile3D.static(ct.N_proj), method="dda"))
        np.testing.assert_allclose(pm, p0, atol=1e-6)

    def test_constant_rotation_is_view_roll(self):
        from dexct_tpu.ops.motion import (MotionProfile3D,
                                          cone_material_paths_motion)

        ct, ph3, mu = self._system()
        k = 4
        dbeta = 2.0 * np.pi / ct.N_proj
        motion = MotionProfile3D(np.full(ct.N_proj, k * dbeta),
                                 np.zeros((ct.N_proj, 3)))
        from dexct_tpu.ops.conebeam import cone_material_paths

        p0 = np.asarray(cone_material_paths(ph3, ct, method="dda"))
        pm = np.asarray(cone_material_paths_motion(ph3, ct, motion,
                                                   method="dda"))
        np.testing.assert_allclose(pm, np.roll(p0, k, axis=0), atol=1e-5)

    def test_dominant_matches_dda_under_motion(self):
        """The packed cone kernel needs a shallow z-slope
        (validate_cone_dominant); use a half-height detector so the
        motion-transformed rays stay inside its envelope."""
        import dataclasses

        from dexct_tpu.ops.motion import (MotionProfile3D,
                                          cone_material_paths_motion)

        ct, ph3, mu = self._system()
        ct = dataclasses.replace(ct, N_rows=8, h_iso=0.25)
        motion = MotionProfile3D.breathing_z(ct.N_proj, amplitude_cm=0.8,
                                             cycles=1.5)
        pd = np.asarray(cone_material_paths_motion(ph3, ct, motion,
                                                   method="dda"))
        pf = np.asarray(cone_material_paths_motion(ph3, ct, motion,
                                                   method="dominant"))
        np.testing.assert_allclose(pf, pd, atol=5e-4)

    def test_zero_motion_matches_static_fdk(self):
        import jax.numpy as jnp

        from dexct_tpu.ops.conebeam import cone_material_paths, \
            fdk_reconstruct
        from dexct_tpu.ops.motion import (MotionProfile3D,
                                          fdk_reconstruct_motion)

        ct, ph3, mu = self._system()
        sino = jnp.einsum("vrcm,m->vrc",
                          jnp.asarray(cone_material_paths(ph3, ct)),
                          jnp.asarray(mu, jnp.float32))
        v0 = np.asarray(fdk_reconstruct(sino, ct, 48, 24.0, 0.8))
        vm = np.asarray(fdk_reconstruct_motion(
            sino, ct, 48, 24.0, 0.8, MotionProfile3D.static(ct.N_proj)))
        # same filter, same math: central slices match to float32
        # rounding.  The OUTERMOST slices differ by design: rows fall
        # off the detector for part of the orbit there, and the motion
        # BP renormalizes by the accumulated coverage (gFDK-style)
        # where static FDK just dims — measured v0 0.148 vs vm 0.222
        # against a true 0.22 water+bone value at slice 0.
        assert v0.shape == vm.shape
        err = np.abs(vm - v0)
        assert err[2:-2].max() < 1e-5, err[2:-2].max()

    def test_z_breathing_artifact_removed(self):
        import jax.numpy as jnp

        from dexct_tpu.ops.conebeam import cone_material_paths, \
            fdk_reconstruct
        from dexct_tpu.ops.motion import (MotionProfile3D,
                                          cone_material_paths_motion,
                                          fdk_reconstruct_motion)

        ct, ph3, mu = self._system()
        motion = MotionProfile3D.breathing_z(ct.N_proj, amplitude_cm=1.0,
                                             cycles=1.5)
        muj = jnp.asarray(mu, jnp.float32)
        clean = jnp.einsum("vrcm,m->vrc",
                           jnp.asarray(cone_material_paths(ph3, ct)), muj)
        moved = jnp.einsum(
            "vrcm,m->vrc",
            jnp.asarray(cone_material_paths_motion(ph3, ct, motion)), muj)
        ref = np.asarray(fdk_reconstruct(clean, ct, 48, 24.0, 0.8))
        bad = np.asarray(fdk_reconstruct(moved, ct, 48, 24.0, 0.8))
        fixed = np.asarray(fdk_reconstruct_motion(moved, ct, 48, 24.0,
                                                  0.8, motion))
        # judge inside the sphere region, central slices (rim rows lose
        # coverage to the axial drift)
        sl = (slice(5, 11), slice(14, 34), slice(14, 34))
        e_bad = float(np.sqrt(np.mean((bad[sl] - ref[sl]) ** 2)))
        e_fix = float(np.sqrt(np.mean((fixed[sl] - ref[sl]) ** 2)))
        assert e_fix < e_bad / 3.0, (e_bad, e_fix)


class TestJointEstimator:
    def test_joint_beats_centroid_and_restores_recon(self):
        """The joint (image, track) inversion: >=2.5x tighter track
        than the centroid init (measured 5x at 800+ iters; 500 here
        for suite runtime) and >=4x artifact-rms reduction through
        MC-FBP (true-track floor ~7x)."""
        from dexct_tpu.ops.motion import estimate_motion_joint

        ct, ph = _system(N=64, n_proj=192, phantom=contrast_rods_phantom)
        motion = MotionProfile.breathing(ct.N_proj, amplitude_cm=0.6,
                                         cycles=1.5, direction=(0.3, 1.0))
        sino = _mono_sino(ph, ct, motion)
        fov = ph.Nx * ph.dx
        amp = np.sqrt(np.mean(motion.disp ** 2))

        est0, _ = estimate_translation(np.asarray(sino), ct, n_modes=6)
        e_init = np.sqrt(np.mean((est0.disp - motion.disp) ** 2))

        est, ximg = estimate_motion_joint(sino, ct, 64, fov,
                                          n_modes=6, n_iters=500,
                                          init=est0)
        e_joint = np.sqrt(np.mean((est.disp - motion.disp) ** 2))
        assert e_joint < e_init / 2.5, (e_init / amp, e_joint / amp)

        clean = _mono_sino(ph, ct)
        ref = np.asarray(fbp_ops.fbp_recon(clean, ct, 64, fov)[0])
        bad, _ = fbp_ops.fbp_recon(sino, ct, 64, fov)
        fixed, _ = fbp_recon_motion(sino, ct, 64, fov, est)
        e_bad = float(np.sqrt(np.mean((np.asarray(bad) - ref) ** 2)))
        e_fix = float(np.sqrt(np.mean((np.asarray(fixed) - ref) ** 2)))
        assert e_fix < e_bad / 4.0, (e_bad, e_fix)
        # the joint image itself is motion-resolved too
        assert np.isfinite(np.asarray(ximg)).all()


    def test_joint_full_rigid(self):
        """fit_rotation=True recovers a combined rotation+translation
        pose track (measured: disp err 0.07x, phi err 0.16x amplitude;
        MC-FBP 5x artifact reduction)."""
        from dexct_tpu.ops.motion import estimate_motion_joint

        ct, ph = _system(N=64, n_proj=192, phantom=contrast_rods_phantom)
        V = ct.N_proj
        motion = MotionProfile(
            0.08 * np.sin(2 * np.pi * np.arange(V) / V),
            MotionProfile.breathing(V, 0.5, 1.5, (0.3, 1.0)).disp)
        sino = _mono_sino(ph, ct, motion)
        fov = ph.Nx * ph.dx
        est, _ = estimate_motion_joint(sino, ct, 64, fov, n_iters=500,
                                       fit_rotation=True)
        ed = np.sqrt(np.mean((est.disp - motion.disp) ** 2))
        ad = np.sqrt(np.mean(motion.disp ** 2))
        ep = np.sqrt(np.mean((est.phi - motion.phi) ** 2))
        ap = np.sqrt(np.mean(motion.phi ** 2))
        assert ed < 0.2 * ad, (ed, ad)
        assert ep < 0.35 * ap, (ep, ap)
        clean = _mono_sino(ph, ct)
        ref = np.asarray(fbp_ops.fbp_recon(clean, ct, 64, fov)[0])
        bad = np.asarray(fbp_ops.fbp_recon(sino, ct, 64, fov)[0])
        fixed = np.asarray(fbp_recon_motion(sino, ct, 64, fov, est)[0])
        e_bad = np.sqrt(np.mean((bad - ref) ** 2))
        e_fix = np.sqrt(np.mean((fixed - ref) ** 2))
        assert e_fix < e_bad / 3.0, (e_bad, e_fix)


class TestGuards:
    def test_analytic_phantom_rejected(self):
        from dexct_tpu.system.analytic import water_cylinder_analytic

        ct, _ = _system()
        ph = water_cylinder_analytic()
        with pytest.raises(ValueError, match="voxel"):
            material_path_sinogram_motion(
                ph, ct, MotionProfile.static(ct.N_proj))

    def test_short_scan_mc_fdk_rejected(self):
        import dataclasses

        from dexct_tpu.ops.motion import (MotionProfile3D,
                                          fdk_reconstruct_motion)
        from dexct_tpu.system import ConeBeamGeometry

        ct = ConeBeamGeometry(N_channels=16, N_proj=16, N_rows=4,
                              gamma_fan=0.8, SID=60.0, SDD=100.0,
                              h_iso=0.5, rotation_total=np.pi)
        sino = jnp.zeros((16, 4, 16))
        with pytest.raises(ValueError, match="2\\*pi"):
            fdk_reconstruct_motion(sino, ct, 16, 8.0, 0.8,
                                   MotionProfile3D.static(16))


class TestHelicalMotion:
    def _system(self):
        from dexct_tpu.physics.materials import (AIR, BONE, WATER,
                                                 MaterialTable)
        from dexct_tpu.system import HelicalConeBeamGeometry
        from dexct_tpu.system.phantom import VoxelPhantom

        N, NZ, dx = 48, 24, 0.5
        lab3 = np.broadcast_to(
            water_cylinder_phantom(N=N, dx=dx).labels[0],
            (NZ, N, N)).copy()
        cz = (np.arange(NZ) + 0.5 - NZ / 2) * dx
        cy = (np.arange(N) + 0.5 - N / 2) * dx
        Z, Y, X = np.meshgrid(cz, cy, cy, indexing="ij")
        lab3[(X ** 2 + (Y - 2.0) ** 2 + Z ** 2) < 6.0] = 2
        mt = MaterialTable([AIR, WATER, BONE])
        ph3 = VoxelPhantom("zvarh", lab3, mt, dx, dx, dx)
        ct = HelicalConeBeamGeometry(
            N_channels=64, N_proj=384, N_rows=8, gamma_fan=0.8230337,
            SID=60.0, SDD=100.0, h_iso=0.5, pitch=2.0,
            rotation_total=8.0 * np.pi)
        mu = mt.mu_table(np.array([60.0]))[:, 0]
        return ct, ph3, mu

    def test_zero_motion_matches_static_helical(self):
        from dexct_tpu.ops.conebeam import (cone_material_paths,
                                            helical_fdk_reconstruct)
        from dexct_tpu.ops.motion import (MotionProfile3D,
                                          helical_fdk_reconstruct_motion)

        ct, ph3, mu = self._system()
        sino = jnp.einsum("vrcm,m->vrc",
                          jnp.asarray(cone_material_paths(ph3, ct)),
                          jnp.asarray(mu, jnp.float32))
        z_out = (np.arange(8) + 0.5 - 4.0) * 0.5
        v0 = np.asarray(helical_fdk_reconstruct(
            sino, ct, 48, 24.0, 0.8, z_out=z_out, weighting="full"))
        vm = np.asarray(helical_fdk_reconstruct_motion(
            sino, ct, 48, 24.0, 0.8, MotionProfile3D.static(ct.N_proj),
            z_out=z_out))
        # same math; the only deviation is float32 rounding of the
        # per-view window center flipping boundary views in/out
        # (measured max 0.011 on a 0.2/cm object)
        assert np.abs(vm - v0).max() < 0.02, np.abs(vm - v0).max()

    def test_z_drift_compensated(self):
        """Respiratory z-drift during a helical scan: MC helical gFDK
        with the true track recovers most of the artifact."""
        from dexct_tpu.ops.conebeam import (cone_material_paths,
                                            helical_fdk_reconstruct)
        from dexct_tpu.ops.motion import (MotionProfile3D,
                                          cone_material_paths_motion,
                                          helical_fdk_reconstruct_motion)

        ct, ph3, mu = self._system()
        muj = jnp.asarray(mu, jnp.float32)
        # large drift, phased so the central-slice windows see it too;
        # the MC residual floor is gFDK's row-interpolation phase error
        # (~0.02 rms on this sharp sphere — measured: a CONSTANT
        # half-row shift costs 0.010, a full-row shift only 0.0026)
        motion = MotionProfile3D.breathing_z(ct.N_proj,
                                             amplitude_cm=1.6,
                                             cycles=1.5)
        clean = jnp.einsum("vrcm,m->vrc",
                           jnp.asarray(cone_material_paths(ph3, ct)),
                           muj)
        moved = jnp.einsum(
            "vrcm,m->vrc",
            jnp.asarray(cone_material_paths_motion(ph3, ct, motion)),
            muj)
        z_out = (np.arange(8) + 0.5 - 4.0) * 0.5
        ref = np.asarray(helical_fdk_reconstruct(
            clean, ct, 48, 24.0, 0.8, z_out=z_out, weighting="full"))
        bad = np.asarray(helical_fdk_reconstruct(
            moved, ct, 48, 24.0, 0.8, z_out=z_out, weighting="full"))
        fixed = np.asarray(helical_fdk_reconstruct_motion(
            moved, ct, 48, 24.0, 0.8, motion, z_out=z_out))
        sl = (slice(None), slice(12, 36), slice(12, 36))
        e_bad = float(np.sqrt(np.mean((bad[sl] - ref[sl]) ** 2)))
        e_fix = float(np.sqrt(np.mean((fixed[sl] - ref[sl]) ** 2)))
        # measured: 0.055 -> 0.024; the fix lands ON the interpolation
        # floor — larger drifts improve the ratio, not the residual
        assert e_fix < e_bad / 2.0, (e_bad, e_fix)
