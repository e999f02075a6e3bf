"""Gated / 4-D reconstruction (pipeline/gated.py): all-ones reduction
to standard FBP, frozen-motion frames from a periodically moving
phantom, and the commensurate-period limited-angle failure mode."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from dexct_tpu.ops import fbp as fbp_ops
from dexct_tpu.ops.motion import MotionProfile, \
    material_path_sinogram_motion
from dexct_tpu.ops.siddon import material_path_sinogram, mono_sinogram
from dexct_tpu.pipeline.gated import (gate_weights, gated_fbp_recon,
                                      gated_series, view_phases)
from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom

MU = np.array([0.0, 0.20, 0.21, 0.45, 0.18, 0.22])


def _multi_rotation_system(n_rot=4, v_turn=96):
    ct = FanBeamGeometry(N_channels=96, N_proj=n_rot * v_turn,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         rotation_total=n_rot * 2.0 * np.pi)
    ph = contrast_rods_phantom(N=64, dx=0.35)
    return ct, ph


class TestGated:
    def test_all_ones_matches_single_turn_fbp(self):
        ct, ph = _multi_rotation_system()
        fov = ph.Nx * ph.dx
        sino = mono_sinogram(material_path_sinogram(ph, ct), MU)
        img = np.asarray(gated_fbp_recon(
            sino, ct, 64, fov, np.ones(ct.N_proj)))
        ct1 = FanBeamGeometry(N_channels=96, N_proj=96,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        sino1 = mono_sinogram(material_path_sinogram(ph, ct1), MU)
        ref = np.asarray(fbp_ops.fbp_recon(sino1, ct1, 64, fov)[0])
        assert np.abs(img - ref).max() < 1e-4, np.abs(img - ref).max()

    def test_gates_freeze_periodic_motion(self):
        """A periodic oscillation incommensurate with the rotation.
        Gate at phase 0.25 — the pose EXTREME, where the motion rate is
        lowest (the cardiac 'diastole' choice; a gate at the zero
        crossing sees the fastest pose sweep and wins nothing) — and
        judge against the pose-matched static reference.  Measured
        width tradeoff: 0.3 -> 0.016 (best), 0.12 -> 0.040 (only ~5
        view clusters survive — angular starvation streaks beat the
        frozen pose); both directions of the tradeoff are pinned."""
        ct, ph = _multi_rotation_system()
        fov = ph.Nx * ph.dx
        period = 96 * 4 / 5.0  # 5 motion cycles over 4 rotations
        ph_v = view_phases(ct.N_proj, period)
        dirv = np.array([1.0, 0.3]) / np.hypot(1.0, 0.3)
        disp = 0.5 * np.sin(2.0 * np.pi * ph_v)[:, None] * dirv[None, :]
        motion = MotionProfile(np.zeros(ct.N_proj), disp)
        sino = mono_sinogram(
            material_path_sinogram_motion(ph, ct, motion), MU)

        # pose-matched reference: the object frozen at the gate pose
        ct1 = FanBeamGeometry(N_channels=96, N_proj=96,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        const = MotionProfile(np.zeros(96),
                              np.broadcast_to(0.5 * dirv, (96, 2)).copy())
        ref = np.asarray(fbp_ops.fbp_recon(
            mono_sinogram(material_path_sinogram_motion(ph, ct1, const),
                          MU), ct1, 64, fov)[0])

        ungated = np.asarray(gated_fbp_recon(
            sino, ct, 64, fov, np.ones(ct.N_proj)))
        g_wide = np.asarray(gated_fbp_recon(
            sino, ct, 64, fov, gate_weights(ph_v, 0.25, width=0.3)))
        g_narrow = np.asarray(gated_fbp_recon(
            sino, ct, 64, fov, gate_weights(ph_v, 0.25, width=0.12)))
        e_un = np.sqrt(np.mean((ungated - ref) ** 2))
        e_w = np.sqrt(np.mean((g_wide - ref) ** 2))
        e_n = np.sqrt(np.mean((g_narrow - ref) ** 2))
        assert e_w < 0.75 * e_un, (e_un, e_w)
        assert e_n > e_w, (e_n, e_w)  # the starvation side

    def test_series_shapes_and_distinct_phases(self):
        ct, ph = _multi_rotation_system(n_rot=2)
        fov = ph.Nx * ph.dx
        period = 96 * 2 / 3.0
        ph_v = view_phases(ct.N_proj, period)
        disp = 0.6 * np.sin(2.0 * np.pi * ph_v)[:, None] \
            * np.array([[1.0, 0.0]])
        motion = MotionProfile(np.zeros(ct.N_proj), disp)
        sino = mono_sinogram(
            material_path_sinogram_motion(ph, ct, motion), MU)
        frames = np.asarray(gated_series(sino, ct, 64, fov, period,
                                         n_gates=4, width=0.3))
        assert frames.shape == (4, 64, 64)
        # opposite phases (0.25 vs 0.75: poses +0.6 vs -0.6 cm) differ
        assert np.sqrt(np.mean((frames[1] - frames[3]) ** 2)) > 0.01

    def test_respiratory_thorax(self):
        """The anatomy the gating exists for: a breathing thorax
        (AP chest-wall excursion) over 4 rotations — the gated frame
        at the pose extreme beats the ungated average on the lungs."""
        from dexct_tpu.system.phantom import thorax_phantom

        ph = thorax_phantom(N=64, dx=0.55)
        mu = ph.materials.mu_table(np.array([70.0]))[:, 0]
        ct = FanBeamGeometry(N_channels=96, N_proj=4 * 96,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             rotation_total=4 * 2.0 * np.pi)
        fov = ph.Nx * ph.dx
        period = 96 * 4 / 5.0
        ph_v = view_phases(ct.N_proj, period)
        ap = np.array([[0.0, 1.0]])  # anterior-posterior breathing
        disp = 0.8 * np.sin(2.0 * np.pi * ph_v)[:, None] * ap
        motion = MotionProfile(np.zeros(ct.N_proj), disp)
        sino = mono_sinogram(
            material_path_sinogram_motion(ph, ct, motion), mu)

        ct1 = FanBeamGeometry(N_channels=96, N_proj=96,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        const = MotionProfile(np.zeros(96),
                              np.broadcast_to(0.8 * ap[0], (96, 2)).copy())
        ref = np.asarray(fbp_ops.fbp_recon(
            mono_sinogram(material_path_sinogram_motion(ph, ct1, const),
                          mu), ct1, 64, fov)[0])

        ungated = np.asarray(gated_fbp_recon(
            sino, ct, 64, fov, np.ones(ct.N_proj)))
        gated = np.asarray(gated_fbp_recon(
            sino, ct, 64, fov, gate_weights(ph_v, 0.25, width=0.3)))
        lab = ph.slice_labels()
        lung = lab == 5
        e_un = np.sqrt(np.mean((ungated - ref)[lung] ** 2))
        e_g = np.sqrt(np.mean((gated - ref)[lung] ** 2))
        assert e_g < 0.6 * e_un, (e_un, e_g)
