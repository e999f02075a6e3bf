"""One-step spectral MBIR (ops/onestep.py): forward-model consistency,
clean-data agreement with the two-step path, and the noisy-data
improvement that justifies the method."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops.fourier import plan_fourier_projector
from dexct_tpu.ops.matdecomp import pcd_bin_fluences
from dexct_tpu.ops.onestep import (onestep_spectral_recon,
                                   spectral_forward_images)
from dexct_tpu.ops import spectral as sp_ops
from dexct_tpu.physics import kramers_spectrum, xcom
from dexct_tpu.physics.detector import photon_counting_response
from dexct_tpu.physics.materials import BONE, WATER
from dexct_tpu.pipeline.spectralct import simulate_pcd_spectral
from dexct_tpu.system import FanBeamGeometry, water_cylinder_phantom

THRESH = [20.0, 34.0, 50.0, 70.0]
BASIS = (WATER, BONE)


@pytest.fixture(scope="module")
def setup():
    ct = FanBeamGeometry(N_channels=96, N_proj=96, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, eid=False,
                         detector=photon_counting_response())
    ph = water_cylinder_phantom(N=64, dx=0.3)
    s = kramers_spectrum(140.0)
    s.rescale_counts(ct.A_iso * 0.02 / ct.N_proj)  # low dose
    i0s = pcd_bin_fluences(ct, s, THRESH)
    plan = plan_fourier_projector(ph, ct, n_theta=256)
    # interior mask (away from the cylinder edge)
    yy, xx = np.mgrid[0:64, 0:64]
    interior = np.hypot(yy - 31.5, xx - 31.5) < 0.3 * 64
    truth = np.zeros((2, 64, 64))
    truth[0][np.asarray(ph.labels[0]) == 1] = 1.0
    return ct, ph, s, i0s, plan, interior, truth


def _twostep(ct, ph, s, noise="none", key=None):
    return simulate_pcd_spectral(ct, ph, s, THRESH, BASIS, 64,
                                 64 * 0.3, noise=noise, key=key,
                                 n_iters=40)


class TestForwardModel:
    def test_matches_pipeline_counts(self, setup):
        """The differentiable image-domain forward on the TRUTH images
        reproduces the pipeline's label-traced counts to the Fourier
        projector's accuracy."""
        ct, ph, s, i0s, plan, interior, truth = setup
        res = _twostep(ct, ph, s)
        mus = jnp.asarray(np.stack([xcom.mixatten(b.matcomp, s.E)
                                    for b in BASIS]), jnp.float32)
        lam = spectral_forward_images(
            plan, jnp.asarray(truth, jnp.float32), mus,
            jnp.asarray(i0s, jnp.float32), (ct.N_proj, ct.N_channels))
        rel = np.abs(np.asarray(lam) - np.asarray(res.counts)) \
            / np.maximum(np.asarray(res.counts), 1e-6)
        assert np.median(rel) < 0.02, np.median(rel)


class TestOneStep:
    def test_clean_data_matches_truth(self, setup):
        ct, ph, s, i0s, plan, interior, truth = setup
        res = _twostep(ct, ph, s)
        x0 = jnp.maximum(res.basis_recons, 0.0)
        x = onestep_spectral_recon(res.counts, s.E, i0s, BASIS, plan,
                                   (ct.N_proj, ct.N_channels), x0=x0,
                                   n_iters=200)
        water = np.asarray(x[0])
        assert abs(water[interior].mean() - 1.0) < 0.03
        assert np.abs(np.asarray(x[1])[interior]).mean() < 0.03

    def test_noisy_beats_twostep(self):
        """The regime one-step exists for: photon-starved low-dose
        bins (bone rod, 2e-4 dose, zero-count rays).  Measured ladder
        (tools study /tmp/onestep_sweep*): unbounded two-step rmse
        1.86 (starvation rails FBP'd into streaks); PHYSICAL a_bounds
        cut it to 0.25; the one-step WLS fit with an edge-preserving
        Huber penalty reaches ~0.10-0.14 on top.  A uniform phantom is
        deliberately NOT used here — it rewards oversmoothing."""
        from dexct_tpu.physics.materials import AIR, MaterialTable
        from dexct_tpu.system.phantom import VoxelPhantom, _ellipse_mask

        N, dxp = 64, 0.3
        labels = _ellipse_mask(N, dxp, 0.0, 0.0, 0.4 * N * dxp,
                               0.4 * N * dxp).astype(np.uint8)
        labels[_ellipse_mask(N, dxp, 2.5, 2.5, 1.3, 1.3)] = 2
        ph = VoxelPhantom("wb", labels,
                          MaterialTable([AIR, WATER, BONE]), dxp, dxp,
                          dxp)
        ct = FanBeamGeometry(N_channels=96, N_proj=96,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=False,
                             detector=photon_counting_response())
        s = kramers_spectrum(140.0)
        s.rescale_counts(ct.A_iso * 2e-4 / ct.N_proj)
        i0s = pcd_bin_fluences(ct, s, THRESH)
        plan = plan_fourier_projector(ph, ct, n_theta=256)
        res = simulate_pcd_spectral(
            ct, ph, s, THRESH, BASIS, N, N * dxp, noise="poisson",
            key=jax.random.PRNGKey(3), n_iters=40,
            a_bounds=(-5.0, 60.0))
        x0 = jnp.clip(res.basis_recons, 0.0, 3.0)
        x = onestep_spectral_recon(res.counts, s.E, i0s, BASIS, plan,
                                   (96, 96), x0=x0, n_iters=600,
                                   beta=0.03, lr=3e-3)
        yy, xx = np.mgrid[0:N, 0:N]
        interior = np.hypot(yy - 31.5, xx - 31.5) < 0.3 * N
        truth = np.zeros((2, N, N))
        truth[0][labels == 1] = 1.0
        truth[1][labels == 2] = 1.92

        def rmse(img):
            return float(np.sqrt(np.mean(
                (np.asarray(img)[:, interior]
                 - truth[:, interior]) ** 2)))

        e_two = rmse(res.basis_recons)
        e_one = rmse(x)
        assert e_one < 0.65 * e_two, (e_two, e_one)
        # the bone rod must survive the penalty (no oversmoothing win)
        assert np.asarray(x[1])[labels == 2].mean() > 1.4


class TestMotionCompensatedSpectral:
    def test_mc_onestep_recovers_moving_phantom(self):
        """Motion-compensated spectral MBIR: a 4-bin PCD scan of a
        MOVING water cylinder solved with the TRUE track recovers the
        basis densities; ignoring the motion leaves a much larger
        error."""
        from dexct_tpu.ops.motion import (MotionProfile,
                                          material_path_sinogram_motion)
        from dexct_tpu.system import water_cylinder_phantom

        ct = FanBeamGeometry(N_channels=96, N_proj=96,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=False,
                             detector=photon_counting_response())
        ph = water_cylinder_phantom(N=64, dx=0.3)
        s = kramers_spectrum(140.0)
        s.rescale_counts(ct.A_iso * 0.02 / ct.N_proj)
        i0s = pcd_bin_fluences(ct, s, THRESH)
        motion = MotionProfile.breathing(ct.N_proj, amplitude_cm=0.8,
                                         cycles=1.5, direction=(1.0, 0.3))
        paths = material_path_sinogram_motion(ph, ct, motion)
        res = simulate_pcd_spectral(ct, ph, s, THRESH, BASIS, 64,
                                    64 * 0.3, paths=paths, n_iters=40)
        x0 = jnp.clip(res.basis_recons, 0.0, 3.0)
        plan = plan_fourier_projector(ph, ct, n_theta=256)
        yy, xx = np.mgrid[0:64, 0:64]
        interior = np.hypot(yy - 31.5, xx - 31.5) < 0.25 * 64
        truth = (np.hypot((yy - 31.5) * 0.3, (xx - 31.5) * 0.3)
                 <= 0.4 * 64 * 0.3).astype(np.float64)

        def fit(mo):
            return onestep_spectral_recon(
                res.counts, s.E, i0s, BASIS, plan, (96, 96), x0=x0,
                n_iters=400, lr=2e-3, motion=mo, geometry=ct)

        def rms(x):
            return float(np.sqrt(np.mean((np.asarray(x[0])
                                          - truth) ** 2)))

        x_mc = fit(motion)
        x_ig = fit(MotionProfile.static(ct.N_proj))
        # measured: init 0.167, MC 0.112, motion-ignoring fit 0.184
        # (fitting a static model to moving data WORSENS the init)
        assert abs(np.asarray(x_mc[0])[interior].mean() - 1.0) < 0.03
        assert rms(x_mc) < 0.75 * rms(x_ig), (rms(x_mc), rms(x_ig))
        assert rms(x_mc) < rms(x0), (rms(x_mc), rms(x0))
