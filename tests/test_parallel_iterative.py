"""View-sharded iterative reconstruction (parallel/iterative.py).

VERDICT round-3 item 4: the statistical-recon family meets the same
SURVEY §2.7 obligation as FBP — view wedges per device, one psum'd
normal-equation product per operator application, replicated iterates.
Exactness contract: sharded == single-device to float tolerance on the
virtual CPU mesh.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops.fourier import plan_fourier_projector
from dexct_tpu.ops.iterative import cg_recon, pwls_recon
from dexct_tpu.ops.siddon import material_path_sinogram, mono_sinogram
from dexct_tpu.parallel import (sharded_cg_recon, sharded_cone_pwls_recon,
                                sharded_onestep_recon, sharded_pwls_recon,
                                view_mesh)
from dexct_tpu.system import FanBeamGeometry, water_cylinder_phantom

V, C, N = 64, 64, 64


@pytest.fixture(scope="module")
def setup2d():
    ph = water_cylinder_phantom(N=N, dx=0.4)
    ct = FanBeamGeometry(N_channels=C, N_proj=V, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0)
    plan = plan_fourier_projector(ph, ct, n_theta=192)
    mu = ph.materials.mu_table(np.array([60.0]))[:, 0]
    sino = mono_sinogram(material_path_sinogram(ph, ct), mu)
    counts = 1e5 * jnp.exp(-sino)
    return ph, ct, plan, sino, counts


class TestSharded2D:
    def test_pwls_matches_single_device(self, setup2d):
        ph, ct, plan, sino, counts = setup2d
        kw = dict(n_iters=12, beta=1e-3, delta=5e-3, power_iters=6)
        ref = np.asarray(pwls_recon(plan, sino, counts, (V, C), **kw))
        for d in (1, 4):
            got = np.asarray(sharded_pwls_recon(
                view_mesh(d), plan, sino, counts, (V, C), **kw))
            np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)

    def test_cg_matches_single_device(self, setup2d):
        ph, ct, plan, sino, counts = setup2d
        ref, ref_h = cg_recon(plan, sino, (V, C), n_iters=10, lam=0.05)
        got, got_h = sharded_cg_recon(view_mesh(4), plan, sino, (V, C),
                                      n_iters=10, lam=0.05)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)
        # residual norms: same convergence trajectory (late iterations
        # amplify psum rounding-order differences, so order-of-magnitude
        # agreement is the meaningful contract)
        np.testing.assert_allclose(np.log10(np.asarray(got_h)),
                                   np.log10(np.asarray(ref_h)), atol=0.05)

    def test_indivisible_views_rejected(self, setup2d):
        ph, ct, plan, sino, counts = setup2d
        with pytest.raises(ValueError, match="not divisible"):
            sharded_pwls_recon(view_mesh(3), plan, sino, counts, (V, C),
                               n_iters=2)


class TestShardedCone:
    def test_cone_pwls_matches_single_device(self):
        import dataclasses

        from dexct_tpu.ops.conebeam import cone_pwls_recon, cone_sinogram
        from dexct_tpu.physics import kramers_spectrum
        from dexct_tpu.system import ConeBeamGeometry

        ct = ConeBeamGeometry(N_channels=32, N_proj=16, N_rows=4,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                              h_iso=0.5)
        ph2 = water_cylinder_phantom(N=32, dx=0.4)
        ph3 = dataclasses.replace(
            ph2, labels=np.broadcast_to(ph2.labels[0], (8, 32, 32)).copy(),
            dz=0.4)
        s = kramers_spectrum(80.0)
        s.rescale_counts(ct.A_iso * 0.1 / ct.N_proj)
        counts, sino_log = cone_sinogram(ph3, ct, s)
        kw = dict(n_iters=8, beta=1e-2, power_iters=4)
        ref = np.asarray(cone_pwls_recon(sino_log, counts, ct,
                                         (8, 32, 32), (0.4, 0.4, 0.4),
                                         **kw))
        got = np.asarray(sharded_cone_pwls_recon(
            view_mesh(4), sino_log, counts, ct, (8, 32, 32),
            (0.4, 0.4, 0.4), **kw))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


class TestShardedOneStep:
    def test_onestep_matches_single_device(self):
        from dexct_tpu.ops.matdecomp import pcd_bin_fluences
        from dexct_tpu.ops.onestep import onestep_spectral_recon
        from dexct_tpu.physics import kramers_spectrum
        from dexct_tpu.physics.detector import photon_counting_response
        from dexct_tpu.physics.materials import BONE, WATER
        from dexct_tpu.pipeline.spectralct import simulate_pcd_spectral

        thresh = [20.0, 50.0, 80.0]
        basis = (WATER, BONE)
        ct = FanBeamGeometry(N_channels=48, N_proj=48,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=False, detector=photon_counting_response())
        ph = water_cylinder_phantom(N=32, dx=0.5)
        s = kramers_spectrum(140.0)
        s.rescale_counts(ct.A_iso * 0.02 / ct.N_proj)
        i0s = pcd_bin_fluences(ct, s, thresh)
        plan = plan_fourier_projector(ph, ct, n_theta=128)
        res = simulate_pcd_spectral(ct, ph, s, thresh, basis, 32,
                                    32 * 0.5, n_iters=10)
        kw = dict(n_iters=30, beta=3e-3, lr=2e-3)
        ref = np.asarray(onestep_spectral_recon(
            res.counts, s.E, i0s, basis, plan, (48, 48), **kw))
        got = np.asarray(sharded_onestep_recon(
            view_mesh(4), res.counts, s.E, i0s, basis, plan, (48, 48),
            **kw))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


class TestShardedKatsevich:
    """VERDICT round-4 item 4: the exact helical family meets the same
    SURVEY §2.7 obligation — view wedges per device, a 2-view beta-
    stencil halo ppermute, one psum'd volume partial."""

    @pytest.mark.parametrize("n_devices", [2, 4])
    def test_matches_single_device(self, n_devices):
        from dexct_tpu.ops.conebeam import cone_material_paths
        from dexct_tpu.ops.katsevich import katsevich_reconstruct
        from dexct_tpu.parallel import sharded_katsevich_reconstruct
        from dexct_tpu.physics.materials import AIR, WATER, MaterialTable
        from dexct_tpu.system import HelicalConeBeamGeometry
        from dexct_tpu.system.phantom import VoxelPhantom

        n, nz, dx = 32, 12, 0.5
        cy = (np.arange(n) + 0.5 - n / 2) * dx
        Y, X = np.meshgrid(cy, cy)
        lab = np.zeros((nz, n, n), np.uint8)
        lab[:, (X**2 + (Y - 1.5) ** 2) < 16.0] = 1
        mt = MaterialTable([AIR, WATER])
        ph = VoxelPhantom("cyl", lab, mt, dx, dx, dx)
        ct = HelicalConeBeamGeometry(
            N_channels=48, N_proj=256, N_rows=12, gamma_fan=0.8230337,
            SID=60.0, SDD=100.0, h_iso=0.3, pitch=2.0,
            rotation_total=8.0 * np.pi)
        mu = mt.mu_table(np.array([60.0]))[:, 0]
        sino = jnp.einsum("vrcm,m->vrc", cone_material_paths(ph, ct),
                          jnp.asarray(mu, jnp.float32))
        cz = (np.arange(nz) + 0.5 - nz / 2) * dx
        ref = np.asarray(katsevich_reconstruct(sino, ct, n, 14.0,
                                               z_out=cz[5:8]))
        got = np.asarray(sharded_katsevich_reconstruct(
            view_mesh(n_devices), sino, ct, n, 14.0, z_out=cz[5:8]))
        np.testing.assert_allclose(got, ref, atol=5e-6,
                                   err_msg=f"D={n_devices}")
        # sanity: the reconstruction itself is right (unit amplitude)
        inner = (X**2 + (Y - 1.5) ** 2) < 9.0
        assert abs(got[1][inner].mean() / float(mu[1]) - 1.0) < 0.02

    def test_indivisible_rejected(self):
        from dexct_tpu.parallel import sharded_katsevich_reconstruct
        from dexct_tpu.system import HelicalConeBeamGeometry

        ct = HelicalConeBeamGeometry(
            N_channels=16, N_proj=30, N_rows=4, gamma_fan=0.8230337,
            SID=60.0, SDD=100.0, h_iso=0.3, pitch=1.0,
            rotation_total=4.0 * np.pi)
        sino = jnp.zeros((30, 4, 16))
        with pytest.raises(ValueError, match="divisible"):
            sharded_katsevich_reconstruct(view_mesh(4), sino, ct, 16, 6.0)
