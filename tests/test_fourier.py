"""Fourier-slice projector tests: analytic chords, exact-oracle parity,
fused-pipeline integration, multi-chip sharding."""

import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops.fourier import (
    _kb_deapod_1d,
    _kb_kernel,
    fourier_paths,
    fourier_radon,
    plan_fourier_projector,
)
from dexct_tpu.ops.siddon import material_path_sinogram
from dexct_tpu.system import (
    FanBeamGeometry,
    pelvis_phantom,
    water_cylinder_phantom,
)


@pytest.fixture(scope="module")
def cylinder_setup():
    ph = water_cylinder_phantom(N=128, dx=0.2)  # radius 10.24 cm
    ct = FanBeamGeometry(N_channels=160, N_proj=48, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0)
    plan = plan_fourier_projector(ph, ct, n_theta=512)
    return ph, ct, plan


class TestKernelMath:
    def test_deapod_matches_poisson_sum(self):
        """The gridding correction equals the empirical kernel response
        sum_p k(x0-p) e^{-2 pi i p n/G} ~ K(n/G) e^{-2 pi i x0 n/G}."""
        G = 64
        rng = np.random.default_rng(0)
        for x0 in rng.uniform(5.0, 40.0, 3):
            ps = np.arange(int(np.floor(x0)) - 3, int(np.floor(x0)) + 5)
            k = _kb_kernel(x0 - ps)
            for n in [0, 5, 12]:
                e = (k * np.exp(-2j * np.pi * ps * n / G)).sum()
                e = e * np.exp(2j * np.pi * x0 * n / G)
                arg = np.pi * 4 * n / G
                from dexct_tpu.ops.fourier import _kb_beta
                beta = _kb_beta()
                sq = np.sqrt(beta**2 - arg**2)
                K = 4.0 * np.sinh(sq) / sq / np.i0(beta)
                assert abs(e.real - K) < 2e-3
                assert abs(e.imag) < 2e-3

    def test_kernel_support(self):
        assert _kb_kernel(np.array([2.5, -2.1]))[0] == 0.0
        assert _kb_kernel(np.array([0.0]))[0] == 1.0


class TestRadonAccuracy:
    def test_cylinder_chord(self, cylinder_setup):
        """Radon transform of the water cylinder vs the analytic chord."""
        ph, ct, plan = cylinder_setup
        import jax

        oh = jax.nn.one_hot(jnp.asarray(ph.slice_labels(), jnp.int32), 2,
                            dtype=jnp.float32, axis=0)
        radon = np.asarray(fourier_radon(plan, oh))
        r = 0.4 * 128 * 0.2
        ts = plan.t0 + plan.dt * np.arange(plan.nt)
        chord = 2.0 * np.sqrt(np.clip(r**2 - ts**2, 0.0, None))
        w = radon[1, 0]
        inner = np.abs(ts) < 9.5
        assert abs(w[np.argmax(chord)] / chord.max() - 1.0) < 0.01
        assert np.sqrt(((w - chord)[inner] ** 2).mean()) < 0.2
        # rotational invariance of a centered cylinder
        center = radon[1, :, np.argmax(chord)]
        assert center.std() / center.mean() < 0.01
        # zero far outside
        assert np.abs(w[np.abs(ts) > 12.0]).max() < 0.05

    def test_fan_paths_vs_exact_siddon(self, cylinder_setup):
        ph, ct, plan = cylinder_setup
        fp = np.asarray(fourier_paths(
            plan, jnp.asarray(ph.slice_labels()), (48, 160)))
        ex = np.asarray(material_path_sinogram(ph, ct))
        assert fp.shape == ex.shape
        # water-path accuracy: sub-mm rms on ~20 cm paths
        err = fp[..., 1] - ex[..., 1]
        assert np.sqrt((err**2).mean()) < 0.08
        assert np.abs(err).max() < 0.6

    def test_pelvis_log_sino_accuracy(self):
        """The physically relevant error: monoenergetic line integrals of
        the anthropomorphic phantom within ~0.5% rms."""
        ph = pelvis_phantom(N=128, dx=0.4)
        ct = FanBeamGeometry(N_channels=160, N_proj=48,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        plan = plan_fourier_projector(ph, ct, n_theta=512)
        fp = np.asarray(fourier_paths(
            plan, jnp.asarray(ph.slice_labels()), (48, 160)))
        ex = np.asarray(material_path_sinogram(ph, ct))
        mu = ph.materials.mu_table(np.array([60.0]))[:, 0]
        L_f, L_e = fp @ mu, ex @ mu
        rms = np.sqrt(((L_f - L_e) ** 2).mean())
        assert rms < 0.01 * L_e.max()

    def test_rejects_nonsquare(self):
        from dexct_tpu.physics.materials import AIR, MaterialTable, WATER
        from dexct_tpu.system import VoxelPhantom

        ph = VoxelPhantom("bad", np.zeros((8, 16), np.uint8),
                          MaterialTable([AIR, WATER]))
        ct = FanBeamGeometry(N_channels=8, N_proj=4)
        with pytest.raises(ValueError):
            plan_fourier_projector(ph, ct)


class TestFusedIntegration:
    def test_fused_fourier_matches_siddon_pipeline(self):
        from dexct_tpu.physics import kramers_spectrum, linac_spectrum
        from dexct_tpu.pipeline.fused import make_jitted_step, pack_dect

        ct = FanBeamGeometry(N_channels=96, N_proj=64,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=True)
        ph = water_cylinder_phantom(N=96, dx=0.25)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        a_sid, m_sid = pack_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=15)
        a_fou, m_fou = pack_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=15,
                                 projector="fourier", n_theta=512)
        out_s = make_jitted_step(m_sid)(a_sid)
        out_f = make_jitted_step(m_fou)(a_fou)
        hu_s = np.asarray(out_s["recon_HU"][1])
        hu_f = np.asarray(out_f["recon_HU"][1])
        # reconstructed HU images agree within a few HU rms in the interior
        r = np.hypot(*(np.mgrid[0:64, 0:64] - 31.5)) * 20.0 / 64
        inner = r < 7.0
        rms = np.sqrt(((hu_s - hu_f)[inner] ** 2).mean())
        assert rms < 15.0

    def test_sharded_fourier(self):
        from dexct_tpu.parallel import (
            shard_arrays,
            sharded_dect_step,
            view_mesh,
        )
        from dexct_tpu.physics import kramers_spectrum, linac_spectrum
        from dexct_tpu.pipeline.fused import make_jitted_step, pack_dect

        ct = FanBeamGeometry(N_channels=64, N_proj=64,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=True)
        ph = water_cylinder_phantom(N=64, dx=0.35)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        arrays, meta = pack_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=10,
                                 projector="fourier", n_theta=256)
        single = make_jitted_step(meta)(arrays)
        mesh = view_mesh(8)
        out = sharded_dect_step(mesh, meta, arrays.keys())(
            shard_arrays(arrays, mesh))
        np.testing.assert_allclose(
            np.asarray(out["recon_raw"][0]),
            np.asarray(single["recon_raw"][0]), atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["mat_sinos"][0]),
            np.asarray(single["mat_sinos"][0]), atol=1e-4,
        )


class TestSamplerBranches:
    def test_packed_and_fallback_samplers_match(self, monkeypatch):
        """The large-grid fallback (16 derived-index gathers) must equal
        the packed-window table sampler exactly."""
        import dexct_tpu.ops.fourier as fo
        from dexct_tpu.system import FanBeamGeometry, water_cylinder_phantom

        ph = water_cylinder_phantom(N=32, dx=0.5)
        ct = FanBeamGeometry(N_channels=48, N_proj=40, gamma_fan=0.8,
                             SID=60.0, SDD=100.0)
        plan = fo.plan_fourier_projector(ph, ct, n_theta=64)
        a = np.asarray(fo.fourier_paths(plan, jnp.asarray(
            ph.slice_labels().astype(np.int32)), (40, 48)))
        fo._radon_from_images.clear_cache()
        monkeypatch.setattr(fo, "_PACKED_TABLE_MAX_GRID", 0)
        try:
            b = np.asarray(fo.fourier_paths(plan, jnp.asarray(
                ph.slice_labels().astype(np.int32)), (40, 48)))
        finally:
            fo._radon_from_images.clear_cache()
        np.testing.assert_allclose(a, b, atol=1e-6)
