"""Halo-exchange sharded rebinning (parallel/halo.py).

The paired-quarter view layout + ring halo exchange must reproduce the
single-device rebinned-parallel reconstruction exactly (same theta/t
grid, same tap math) while replacing the all_gather with O(H*C)
ppermutes.
"""

import numpy as np
import pytest

from dexct_tpu.parallel import shard_arrays, sharded_dect_step, view_mesh
from dexct_tpu.parallel.halo import apply_halo_plan, plan_halo
from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.pipeline.fused import make_jitted_step, pack_dect
from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom

N_CH, N_PROJ, N_THETA, NT = 64, 96, 64, 128


@pytest.fixture(scope="module")
def system():
    ct = FanBeamGeometry(N_channels=N_CH, N_proj=N_PROJ,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=True)
    ph = contrast_rods_phantom(N=64, dx=0.35)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    arrays, meta = pack_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=10,
                             projector="siddon", recon="parallel",
                             recon_n_theta=N_THETA, recon_nt=NT)
    single = make_jitted_step(meta)(arrays)
    return ct, arrays, meta, single


class TestPlan:
    def test_perm_is_permutation(self, system):
        ct = system[0]
        plan = plan_halo(ct, 4, N_THETA, NT)
        assert sorted(plan.view_perm) == list(range(N_PROJ))
        # shard 0's first quarter-block is the natural first views
        vq = N_PROJ // 16
        assert list(plan.view_perm[:vq]) == list(range(vq))

    def test_thetas_cover_global_grid(self, system):
        ct = system[0]
        plan = plan_halo(ct, 4, N_THETA, NT)
        got = np.sort(plan.thetas)
        want = np.arange(N_THETA) * (np.pi / N_THETA)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_indivisible_rejected(self, system):
        ct = system[0]
        with pytest.raises(ValueError):
            plan_halo(ct, 7, N_THETA, NT)  # 96 % 28 != 0
        with pytest.raises(ValueError):
            plan_halo(ct, 4, 60, NT)  # 60 % 8 != 0

    @pytest.mark.parametrize("n_devices", [2, 4, 8])
    def test_sym8_orbit_tables_cover_grid(self, n_devices):
        """Orbits + wedge-boundary 4-fold pairs must cover every theta
        row of the global grid exactly once (the same coverage invariant
        the single-device sym8 + boundary split satisfies)."""
        from dexct_tpu.parallel.halo import plan_sym8_orbits

        D, n_theta = n_devices, N_THETA
        idx, th, w = plan_sym8_orbits(D, n_theta)
        ntq = n_theta // (2 * D)
        n_orb = ntq // 2
        counts = np.zeros(n_theta, np.int64)
        for i in range(D):
            base = np.array([i * ntq, (i + D) * ntq,
                             (D - 1 - i) * ntq, (2 * D - 1 - i) * ntq])
            for o in range(n_orb):
                j = i * n_orb + o
                if w[j] == 0:
                    continue
                rows, theta = idx[j], th[j]
                # member order (theta, pi/2+theta, pi/2-theta, pi-theta)
                anchor = int(round(theta / (np.pi / n_theta)))
                want = [anchor, n_theta // 2 + anchor,
                        n_theta // 2 - anchor, n_theta - anchor]
                # local buffer row -> global theta row
                got = [int(base[r // ntq] + r % ntq) for r in rows]
                assert got == want, (i, o, got, want)
                counts[want] += 1
            # the shard's 4-fold boundary pair covers rows
            # {i*ntq, i*ntq + n_theta/2} (+ point mirror, no new rows)
            counts[[i * ntq, i * ntq + n_theta // 2]] += 1
        assert (counts == 1).all()

    def test_sym8_branch_taken(self, system):
        """The halo-sharded step must actually run the 8-fold kernel
        (pack_filtered_sym8_rows), not silently fall back to 4-fold."""
        import dexct_tpu.ops.fbp_fast as ff

        ct, arrays, meta, single = system
        plan = plan_halo(ct, 2, N_THETA, NT)
        a2, m2 = apply_halo_plan(arrays, meta, plan)
        assert "sym8_orb_idx" in a2
        called = []
        orig = ff.pack_filtered_sym8_rows
        ff.pack_filtered_sym8_rows = (
            lambda q: (called.append(q.shape), orig(q))[1])
        try:
            mesh = view_mesh(2)
            out = sharded_dect_step(mesh, m2, a2.keys())(
                shard_arrays(a2, mesh))
        finally:
            ff.pack_filtered_sym8_rows = orig
        assert called and called[0][2] == 4
        np.testing.assert_allclose(
            np.asarray(out["recon_raw"][0]),
            np.asarray(single["recon_raw"][0]), atol=1e-5)

    def test_halo_wider_than_ring_rejected(self):
        # tiny V at high D: halo spans the whole ring
        ct = FanBeamGeometry(N_channels=16, N_proj=16,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=True)
        with pytest.raises(ValueError, match="ring"):
            plan_halo(ct, 4, 8, 32)


class TestHaloShardedStep:
    @pytest.mark.parametrize("n_devices", [2, 4, 8])
    def test_matches_single_device(self, system, n_devices):
        ct, arrays, meta, single = system
        plan = plan_halo(ct, n_devices, N_THETA, NT)
        a2, m2 = apply_halo_plan(arrays, meta, plan)
        assert m2.comm[0] == "halo" and m2.comm[1] == n_devices
        mesh = view_mesh(n_devices)
        step = sharded_dect_step(mesh, m2, a2.keys())
        out = step(shard_arrays(a2, mesh))
        # tolerances per output unit scale: cm^-1 / g/cm^3 vs HU (x~6000)
        for key, atol in (("recon_raw", 1e-5), ("mat_recons", 1e-4),
                          ("recon_HU", 2e-2)):
            for i in range(2):
                np.testing.assert_allclose(
                    np.asarray(out[key][i]), np.asarray(single[key][i]),
                    atol=atol,
                    err_msg=f"D={n_devices} {key}[{i}]",
                )
        # sinogram outputs come back in paired-quarter order
        nat = plan.to_natural(np.asarray(out["sino_log"][0]))
        np.testing.assert_allclose(nat, np.asarray(single["sino_log"][0]),
                                   atol=1e-5)

    @pytest.mark.parametrize("n_devices", [2, 4])
    def test_siddon_dominant_under_halo(self, system, n_devices):
        """The exact packed projector (single-device-only in round 1)
        shards via per-shard dominant-axis plans; the paired-quarter
        layout keeps the y/x split balanced (pad factor ~1)."""
        from dexct_tpu.parallel.halo import pack_dect_sharded

        ct, arrays, meta, single = system
        ph = contrast_rods_phantom(N=64, dx=0.35)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        a2, m2, plan = pack_dect_sharded(
            ct, ph, s1, s2, 64, 20.0, 0.8, n_devices=n_devices,
            projector="siddon_dominant", recon_n_theta=N_THETA,
            recon_nt=NT, n_iters=10)
        assert m2.projector == "siddon_dominant"
        # quarter-rotated bundles keep the split balanced
        assert plan.dominant_pad_factor < 1.25
        mesh = view_mesh(n_devices)
        out = sharded_dect_step(mesh, m2, a2.keys())(shard_arrays(a2, mesh))
        np.testing.assert_allclose(
            np.asarray(out["recon_raw"][0]),
            np.asarray(single["recon_raw"][0]), atol=2e-5,
            err_msg=f"D={n_devices} dominant recon_raw")
        nat = plan.to_natural(np.asarray(out["sino_log"][1]))
        np.testing.assert_allclose(nat, np.asarray(single["sino_log"][1]),
                                   atol=1e-4)

    def test_siddon_dominant_bundled_under_halo(self):
        """A geometry fine enough that >=75% of rays bundle exercises
        the per-shard BUNDLED plans (fp_meta 'bundled'); the sharded
        result must still match the single-device pipeline."""
        from dexct_tpu.parallel.halo import pack_dect_sharded
        from dexct_tpu.system import contrast_rods_phantom

        ct = FanBeamGeometry(N_channels=160, N_proj=96,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=True)
        ph = contrast_rods_phantom(N=128, dx=0.2)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        single_a, single_m = pack_dect(
            ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=10,
            projector="siddon_dominant", recon="parallel",
            recon_n_theta=N_THETA, recon_nt=NT)
        single = make_jitted_step(single_m)(single_a)
        a2, m2, plan = pack_dect_sharded(
            ct, ph, s1, s2, 64, 20.0, 0.8, n_devices=2,
            projector="siddon_dominant", recon_n_theta=N_THETA,
            recon_nt=NT, n_iters=10)
        assert m2.fp_meta[0] == "bundled"  # the fine grid must bundle
        assert plan.dominant_pad_factor < 1.25
        mesh = view_mesh(2)
        out = sharded_dect_step(mesh, m2, a2.keys())(shard_arrays(a2, mesh))
        np.testing.assert_allclose(
            np.asarray(out["recon_raw"][0]),
            np.asarray(single["recon_raw"][0]), atol=2e-5)
        nat = plan.to_natural(np.asarray(out["sino_log"][0]))
        np.testing.assert_allclose(nat, np.asarray(single["sino_log"][0]),
                                   atol=1e-5)

    def test_fourier_projector_under_halo(self, system):
        ct, _, _, _ = system
        from dexct_tpu.system import contrast_rods_phantom

        ph = contrast_rods_phantom(N=64, dx=0.35)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        arrays, meta = pack_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=8,
                                 projector="fourier", n_theta=128,
                                 recon="parallel", recon_n_theta=N_THETA,
                                 recon_nt=NT)
        single = make_jitted_step(meta)(arrays)
        plan = plan_halo(ct, 4, N_THETA, NT)
        a2, m2 = apply_halo_plan(arrays, meta, plan)
        mesh = view_mesh(4)
        out = sharded_dect_step(mesh, m2, a2.keys())(shard_arrays(a2, mesh))
        np.testing.assert_allclose(
            np.asarray(out["recon_HU"][0]),
            np.asarray(single["recon_HU"][0]), atol=2e-2)  # HU scale
