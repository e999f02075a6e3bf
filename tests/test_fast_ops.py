"""Fast-path ops vs reference implementations: band-prefix Siddon and
packed multi-image backprojection must match the oracles exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops.fbp import fan_backproject, filter_sinogram
from dexct_tpu.ops.fbp_fast import fan_backproject_multi, pack_filtered
from dexct_tpu.ops.siddon import trace_paths
from dexct_tpu.ops.siddon_fast import pack_prefix_table, trace_paths_fast
from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom
from dexct_tpu.utils.testing import siddon_paths_numpy


class TestBandSiddon:
    def rays(self, n, seed=0, radius=40.0):
        rng = np.random.default_rng(seed)
        ang = rng.uniform(0, 2 * np.pi, n)
        src = radius * np.stack([np.cos(ang), np.sin(ang)], -1)
        tgt = rng.uniform(-2.0, 2.0, (n, 2))
        d = tgt - src
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return src, d

    def test_matches_float64_oracle(self):
        rng = np.random.default_rng(1)
        labels = rng.integers(0, 5, (32, 32)).astype(np.int32)
        src, d = self.rays(300)
        packed = pack_prefix_table(jnp.asarray(labels), 5)
        got = np.asarray(trace_paths_fast(
            packed, (32, 32), jnp.asarray(src, jnp.float32),
            jnp.asarray(d, jnp.float32), 0.17, 0.23, n_materials=5))
        ref = siddon_paths_numpy(labels, src, d, 0.17, 0.23, 5)
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_matches_dda(self):
        rng = np.random.default_rng(2)
        labels = rng.integers(0, 7, (64, 64)).astype(np.int32)
        src, d = self.rays(500, seed=3)
        packed = pack_prefix_table(jnp.asarray(labels), 7)
        fast = np.asarray(trace_paths_fast(
            packed, (64, 64), jnp.asarray(src, jnp.float32),
            jnp.asarray(d, jnp.float32), 0.1, 0.1, n_materials=7))
        dda = np.asarray(trace_paths(
            jnp.asarray(labels), jnp.asarray(src, jnp.float32),
            jnp.asarray(d, jnp.float32), 0.1, 0.1, n_materials=7))
        np.testing.assert_allclose(fast, dda, atol=2e-3)

    def test_axis_aligned(self):
        labels = np.zeros((32, 32), np.int32)
        labels[:, 16:] = 1
        packed = pack_prefix_table(jnp.asarray(labels), 2)
        # horizontal ray through the middle
        got = np.asarray(trace_paths_fast(
            packed, (32, 32), jnp.asarray([[-50.0, 0.5]], jnp.float32),
            jnp.asarray([[1.0, 0.0]], jnp.float32), 1.0, 1.0,
            n_materials=2))
        np.testing.assert_allclose(got[0], [16.0, 16.0], atol=1e-4)
        # vertical ray
        got = np.asarray(trace_paths_fast(
            packed, (32, 32), jnp.asarray([[2.5, 50.0]], jnp.float32),
            jnp.asarray([[0.0, -1.0]], jnp.float32), 1.0, 1.0,
            n_materials=2))
        np.testing.assert_allclose(got[0], [0.0, 32.0], atol=1e-4)

    def test_miss(self):
        labels = np.zeros((32, 32), np.int32)
        packed = pack_prefix_table(jnp.asarray(labels), 2)
        got = np.asarray(trace_paths_fast(
            packed, (32, 32), jnp.asarray([[-50.0, 40.0]], jnp.float32),
            jnp.asarray([[1.0, 0.0]], jnp.float32), 1.0, 1.0,
            n_materials=2))
        assert np.all(got == 0.0)

    def test_too_many_materials_rejected(self):
        with pytest.raises(ValueError):
            pack_prefix_table(jnp.zeros((8, 8), jnp.int32), 9)


class TestDominantAxisSiddon:
    def test_matches_float64_oracle(self):
        from dexct_tpu.ops.siddon_fast import trace_paths_dominant

        rng = np.random.default_rng(3)
        labels = rng.integers(0, 6, (32, 32)).astype(np.int32)
        n = 400
        ang = rng.uniform(0, 2 * np.pi, n)
        src = 40.0 * np.stack([np.cos(ang), np.sin(ang)], -1)
        tgt = rng.uniform(-1.5, 1.5, (n, 2))
        d = tgt - src
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        got = np.asarray(trace_paths_dominant(
            jnp.asarray(labels), jnp.asarray(src, jnp.float32),
            jnp.asarray(d, jnp.float32), 0.21, 0.21, n_materials=6))
        ref = siddon_paths_numpy(labels, src, d, 0.21, 0.21, 6)
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_full_fan_geometry_matches_dda(self):
        from dexct_tpu.ops.siddon import material_path_sinogram
        from dexct_tpu.ops.siddon_fast import trace_paths_dominant
        from dexct_tpu.system import contrast_rods_phantom

        ph = contrast_rods_phantom(N=64, dx=0.3)
        ct = FanBeamGeometry(N_channels=96, N_proj=64,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        src, dirs = ct.ray_geometry()
        got = np.asarray(trace_paths_dominant(
            jnp.asarray(ph.slice_labels()), jnp.asarray(src, jnp.float32),
            jnp.asarray(dirs, jnp.float32), ph.dx, ph.dy,
            n_materials=ph.n_materials))
        dda = np.asarray(material_path_sinogram(ph, ct))
        np.testing.assert_allclose(got, dda, atol=2e-3)

    def test_too_many_materials_rejected(self):
        from dexct_tpu.ops.siddon_fast import trace_paths_dominant

        with pytest.raises(ValueError, match="32 material"):
            trace_paths_dominant(
                jnp.zeros((16, 16), jnp.int32),
                jnp.zeros((4, 2), jnp.float32),
                jnp.asarray([[0.0, 1.0]] * 4, jnp.float32),
                1.0, 1.0, n_materials=40)

    def test_anisotropic_cells_rejected(self):
        # the row windows budget exactly one column of drift per image
        # row, which only holds for square cells (both orientations,
        # because the x-dominant pass transposes)
        from dexct_tpu.ops.siddon_fast import trace_paths_dominant

        with pytest.raises(ValueError, match="square cells"):
            trace_paths_dominant(
                jnp.zeros((16, 16), jnp.int32),
                jnp.zeros((4, 2), jnp.float32),
                jnp.asarray([[0.0, 1.0]] * 4, jnp.float32),
                0.1, 0.12, n_materials=2)

    @pytest.mark.parametrize("shape", [(16, 64), (64, 16), (24, 40)])
    def test_rectangular_grids_match_oracle(self, shape):
        # the x-dominant kernel marches the TRANSPOSED labels, so the
        # window-fit guard must check BOTH dims; Ny == group grids used
        # to select a window wider than the transposed grid and gather
        # from negative anchors (round-2 review finding)
        from dexct_tpu.ops.siddon_fast import trace_paths_dominant

        rng = np.random.default_rng(11)
        labels = rng.integers(0, 5, shape).astype(np.int32)
        n = 400
        ang = rng.uniform(0, 2 * np.pi, n)
        src = 40.0 * np.stack([np.cos(ang), np.sin(ang)], -1)
        tgt = rng.uniform(-1.5, 1.5, (n, 2))
        d = tgt - src
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        got = np.asarray(trace_paths_dominant(
            jnp.asarray(labels), jnp.asarray(src, jnp.float32),
            jnp.asarray(d, jnp.float32), 0.21, 0.21, n_materials=5))
        ref = siddon_paths_numpy(labels, src, d, 0.21, 0.21, 5)
        np.testing.assert_allclose(got, ref, atol=2e-3)

    @pytest.mark.parametrize("group", [16, 32])
    def test_wide_groups_match_group8(self, group):
        # the generic group-row kernel (one row-(group*W) int32 gather
        # per ray per `group` rows) must be bit-identical to the tuned
        # 8-row kernel — same subband math, same addition order
        from dexct_tpu.ops.siddon_fast import trace_paths_dominant

        rng = np.random.default_rng(7)
        labels = rng.integers(0, 6, (64, 64)).astype(np.int32)
        n = 500
        ang = rng.uniform(0, 2 * np.pi, n)
        src = 40.0 * np.stack([np.cos(ang), np.sin(ang)], -1)
        tgt = rng.uniform(-3.0, 3.0, (n, 2))
        d = tgt - src
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        args = (jnp.asarray(labels), jnp.asarray(src, jnp.float32),
                jnp.asarray(d, jnp.float32), 0.21, 0.21)
        g8 = np.asarray(trace_paths_dominant(*args, n_materials=6, group=8))
        gx = np.asarray(trace_paths_dominant(*args, n_materials=6,
                                             group=group))
        np.testing.assert_array_equal(gx, g8)

    def test_axis_aligned_rays(self):
        from dexct_tpu.ops.siddon_fast import trace_paths_dominant

        labels = np.zeros((16, 16), np.int32)
        labels[:, 8:] = 1
        # pure vertical (y-dominant) and pure horizontal (x-dominant)
        src = np.array([[2.5, 50.0], [-50.0, 3.5]], np.float32)
        d = np.array([[0.0, -1.0], [1.0, 0.0]], np.float32)
        got = np.asarray(trace_paths_dominant(
            jnp.asarray(labels), jnp.asarray(src), jnp.asarray(d),
            1.0, 1.0, n_materials=2))
        np.testing.assert_allclose(got[0], [0.0, 16.0], atol=1e-4)
        np.testing.assert_allclose(got[1], [8.0, 8.0], atol=1e-4)


class TestBundledDominant:
    """Bundled-gather dominant tracing: B adjacent same-view channels
    share one row-window gather per 16-row group
    (plan_dominant_split_bundled).  Exactness contract: bit-identical
    to the per-ray kernel — same subband math, same addition order —
    for every ray, bundled or leftover."""

    def _fan(self, n_ch=160, n_proj=90):
        ct = FanBeamGeometry(N_channels=n_ch, N_proj=n_proj,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        return ct.ray_geometry()

    def test_matches_per_ray_bit_exact(self):
        from dexct_tpu.ops.siddon_fast import (
            plan_dominant_split_bundled, trace_paths_dominant,
            trace_paths_dominant_bundled)

        rng = np.random.default_rng(5)
        labels = rng.integers(0, 6, (128, 128)).astype(np.int32)
        src, dirs = self._fan()
        dx = 50.0 / 128
        plan = plan_dominant_split_bundled(
            np.asarray(src), np.asarray(dirs), labels.shape, dx, dx)
        assert plan["frac_bundled"] > 0.8  # fan views bundle densely
        got = np.asarray(trace_paths_dominant_bundled(
            jnp.asarray(labels), np.asarray(src), np.asarray(dirs),
            dx, dx, n_materials=6, plan=plan))
        ref = np.asarray(trace_paths_dominant(
            jnp.asarray(labels), jnp.asarray(src), jnp.asarray(dirs),
            dx, dx, n_materials=6, group=16))
        np.testing.assert_array_equal(got, ref)

    def test_plan_is_a_permutation(self):
        # every input ray lands on exactly one output position: the
        # bundled/leftover split plus the inverse map cover the ray set
        from dexct_tpu.ops.siddon_fast import plan_dominant_split_bundled

        src, dirs = self._fan(96, 40)
        plan = plan_dominant_split_bundled(
            np.asarray(src), np.asarray(dirs), (128, 128), 0.4, 0.4)
        r = np.asarray(src).reshape(-1, 2).shape[0]
        n_placed = (plan["nb_y"] + plan["nb_x"]) * plan["bundle"] \
            + plan["n_rest_y"] + plan["n_rest_x"]
        assert n_placed == r
        assert len(np.unique(plan["inv"])) == r

    def test_infeasible_bundles_fall_to_rest(self):
        # a coarse grid makes the bundle spread exceed the 30-column
        # window: those bundles must route to the per-ray path and the
        # result must still be exact
        from dexct_tpu.ops.siddon_fast import (
            plan_dominant_split_bundled, trace_paths_dominant,
            trace_paths_dominant_bundled)

        rng = np.random.default_rng(9)
        labels = rng.integers(0, 6, (32, 32)).astype(np.int32)
        src, dirs = self._fan(64, 24)
        dx = 50.0 / 32  # coarse: wide channel spacing in cells
        plan = plan_dominant_split_bundled(
            np.asarray(src), np.asarray(dirs), labels.shape, dx, dx)
        got = np.asarray(trace_paths_dominant_bundled(
            jnp.asarray(labels), np.asarray(src), np.asarray(dirs),
            dx, dx, n_materials=6, plan=plan))
        ref = np.asarray(trace_paths_dominant(
            jnp.asarray(labels), jnp.asarray(src), jnp.asarray(dirs),
            dx, dx, n_materials=6, group=16))
        np.testing.assert_array_equal(got, ref)

    def test_flat_rays_rejected(self):
        from dexct_tpu.ops.siddon_fast import plan_dominant_split_bundled

        with pytest.raises(ValueError, match="V, C, 2"):
            plan_dominant_split_bundled(
                np.zeros((8, 2)), np.zeros((8, 2)), (32, 32), 1.0, 1.0)

    def test_public_api_routes_bundled(self):
        # round-4: material_path_sinogram(method="dominant") must run the
        # SAME bundled kernel the fused pipeline uses (VERDICT r3 item 1),
        # with the host plan + packed tables cached on the objects, and
        # stay bit-identical to the per-ray row-window plan
        from dexct_tpu.ops.siddon import material_path_sinogram
        from dexct_tpu.ops.siddon_fast import trace_paths_dominant
        from dexct_tpu.system import contrast_rods_phantom

        ph = contrast_rods_phantom(N=64, dx=0.3)
        ct = FanBeamGeometry(N_channels=96, N_proj=64,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        got = np.asarray(material_path_sinogram(ph, ct, method="dominant"))
        cache = ct.__dict__.get("_dexct_trace_cache", {})
        assert any(k[0] == "bplan" for k in cache), \
            "public API did not take the bundled plan"
        src, dirs = ct.ray_geometry()
        ref = np.asarray(trace_paths_dominant(
            jnp.asarray(ph.slice_labels()), jnp.asarray(src, jnp.float32),
            jnp.asarray(dirs, jnp.float32), ph.dx, ph.dy,
            n_materials=ph.n_materials, group=16))
        np.testing.assert_array_equal(got, ref)
        # second call rides the cached plan/packs and is identical
        again = np.asarray(material_path_sinogram(ph, ct, method="dominant"))
        np.testing.assert_array_equal(again, got)

    def test_fused_step_parity(self):
        # the production wiring: pack_dect(trace_bundle=8) must produce
        # bit-identical pipeline outputs to the per-ray plan
        from dexct_tpu.physics import kramers_spectrum, linac_spectrum
        from dexct_tpu.pipeline.fused import dect_step, pack_dect
        from dexct_tpu.system import pelvis_phantom

        ct = FanBeamGeometry(N_channels=96, N_proj=80,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=True)
        ph = pelvis_phantom(N=64, dx=0.8)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        outs = {}
        for tb in (8, 0):
            a, m = pack_dect(ct, ph, s1, s2, 64, 40.0, 0.8, n_iters=4,
                             projector="siddon_dominant",
                             recon="parallel", trace_bundle=tb)
            if tb:
                assert m.fp_meta[0] == "bundled"
            outs[tb] = dect_step(a, meta=m)
        import jax

        for k, v in outs[8].items():
            jax.tree.map(
                lambda x, y: np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y)), v, outs[0][k])


class TestPackedBackprojection:
    def test_matches_reference_bp(self):
        ct = FanBeamGeometry(N_channels=96, N_proj=80, gamma_fan=0.8,
                             SID=50.0, SDD=90.0)
        rng = np.random.default_rng(0)
        sinos = rng.normal(size=(3, 80, 96)).astype(np.float32)
        qs = jnp.stack([
            filter_sinogram(jnp.asarray(s), ct, 0.8) for s in sinos
        ])
        betas = jnp.asarray(ct.betas, jnp.float32)
        dbeta = 2 * np.pi / 80
        ref = np.stack([
            np.asarray(fan_backproject(qs[k], betas, ct.SID, ct.dgamma,
                                       64, 20.0, dbeta=dbeta))
            for k in range(3)
        ])
        packed = pack_filtered(qs)
        got = np.asarray(fan_backproject_multi(
            packed, 3, betas, ct.SID, ct.dgamma, 96, 64, 20.0, dbeta))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_view_block_invariance(self):
        ct = FanBeamGeometry(N_channels=64, N_proj=50, gamma_fan=0.8,
                             SID=50.0, SDD=90.0)
        rng = np.random.default_rng(1)
        qs = jnp.asarray(rng.normal(size=(2, 50, 64)), jnp.float32)
        packed = pack_filtered(qs)
        betas = jnp.asarray(ct.betas, jnp.float32)
        a = np.asarray(fan_backproject_multi(
            packed, 2, betas, 50.0, ct.dgamma, 64, 32, 20.0, 0.1,
            view_block=7))
        b = np.asarray(fan_backproject_multi(
            packed, 2, betas, 50.0, ct.dgamma, 64, 32, 20.0, 0.1,
            view_block=50))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_end_to_end_water_recon(self):
        """Fast path reconstructs the water cylinder to mu (absolute scale
        check against the FBP oracle result)."""
        from dexct_tpu.ops.siddon import material_path_sinogram, mono_sinogram
        from dexct_tpu.system import water_cylinder_phantom

        ph = water_cylinder_phantom(N=96, dx=0.25)
        ct = FanBeamGeometry(N_channels=128, N_proj=96,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        mu = ph.materials.mu_table(np.array([60.0]))[:, 0]
        sino = mono_sinogram(material_path_sinogram(ph, ct), mu)
        q = filter_sinogram(sino, ct, 0.8)[None]
        img = np.asarray(fan_backproject_multi(
            pack_filtered(q), 1, jnp.asarray(ct.betas, jnp.float32),
            ct.SID, ct.dgamma, 128, 96, 24.0, 2 * np.pi / 96))[0]
        center = img[44:52, 44:52]
        assert abs(center.mean() - mu[1]) / mu[1] < 0.01
