"""Flat-panel (equidistant-column) cone-beam geometry + FDK
(system.FlatPanelConeBeamGeometry, ops/flatpanel.py).

Anchors: exact ray-on-panel identities, and the reconstruction of a
z-uniform object must agree with the validated equiangular fan pipeline
(both estimate the same mu image, from different samplings)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dexct_tpu.ops.flatpanel import fdk_flat_reconstruct
from dexct_tpu.system import FlatPanelConeBeamGeometry
from dexct_tpu.system.phantom import water_cylinder_phantom


def _geometry(**kw):
    kw.setdefault("N_channels", 64)
    kw.setdefault("N_proj", 96)
    kw.setdefault("N_rows", 8)
    kw.setdefault("gamma_fan", 0.8230337)
    kw.setdefault("SID", 60.0)
    kw.setdefault("SDD", 100.0)
    kw.setdefault("h_iso", 0.5)
    return FlatPanelConeBeamGeometry(**kw)


class TestGeometry:
    def test_rays_hit_panel_elements_exactly(self):
        ct = _geometry(N_channels=16, N_proj=8, N_rows=4)
        src, d = ct.ray_geometry_3d()
        u_p = ct.u_iso * ct.SDD / ct.SID  # [C] panel columns
        z_p = ct.z_iso * ct.SDD / ct.SID  # [R] panel rows
        for v in range(ct.N_proj):
            beta = ct.betas[v]
            e = np.array([np.cos(beta), np.sin(beta)])
            t_hat = np.array([-np.sin(beta), np.cos(beta)])
            for r in range(ct.N_rows):
                for c in range(ct.N_channels):
                    # element position on the plane SDD behind the
                    # source along -e, offset u_p tangentially.
                    # sign: gamma > 0 must match the equiangular
                    # convention dir = -(cos(b+g), sin(b+g)) whose
                    # tangential component is -g*t_hat
                    el = (src[v, r, c, :2] - ct.SDD * e
                          - u_p[c] * t_hat)
                    elz = z_p[r]
                    # the ray from src along d must pass through el
                    t = ct.SDD / -(d[v, r, c, :2] @ e)
                    hit = src[v, r, c, :2] + t * d[v, r, c, :2]
                    hitz = src[v, r, c, 2] + t * d[v, r, c, 2]
                    np.testing.assert_allclose(hit, el, atol=1e-9)
                    assert abs(hitz - elz) < 1e-9

    def test_gammas_are_atan_not_equiangular(self):
        ct = _geometry()
        np.testing.assert_allclose(ct.gammas,
                                   np.arctan(ct.u_iso / ct.SID))
        # edge channels compress vs the uniform-angle grid
        dg = np.diff(ct.gammas)
        assert dg[0] < dg[len(dg) // 2]

    def test_total_fan_angle_preserved(self):
        ct = _geometry()
        # outermost column edges subtend gamma_fan
        u_edge = ct.N_channels / 2.0 * ct.du_iso
        assert abs(2.0 * np.arctan(u_edge / ct.SID)
                   - ct.gamma_fan) < 1e-12


class TestReconstruction:
    @pytest.fixture(scope="class")
    def system(self):
        import dataclasses

        ct = _geometry()
        ph2 = water_cylinder_phantom(N=48, dx=0.5)
        lab3 = np.broadcast_to(ph2.labels[0], (8, 48, 48)).copy()
        ph3 = dataclasses.replace(ph2, labels=lab3, dz=0.5)
        return ct, ph2, ph3

    def test_water_mu_and_fan_agreement(self, system):
        from dexct_tpu.ops.conebeam import cone_material_paths
        from dexct_tpu.ops.fbp import fan_backproject, filter_sinogram
        from dexct_tpu.ops.siddon import (material_path_sinogram,
                                          mono_sinogram)
        from dexct_tpu.system import FanBeamGeometry

        ct, ph2, ph3 = system
        mu60 = ph2.materials.mu_table(np.array([60.0]))[:, 0]
        sino3 = jnp.einsum(
            "vrcm,m->vrc", cone_material_paths(ph3, ct),
            jnp.asarray(mu60, jnp.float32))
        vol = np.asarray(fdk_flat_reconstruct(sino3, ct, 48, 20.0, 0.8))
        assert vol.shape == (8, 48, 48)
        mid = 0.5 * (vol[3] + vol[4])
        mu_w = float(mu60[1])
        # absolute calibration: water recovers mu
        assert abs(mid[20:28, 20:28].mean() - mu_w) < 0.01 * mu_w

        # same object through the validated equiangular fan pipeline
        fan = FanBeamGeometry(N_channels=64, N_proj=96,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        sino2 = mono_sinogram(material_path_sinogram(ph2, fan),
                              jnp.asarray(mu60, jnp.float32))
        img2 = np.asarray(fan_backproject(
            filter_sinogram(sino2, fan, 0.8),
            jnp.asarray(fan.betas, jnp.float32), fan.SID, fan.dgamma,
            48, 20.0))
        interior = np.hypot(
            *np.meshgrid(*[np.arange(48) - 23.5] * 2)) < 16
        assert np.abs(mid - img2)[interior].max() < 0.03 * img2.max()

    def test_multi_volume_matches_per_volume(self, system):
        ct, _, _ = system
        rng = np.random.default_rng(0)
        s = rng.standard_normal((3, 96, 8, 64)).astype(np.float32)
        multi = np.asarray(fdk_flat_reconstruct(
            jnp.asarray(s), ct, 32, 20.0, 0.8))
        for k in range(3):
            one = np.asarray(fdk_flat_reconstruct(
                jnp.asarray(s[k]), ct, 32, 20.0, 0.8))
            # identical taps/weights; the batched rfft of the filter
            # stage reassociates, so float-rounding only
            assert np.abs(multi[k] - one).max() < 1e-6 * max(
                np.abs(one).max(), 1e-30)

    def test_det_offsets_shift_the_recon(self, system):
        # a half-channel panel offset translates the reconstruction's
        # apparent center; the offset-aware BP must compensate exactly
        # when the SAME offset geometry produced the data
        import dataclasses

        from dexct_tpu.ops.conebeam import cone_material_paths

        ct, ph2, ph3 = system
        ct_off = dataclasses.replace(ct, det_offset_ch=0.25,
                                     det_offset_row=0.5)
        mu60 = ph2.materials.mu_table(np.array([60.0]))[:, 0]
        sino = jnp.einsum(
            "vrcm,m->vrc", cone_material_paths(ph3, ct_off),
            jnp.asarray(mu60, jnp.float32))
        vol = np.asarray(fdk_flat_reconstruct(sino, ct_off, 48, 20.0,
                                              0.8))
        mid = 0.5 * (vol[3] + vol[4])
        mu_w = float(mu60[1])
        assert abs(mid[20:28, 20:28].mean() - mu_w) < 0.012 * mu_w


class TestRouting:
    def test_equiangular_fdk_rejects_flat(self):
        from dexct_tpu.ops.conebeam import fdk_reconstruct

        ct = _geometry(N_channels=16, N_proj=8, N_rows=4)
        with pytest.raises(ValueError, match="flat"):
            fdk_reconstruct(jnp.zeros((8, 4, 16)), ct, 16, 10.0, 0.8)

    def test_fused_pack_rejects_flat(self):
        import dataclasses

        from dexct_tpu.physics.spectrum import kramers_spectrum
        from dexct_tpu.pipeline.cone import pack_cone_dect

        ct = _geometry(N_channels=32, N_proj=16, N_rows=4)
        ph2 = water_cylinder_phantom(N=32, dx=0.4)
        lab3 = np.broadcast_to(ph2.labels[0], (4, 32, 32)).copy()
        ph3 = dataclasses.replace(ph2, labels=lab3, dz=0.4)
        s = kramers_spectrum(80.0)
        with pytest.raises(ValueError, match="flat"):
            pack_cone_dect(ct, ph3, s, s, 32, 10.0, 0.8)

    def test_simulate_cone_dect_auto_routes_flat(self):
        import dataclasses

        from dexct_tpu.ops.conebeam import simulate_cone_dect
        from dexct_tpu.physics.spectrum import (kramers_spectrum,
                                                linac_spectrum)

        ct = _geometry(N_channels=32, N_proj=48, N_rows=4)
        ph2 = water_cylinder_phantom(N=32, dx=0.4)
        lab3 = np.broadcast_to(ph2.labels[0], (4, 32, 32)).copy()
        ph3 = dataclasses.replace(ph2, labels=lab3, dz=0.4)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        out = simulate_cone_dect(ct, ph3, s1, s2, 32, 10.0, 0.8)
        hu = np.asarray(out["recon_HU"][1])
        assert hu.shape == (4, 32, 32)
        mid = 0.5 * (hu[1] + hu[2])
        assert -250.0 < mid[14:18, 14:18].mean() < 60.0  # ~water
        assert mid[:3, :3].mean() < -900.0  # air corner


class TestShortScan:
    def test_short_scan_matches_full(self):
        # pi + fan C-arm orbit with Parker weights reproduces the full
        # 2*pi reconstruction (the flat analog of the fan short-scan
        # identity, ops/fbp.parker_weights)
        import dataclasses

        from dexct_tpu.ops.conebeam import cone_material_paths

        ct_full = _geometry()
        ph2 = water_cylinder_phantom(N=48, dx=0.5)
        lab3 = np.broadcast_to(ph2.labels[0], (8, 48, 48)).copy()
        ph3 = dataclasses.replace(ph2, labels=lab3, dz=0.5)
        mu60 = ph2.materials.mu_table(np.array([60.0]))[:, 0]

        def recon(ct):
            sino = jnp.einsum(
                "vrcm,m->vrc", cone_material_paths(ph3, ct),
                jnp.asarray(mu60, jnp.float32))
            return np.asarray(fdk_flat_reconstruct(sino, ct, 48, 20.0,
                                                   0.8))
        full = recon(ct_full)
        # error is angular-discretization-limited (measured 3.4/2.3/
        # 1.6% at 64/96/192 views — converging, i.e. the Parker
        # partition itself is exact); test at the dense grid
        short = recon(_geometry(
            N_proj=192, rotation_total=np.pi + ct_full.gamma_fan))
        interior = np.hypot(
            *np.meshgrid(*[np.arange(48) - 23.5] * 2)) < 16
        mid_f = 0.5 * (full[3] + full[4])
        mid_s = 0.5 * (short[3] + short[4])
        assert np.abs(mid_s - mid_f)[interior].max() \
            < 0.02 * np.abs(mid_f).max()

    def test_too_short_orbit_raises(self):
        ct = _geometry(N_proj=32, rotation_total=0.8 * np.pi)
        with pytest.raises(ValueError, match="not enough data"):
            fdk_flat_reconstruct(jnp.zeros((32, 8, 64), jnp.float32),
                                 ct, 32, 20.0, 0.8)


class TestOffsetDetector:
    """Half-fan offset-detector CBCT (FOV enlargement via Wang
    redundancy weights, `offset_detector_weights`)."""

    def test_partition_of_unity_in_overlap(self):
        from dexct_tpu.ops.flatpanel import offset_detector_weights

        ct = _geometry(N_channels=64, det_offset_ch=16.0)
        w = offset_detector_weights(ct)  # includes the 2x convention
        gam = ct.gammas
        g_ov = min(-gam[0], gam[-1])
        # conjugate pairs inside the overlap sum to 2 (i.e. w+w' = 1)
        for g in np.linspace(-0.9 * g_ov, 0.9 * g_ov, 9):
            wa = np.interp(g, gam, w)
            wb = np.interp(-g, gam, w)
            assert abs(wa + wb - 2.0) < 5e-2  # channel interp only
        # long side doubled, short edge zeroed
        assert abs(w[-1] - 2.0) < 1e-9
        assert w[0] < 1e-9

    def test_offset_scan_recovers_wide_phantom(self):
        # a cylinder larger than the symmetric-panel FOV: the offset
        # scan + Wang weights reconstruct it to the same values as a
        # full-width panel scan; without the weights the periphery
        # shades visibly
        import dataclasses

        from dexct_tpu.ops.conebeam import cone_material_paths

        ph2 = water_cylinder_phantom(N=64, dx=0.5, radius_cm=13.0)
        lab3 = np.broadcast_to(ph2.labels[0], (4, 64, 64)).copy()
        ph3 = dataclasses.replace(ph2, labels=lab3, dz=0.5)
        mu60 = ph2.materials.mu_table(np.array([60.0]))[:, 0]
        mu_w = float(mu60[1])

        # offset scan: 48-channel panel shifted 16 channels — covers
        # gamma in ~[-0.16, +0.55] rad; a symmetric 48-channel panel
        # alone could not see the 13 cm cylinder's far edge
        ct_off = _geometry(N_channels=48, N_proj=128, N_rows=4,
                           gamma_fan=1.0, det_offset_ch=16.0)
        # reference: a full-width panel with the SAME column pitch and
        # no offset (96 channels span twice the fan)
        ct_wide = _geometry(N_channels=96, N_proj=128, N_rows=4,
                            gamma_fan=2.0 * np.arctan(
                                2.0 * np.tan(0.5)), det_offset_ch=0.0)
        sino_off = jnp.einsum(
            "vrcm,m->vrc", cone_material_paths(ph3, ct_off),
            jnp.asarray(mu60, jnp.float32))
        vol_off = np.asarray(fdk_flat_reconstruct(
            sino_off, ct_off, 64, 30.0, 0.8))
        vol_bad = np.asarray(fdk_flat_reconstruct(
            sino_off, ct_off, 64, 30.0, 0.8, redundancy="full"))
        sino_wide = jnp.einsum(
            "vrcm,m->vrc", cone_material_paths(ph3, ct_wide),
            jnp.asarray(mu60, jnp.float32))
        vol_wide = np.asarray(fdk_flat_reconstruct(
            sino_wide, ct_wide, 64, 30.0, 0.8))

        mid_off = 0.5 * (vol_off[1] + vol_off[2])
        mid_bad = 0.5 * (vol_bad[1] + vol_bad[2])
        mid_wide = 0.5 * (vol_wide[1] + vol_wide[2])
        yy, xx = np.meshgrid(*[np.arange(64) - 31.5] * 2, indexing="ij")
        r = np.hypot(yy, xx) * (30.0 / 64)
        interior = r < 11.0
        ring = (r > 8.0) & (r < 11.0)
        # weighted offset recon: flat at mu_w and close to the wide
        # scan (measured: interior mean +0.3%, mean |diff| well under
        # the edge-feather scale)
        assert abs(mid_off[interior].mean() - mu_w) < 0.02 * mu_w
        assert abs(mid_off[ring].mean() - mu_w) < 0.02 * mu_w
        assert np.abs(mid_off - mid_wide)[interior].mean() < 0.02 * mu_w
        # unweighted: the hard short-edge truncation + mis-partitioned
        # redundancy bias the ring by an order of magnitude more
        # (measured +14% vs +1.0%)
        assert (abs(mid_bad[ring].mean() - mu_w)
                > 5.0 * abs(mid_off[ring].mean() - mu_w))

    def test_over_offset_raises(self):
        from dexct_tpu.ops.flatpanel import offset_detector_weights

        ct = _geometry(N_channels=48, det_offset_ch=30.0)
        with pytest.raises(ValueError, match="central ray|overlap"):
            offset_detector_weights(ct)


def test_flat_pair_mode_matches_per_slice():
    # z-pair window gathers == per-slice taps at odd and even slice
    # counts (mirrors the helical pair-mode pin)
    from dexct_tpu.ops.flatpanel import _flat_backproject

    ct = _geometry()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((4, 96, 8, 64))
                    .astype(np.float32))
    for nz in (6, 7):
        args = (q, jnp.asarray(ct.betas, jnp.float32), 60.0,
                float(ct.du_iso), 0.5, 0.0, 0.0, 8, 32, nz, 20.0,
                0.45, float(ct.rotation_total / 96))
        a = np.asarray(_flat_backproject(*args, pair_mode=False))
        b = np.asarray(_flat_backproject(*args, pair_mode=True))
        assert np.abs(a - b).max() < 1e-6 * np.abs(a).max(), nz
