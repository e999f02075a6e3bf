"""Anode heel effect (ops/heel.py): row-dependent intensity/hardness,
per-row air calibration, and the exact per-row decomposition."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from dexct_tpu.ops.conebeam import cone_sinogram, fdk_reconstruct
from dexct_tpu.ops.heel import (HeelEffect, cone_sinogram_heel,
                                decompose_cone_sinograms_heel,
                                heel_fluence)
from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.system import ConeBeamGeometry
from dexct_tpu.system.phantom import water_cylinder_phantom


def _system(R=8, N=32):
    ct = ConeBeamGeometry(
        N_channels=48, N_proj=48, N_rows=R, gamma_fan=0.8,
        SID=60.0, SDD=100.0, h_iso=0.5, eid=True)
    ph2 = water_cylinder_phantom(N=N, dx=0.5, radius_cm=6.0)
    lab3 = np.broadcast_to(ph2.labels[0], (12, N, N)).copy()
    ph = dataclasses.replace(ph2, labels=lab3, dz=0.5)
    sp = kramers_spectrum(120.0)
    sp.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
    return ct, ph, sp


class TestHeelModel:
    def test_zero_depth_matches_heel_free(self):
        ct, ph, sp = _system()
        c0, l0 = cone_sinogram(ph, ct, sp)
        c1, l1 = cone_sinogram_heel(ph, ct, sp,
                                    HeelEffect(d0_cm=0.0))
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))

    def test_intensity_falls_and_spectrum_hardens_toward_anode(self):
        ct, ph, sp = _system()
        heel = HeelEffect(toward_positive_z=True)
        i0_r = heel_fluence(sp, ct, heel)  # [R, E]
        air = i0_r.sum(-1)
        # strictly decreasing air counts toward the anode (+z rows)
        assert np.all(np.diff(air) < 0)
        e = np.asarray(sp.E)
        emean = (i0_r * e).sum(-1) / air
        # mean detected energy strictly increases toward the anode
        assert np.all(np.diff(emean) > 0)
        # flipping the anode side mirrors the profile
        i0_f = heel_fluence(sp, ct,
                            HeelEffect(toward_positive_z=False))
        np.testing.assert_allclose(np.asarray(i0_f),
                                   np.asarray(i0_r)[::-1], rtol=1e-12)

    def test_rows_past_anode_angle_raise(self):
        ct, _, _ = _system()
        with pytest.raises(ValueError, match="anode angle"):
            HeelEffect(anode_angle=np.deg2rad(1.0)).excess_path(ct)

    def test_air_calibrated_log_keeps_only_hardening_bias(self):
        # per-row air normalization removes the intensity profile: an
        # AIR scan logs to ~0 on every row; a water scan's per-row bias
        # is the residual HARDENING (anode rows read lower mu)
        ct, ph, sp = _system()
        heel = HeelEffect(d0_cm=20e-4)
        air_ph = dataclasses.replace(
            ph, labels=np.zeros_like(ph.labels))
        c_air, l_air = cone_sinogram_heel(air_ph, ct, sp, heel)
        _, l_air0 = cone_sinogram(air_ph, ct, sp)
        # raw air counts vary ~1.7x across rows (log spread ~0.5); the
        # per-row air calibration removes that profile from the log
        # data to <1% of it — the residual is the heel SPECTRUM
        # acting on the physical air column (present heel-free too)
        raw_spread = float(np.log(np.asarray(c_air).mean((0, 2)).max()
                                  / np.asarray(c_air).mean((0, 2)).min()))
        resid = np.abs(np.asarray(l_air) - np.asarray(l_air0)).max()
        assert raw_spread > 0.2
        assert resid < 0.01 * raw_spread
        _, l_w = cone_sinogram_heel(ph, ct, sp, heel)
        lw = np.asarray(l_w)
        center = lw[:, :, lw.shape[2] // 2].mean(0)  # [R] central ray
        # hardened (anode-side) rows measure LOWER line integrals
        assert center[-1] < center[0]
        rel = (center[0] - center[-1]) / center[0]
        assert 0.002 < rel < 0.2  # a few-percent clinical-scale bias

    def test_heel_aware_decomposition_beats_naive(self):
        from dexct_tpu.ops import matdecomp as md

        ct, ph, _ = _system(R=6, N=24)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        heel = HeelEffect(d0_cm=20e-4)
        c1, _ = cone_sinogram_heel(ph, ct, s1, heel)
        c2, _ = cone_sinogram_heel(ph, ct, s2, heel)

        m1, m2 = decompose_cone_sinograms_heel(ct, c1, c2, s1, s2,
                                               heel, n_iters=30)
        # naive: central-spectrum solve of the flattened sinograms
        _, i0, mus = md.prepare_decomposition(ct, s1, s2)
        flat = jnp.stack([jnp.asarray(c1).reshape(-1),
                          jnp.asarray(c2).reshape(-1)])
        ab = md.gauss_newton_solve(flat, jnp.asarray(i0, jnp.float32),
                                   jnp.asarray(mus, jnp.float32),
                                   n_iters=30)
        n1 = np.asarray(ab[:, 0]).reshape(np.asarray(c1).shape)

        # compare against the heel-free truth decomposition
        c1_0, _ = cone_sinogram(ph, ct, s1)
        c2_0, _ = cone_sinogram(ph, ct, s2)
        ab0 = md.gauss_newton_solve(
            jnp.stack([jnp.asarray(c1_0).reshape(-1),
                       jnp.asarray(c2_0).reshape(-1)]),
            jnp.asarray(i0, jnp.float32), jnp.asarray(mus, jnp.float32),
            n_iters=30)
        t1 = np.asarray(ab0[:, 0]).reshape(np.asarray(c1).shape)

        sel = t1 > 0.1 * t1.max()  # through-object rays
        err_aware = np.abs(np.asarray(m1) - t1)[sel].max()
        err_naive = np.abs(n1 - t1)[sel].max()
        assert err_aware < 0.2 * err_naive
        assert err_aware < 5e-3 * t1.max()


class TestSimulateIntegration:
    def test_simulate_cone_dect_heel_kwarg(self):
        from dexct_tpu.ops.conebeam import simulate_cone_dect

        ct, ph, _ = _system(R=6, N=24)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        heel = HeelEffect(d0_cm=20e-4)
        out = simulate_cone_dect(ct, ph, s1, s2, 24, 10.0, 0.8,
                                 heel=heel, nz_out=4, dz_out=0.5)
        # counts/log/decomposition match the standalone heel ops
        c1, l1 = cone_sinogram_heel(ph, ct, s1, heel)
        np.testing.assert_array_equal(np.asarray(out["sino_raw"][0]),
                                      np.asarray(c1))
        np.testing.assert_array_equal(np.asarray(out["sino_log"][0]),
                                      np.asarray(l1))
        c2, _ = cone_sinogram_heel(ph, ct, s2, heel)
        m1, _ = decompose_cone_sinograms_heel(ct, c1, c2, s1, s2, heel,
                                              n_iters=10)
        np.testing.assert_array_equal(np.asarray(out["mat_sinos"][0]),
                                      np.asarray(m1))
        assert np.isfinite(out["recon_HU"][0]).all()
        # heel=None and d0=0 reproduce the heel-free path exactly
        o0 = simulate_cone_dect(ct, ph, s1, s2, 24, 10.0, 0.8,
                                nz_out=4, dz_out=0.5)
        oz = simulate_cone_dect(ct, ph, s1, s2, 24, 10.0, 0.8,
                                heel=HeelEffect(d0_cm=0.0),
                                nz_out=4, dz_out=0.5)
        np.testing.assert_array_equal(np.asarray(o0["sino_raw"][0]),
                                      np.asarray(oz["sino_raw"][0]))
        np.testing.assert_array_equal(np.asarray(o0["mat_recons"][0]),
                                      np.asarray(oz["mat_recons"][0]))

    def test_air_mask_survives_fully_covered_rows(self):
        # regression: a per-row DATA-max air threshold zeroes real
        # through-object rays on rows the object covers completely;
        # the mask is anchored to the known per-row air counts instead
        import dataclasses

        from dexct_tpu.system import ConeBeamGeometry
        from dexct_tpu.system.phantom import water_cylinder_phantom

        ct = ConeBeamGeometry(
            N_channels=32, N_proj=24, N_rows=4, gamma_fan=0.3,
            SID=60.0, SDD=100.0, h_iso=0.5, eid=True)
        # cylinder wider than the fan's fov radius (60*sin(0.15) = 9):
        # every channel of every row is covered
        ph2 = water_cylinder_phantom(N=32, dx=0.7, radius_cm=10.5)
        lab3 = np.broadcast_to(ph2.labels[0], (8, 32, 32)).copy()
        ph = dataclasses.replace(ph2, labels=lab3, dz=0.7)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        heel = HeelEffect(d0_cm=10e-4)
        c1, _ = cone_sinogram_heel(ph, ct, s1, heel)
        c2, _ = cone_sinogram_heel(ph, ct, s2, heel)
        m1, _ = decompose_cone_sinograms_heel(ct, c1, c2, s1, s2, heel,
                                              n_iters=15)
        m1 = np.asarray(m1)
        # no ray was misclassified as air: every ray carries water
        assert (m1 > 1.0).all(), (m1.min(), float((m1 <= 1.0).mean()))
