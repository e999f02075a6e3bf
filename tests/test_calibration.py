"""Detector-offset calibration (ops/calibration.py) + the
det_offset_ch geometry field: the offset shifts the rays, the
conjugate-ray estimator recovers it, and reconstructing with the
calibrated geometry removes the center-of-rotation artifact."""

import numpy as np

from dexct_tpu.ops.calibration import (conjugate_inconsistency,
                                       estimate_det_offset)
from dexct_tpu.pipeline.api import get_recon, get_sino
from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom


def _geom(offset=0.0, n_proj=128):
    return FanBeamGeometry(N_channels=96, N_proj=n_proj,
                           gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                           eid=True, det_offset_ch=offset)


def _scan(offset):
    ct_true = _geom(offset)
    ph = contrast_rods_phantom(N=64, dx=0.35)
    s = kramers_spectrum(80.0)
    s.rescale_counts(ct_true.A_iso * 10.0 / ct_true.N_proj)
    _, log = get_sino(ct_true, ph, s)
    return np.asarray(log), s


class TestDetOffset:
    def test_offset_shifts_gammas(self):
        g0 = _geom(0.0).gammas
        g1 = _geom(0.75).gammas
        np.testing.assert_allclose(g1 - g0, 0.75 * _geom().dgamma,
                                   atol=1e-12)

    def test_estimator_recovers_offset(self):
        for true in (0.0, 0.7, -1.3):
            log, _ = _scan(true)
            est = estimate_det_offset(log, _geom())
            assert abs(est - true) < 0.1, (true, est)

    def test_true_offset_minimizes_inconsistency(self):
        log, _ = _scan(0.7)
        ct = _geom()
        e_true = conjugate_inconsistency(log, ct, 0.7)
        e_zero = conjugate_inconsistency(log, ct, 0.0)
        assert e_true < 0.2 * e_zero

    def test_calibrated_recon_removes_artifact(self):
        true = 1.0
        log, s = _scan(true)
        # reconstruct assuming nominal geometry vs the calibrated one
        rec_bad, _ = get_recon(log, _geom(0.0), s, 64, 20.0, 0.8)
        est = estimate_det_offset(log, _geom())
        rec_cal, _ = get_recon(log, _geom(est), s, 64, 20.0, 0.8)
        rec_true, _ = get_recon(log, _geom(true), s, 64, 20.0, 0.8)
        err_bad = float(np.sqrt(np.mean(
            (np.asarray(rec_bad) - np.asarray(rec_true)) ** 2)))
        err_cal = float(np.sqrt(np.mean(
            (np.asarray(rec_cal) - np.asarray(rec_true)) ** 2)))
        assert err_cal < 0.15 * err_bad
