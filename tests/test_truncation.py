"""Detector truncation + water-cylinder data completion
(ops/truncation.py): the limited-FOV scan biases rim and interior, the
edge-fit extrapolation removes most of it."""

import dataclasses

import numpy as np

from dexct_tpu.ops.truncation import (pad_truncated_sinogram,
                                      truncation_severity)
from dexct_tpu.pipeline.api import get_recon, get_sino
from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.system import FanBeamGeometry, water_cylinder_phantom

N, DX = 64, 0.5


def _phantom():
    ph = water_cylinder_phantom(N=N, dx=DX)
    yy, xx = np.mgrid[0:N, 0:N]
    c = (N - 1) / 2
    ell = (((xx - c) / (0.45 * N)) ** 2
           + ((yy - c) / (0.28 * N)) ** 2) <= 1
    return dataclasses.replace(
        ph, labels=np.where(ell, 1, 0).astype(np.uint8)[None])


def _scan(gamma_fan, n_ch):
    ct = FanBeamGeometry(N_channels=n_ch, N_proj=128,
                         gamma_fan=gamma_fan, SID=60.0, SDD=100.0,
                         eid=True)
    s = kramers_spectrum(80.0)
    s.rescale_counts(ct.A_iso * 10.0 / ct.N_proj)
    _, log = get_sino(ct, _phantom(), s)
    return ct, s, log


class TestTruncation:
    def test_severity_flags_truncation(self):
        ct_n, _, log_n = _scan(0.42, 64)   # FOV 12.5 cm < 14.4 cm object
        ct_w, _, log_w = _scan(0.90, 136)  # covers the object
        assert truncation_severity(log_n) > 0.5
        assert truncation_severity(log_w) == 0.0

    def test_padded_geometry_consistent(self):
        ct_n, _, log_n = _scan(0.42, 64)
        padded, pct = pad_truncated_sinogram(log_n, ct_n)
        n_pad = (padded.shape[-1] - ct_n.N_channels) // 2
        assert pct.N_channels == ct_n.N_channels + 2 * n_pad
        np.testing.assert_allclose(pct.dgamma, ct_n.dgamma, rtol=1e-12)
        # measured data passes through untouched
        np.testing.assert_array_equal(
            np.asarray(padded)[..., n_pad:n_pad + ct_n.N_channels],
            np.asarray(log_n))
        # the extension decays outward to (near) zero
        assert float(np.asarray(padded)[..., 0].max()) < 0.2
        assert float(np.asarray(padded)[..., -1].max()) < 0.2

    def test_completion_removes_truncation_artifact(self):
        ct_n, s_n, log_n = _scan(0.42, 64)
        ct_w, s_w, log_w = _scan(0.90, 136)
        rec_truth, _ = get_recon(log_w, ct_w, s_w, N, 20.0, 0.8)
        rec_trunc, _ = get_recon(log_n, ct_n, s_n, N, 20.0, 0.8)
        padded, pct = pad_truncated_sinogram(log_n, ct_n)
        rec_fix, _ = get_recon(padded, pct, s_n, N, 20.0, 0.8)
        rt = np.asarray(rec_truth)
        yy, xx = np.mgrid[0:N, 0:N]
        c = (N - 1) / 2
        r = np.hypot(yy - c, xx - c)
        interior = r < 0.2 * N
        ell = (((xx - c) / (0.45 * N)) ** 2
               + ((yy - c) / (0.28 * N)) ** 2) <= 1
        rim = (r > 0.33 * N) & (r < 0.38 * N) & ell  # inside the object

        def rms(img, region):
            return float(np.sqrt(np.mean(
                (np.asarray(img) - rt)[region] ** 2)))

        assert rms(rec_fix, interior) < 0.6 * rms(rec_trunc, interior)
        assert rms(rec_fix, rim) < 0.5 * rms(rec_trunc, rim)

    def test_untruncated_scan_unchanged(self):
        ct_w, s_w, log_w = _scan(0.90, 136)
        padded, pct = pad_truncated_sinogram(log_w, ct_w)
        n_pad = (padded.shape[-1] - ct_w.N_channels) // 2
        # nothing to extrapolate: the pad region is zero
        assert float(np.abs(np.asarray(padded)[..., :n_pad]).max()) \
            < 1e-6
        rec_w, _ = get_recon(log_w, ct_w, s_w, N, 20.0, 0.8)
        rec_p, _ = get_recon(padded, pct, s_w, N, 20.0, 0.8)
        np.testing.assert_allclose(np.asarray(rec_p),
                                   np.asarray(rec_w), atol=2e-4)
