"""QA phantom + automated image-quality report.

The pinned numbers come from the design run (256ch x 256v, N=192,
filtered 120 kVp Kramers, water BHC): low-contrast insert +10.0 HU,
water center -3 HU, muscle/tissue within ~1 HU of the 60 keV oracle's
relative contrast, MTF50 1.68 /cm.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dexct_tpu.analysis.qa import format_qa_report, qa_report
from dexct_tpu.ops import spectral as sp_ops
from dexct_tpu.ops.bhc import apply_water_bhc, fit_water_bhc
from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.pipeline.api import get_recon, get_sino
from dexct_tpu.system.geometry import FanBeamGeometry
from dexct_tpu.system.phantom import qa_phantom


@pytest.fixture(scope="module")
def qa_scan():
    ct = FanBeamGeometry(N_channels=192, N_proj=192, gamma_fan=0.82,
                         SID=60.0, SDD=100.0, eid=True)
    ph, spec = qa_phantom(N=160, dx=0.18)
    s = kramers_spectrum(120.0)
    air0 = float(np.sum(sp_ops.effective_fluence(s, ct)))
    s.rescale_counts(5e6 / air0)
    raw, slog = get_sino(ct, ph, s)
    bhc = fit_water_bhc(s, ct)
    n, fov = 160, 160 * 0.18
    _, hu = get_recon(apply_water_bhc(bhc, slog), ct, s, n, fov, 0.8)

    def one(key):
        noisy = sp_ops.sample_noise(key, jnp.asarray(raw), "poisson")
        sl = apply_water_bhc(bhc, sp_ops.log_sinogram(noisy, air0))
        _, h = get_recon(sl, ct, s, n, fov, 0.8)
        return h

    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    ensemble = np.asarray(jax.lax.map(one, keys))
    return ph, spec, np.asarray(hu), ensemble


class TestQaReport:
    def test_ct_number_linearity(self, qa_scan):
        ph, spec, hu, _ = qa_scan
        rep = qa_report(hu, spec)
        ins = {k: v["mean_HU"] for k, v in rep["inserts"].items()}
        assert ins["air"] < -900
        assert ins["bone"] > 1000
        # physical HU ordering of the soft-tissue inserts
        assert ins["adipose"] < ins["low_contrast"] < ins["muscle"] \
            < ins["tissue"]
        # low-contrast module: designed +10 HU (measured 10.0)
        assert abs(ins["low_contrast"] - 10.0) < 4.0

    def test_uniformity_and_low_contrast(self, qa_scan):
        ph, spec, hu, _ = qa_scan
        rep = qa_report(hu, spec)
        # water BHC centers the body (measured -3 HU)
        assert abs(rep["uniformity"]["center_HU"]) < 15.0
        lc = rep["low_contrast"]
        assert abs(lc["contrast_HU"] - 10.0) < 4.0

    def test_mtf_crossings(self, qa_scan):
        ph, spec, hu, _ = qa_scan
        rep = qa_report(hu, spec)
        f50 = rep["mtf"]["f50_per_cm"]
        f10 = rep["mtf"]["f10_per_cm"]
        assert 0.5 < f50 < 3.5
        assert f50 < f10 < 6.0

    def test_ensemble_block_and_report_text(self, qa_scan):
        ph, spec, hu, ensemble = qa_scan
        rep = qa_report(ensemble[0], spec, noisy_recons=ensemble)
        e = rep["ensemble"]
        assert e["n_realizations"] == 8
        assert e["noise_HU"] > rep_noiseless_noise(hu, spec)
        assert e["dprime_pw"] >= e["dprime_npw"] > 0.0
        text = format_qa_report(rep)
        assert "MTF50" in text and "d' PW" in text

    def test_oracle_consistency(self, qa_scan):
        """Insert HU relative contrasts track the monoenergetic oracle
        (polyenergetic values are hardened, so compare soft-tissue
        DIFFERENCES which are first-order energy-stable)."""
        ph, spec, hu, _ = qa_scan
        rep = qa_report(hu, spec)
        oracle = np.asarray(ph.M_mono(60.0))
        n, dx = hu.shape[-1], spec["dx"]
        y = (np.arange(n) + 0.5 - n / 2) * dx
        diffs = {}
        for name in ("muscle", "tissue"):
            ins = spec["inserts"][name]
            cy, cx = ins["center"]
            m = np.hypot(y[None, :] - cx, y[:, None] - cy) \
                <= 0.6 * ins["radius"]
            diffs[name] = (rep["inserts"][name]["mean_HU"],
                           float(oracle[m].mean()))
        meas = diffs["tissue"][0] - diffs["muscle"][0]
        orac = diffs["tissue"][1] - diffs["muscle"][1]
        assert abs(meas - orac) < 6.0  # measured ~1 HU apart


def rep_noiseless_noise(hu, spec):
    return qa_report(hu, spec)["noise_HU"]
