"""Tube current modulation (pipeline/tcm.py): noiseless invariance,
dose conservation, and the noise-equalization payoff on an eccentric
object (the reason scanners modulate)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.pipeline.api import simulate_dect
from dexct_tpu.pipeline.tcm import auto_tcm_profile, simulate_tcm_dect
from dexct_tpu.system import FanBeamGeometry, water_cylinder_phantom


def _ellipse_phantom(N=64, dx=0.35):
    """Eccentric water ellipse: TCM pays only on non-round objects."""
    ph = water_cylinder_phantom(N=N, dx=dx)
    yy, xx = np.mgrid[0:N, 0:N]
    cy = cx = (N - 1) / 2
    ell = (((xx - cx) / (0.45 * N)) ** 2
           + ((yy - cy) / (0.18 * N)) ** 2) <= 1.0
    labels = np.where(ell, 1, 0).astype(np.uint8)[None]
    return dataclasses.replace(ph, labels=labels)


def _system():
    ct = FanBeamGeometry(N_channels=96, N_proj=128,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=True)
    ph = _ellipse_phantom()
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 2.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 0.3 / ct.N_proj)
    return ct, ph, s1, s2


class TestTcm:
    def test_profile_follows_attenuation(self):
        # the 80 kV beam (s2) sees the ellipse's eccentricity; the MV
        # beam barely attenuates and would modulate ~1%
        ct, ph, _, s2 = _system()
        m = np.asarray(auto_tcm_profile(ct, ph, s2))
        assert m.shape == (ct.N_proj,)
        np.testing.assert_allclose(m.mean(), 1.0, rtol=1e-5)
        # the ellipse's long axis (side views) must draw more current
        assert m.max() / m.min() > 1.2

    def test_noiseless_matches_unmodulated(self):
        ct, ph, s1, s2 = _system()
        base = simulate_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=8)
        tcm = simulate_tcm_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=8)
        np.testing.assert_allclose(np.asarray(tcm.recon_raw[0]),
                                   np.asarray(base.recon_raw[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(tcm.mat_sinos[0]),
                                   np.asarray(base.mat_sinos[0]),
                                   atol=1e-4)

    def test_total_output_conserved(self):
        ct, ph, _, s2 = _system()
        m = np.asarray(auto_tcm_profile(ct, ph, s2, strength=1.0))
        np.testing.assert_allclose(m.sum(), ct.N_proj, rtol=1e-5)

    def test_noise_equalization_payoff(self):
        # at the SAME total tube output, attenuation-following TCM must
        # reduce the noise in the reconstruction of an eccentric object
        ct, ph, s1, s2 = _system()
        roi = (slice(28, 36), slice(24, 40))

        def roi_noise(m, seed):
            outs = []
            for k in range(4):
                r = simulate_tcm_dect(
                    ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=6,
                    m=m, noise="poisson",
                    key=jax.random.PRNGKey(seed + k))
                # the 80 kV image carries the noise the TCM targets
                outs.append(np.asarray(r.recon_raw[1]))
            outs = np.stack(outs)
            # noise = std across realizations, averaged over the ROI
            return float(outs.std(axis=0)[roi].mean())

        m_flat = jnp.ones(ct.N_proj)
        m_tcm = auto_tcm_profile(ct, ph, s2, strength=1.0)
        n_flat = roi_noise(m_flat, 10)
        n_tcm = roi_noise(m_tcm, 10)
        assert n_tcm < 0.95 * n_flat, (n_tcm, n_flat)
