"""Robustness guards: NaN-freedom under jax_debug_nans, golden regression
values, models namespace (SURVEY.md §5 sanitizer strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.pipeline.fused import make_jitted_step, pack_dect
from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom


def small_pack(**kw):
    ct = FanBeamGeometry(N_channels=64, N_proj=64, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, eid=True)
    ph = contrast_rods_phantom(N=64, dx=0.35)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    return pack_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=12, **kw)


class TestNanGuard:
    def test_pipeline_nan_free_under_debug_nans(self):
        """The full DE pipeline raises nothing under jax_debug_nans — the
        CI-level replacement for the reference's device-divergence comment
        (matdecomp.py:89-92)."""
        arrays, meta = small_pack()
        with jax.debug_nans(True):
            out = make_jitted_step(meta)(arrays)
            jax.block_until_ready(out)
        for leaf in jax.tree.leaves(out):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_fourier_parallel_nan_free(self):
        arrays, meta = small_pack(projector="fourier", n_theta=256,
                                  recon="parallel", recon_n_theta=128,
                                  recon_nt=256)
        with jax.debug_nans(True):
            out = make_jitted_step(meta)(arrays)
            jax.block_until_ready(out)
        for leaf in jax.tree.leaves(out):
            assert np.isfinite(np.asarray(leaf)).all()


class TestGoldenValues:
    """Scalar regression anchors: catches silent numerical drift."""

    def test_pipeline_golden_statistics(self):
        arrays, meta = small_pack()
        out = make_jitted_step(meta)(arrays)
        hu = np.asarray(out["recon_HU"][1])
        m1 = np.asarray(out["mat_sinos"][0])
        # values pinned at framework round 1 (CPU f32); tolerances cover
        # compiler/version reordering, not algorithm changes
        assert abs(hu[32, 32] - (-90.3)) < 30.0  # water center + cupping
        assert abs(float(m1.max()) - 19.44) < 1.0
        assert abs(float(np.asarray(out["sino_log"][1]).max()) - 5.93) < 0.3

    def test_mixatten_golden(self):
        from dexct_tpu.physics import mixatten

        # vendored NIST anchor values (nist_data.py); drift here means the
        # vendored tables changed
        assert abs(float(mixatten("H(11.2)O(88.8)", 60.0)) - 0.20598) < 2e-4
        assert abs(float(mixatten("Fe(100)", 100.0)) - 0.3717) < 5e-4


class TestTopLevelNamespace:
    def test_system_surface(self):
        import dexct_tpu as dx

        assert dx.FanBeamGeometry is FanBeamGeometry
        ph = dx.water_cylinder_phantom(N=16)
        assert ph.labels.shape == (1, 16, 16)
