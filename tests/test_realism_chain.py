"""Composable realism chain (pipeline/realism.py): ordered application,
reverse correction, and the all-artifacts-at-once DE pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops.afterglow import decay_per_view
from dexct_tpu.ops.mtf import focal_spot_kernel
from dexct_tpu.ops.rings import sample_channel_gains
from dexct_tpu.ops.scatter import scatter_kernel
from dexct_tpu.ops.spectral import effective_fluence
from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.pipeline.api import simulate_dect
from dexct_tpu.pipeline.realism import (Stage, apply_chain, correct_chain,
                                        simulate_dect_realistic,
                                        stage_afterglow, stage_gains,
                                        stage_mtf, stage_pileup,
                                        stage_scatter)
from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom


def _system():
    ct = FanBeamGeometry(N_channels=384, N_proj=128,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=True)
    ph = contrast_rods_phantom(N=64, dx=0.35)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    return ct, ph, s1, s2


def _chain(ct, spec):
    air = float(np.sum(effective_fluence(spec, ct)))
    return [
        # moderate spot: a wide (>> clinical) spot's rect kernel has
        # spectral ZEROS — destroyed bands that no restoration recovers
        stage_mtf(focal_spot_kernel(ct, 0.45), nsr=1e-6),
        stage_scatter(air, scatter_kernel(ct.N_channels, sigma_ch=60.0),
                      spr=0.3),
        stage_pileup(0.2 / air),
        stage_gains(sample_channel_gains(3, ct.N_channels, sigma=0.01),
                    air),
        stage_afterglow([0.05, 0.02], decay_per_view([2.0, 20.0], 1.0)),
    ]


class TestChain:
    def test_roundtrip_counts(self):
        """apply then correct recovers the clean counts to percent
        level (each correction is model-matched here)."""
        ct, ph, s1, s2 = _system()
        stages = _chain(ct, s1)
        air = float(np.sum(effective_fluence(s1, ct)))
        # a REAL (channel-smooth) sinogram: white random data has full
        # spectral content at the blur kernel's near-zeros and is
        # unrecoverable by construction
        from dexct_tpu.pipeline.api import get_sino

        clean, _ = get_sino(ct, ph, s1)
        meas = apply_chain(clean, stages)
        # the chain visibly distorts
        assert float(jnp.abs(meas / clean - 1.0).max()) > 0.05
        back = correct_chain(meas, stages)
        rel = np.abs(np.asarray(back) / np.asarray(clean) - 1.0)
        assert np.median(rel) < 0.01, np.median(rel)

    def test_full_de_pipeline_with_all_artifacts(self):
        """All five artifacts at once: the corrected realistic DE
        pipeline tracks the clean pipeline's basis images; uncorrected
        it does not."""
        ct, ph, s1, s2 = _system()
        clean = simulate_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=15)
        ref = np.asarray(clean.mat_recons[0])

        def run(correct):
            res = simulate_dect_realistic(
                ct, ph, s1, s2, 64, 20.0, 0.8,
                _chain(ct, s1), _chain(ct, s2), n_iters=15,
                correct=correct)
            return np.asarray(res.mat_recons[0])

        e_corr = np.sqrt(np.mean((run(True) - ref) ** 2))
        e_raw = np.sqrt(np.mean((run(False) - ref) ** 2))
        assert e_corr < 0.3 * e_raw, (e_raw, e_corr)
        scale = np.sqrt(np.mean(ref ** 2))
        assert e_corr < 0.15 * scale, (e_corr, scale)

    def test_compound_noise_supported(self):
        ct, ph, s1, s2 = _system()
        res = simulate_dect_realistic(
            ct, ph, s1, s2, 64, 20.0, 0.8, _chain(ct, s1),
            _chain(ct, s2), n_iters=10, noise="compound",
            key=jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(res.mat_recons[0])).all()

    def test_chain_applies_to_cone_shapes(self):
        """The stages are shape-generic: [V, R, C] cone count streams
        roundtrip through gains/pileup/afterglow/mtf (+ 2-D scatter via
        row_kernel at the op level, test_scatter.py)."""
        from dexct_tpu.ops.afterglow import decay_per_view
        from dexct_tpu.pipeline.realism import (apply_chain,
                                                correct_chain,
                                                stage_afterglow,
                                                stage_gains,
                                                stage_pileup)

        air = 1e5
        rng = np.random.default_rng(0)
        clean = jnp.asarray(air * np.exp(-rng.uniform(
            0.5, 3.0, (32, 4, 48))))
        stages = [
            stage_pileup(0.1 / air),
            stage_gains(sample_channel_gains(1, 48, sigma=0.01), air),
            stage_afterglow([0.05], decay_per_view([3.0], 1.0)),
        ]
        meas = apply_chain(clean, stages)
        back = correct_chain(meas, stages)
        rel = np.abs(np.asarray(back) / np.asarray(clean) - 1.0)
        assert rel.max() < 5e-3, rel.max()


class TestBowtieUnderChain:
    def test_bowtie_with_gains_and_mtf(self):
        """Beam-shaping filtration under the artifact chain: per-channel
        air calibration (gains stage sees the bowtie'd air scan), the
        Wiener MTF restoration, and the thickness-grouped decomposition
        together recover the clean (no-bowtie) basis sinograms."""
        from dexct_tpu.ops.bowtie import (bowtie_fluence,
                                          design_flattening_bowtie)

        ct, ph, s1, s2 = _system()
        bt = design_flattening_bowtie(ct, 8.0, n_steps=8)
        clean = simulate_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=15,
                              do_recon=False)
        ref = np.asarray(clean.mat_sinos[0])

        def chain(spec):
            air_ch = jnp.asarray(
                bowtie_fluence(spec, ct, bt).sum(-1), jnp.float32)
            return [
                stage_mtf(focal_spot_kernel(ct, 0.45), nsr=1e-6),
                stage_gains(
                    sample_channel_gains(5, ct.N_channels, sigma=0.01),
                    air_ch),
            ]

        res = simulate_dect_realistic(
            ct, ph, s1, s2, 64, 20.0, 0.8,
            chain(s1), chain(s2), n_iters=15, do_recon=False, bowtie=bt)
        got = np.asarray(res.mat_sinos[0])
        inside = ref > 0.25 * ref.max()
        rel = np.abs(got - ref)[inside] / ref.max()
        assert np.median(rel) < 0.01, np.median(rel)
        assert rel.max() < 0.1, rel.max()


class TestPhysicsScatterStage:
    def test_roundtrip_and_mismatch(self):
        import jax.numpy as jnp
        from dexct_tpu.pipeline.realism import (apply_chain, correct_chain,
                                                stage_physics_scatter)

        rng = np.random.default_rng(0)
        primary = jnp.asarray(1e5 * (1 + rng.random((4, 32))))
        s = jnp.asarray(2e3 * (1 + rng.random((4, 32))))
        st = stage_physics_scatter(s, grid_s=0.5)
        meas = apply_chain(primary, [st])
        # f32 cancellation: primary ~1e5, scatter ~1e3
        np.testing.assert_allclose(np.asarray(meas - primary),
                                   0.5 * np.asarray(s), rtol=2e-2)
        corr = correct_chain(meas, [st])
        np.testing.assert_allclose(np.asarray(corr), np.asarray(primary),
                                   rtol=1e-4)
        # mismatched estimate leaves the residual
        st2 = stage_physics_scatter(s, estimate=0.5 * s)
        res = correct_chain(apply_chain(primary, [st2]), [st2])
        np.testing.assert_allclose(np.asarray(res - primary),
                                   0.5 * np.asarray(s), rtol=2e-2)
