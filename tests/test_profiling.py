"""Observability utilities + parallel-beam config-level run."""

import json

import jax.numpy as jnp
import numpy as np

from dexct_tpu.utils.profiling import (
    StageTimer,
    device_memory_stats,
    fence,
    rays_per_second,
    trace,
)


class TestProfiling:
    def test_stage_timer_accumulates(self):
        t = StageTimer()
        with t("a"):
            _ = sum(range(1000))
        with t("a"):
            pass
        with t("b"):
            pass
        assert t.records["a"].calls == 2
        assert t.records["b"].calls == 1
        lines = []
        total = t.report(printer=lines.append)
        assert total >= 0.0
        assert any("a" in ln for ln in lines)

    def test_fence_forces_values(self):
        x = jnp.arange(8.0) * 2.0
        out = fence({"x": x, "n": 3})
        np.testing.assert_allclose(np.asarray(out["x"]), np.arange(8.0) * 2)

    def test_rays_per_second(self):
        assert rays_per_second(1000, 800, 2.0) == 400000.0

    def test_trace_context_degrades_gracefully(self, tmp_path):
        with trace(str(tmp_path)) as d:
            _ = jnp.ones(4).sum()
        assert d == str(tmp_path)

    def test_memory_stats_shape(self):
        stats = device_memory_stats()
        assert isinstance(stats, dict) and len(stats) >= 1


class TestParallelBeamConfig:
    def test_runner_falls_back_for_parallel_geometry(self, tmp_path):
        import json as _json

        from dexct_tpu.pipeline.runner import run_config
        from dexct_tpu.system import water_cylinder_phantom
        from dexct_tpu.system.config import RunConfig
        from dexct_tpu.system.geometry import ParallelBeamGeometry

        ct = ParallelBeamGeometry(N_channels=64, N_proj=48,
                                  detector_width=20.0)
        ph = water_cylinder_phantom(N=48, dx=0.4)
        cfg = RunConfig("par_run", True, True, ct, ph, None, 48, 18.0, 0.8)
        res = run_config(
            cfg, out_dir=str(tmp_path), n_iters=8, verbose=False,
            spec_pairs=(("detunedMV", "80kV", 9.0, 1.0),),
            spectrum_dir=str(tmp_path / "none"),
        )
        assert len(res) == 1
        hu = np.asarray(res[0].dect.recon_HU[1])
        assert np.isfinite(hu).all()
        assert abs(hu[24, 24]) < 200.0  # water-ish center
