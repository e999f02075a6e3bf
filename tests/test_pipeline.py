"""End-to-end pipeline tests: reference API surface, fused step, output
contract (SURVEY.md §3.1, §2.6)."""

import os

import jax
import numpy as np
import pytest

from dexct_tpu.analysis import make_vmi, nonair_mask, rmse
from dexct_tpu.analysis.register import register_phantom_to_recon
from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.pipeline import (
    get_basismat_sinos,
    get_recon,
    get_sino,
    simulate_dect,
)
from dexct_tpu.pipeline.fused import make_jitted_step, pack_dect
from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom, water_cylinder_phantom


@pytest.fixture(scope="module")
def small_de():
    """A small but complete DE setup (config-3/4 analog, BASELINE.json)."""
    ct = FanBeamGeometry(N_channels=128, N_proj=96, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, eid=True)
    ph = water_cylinder_phantom(N=96, dx=0.25)  # radius 9.6 cm
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    return ct, ph, s1, s2


class TestReferenceApi:
    def test_get_sino_shapes(self, small_de):
        ct, ph, s1, s2 = small_de
        raw, log = get_sino(ct, ph, s2)
        assert raw.shape == (96, 128) and log.shape == (96, 128)
        assert float(np.asarray(raw).min()) > 0.0

    def test_get_recon_shapes(self, small_de):
        ct, ph, s1, s2 = small_de
        _, log = get_sino(ct, ph, s2)
        recon_raw, recon_hu = get_recon(log, ct, s2, 96, 24.0, 0.8)
        assert recon_raw.shape == (96, 96)
        # water ~ 0 HU in the center for a polyenergetic scan, up to the
        # residual beam-hardening cupping of a lightly filtered 80 kV beam
        # through 19 cm of water (removed by the BHC stage)
        c = np.asarray(recon_hu)[44:52, 44:52].mean()
        assert abs(c) < 150.0

    def test_get_recon_filler_spectrum(self, small_de):
        ct, ph, s1, s2 = small_de
        _, log = get_sino(ct, ph, s2)
        raw, hu = get_recon(log, ct, None, 64, 24.0, 0.8)
        assert hu is None and raw.shape == (64, 64)

    def test_noise_seeded(self, small_de):
        ct, ph, s1, s2 = small_de
        k = jax.random.PRNGKey(0)
        r1, _ = get_sino(ct, ph, s2, noise="poisson", key=k)
        r2, _ = get_sino(ct, ph, s2, noise="poisson", key=k)
        r3, _ = get_sino(ct, ph, s2, noise="poisson",
                         key=jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        assert np.any(np.asarray(r1) != np.asarray(r3))


class TestDectEndToEnd:
    def test_basis_decomposition_water(self, small_de):
        """A pure-water object decomposes into ~water-equivalent tissue
        with small bone component; VMI at 60 keV ~ water HU."""
        ct, ph, s1, s2 = small_de
        res = simulate_dect(ct, ph, s1, s2, 96, 24.0, 0.8, n_iters=40)
        m1 = np.asarray(res.mat_recons[0])
        m2 = np.asarray(res.mat_recons[1])
        # center: basis densities reconstruct the cylinder; tissue-basis
        # dominates for water
        assert m1[44:52, 44:52].mean() > 0.5
        assert abs(m2[44:52, 44:52].mean()) < 0.35
        vmi = make_vmi(60.0, m1, m2)
        assert abs(vmi[44:52, 44:52].mean()) < 60.0  # ~water HU

    def test_vmi_matches_m_mono_oracle(self, small_de):
        """Noiseless DE scan: VMI(E0) vs M_mono(E0) (SURVEY.md §4 item 1)."""
        ct, ph, s1, s2 = small_de
        res = simulate_dect(ct, ph, s1, s2, 96, 24.0, 0.8, n_iters=40)
        vmi = make_vmi(80.0, np.asarray(res.mat_recons[0]),
                       np.asarray(res.mat_recons[1]))
        gt = register_phantom_to_recon(ph, 96, 24.0, energy_keV=80.0)
        mask = nonair_mask(gt)
        # erode the edge ring: compare interior only
        r = np.hypot(*np.mgrid[0:96, 0:96] - 47.5) * 24.0 / 96
        interior = (r < 7.0) & mask
        assert rmse(vmi, gt, interior) < 40.0


class TestFusedStep:
    def test_fused_matches_composed(self, small_de):
        """Single-jit fused step == composed api path."""
        ct, ph, s1, s2 = small_de
        arrays, meta = pack_dect(ct, ph, s1, s2, 64, 24.0, 0.8, n_iters=20)
        out = make_jitted_step(meta)(arrays)
        res = simulate_dect(ct, ph, s1, s2, 64, 24.0, 0.8, n_iters=20)
        # fused uses the band-prefix Siddon / packed BP fast paths; the
        # composed path uses the DDA + per-image BP — same math, different
        # float32 summation order
        np.testing.assert_allclose(
            np.asarray(out["sino_raw"][0]), np.asarray(res.sino_raw[0]),
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["mat_sinos"][0]), np.asarray(res.mat_sinos[0]),
            atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out["recon_raw"][0]), np.asarray(res.recon_raw[0]),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["mat_recons"][1]), np.asarray(res.mat_recons[1]),
            atol=1e-3,
        )


class TestFusedExactProjector:
    def test_siddon_dominant_matches_dda_in_fused(self, small_de):
        ct, ph, s1, s2 = small_de
        a1, m1 = pack_dect(ct, ph, s1, s2, 64, 24.0, 0.8, n_iters=15)
        a2, m2 = pack_dect(ct, ph, s1, s2, 64, 24.0, 0.8, n_iters=15,
                           projector="siddon_dominant")
        o1 = make_jitted_step(m1)(a1)
        o2 = make_jitted_step(m2)(a2)
        np.testing.assert_allclose(
            np.asarray(o1["sino_raw"][0]), np.asarray(o2["sino_raw"][0]),
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(o1["recon_HU"][1]), np.asarray(o2["recon_HU"][1]),
            atol=1.0,
        )

    def test_siddon_dominant_rejected_under_sharding(self, small_de):
        from dexct_tpu.parallel import shard_arrays, sharded_dect_step, view_mesh

        ct, ph, s1, s2 = small_de
        arrays, meta = pack_dect(ct, ph, s1, s2, 64, 24.0, 0.8, n_iters=5,
                                 projector="siddon_dominant")
        mesh = view_mesh(8)
        with pytest.raises(ValueError):
            sharded_dect_step(mesh, meta, arrays.keys())(
                shard_arrays(arrays, mesh))


class TestRunnerContract:
    def test_output_contract(self, small_de, tmp_path):
        """Files land exactly where plots.py expects them (SURVEY.md §2.6)."""
        from dexct_tpu.pipeline.runner import run_config
        from dexct_tpu.system.config import RunConfig

        ct, ph, s1, s2 = small_de
        cfg = RunConfig("t_run", True, True, ct, ph, None, 64, 24.0, 0.8)
        out = tmp_path / "output"
        results = run_config(
            cfg, out_dir=str(out),
            spec_pairs=(("detunedMV", "80kV", 9.0, 1.0),),
            spectrum_dir=str(tmp_path / "nonexistent"),  # force generators
            n_iters=10, verbose=False,
        )
        assert len(results) == 1
        base = out / "t_run"
        for sub, fname, shape in [
            ("detunedMV_9000uGy", "sino_raw_float32.bin", (96, 128)),
            ("detunedMV_9000uGy", "sino_log_float32.bin", (96, 128)),
            ("detunedMV_9000uGy", "recon_raw_float32.bin", (64, 64)),
            ("detunedMV_9000uGy", "recon_HU_float32.bin", (64, 64)),
            ("80kV_1000uGy", "sino_raw_float32.bin", (96, 128)),
            ("matdecomp_detunedMV_80kV_9000uGy_1000uGy",
             "mat1_sino_float32.bin", (96, 128)),
            ("matdecomp_detunedMV_80kV_9000uGy_1000uGy",
             "mat2_recon_float32.bin", (64, 64)),
        ]:
            f = base / sub / fname
            assert f.exists(), f
            arr = np.fromfile(f, np.float32)
            assert arr.size == shape[0] * shape[1], f

    def test_forward_only_config_skips_recon_files(self, small_de,
                                                   tmp_path):
        """do_back_projection=False writes sinograms only — the reference's
        stage gating (main.py:93-94, 132)."""
        from dexct_tpu.pipeline.runner import run_config
        from dexct_tpu.system.config import RunConfig

        ct, ph, s1, s2 = small_de
        cfg = RunConfig("t_fp", True, False, ct, ph, None, 64, 24.0, 0.8)
        run_config(cfg, out_dir=str(tmp_path / "o"), n_iters=5,
                   spec_pairs=(("detunedMV", "80kV", 9.0, 1.0),),
                   spectrum_dir=str(tmp_path / "none"), verbose=False)
        base = tmp_path / "o" / "t_fp" / "detunedMV_9000uGy"
        assert (base / "sino_raw_float32.bin").exists()
        assert not (base / "recon_raw_float32.bin").exists()

    def test_resume_skips_completed(self, small_de, tmp_path, capsys):
        from dexct_tpu.pipeline.runner import run_config
        from dexct_tpu.system.config import RunConfig

        ct, ph, s1, s2 = small_de
        cfg = RunConfig("t_res", True, True, ct, ph, None, 64, 24.0, 0.8)
        kw = dict(out_dir=str(tmp_path / "o"),
                  spec_pairs=(("detunedMV", "80kV", 9.0, 1.0),),
                  spectrum_dir=str(tmp_path / "none"), n_iters=5,
                  verbose=True)
        run_config(cfg, **kw)
        res2 = run_config(cfg, resume=True, **kw)
        assert res2 == []  # everything skipped
        assert "skipping completed" in capsys.readouterr().out

    def test_cli_pair_parsing(self):
        from dexct_tpu.run import parse_pairs

        assert parse_pairs(["detunedMV,80kV,9,1"]) == (
            ("detunedMV", "80kV", 9.0, 1.0),
        )


def test_cone_config_through_runner(tmp_path):
    """Round-3 L3 completion: a cone_beam config runs end-to-end through
    the CLI runner and persists the volume extension of the output
    contract ([V, R, C] sinograms, [nz, N, N] volumes, same filenames)."""
    import json

    import dexct_tpu.pipeline.runner as runner
    from dexct_tpu.system.phantom import VoxelPhantom

    ph = water_cylinder_phantom(N=48, dx=0.5)
    ph3 = VoxelPhantom("w3", np.broadcast_to(
        ph.labels[0], (16, 48, 48)).copy(), ph.materials, 0.5, 0.5, 0.5)
    ph3.to_file(str(tmp_path / "ph.bin"), str(tmp_path / "ph.csv"))
    params = {
        "RUN_ID": "vcone", "forward_project": True, "back_project": True,
        "phantom_type": "voxel", "phantom_id": "w3",
        "phantom_filename": str(tmp_path / "ph.bin"),
        "matcomp_filename": str(tmp_path / "ph.csv"),
        "Nx": 48, "Ny": 48, "Nz": 16, "dx": 0.5, "dy": 0.5, "dz": 0.5,
        "z_index": 0,
        "scanner_geometry": "cone_beam", "SID": 60.0, "SDD": 100.0,
        "N_channels": 64, "N_projections": 48, "N_rows": 8,
        "fan_angle_total": 0.8230337,
        "rotation_angle_total": 6.283185307,
        "detector_px_height": 0.5, "detector_mode": "eid",
        "detector_filename": "NA",
        "spectrum_id": "NA", "spectrum_filename": "NA",
        "N_photons_per_cm2_per_scan": "NA",
        "N_recon_matrix": 48, "FOV_recon": 20.0,
        "ramp_filter_percent_Nyquist": 0.8,
    }
    pf = tmp_path / "params.txt"
    pf.write_text(json.dumps(params))
    out = tmp_path / "out"
    runner.run_parameter_file(str(pf), out_dir=str(out), n_iters=8,
                              verbose=False)
    acq = out / "vcone" / "80kV_1000uGy"
    sino = np.fromfile(acq / "sino_raw_float32.bin", np.float32)
    assert sino.size == 48 * 8 * 64  # [V, R, C]
    vol = np.fromfile(acq / "recon_raw_float32.bin", np.float32)
    assert vol.size == 8 * 48 * 48  # [nz, N, N]
    center = vol.reshape(8, 48, 48)[4, 22:26, 22:26].mean()
    assert 0.18 < center < 0.28  # water at a soft 80 kV beam


def test_cone_forward_only_skips_recon(tmp_path):
    """back_project=False on a cone config must skip the FDK stage (the
    3-D pipeline's dominant cost) and write sinograms only."""
    from dexct_tpu.pipeline.cone import make_jitted_cone_step, pack_cone_dect
    from dexct_tpu.pipeline.runner import run_config
    from dexct_tpu.system.config import RunConfig
    from dexct_tpu.system.geometry import ConeBeamGeometry
    from dexct_tpu.system.phantom import VoxelPhantom

    ph = water_cylinder_phantom(N=48, dx=0.5)
    ph3 = VoxelPhantom("w3f", np.broadcast_to(
        ph.labels[0], (16, 48, 48)).copy(), ph.materials, 0.5, 0.5, 0.5)
    ct = ConeBeamGeometry(N_channels=64, N_proj=48, N_rows=8,
                          gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                          h_iso=0.5)
    cfg = RunConfig("t_cfp", True, False, ct, ph3, None, 48, 20.0, 0.8)
    run_config(cfg, out_dir=str(tmp_path / "o"), n_iters=5,
               spec_pairs=(("detunedMV", "80kV", 9.0, 1.0),),
               spectrum_dir=str(tmp_path / "none"), verbose=False)
    acq = tmp_path / "o" / "t_cfp" / "80kV_1000uGy"
    assert (acq / "sino_raw_float32.bin").exists()
    assert not (acq / "recon_raw_float32.bin").exists()
    # and the packed pipeline's jitted program itself returns no volumes
    from dexct_tpu.pipeline.runner import _resolve_spectrum, default_generators

    gens = default_generators()
    s1 = _resolve_spectrum("detunedMV", 9.0, ct, str(tmp_path / "none"),
                           gens)
    s2 = _resolve_spectrum("80kV", 1.0, ct, str(tmp_path / "none"), gens)
    arrays, meta = pack_cone_dect(ct, ph3, s1, s2, 48, 20.0, 0.8,
                                  n_iters=5, do_recon=False)
    out = make_jitted_cone_step(meta)(arrays)
    assert out["recon_raw"] == (None, None)
    assert out["sino_log"][0].shape == (48, 8, 64)


def test_helical_katsevich_through_runner(tmp_path):
    """recon3d='katsevich' routes a helical config through the exact
    Katsevich reconstructor; mismatched geometry/recon3d combinations
    fail fast with a clear error instead of producing a wrong volume."""
    import pytest as _pytest

    from dexct_tpu.pipeline.runner import run_config
    from dexct_tpu.system.config import RunConfig
    from dexct_tpu.system.geometry import (ConeBeamGeometry,
                                           HelicalConeBeamGeometry)
    from dexct_tpu.system.phantom import VoxelPhantom

    ph = water_cylinder_phantom(N=48, dx=0.5)
    ph3 = VoxelPhantom("wk3", np.broadcast_to(
        ph.labels[0], (16, 48, 48)).copy(), ph.materials, 0.5, 0.5, 0.5)
    ct = HelicalConeBeamGeometry(
        N_channels=64, N_proj=384, N_rows=16, gamma_fan=0.8230337,
        SID=60.0, SDD=100.0, h_iso=0.25, pitch=2.0,
        rotation_total=8.0 * np.pi)
    cfg = RunConfig("t_kat", True, True, ct, ph3, None, 48, 20.0, 0.8)
    run_config(cfg, out_dir=str(tmp_path / "o"), n_iters=5,
               spec_pairs=(("detunedMV", "80kV", 9.0, 1.0),),
               spectrum_dir=str(tmp_path / "none"), verbose=False,
               recon3d="katsevich")
    acq = tmp_path / "o" / "t_kat" / "80kV_1000uGy"
    vol = np.fromfile(acq / "recon_raw_float32.bin", np.float32)
    nz = vol.size // (48 * 48)
    assert nz >= 4 and vol.size == nz * 48 * 48
    center = vol.reshape(nz, 48, 48)[nz // 2, 22:26, 22:26].mean()
    assert 0.18 < center < 0.28  # water at a soft 80 kV beam

    # katsevich on a circular orbit: hard error, not a silent fallback
    ct0 = ConeBeamGeometry(N_channels=64, N_proj=48, N_rows=8,
                           gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                           h_iso=0.5)
    cfg0 = RunConfig("t_kat0", True, True, ct0, ph3, None, 48, 20.0, 0.8)
    with _pytest.raises(ValueError, match="helical config"):
        run_config(cfg0, out_dir=str(tmp_path / "o2"), n_iters=5,
                   spec_pairs=(("detunedMV", "80kV", 9.0, 1.0),),
                   spectrum_dir=str(tmp_path / "none"), verbose=False,
                   recon3d="katsevich")
    # circular FDK on a helical scan: equally wrong, equally fatal
    with _pytest.raises(ValueError, match="helical scan"):
        run_config(cfg, out_dir=str(tmp_path / "o3"), n_iters=5,
                   spec_pairs=(("detunedMV", "80kV", 9.0, 1.0),),
                   spectrum_dir=str(tmp_path / "none"), verbose=False,
                   recon3d="fdk")


def test_unknown_engine_raises_for_all_geometries(small_de, tmp_path):
    """engine validation happens before geometry dispatch — a typo'd
    engine string must raise even on cone configs."""
    import pytest as _pytest

    from dexct_tpu.pipeline.runner import run_config
    from dexct_tpu.system.config import RunConfig

    ct, ph, s1, s2 = small_de
    cfg = RunConfig("t_eng", True, True, ct, ph, None, 64, 24.0, 0.8)
    with _pytest.raises(ValueError, match="unknown engine"):
        run_config(cfg, out_dir=str(tmp_path / "o"), n_iters=5,
                   spec_pairs=(("detunedMV", "80kV", 9.0, 1.0),),
                   spectrum_dir=str(tmp_path / "none"), verbose=False,
                   engine="bogus")
