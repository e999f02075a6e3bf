"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via JAX's forced host
platform device count (SURVEY.md §4 item 5).  Note: this environment's TPU
plugin prepends itself to JAX_PLATFORMS, so the env var alone does not force
CPU — we also override the config before any backend initializes.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: DISABLED by default.  XLA compiles of the
# fused pipelines dominate suite wall-clock and a persistent cache
# halves repeat runs — but on this environment the XLA:CPU AOT
# serializer is UNRELIABLE late in a long session: three full-suite
# runs segfaulted/aborted inside compilation_cache
# put/get_executable_and_time (executable.serialize() or its
# deserialization), each after ~300+ tests, at DIFFERENT tests, on a
# cold cache, with single-process access enforced by flock, while the
# same tests pass in isolation with the same cache — i.e. the fault
# needs accumulated in-process compile state and cannot be scoped per
# entry.  (Cross-host staleness is a second, independent hazard: the
# VM migrates between heterogeneous hosts and foreign AOT entries
# SIGILL at load.)  With no cache, put/get are never called and the
# whole crash class is gone; the suite compiles cold (~25 min single
# core).  Developers iterating on one module can still opt in:
#
#   JAX_COMPILATION_CACHE_DIR=/tmp/myjaxcache python -m pytest tests/test_x.py
#
# — safe for short runs; do NOT enable it for the full suite.
if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", "tests must run on CPU"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"


# Release compiled executables between test MODULES.  Full-suite runs
# segfaulted at ~80-85% inside plain XLA:CPU compilation (and, when the
# persistent cache was on, inside its serialize/deserialize wrappers) —
# never at the same test, never in isolation, RAM free: the signature
# of accumulated loaded-executable state (hundreds of live AOT code
# objects in one process) breaking the compiler/loader late in the
# session.  Dropping the jit caches per module keeps the live count
# bounded by one module's compiles; cross-module recompiles of shared
# helpers cost a few % of wall-clock.
_LAST_MODULE = [None]


def pytest_runtest_setup(item):
    mod = item.module.__name__
    if _LAST_MODULE[0] is not None and _LAST_MODULE[0] != mod:
        jax.clear_caches()
    _LAST_MODULE[0] = mod


# ---------------------------------------------------------------------------
# Quick tier: `pytest -m quick` — one (occasionally two) representative
# tests per subsystem at small shapes, < 6 min cold on this machine.
# The full suite (~31 min cold) remains the commit gate; the quick tier
# is the inner-loop sanity check (VERDICT r3 item 7).  Keep this list
# one-per-module: when a module is added, add its cheapest
# core-property test here.
# ---------------------------------------------------------------------------

QUICK = {
    "test_acquisition_modes.py::TestDualLayer::test_counts_conserved",
    "test_afterglow.py::TestInversion::test_roundtrip_exact[False]",
    "test_analysis.py::TestVmi::test_pure_basis_recovers_hu",
    "test_analytic.py::TestClosedForm::test_circle_chords_exact",
    "test_aperture.py::TestAperture::test_single_subray_matches_standard",
    "test_bhc.py::TestWaterBhc::test_removes_cupping",
    "test_bowtie.py::TestDesign::test_flattens_detected_flux",
    "test_calibration.py::TestDetOffset::test_offset_shifts_gammas",
    "test_compat_pcd.py::TestCompatSurface::test_reference_import_pattern",
    "test_conebeam.py::TestTracePaths3D::test_in_plane_rays_match_2d",
    "test_denoise.py::TestInvariant::test_low_noise_component_exact",
    "test_dose.py::TestAnalyticAnchors::test_air_iso_inverse_square",
    "test_empirical.py::TestWedgeInversion::test_air_maps_to_exactly_zero",
    "test_fast_ops.py::TestDominantAxisSiddon::test_matches_float64_oracle",
    "test_fbp.py::TestFilters::test_ramp_kernel_structure",
    "test_fbp.py::TestReconstruction::test_water_cylinder_recovers_mu",
    "test_ffs.py::TestFfsGeometry::test_rays_hit_fixed_detector_cells",
    "test_flatpanel.py::TestGeometry::test_rays_hit_panel_elements_exactly",
    "test_formfactor.py::TestSumRules::test_f0_equals_z_all_tabulated",
    "test_fourier.py::TestRadonAccuracy::test_cylinder_chord",
    "test_gated.py::TestGated::test_all_ones_matches_single_turn_fbp",
    "test_geocal.py::TestProjectionModel::test_anchors_to_voxel_projector",
    "test_halo.py::TestPlan::test_perm_is_permutation",
    "test_heel.py::TestHeelModel::test_zero_depth_matches_heel_free",
    "test_iterative.py::TestAdjointness::test_inner_product_identity",
    "test_katsevich.py::TestKatsevich::test_pitch_zero_raises",
    "test_learn.py::test_identity_at_initialization",
    "test_lowdose.py::TestPoissonThinning::test_f_one_identity",
    "test_mar.py::TestInterpolate::test_interior_bridge",
    "test_matdecomp.py::TestRecovery::test_float64_oracle_exact_recovery",
    "test_motion.py::TestSimulation::test_constant_rotation_is_view_roll",
    "test_mtf.py::TestKernels::test_blur_conserves_flat_field",
    "test_multibin.py::TestPcdBins::test_bins_partition_fluence",
    "test_native.py::TestNative::test_builds_and_reports_threads",
    "test_nist_data.py::TestAnchors::test_anchor_spot_values",
    "test_noisemap.py::TestLogVariance::test_poisson_default",
    "test_nps.py::TestNps::test_white_noise_flat_and_parseval",
    "test_onestep.py::TestForwardModel::test_matches_pipeline_counts",
    "test_parallel.py::TestShardedPipeline::test_sharded_equals_single_device",
    "test_parallel_iterative.py::TestSharded2D::test_cg_matches_single_device",
    "test_parallel_recon.py::TestRebin::test_rebinned_profile_matches_chord",
    "test_pcd_response.py::TestResponseMatrix::test_columns_stochastic",
    "test_physics_models.py::TestSpectrum::test_file_roundtrip",
    "test_pileup.py::TestDeadTime::test_nonparalyzable_inversion_exact",
    "test_pipeline.py::TestReferenceApi::test_get_sino_shapes",
    "test_pipeline.py::TestRunnerContract::test_output_contract",
    "test_products.py::TestProducts::test_electron_density_water_unity",
    "test_profiling.py::TestProfiling::test_fence_forces_values",
    "test_qa.py::TestQaReport::test_ct_number_linearity",
    "test_realism_chain.py::TestChain::test_roundtrip_counts",
    "test_reference_inputs.py::test_shipped_pcd_detector_loads",
    "test_rings.py::TestAirCalibration::test_recovers_gains",
    "test_robustness.py::TestTopLevelNamespace::test_system_surface",
    "test_scatter.py::TestScatter::test_kernel_normalized",
    "test_scatter_physics.py::TestCrossSections::test_kn_integrates_to_total",
    "test_siddon.py::TestHandComputed::test_axis_aligned_ray",
    "test_spectral.py::TestForwardModel::test_air_ray_zero_log",
    "test_spectralct.py::TestSpectralPipeline::test_eid_geometry_rejected",
    "test_spectrum_calibration.py::TestEmEstimation::test_validation_errors",
    "test_sweep.py::TestDoseSweep::test_bad_grid_size_rejected",
    "test_system.py::TestFanBeamGeometry::test_a_iso",
    "test_system.py::TestConfig::test_reference_params_file_geometry",
    "test_tcm.py::TestTcm::test_profile_follows_attenuation",
    "test_truncation.py::TestTruncation::test_severity_flags_truncation",
    "test_xcom.py::TestWaterAnchors::test_water_matches_nist_grid",
    "test_xcom.py::TestFullPeriodicTable::test_every_element_resolves_from_tables",
    "test_learn.py::TestDenoiserProduct::test_checkpoint_round_trip",
    "test_dose.py::TestRound5DoseLevers::test_vox_tap_fold_bit_identical",
    "test_halo.py::TestPlan::test_sym8_orbit_tables_cover_grid[4]",
    "test_parallel_iterative.py::TestShardedKatsevich::test_indivisible_rejected",
    "test_zstack.py::test_stack_phantom_varies_slices",
}

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("/")[-1]  # tests/<file>::... -> <file>::...
        if rel in QUICK:
            item.add_marker(pytest.mark.quick)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: ~5-min one-test-per-subsystem inner-loop tier")
