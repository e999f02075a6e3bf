"""Cone-beam geometric calibration (ops/geocal.py).

Pinned from the design run: du/dv recovered to <0.01 sample, pitch
scales to <6 % relative, and FDK with the calibrated geometry matches
the true-geometry recon 100x closer than the nominal one.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from dexct_tpu.ops import conebeam as cb
from dexct_tpu.ops.conebeam import cone_material_paths
from dexct_tpu.ops.geocal import (
    apply_calibration,
    bead_centroids,
    bead_phantom_3d,
    fit_cone_geometry,
    project_points,
)
from dexct_tpu.system.geometry import ConeBeamGeometry

TRUTH = {"du": 1.7, "dv": 0.8, "s_u": 0.012, "s_v": -0.015}


@pytest.fixture(scope="module")
def setup():
    nom = ConeBeamGeometry(N_channels=128, N_proj=64, N_rows=24,
                           gamma_fan=0.7, SID=60.0, SDD=100.0,
                           h_iso=0.25, eid=False)
    true = dataclasses.replace(
        nom, det_offset_ch=TRUTH["du"], det_offset_row=TRUTH["dv"],
        gamma_fan=nom.gamma_fan * (1 + TRUTH["s_u"]),
        h_iso=nom.h_iso * (1 + TRUTH["s_v"]))
    ph, pts = bead_phantom_3d(nom, n_beads=4, radius_vox=2.2, N=96,
                              nz=48, dx=0.3)
    paths = np.asarray(cone_material_paths(ph, true))[..., 1]
    return nom, true, ph, pts, paths


class TestProjectionModel:
    def test_anchors_to_voxel_projector(self, setup):
        """Analytic centroids match the traced bead shadows' intensity
        centroids sub-sample (voxelized beads limit this to ~0.5)."""
        nom, _, ph, pts, _ = setup
        paths0 = np.asarray(cone_material_paths(ph, nom))[..., 1]
        u, v, ok = bead_centroids(paths0, 4)
        um, vm = project_points(pts, nom)
        errs_u, errs_v = [], []
        for view in range(nom.N_proj):
            if not ok[view].all():
                continue
            errs_u.append(np.abs(np.sort(u[view]) - np.sort(um[view])))
            errs_v.append(np.abs(np.sort(v[view]) - np.sort(vm[view])))
        assert len(errs_u) > 10
        assert np.max(errs_u) < 0.7
        assert np.max(errs_v) < 0.8

    def test_twist_recovery_on_synthetic_centroids(self, setup):
        nom, _, _, pts, _ = setup
        u, v = project_points(pts, nom, du=0.4, eta=0.004)
        ok = np.ones(u.shape, bool)
        fit = fit_cone_geometry(u, v, ok, pts, nom)
        assert abs(fit["eta_rad"] - 0.004) < 2e-4
        assert abs(fit["du_ch"] - 0.4) < 1e-3
        assert fit["rms_residual"] < 1e-6


class TestRecovery:
    def test_parameters_from_traced_beads(self, setup):
        nom, _, _, pts, paths = setup
        u, v, ok = bead_centroids(paths, 4)
        assert ok.mean() > 0.25  # enough clean views
        fit = fit_cone_geometry(u, v, ok, pts, nom)
        # measured: 1.698 / 0.809 / 0.0119 / -0.0142 / -2e-4
        assert abs(fit["du_ch"] - TRUTH["du"]) < 0.05
        assert abs(fit["dv_row"] - TRUTH["dv"]) < 0.05
        assert abs(fit["s_u"] - TRUTH["s_u"]) < 0.002
        assert abs(fit["s_v"] - TRUTH["s_v"]) < 0.002
        assert abs(fit["eta_rad"]) < 0.002
        assert fit["rms_residual"] < 0.3

    def test_aligned_fit_is_null(self, setup):
        nom, _, ph, pts, _ = setup
        paths0 = np.asarray(cone_material_paths(ph, nom))[..., 1]
        u, v, ok = bead_centroids(paths0, 4)
        fit = fit_cone_geometry(u, v, ok, pts, nom)
        assert abs(fit["du_ch"]) < 0.05
        assert abs(fit["dv_row"]) < 0.05
        assert abs(fit["s_u"]) < 0.002
        # s_v has a measured ~0.013 row-phase quantization floor
        # (module docstring); everything else nulls far tighter
        assert abs(fit["s_v"]) < 0.02


class TestReconCorrection:
    def test_calibrated_fdk_matches_true_geometry(self, setup):
        nom, true, _, pts, paths = setup
        u, v, ok = bead_centroids(paths, 4)
        fit = fit_cone_geometry(u, v, ok, pts, nom)
        cal = apply_calibration(nom, fit)
        sino = jnp.asarray(paths * 0.3)
        n, fov, nz_out = 96, 96 * 0.3, 24
        vols = {}
        for name, g in (("nom", nom), ("cal", cal), ("true", true)):
            vols[name] = np.asarray(
                cb.fdk_reconstruct(sino, g, n, fov, 0.8, nz_out=nz_out))
        e_nom = np.sqrt(((vols["nom"] - vols["true"]) ** 2).mean())
        e_cal = np.sqrt(((vols["cal"] - vols["true"]) ** 2).mean())
        assert e_nom > 20.0 * e_cal  # measured 100x
        # bead peak restored (blur from misalignment removed)
        assert vols["cal"].max() > 0.99 * vols["true"].max()
