"""Bowtie beam-shaping filtration: design, forward model, decomposition."""

import numpy as np
import pytest

from dexct_tpu.ops.bowtie import (
    ALUMINUM,
    Bowtie,
    bowtie_fluence,
    decompose_sinograms_bowtie,
    design_flattening_bowtie,
)
from dexct_tpu.ops.matdecomp import decompose_sinograms
from dexct_tpu.ops.siddon import material_path_sinogram
from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.physics.materials import AIR, TISSUE, MaterialTable
from dexct_tpu.physics.spectrum import Spectrum
from dexct_tpu.pipeline.api import get_sino
from dexct_tpu.system import FanBeamGeometry, water_cylinder_phantom
from dexct_tpu.system.phantom import VoxelPhantom


def _geometry(nch=64, nproj=48):
    return FanBeamGeometry(N_channels=nch, N_proj=nproj, gamma_fan=0.5,
                           SID=40.0, SDD=70.0, eid=True)


def _tissue_cylinder(N=64, dx=0.2, radius=5.0):
    x = (np.arange(N) + 0.5 - N / 2.0) * dx
    rr = x[None, :] ** 2 + x[:, None] ** 2
    labels = (rr <= radius * radius).astype(np.uint8)
    return VoxelPhantom("tissue_cyl", labels, MaterialTable([AIR, TISSUE]),
                        dx, dx, dx)


class TestDesign:
    def test_profile_shape_and_symmetry(self):
        ct = _geometry()
        bt = design_flattening_bowtie(ct, 5.0, n_steps=16)
        t = bt.t_ch
        assert t.shape == (ct.N_channels,)
        assert t.min() == 0.0  # central channels unfiltered
        # symmetric profile, thickest at the fan edges
        np.testing.assert_allclose(t, t[::-1], atol=1e-9)
        assert t[0] == t.max() and t[-1] == t.max()
        levels, gidx = bt.groups()
        assert len(levels) <= 16 and gidx.shape == (ct.N_channels,)

    def test_transmission_physical(self):
        ct = _geometry()
        bt = design_flattening_bowtie(ct, 5.0)
        e = np.array([30.0, 60.0, 120.0])
        tr = bt.transmission(e)
        assert tr.shape == (ct.N_channels, 3)
        assert np.all(tr > 0.0) and np.all(tr <= 1.0)
        # hardening: low energies attenuated more at the thick channels
        assert tr[0, 0] < tr[0, 2]

    def test_flattens_detected_flux(self):
        """Monoenergetic at e_ref: counts through the cylinder are flat
        across channels (to phantom pixelation); without the bowtie the
        spread is the full cylinder attenuation."""
        ph = water_cylinder_phantom(N=96, dx=0.125, radius_cm=5.0)
        ct = _geometry(nch=96, nproj=8)
        spec = Spectrum(np.array([60.0]), np.array([1e8]), "mono60")
        bt = design_flattening_bowtie(ct, 5.0, e_ref=60.0, n_steps=0)
        raw_bt, _ = get_sino(ct, ph, spec, bowtie=bt)
        raw, _ = get_sino(ct, ph, spec)
        log_bt = -np.log(np.asarray(raw_bt[0]) / np.max(raw_bt[0]))
        log_pl = -np.log(np.asarray(raw[0]) / np.max(raw[0]))
        # unflattened spread ~ mu_w(60) * 10 cm ~ 2; flattened residual is
        # the voxelized-chord error (a few pixels worth of water)
        assert log_pl.max() > 1.5
        assert log_bt.max() < 0.25

    def test_quantization_steps(self):
        ct = _geometry()
        smooth = design_flattening_bowtie(ct, 5.0, n_steps=0)
        stepped = design_flattening_bowtie(ct, 5.0, n_steps=8)
        assert len(np.unique(stepped.t_ch)) <= 8
        # quantization error bounded by half a step
        step = smooth.t_ch.max() / 7
        assert np.max(np.abs(stepped.t_ch - smooth.t_ch)) <= 0.5 * step + 1e-12

    def test_single_step_rejected(self):
        """n_steps=1 used to divide by zero and emit an all-NaN profile
        that passed the >=0 validation (review finding)."""
        ct = _geometry()
        with pytest.raises(ValueError, match="n_steps"):
            design_flattening_bowtie(ct, 5.0, n_steps=1)


class TestForwardModel:
    def test_mono_log_sino_invariant(self):
        """Single-energy beam: the bowtie is a pure per-channel flux scale,
        so after per-channel air normalization the log sinogram is
        unchanged — pins the per-channel air-counts path exactly."""
        ph = water_cylinder_phantom(N=64, dx=0.2)
        ct = _geometry()
        spec = Spectrum(np.array([60.0]), np.array([1e8]), "mono60")
        bt = design_flattening_bowtie(ct, 4.0, n_steps=12)
        _, log_bt = get_sino(ct, ph, spec, bowtie=bt)
        _, log_pl = get_sino(ct, ph, spec)
        np.testing.assert_allclose(np.asarray(log_bt), np.asarray(log_pl),
                                   atol=2e-5)

    def test_poly_air_rays_normalize(self):
        """Air rays log to ~0 on every channel despite channel-dependent
        filtration."""
        ph = water_cylinder_phantom(N=64, dx=0.2, radius_cm=3.0)
        ct = _geometry()
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
        bt = design_flattening_bowtie(ct, 3.0, n_steps=12)
        _, slog = get_sino(ct, ph, spec, bowtie=bt)
        slog = np.asarray(slog)
        # edge channels miss the 3 cm cylinder entirely
        assert abs(slog[0, 0]) < 1e-3 and abs(slog[0, -1]) < 1e-3

    def test_fluence_table_shape(self):
        ct = _geometry()
        spec = kramers_spectrum(120.0)
        bt = design_flattening_bowtie(ct, 5.0)
        i0 = bowtie_fluence(spec, ct, bt)
        assert i0.shape == (ct.N_channels, spec.E.size)
        # the unfiltered center channel equals the plain fluence
        from dexct_tpu.ops.spectral import effective_fluence

        c0 = int(np.argmin(bt.t_ch))
        np.testing.assert_allclose(i0[c0], effective_fluence(spec, ct),
                                   rtol=1e-12)


class TestDecomposition:
    def _de_setup(self, bt_steps):
        ph = _tissue_cylinder(N=64, dx=0.2, radius=5.0)
        ct = _geometry(nch=64, nproj=24)
        s1 = kramers_spectrum(80.0)
        s2 = kramers_spectrum(140.0)
        for s, d in ((s1, 5.0), (s2, 5.0)):
            s.rescale_counts(ct.A_iso * d / ct.N_proj)
        bt = design_flattening_bowtie(ct, 5.0, n_steps=bt_steps)
        paths = material_path_sinogram(ph, ct)
        raw1, _ = get_sino(ct, ph, s1, paths=paths, bowtie=bt)
        raw2, _ = get_sino(ct, ph, s2, paths=paths, bowtie=bt)
        truth = np.asarray(paths[..., 1]) * TISSUE.density  # [g/cm^2]
        return ct, s1, s2, bt, raw1, raw2, truth

    def test_grouped_solve_beats_central_spectrum(self):
        """The thickness-grouped solve has zero spectral-model mismatch;
        solving with the central (unfiltered) tables biases the filtered
        channels."""
        ct, s1, s2, bt, raw1, raw2, truth = self._de_setup(bt_steps=8)
        mat1, _ = decompose_sinograms_bowtie(ct, raw1, raw2, s1, s2, bt)
        mat1_naive, _ = decompose_sinograms(ct, raw1, raw2, s1, s2)
        interior = truth > 2.0  # rays well inside the cylinder
        err = np.abs(np.asarray(mat1) - truth)[interior]
        err_naive = np.abs(np.asarray(mat1_naive) - truth)[interior]
        assert err.max() < 0.05, err.max()
        assert err_naive.max() > 4.0 * err.max()

    def test_zero_thickness_matches_plain_solver(self):
        """A t=0 bowtie must reproduce the standard decomposition —
        pins the group/pad/scatter machinery."""
        ct, s1, s2, _, _, _, _ = self._de_setup(bt_steps=8)
        ph = _tissue_cylinder(N=64, dx=0.2, radius=5.0)
        paths = material_path_sinogram(ph, ct)
        raw1, _ = get_sino(ct, ph, s1, paths=paths)
        raw2, _ = get_sino(ct, ph, s2, paths=paths)
        bt0 = Bowtie(ALUMINUM, np.zeros(ct.N_channels))
        m1b, m2b = decompose_sinograms_bowtie(ct, raw1, raw2, s1, s2, bt0)
        m1p, m2p = decompose_sinograms(ct, raw1, raw2, s1, s2)
        np.testing.assert_allclose(np.asarray(m1b), np.asarray(m1p),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(m2b), np.asarray(m2p),
                                   atol=1e-5)

    def test_many_groups_padding(self):
        """Unequal group sizes (fine quantization) exercise the padding
        path; results stay close to the coarse-group solve."""
        ct, s1, s2, _, _, _, _ = self._de_setup(bt_steps=8)
        ph = _tissue_cylinder(N=64, dx=0.2, radius=5.0)
        bt = design_flattening_bowtie(ct, 5.0, n_steps=21)
        paths = material_path_sinogram(ph, ct)
        raw1, _ = get_sino(ct, ph, s1, paths=paths, bowtie=bt)
        raw2, _ = get_sino(ct, ph, s2, paths=paths, bowtie=bt)
        mat1, _ = decompose_sinograms_bowtie(ct, raw1, raw2, s1, s2, bt)
        truth = np.asarray(paths[..., 1]) * TISSUE.density
        interior = truth > 2.0
        err = np.abs(np.asarray(mat1) - truth)[interior]
        assert err.max() < 0.05, err.max()


class TestBowtieBhc:
    def test_bowtie_water_bhc_restores_flat_zero_hu(self):
        """Polyenergetic water cylinder under a body bowtie: the plain
        (central-spectrum) water BHC leaves a channel-hardening HU bias;
        the per-thickness-group calibration removes it."""
        from dexct_tpu.ops.bhc import (fit_water_bhc, fit_water_bhc_bowtie,
                                       water_bhc_recon)
        from dexct_tpu.pipeline.api import get_sino

        ph = water_cylinder_phantom(N=96, dx=0.15, radius_cm=6.0)
        ct = _geometry(nch=96, nproj=96)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
        bt = design_flattening_bowtie(ct, 6.0, n_steps=12)
        _, slog = get_sino(ct, ph, spec, bowtie=bt)

        bhc_bt = fit_water_bhc_bowtie(spec, ct, bt)
        bhc_pl = fit_water_bhc(spec, ct)
        _, hu_bt = water_bhc_recon(slog, ct, spec, 96, 13.0, 0.9,
                                   water_bhc=bhc_bt)
        _, hu_pl = water_bhc_recon(slog, ct, spec, 96, 13.0, 0.9,
                                   water_bhc=bhc_pl)
        hu_bt, hu_pl = np.asarray(hu_bt), np.asarray(hu_pl)
        inner = slice(36, 60)
        assert abs(hu_bt[inner, inner].mean()) < 6.0, \
            hu_bt[inner, inner].mean()
        # the naive calibration is biased by the residual hardening
        assert abs(hu_pl[inner, inner].mean()) > \
            4.0 * abs(hu_bt[inner, inner].mean()) or \
            abs(hu_pl[inner, inner].mean()) > 25.0
        # and the corrected image is flat (no bowtie-induced cupping):
        # compare center vs an off-center water patch
        off = slice(18, 34)
        assert abs(hu_bt[off, off].mean() - hu_bt[inner, inner].mean()) \
            < 8.0
