"""Compatibility-surface tests + photon-counting-detector pipeline."""

import numpy as np
import pytest


class TestCompatSurface:
    def test_reference_import_pattern(self):
        """The reference's import set resolves from dexct_tpu.compat
        (main.py:19-22, plots.py:16-18, matdecomp.py:12-17)."""
        from dexct_tpu.compat import (
            FanBeamGeometry,
            VoxelPhantom,
            density1,
            density2,
            get_basismat_sinos,
            get_recon,
            get_sino,
            mat1,
            mat2,
            matcomp1,
            matcomp2,
            mixatten,
            read_parameter_file,
            xRaySpectrum,
        )

        assert mat1 == "ICRU tissue" and mat2 == "ICRU bone"
        assert density1 == 1.06 and density2 == 1.92
        assert matcomp1.startswith("H(10.2)")
        assert matcomp2.startswith("H(3.4)")
        v = mixatten("H(11.2)O(88.8)", np.array([60.0]))
        assert abs(float(v[0]) - 0.2059) < 0.005

    def test_reference_mainloop_shape(self, tmp_path):
        """A condensed version of the reference main loop runs through the
        compat surface (SURVEY.md §3.1)."""
        from dexct_tpu.compat import get_basismat_sinos, get_recon, get_sino
        from dexct_tpu.physics import kramers_spectrum, linac_spectrum
        from dexct_tpu.system import FanBeamGeometry, water_cylinder_phantom

        ct = FanBeamGeometry(N_channels=64, N_proj=48, gamma_fan=0.8,
                             SID=60.0, SDD=100.0, eid=True)
        ph = water_cylinder_phantom(N=48, dx=0.4)
        dect_specs, dect_sinos = [], []
        for gen, dose in ((linac_spectrum, 9.0),
                          (lambda: kramers_spectrum(80.0), 1.0)):
            spec = gen()
            spec.rescale_counts(ct.A_iso * dose / ct.N_proj)
            sino_raw, sino_log = get_sino(ct, ph, spec)
            recon_raw, recon_HU = get_recon(sino_log, ct, spec, 48, 18.0,
                                            0.8)
            dect_specs.append(spec)
            dect_sinos.append(sino_raw)
        m1, m2 = get_basismat_sinos(ct, dect_sinos[0], dect_sinos[1],
                                    dect_specs[0], dect_specs[1],
                                    n_iters=20)
        r1, _ = get_recon(m1, ct, None, 48, 18.0, 0.8)
        assert np.asarray(r1).shape == (48, 48)
        # water object -> tissue-basis density ~ 1 g/cm3 at center
        assert 0.6 < np.asarray(r1)[22:26, 22:26].mean() < 1.3


class TestSolverCompat:
    def test_do_matdecomp_gn_shape_and_values(self):
        """Reference array-layout solver entries (matdecomp.py:130,87)."""
        import jax.numpy as jnp

        from dexct_tpu.compat import do_matdecomp_gn, optimize_sino_cpu
        from dexct_tpu.ops.matdecomp import prepare_decomposition
        from dexct_tpu.physics import kramers_spectrum, linac_spectrum
        from dexct_tpu.system import FanBeamGeometry

        ct = FanBeamGeometry(N_channels=16, N_proj=4, eid=True)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        ee, i0, mus = prepare_decomposition(ct, s1, s2)
        rng = np.random.default_rng(0)
        a_true = np.stack([rng.uniform(0, 20, 64),
                           rng.uniform(0, 5, 64)], -1)
        counts = (np.exp(-(a_true @ mus)) @ i0.T).T.reshape(2, 4, 16)
        out = do_matdecomp_gn(ct, counts[0], counts[1], s1, s2, 40)
        assert out.shape == (4, 16, 2)
        np.testing.assert_allclose(out.reshape(-1, 2), a_true, atol=1e-3)
        # the reference's channel-tiled i0 layout for the CPU solver
        i0_tiled = np.repeat(i0[:, None, :], 16, axis=1)
        out2 = optimize_sino_cpu(counts, ee, i0_tiled, mus, 40)
        np.testing.assert_allclose(out2.reshape(-1, 2), a_true,
                                   atol=1e-8)


class TestPhotonCountingPipeline:
    def test_pcd_end_to_end(self):
        """detector_mode='pcd': eta-only weighting, full DE pipeline."""
        from dexct_tpu.physics import kramers_spectrum
        from dexct_tpu.physics.detector import photon_counting_response
        from dexct_tpu.pipeline.fused import make_jitted_step, pack_dect
        from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom

        det = photon_counting_response()
        ct = FanBeamGeometry(N_channels=64, N_proj=64, gamma_fan=0.8,
                             SID=60.0, SDD=100.0, eid=False, detector=det)
        assert ct.eid is False
        # response must NOT be energy weighted
        r = ct.detector_response(np.array([50.0, 100.0]))
        assert np.all(r <= 1.0)
        ph = contrast_rods_phantom(N=64, dx=0.3)
        s1 = kramers_spectrum(140.0)
        s1.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
        arrays, meta = pack_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=15)
        out = make_jitted_step(meta)(arrays)
        hu = np.asarray(out["recon_HU"][1])
        assert np.isfinite(hu).all()
        # water body ~0 HU (PCD, 80 kV, with BH residual), air ~ -1000
        assert abs(hu[40, 32]) < 200.0
        assert hu[2, 2] < -900.0
