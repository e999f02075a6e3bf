"""One-call spectral PCD pipeline (pipeline/spectralct.py): basis
density recovery, VMI synthesis, pileup bias + correction at the
pipeline level, and noise smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.physics import kramers_spectrum, xcom
from dexct_tpu.physics.detector import photon_counting_response
from dexct_tpu.physics.materials import BONE, WATER
from dexct_tpu.pipeline.spectralct import simulate_pcd_spectral
from dexct_tpu.system import FanBeamGeometry, water_cylinder_phantom

THRESH = [20.0, 34.0, 50.0, 70.0]


def _system():
    ct = FanBeamGeometry(N_channels=96, N_proj=96, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, eid=False,
                         detector=photon_counting_response())
    ph = water_cylinder_phantom(N=64, dx=0.3)
    s = kramers_spectrum(140.0)
    s.rescale_counts(ct.A_iso * 10.0 / ct.N_proj)
    return ct, ph, s


class TestSpectralPipeline:
    @pytest.fixture(scope="class")
    def clean(self):
        ct, ph, s = _system()
        return ct, ph, s, simulate_pcd_spectral(
            ct, ph, s, THRESH, (WATER, BONE), 64, 19.2)

    def test_water_density_recovered(self, clean):
        ct, ph, s, res = clean
        water = np.asarray(res.basis_recons[0])
        bone = np.asarray(res.basis_recons[1])
        assert abs(water[28:36, 28:36].mean() - 1.0) < 0.02
        assert abs(bone[28:36, 28:36].mean()) < 0.02
        assert abs(water[2:6, 2:6].mean()) < 0.02  # air

    def test_vmi_matches_water_mu(self, clean):
        ct, ph, s, res = clean
        vmi = np.asarray(res.vmi(70.0))
        mu_w = float(xcom.mixatten(WATER.matcomp, np.array([70.0]))[0])
        assert abs(vmi[28:36, 28:36].mean() - mu_w) / mu_w < 0.02

    def test_eid_geometry_rejected(self):
        ct, ph, s = _system()
        import dataclasses

        ct_eid = dataclasses.replace(ct, eid=True)
        with pytest.raises(ValueError):
            simulate_pcd_spectral(ct_eid, ph, s, THRESH, (WATER, BONE),
                                  64, 19.2)

    def test_pileup_bias_removed(self, clean):
        """Uncorrected pileup biases the basis densities where the ray
        rates are highest — the object RIM (thin paths), a capping
        artifact (measured rim +0.018 g/cm^3, peak 0.1 at air-rho 0.5);
        the in-pipeline correction removes it to float precision."""
        ct, ph, s, res0 = clean
        ref = np.asarray(res0.basis_recons[0])
        air = float(np.asarray(res0.counts).sum(0).max())
        tau = 0.5 / air  # air rays at rho = 0.5
        biased = simulate_pcd_spectral(
            ct, ph, s, THRESH, (WATER, BONE), 64, 19.2,
            pileup_tau=tau, correct_pileup=False)
        fixed = simulate_pcd_spectral(
            ct, ph, s, THRESH, (WATER, BONE), 64, 19.2, pileup_tau=tau)
        yy, xx = np.mgrid[0:64, 0:64]
        rim = (np.hypot(yy - 31.5, xx - 31.5) > 20) \
            & (np.hypot(yy - 31.5, xx - 31.5) < 25)
        db = np.asarray(biased.basis_recons[0]) - ref
        df = np.asarray(fixed.basis_recons[0]) - ref
        assert db[rim].mean() > 0.01, db[rim].mean()  # real artifact
        assert np.abs(db).max() > 0.05
        assert abs(df[rim].mean()) < db[rim].mean() / 10.0
        assert np.abs(df).max() < 0.005, np.abs(df).max()

    def test_noise_smoke(self, clean):
        ct, ph, s, _ = clean
        res = simulate_pcd_spectral(
            ct, ph, s, THRESH, (WATER, BONE), 64, 19.2,
            noise="poisson", key=jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(res.basis_recons)).all()
        assert abs(np.asarray(res.basis_recons[0])[28:36, 28:36].mean()
                   - 1.0) < 0.1

    def test_realistic_response_still_recovers(self, clean):
        """A consistent spectral-response model (charge sharing +
        electronic noise) degrades conditioning, not accuracy."""
        from dexct_tpu.physics.pcd_response import pcd_response_matrix

        ct, ph, s, _ = clean
        r = pcd_response_matrix(s.E, sigma_e_keV=3.0, share_frac=0.15)
        res = simulate_pcd_spectral(ct, ph, s, THRESH, (WATER, BONE),
                                    64, 19.2, response=r)
        water = np.asarray(res.basis_recons[0])
        assert abs(water[28:36, 28:36].mean() - 1.0) < 0.03


class TestSpectralCone:
    def test_cone_basis_volumes(self):
        """3-D spectral PCD: a bone sphere in a water cylinder
        decomposes into basis VOLUMES with correct densities; the VMI
        volume matches water mu in the water region."""
        from dexct_tpu.physics.materials import AIR, MaterialTable
        from dexct_tpu.pipeline.spectralct import \
            simulate_pcd_spectral_cone
        from dexct_tpu.system import ConeBeamGeometry
        from dexct_tpu.system.phantom import (VoxelPhantom, _ellipse_mask,
                                              water_cylinder_phantom)

        N, NZ, dxp = 48, 8, 0.4
        lab3 = np.broadcast_to(
            water_cylinder_phantom(N=N, dx=dxp).labels[0],
            (NZ, N, N)).copy()
        cz = (np.arange(NZ) + 0.5 - NZ / 2) * dxp
        cy = (np.arange(N) + 0.5 - N / 2) * dxp
        Z, Y, X = np.meshgrid(cz, cy, cy, indexing="ij")
        lab3[(X ** 2 + (Y - 2.0) ** 2 + Z ** 2) < 2.0] = 2
        ph = VoxelPhantom("wb3", lab3,
                          MaterialTable([AIR, WATER, BONE]), dxp, dxp,
                          dxp)
        ct = ConeBeamGeometry(N_channels=64, N_proj=96, N_rows=8,
                              gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                              h_iso=0.4, eid=False,
                              detector=photon_counting_response())
        s = kramers_spectrum(140.0)
        s.rescale_counts(ct.A_iso * 10.0 / ct.N_proj)
        res = simulate_pcd_spectral_cone(ct, ph, s, THRESH,
                                         (WATER, BONE), N, N * dxp,
                                         n_iters=30)
        assert res.basis_recons.shape == (2, 8, N, N)
        water = np.asarray(res.basis_recons[0])
        bone = np.asarray(res.basis_recons[1])
        # central-slice water region (away from the sphere)
        sl = water[4]
        assert abs(sl[20:28, 12:20].mean() - 1.0) < 0.04
        # sphere (iy 26-31, ix 21-26 at slice 4) carries bone density
        assert bone[4, 26:32, 21:27].max() > 1.5
        vmi = np.asarray(res.vmi(70.0))
        mu_w = float(xcom.mixatten(WATER.matcomp, np.array([70.0]))[0])
        assert abs(vmi[4, 20:28, 12:20].mean() - mu_w) / mu_w < 0.04


class TestFusedPcd:
    """Round-3 pack-once fused PCD pipeline (pack_pcd_spectral +
    pcd_step): one jitted program on the production kernels, vs the
    stateless simulate_pcd_spectral."""

    @staticmethod
    def _inputs():
        from dexct_tpu.ops import spectral as sp_ops
        from dexct_tpu.physics.materials import TISSUE
        from dexct_tpu.system.phantom import contrast_rods_phantom

        ct = FanBeamGeometry(N_channels=96, N_proj=96,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=False)
        ph = contrast_rods_phantom(N=96, dx=0.4)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(
            2e4 / float(np.sum(sp_ops.effective_fluence(spec, ct))))
        return ct, ph, spec, [20.0, 34.0, 50.0, 70.0], [TISSUE, BONE]

    def test_matches_stateless_same_kernels(self):
        # identical projector/recon: float-rounding-level agreement,
        # with pileup distortion + inversion in the chain
        from dexct_tpu.pipeline.spectralct import (make_jitted_pcd_step,
                                                   pack_pcd_spectral)

        ct, ph, spec, thr, basis = self._inputs()
        ref = simulate_pcd_spectral(ct, ph, spec, thr, basis, 96, 30.0,
                                    0.8, n_iters=10, pileup_tau=1e-5)
        a, m = pack_pcd_spectral(ct, ph, spec, thr, basis, 96, 30.0,
                                 0.8, n_iters=10, pileup_tau=1e-5,
                                 projector="siddon", recon="fan")
        out = make_jitted_pcd_step(m)(a)
        cs = float(np.abs(np.asarray(ref.counts)).max())
        assert np.abs(np.asarray(out["counts"])
                      - np.asarray(ref.counts)).max() < 1e-4 * cs
        assert np.abs(np.asarray(out["basis_sinos"])
                      - np.asarray(ref.basis_sinos)).max() < 5e-3
        assert np.abs(np.asarray(out["basis_recons"])
                      - np.asarray(ref.basis_recons)).max() < 1e-3

    def test_production_kernels_interior_agreement(self):
        # dominant-axis trace + rebinned symmetry-packed parallel BP:
        # sinogram-domain quantities match tightly; recons differ only
        # by the documented fan-vs-rebinned edge response (interior
        # values agree)
        from dexct_tpu.pipeline.spectralct import (make_jitted_pcd_step,
                                                   pack_pcd_spectral)

        ct, ph, spec, thr, basis = self._inputs()
        ref = simulate_pcd_spectral(ct, ph, spec, thr, basis, 96, 30.0,
                                    0.8, n_iters=10)
        a, m = pack_pcd_spectral(ct, ph, spec, thr, basis, 96, 30.0,
                                 0.8, n_iters=10,
                                 projector="siddon_dominant",
                                 recon="parallel")
        out = make_jitted_pcd_step(m)(a)
        assert np.abs(np.asarray(out["basis_sinos"])
                      - np.asarray(ref.basis_sinos)).max() < 1e-3
        A = np.asarray(out["basis_recons"])
        B = np.asarray(ref.basis_recons)
        # water-region basis densities (tissue ~1, bone ~0)
        assert abs(A[0][44:52, 44:52].mean() - 1.0) < 0.05
        assert abs(A[0][44:52, 44:52].mean()
                   - B[0][44:52, 44:52].mean()) < 5e-3
        yy, xx = np.meshgrid(*[np.arange(96) - 47.5] * 2, indexing="ij")
        inter = np.hypot(yy, xx) * (30.0 / 96) < 12.0
        d = (A - B)[:, inter]
        assert np.sqrt((d ** 2).mean()) < 0.05

    def test_noise_path_runs_and_rails_bounded(self):
        from dexct_tpu.pipeline.spectralct import (make_jitted_pcd_step,
                                                   pack_pcd_spectral)

        ct, ph, spec, thr, basis = self._inputs()
        a, m = pack_pcd_spectral(ct, ph, spec, thr, basis, 96, 30.0,
                                 0.8, n_iters=10, noise="poisson",
                                 seed=3, projector="siddon",
                                 recon="fan", a_bounds=(-20.0, 60.0))
        out = make_jitted_pcd_step(m)(a)
        s = np.asarray(out["basis_sinos"])
        assert np.isfinite(s).all()
        assert s.max() <= 60.0 + 1e-3  # physical a_bounds honored
        # noise actually sampled: counts differ from the noiseless run
        a0, m0 = pack_pcd_spectral(ct, ph, spec, thr, basis, 96, 30.0,
                                   0.8, n_iters=10, projector="siddon",
                                   recon="fan")
        out0 = make_jitted_pcd_step(m0)(a0)
        assert np.abs(np.asarray(out["counts"])
                      - np.asarray(out0["counts"])).max() > 1.0

    def test_eid_rejected(self):
        from dexct_tpu.pipeline.spectralct import pack_pcd_spectral

        ct, ph, spec, thr, basis = self._inputs()
        import dataclasses

        ct_eid = dataclasses.replace(ct, eid=True)
        with pytest.raises(ValueError, match="eid"):
            pack_pcd_spectral(ct_eid, ph, spec, thr, basis, 96, 30.0)


class TestFusedPcdCone:
    """Round-3 fused cone PCD (pack_pcd_spectral_cone + pcd_cone_step):
    circular and helical orbits, vs the stateless cone pipeline."""

    @staticmethod
    def _inputs(helical=False):
        import dataclasses

        from dexct_tpu.ops import spectral as sp_ops
        from dexct_tpu.physics.materials import TISSUE
        from dexct_tpu.system import (ConeBeamGeometry,
                                      HelicalConeBeamGeometry)
        from dexct_tpu.system.phantom import contrast_rods_phantom

        if helical:
            ct = HelicalConeBeamGeometry(
                N_channels=64, N_proj=96, N_rows=8,
                gamma_fan=0.8230337, SID=60.0, SDD=100.0, h_iso=0.5,
                eid=False, rotation_total=4 * np.pi, pitch=2.0)
        else:
            ct = ConeBeamGeometry(
                N_channels=64, N_proj=96, N_rows=8,
                gamma_fan=0.8230337, SID=60.0, SDD=100.0, h_iso=0.5,
                eid=False)
        ph2 = contrast_rods_phantom(N=64, dx=0.5)
        ph3 = dataclasses.replace(
            ph2, labels=np.broadcast_to(ph2.labels[0],
                                        (8, 64, 64)).copy(), dz=0.5)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(
            2e4 / float(np.sum(sp_ops.effective_fluence(spec, ct))))
        return ct, ph3, spec, [20.0, 34.0, 50.0, 70.0], [TISSUE, BONE]

    def test_circular_matches_stateless(self):
        from dexct_tpu.pipeline.spectralct import (
            make_jitted_pcd_cone_step,
            pack_pcd_spectral_cone,
            simulate_pcd_spectral_cone,
        )

        ct, ph3, spec, thr, basis = self._inputs()
        ref = simulate_pcd_spectral_cone(ct, ph3, spec, thr, basis, 64,
                                         24.0, 0.8, n_iters=10,
                                         pileup_tau=1e-5)
        a, m = pack_pcd_spectral_cone(ct, ph3, spec, thr, basis, 64,
                                      24.0, 0.8, n_iters=10,
                                      pileup_tau=1e-5)
        out = make_jitted_pcd_cone_step(m)(a)
        cs = float(np.abs(np.asarray(ref.counts)).max())
        assert np.abs(np.asarray(out["counts"])
                      - np.asarray(ref.counts)).max() < 1e-4 * cs
        assert np.abs(np.asarray(out["basis_sinos"])
                      - np.asarray(ref.basis_sinos)).max() < 5e-3
        # both paths run fdk kernels (packed vs plain): tight agreement
        assert np.abs(np.asarray(out["basis_recons"])
                      - np.asarray(ref.basis_recons)).max() < 5e-3

    def test_helical_basis_volumes(self):
        # helical orbit: the recon stage runs the multi-volume gFDK;
        # water region reads the tissue basis density
        from dexct_tpu.pipeline.spectralct import (
            make_jitted_pcd_cone_step,
            pack_pcd_spectral_cone,
        )

        ct, ph3, spec, thr, basis = self._inputs(helical=True)
        a, m = pack_pcd_spectral_cone(ct, ph3, spec, thr, basis, 64,
                                      24.0, 0.8, n_iters=10)
        out = make_jitted_pcd_cone_step(m)(a)
        r = np.asarray(out["basis_recons"])
        assert r.shape[0] == 2 and r.shape[2:] == (64, 64)
        mid = r.shape[1] // 2
        assert abs(r[0][mid, 28:36, 28:36].mean() - 1.0) < 0.08
        assert abs(r[1][mid, 28:36, 28:36].mean()) < 0.05  # no bone
        assert np.isfinite(r).all()

    def test_sharded_cone_pcd_matches_single_device(self):
        # views and views x zslab meshes reproduce the single-device
        # fused cone PCD (helical orbit; pmax + the recon-stage
        # reduction are the only collectives)
        import jax
        from jax.sharding import Mesh

        from dexct_tpu.pipeline.spectralct import (
            make_jitted_pcd_cone_step,
            make_sharded_pcd_cone_step,
            pack_pcd_spectral_cone,
            pack_pcd_spectral_cone_sharded,
        )

        ct, ph3, spec, thr, basis = self._inputs(helical=True)
        import dataclasses

        ct = dataclasses.replace(ct, rotation_total=2 * np.pi,
                                 pitch=3.0)
        ph3 = dataclasses.replace(
            ph3, labels=np.broadcast_to(ph3.labels[0],
                                        (16, 64, 64)).copy())
        a0, m0 = pack_pcd_spectral_cone(ct, ph3, spec, thr, basis, 48,
                                        24.0, 0.8, n_iters=10)
        ref = make_jitted_pcd_cone_step(m0)(a0)

        mesh = Mesh(np.array(jax.devices()[:4]), ("views",))
        sa, sm, perm = pack_pcd_spectral_cone_sharded(
            ct, ph3, spec, thr, basis, 48, 24.0, 0.8, n_devices=4,
            n_iters=10)
        out = make_sharded_pcd_cone_step(mesh, sm, tuple(sa))(sa)
        np.testing.assert_allclose(
            np.asarray(out["basis_recons"]),
            np.asarray(ref["basis_recons"]), atol=1e-5)
        nat = np.asarray(out["basis_sinos"])[:, np.argsort(perm)]
        np.testing.assert_allclose(
            nat, np.asarray(ref["basis_sinos"]), atol=1e-4)

        if m0.base.nz_out % 2 == 0:
            mesh2 = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                         ("views", "zslab"))
            za, zm, _ = pack_pcd_spectral_cone_sharded(
                ct, ph3, spec, thr, basis, 48, 24.0, 0.8,
                n_devices=4, n_zslab=2, n_iters=10)
            zout = make_sharded_pcd_cone_step(
                mesh2, zm, tuple(za), zslab_axis="zslab")(za)
            np.testing.assert_allclose(
                np.asarray(zout["basis_recons"]),
                np.asarray(ref["basis_recons"]), atol=1e-5)


def test_sharded_2d_pcd_matches_single_device():
    # the 2-D fused PCD under the halo-sharded pack (paired-quarter
    # views, ring-halo rebin, per-shard dominant ray plans) == the
    # single-device pipeline
    import jax
    from jax.sharding import Mesh

    from dexct_tpu.ops import spectral as sp_ops
    from dexct_tpu.physics.materials import TISSUE
    from dexct_tpu.pipeline.spectralct import (
        make_jitted_pcd_step,
        make_sharded_pcd_step,
        pack_pcd_spectral,
        pack_pcd_spectral_sharded,
    )
    from dexct_tpu.system.phantom import contrast_rods_phantom

    ct = FanBeamGeometry(N_channels=96, N_proj=128,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=False)
    ph = contrast_rods_phantom(N=96, dx=0.4)
    spec = kramers_spectrum(120.0)
    spec.rescale_counts(
        2e4 / float(np.sum(sp_ops.effective_fluence(spec, ct))))
    thr = [20.0, 34.0, 50.0, 70.0]
    a0, m0 = pack_pcd_spectral(ct, ph, spec, thr, [TISSUE, BONE], 96,
                               30.0, 0.8, n_iters=10,
                               projector="siddon", recon="parallel",
                               recon_n_theta=64, recon_nt=128)
    ref = make_jitted_pcd_step(m0)(a0)
    mesh = Mesh(np.array(jax.devices()[:4]), ("views",))
    sa, sm, plan = pack_pcd_spectral_sharded(
        ct, ph, spec, thr, [TISSUE, BONE], 96, 30.0, 0.8, n_devices=4,
        n_iters=10, projector="siddon_dominant", recon_n_theta=64,
        recon_nt=128)
    out = make_sharded_pcd_step(mesh, sm, tuple(sa))(sa)
    # recons: siddon vs siddon_dominant trace -> float-level agreement
    np.testing.assert_allclose(
        np.asarray(out["basis_recons"]),
        np.asarray(ref["basis_recons"]), atol=1e-4)
    # sinograms return in permuted view order (axis 1 of [K, V, C])
    nat = np.stack([plan.to_natural(s)
                    for s in np.asarray(out["basis_sinos"])])
    np.testing.assert_allclose(nat, np.asarray(ref["basis_sinos"]),
                               atol=1e-3)


class TestFourMaterialPipeline:
    """End-to-end K = 4 spectral CT: water/bone + iodine AND gadolinium
    quantified simultaneously from one 6-bin PCD scan (dual-contrast
    imaging — the clinical use of two K-edge agents).  Exercises the
    symmetric 4x4 closed-form Newton solve through the full pipeline."""

    def test_dual_contrast_quantification(self):
        import dataclasses

        from dexct_tpu.physics.materials import (AIR, Material,
                                                 MaterialTable)
        from dexct_tpu.system.phantom import water_cylinder_phantom

        iod = Material("iodine 10mg/mL", 1.008, "H(11.1)O(87.9)I(1.0)")
        gd = Material("gado 10mg/mL", 1.008, "H(11.1)O(87.9)Gd(1.0)")
        ph0 = water_cylinder_phantom(N=64, dx=0.3)
        labels = np.asarray(ph0.labels).copy()
        yy, xx = np.mgrid[0:64, 0:64]
        labels[0][np.hypot(yy - 32 - 10, xx - 32) < 5] = 2  # I rod
        labels[0][np.hypot(yy - 32 + 10, xx - 32) < 5] = 3  # Gd rod
        ph = dataclasses.replace(
            ph0, labels=labels,
            materials=MaterialTable([AIR, WATER, iod, gd]))

        ct = FanBeamGeometry(N_channels=96, N_proj=96,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=False,
                             detector=photon_counting_response())
        s = kramers_spectrum(140.0)
        s.rescale_counts(ct.A_iso * 20.0 / ct.N_proj)
        basis = (WATER, BONE,
                 Material("iodine", 4.93, "I(100.0)"),
                 Material("gadolinium", 7.9, "Gd(100.0)"))
        res = simulate_pcd_spectral(
            ct, ph, s, [20.0, 34.0, 45.0, 52.0, 65.0, 85.0], basis,
            64, 19.2, n_iters=60)
        vols = np.asarray(res.basis_recons)  # [4, 64, 64] g/cm^3
        assert vols.shape[0] == 4
        # rod centers: 10 mg/mL = 0.010 g/cm^3 of each agent, none of
        # the other; water background carries neither
        i_rod = vols[:, 38:46, 28:36].mean((1, 2))
        g_rod = vols[:, 18:26, 28:36].mean((1, 2))
        bg = vols[:, 30:34, 8:16].mean((1, 2))
        assert abs(i_rod[2] - 0.010) < 0.002, i_rod
        assert abs(i_rod[3]) < 0.002, i_rod
        assert abs(g_rod[3] - 0.010) < 0.002, g_rod
        assert abs(g_rod[2]) < 0.002, g_rod
        assert abs(bg[2]) < 0.001 and abs(bg[3]) < 0.001, bg
        assert abs(bg[0] - 1.0) < 0.03, bg  # water density
