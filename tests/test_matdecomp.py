"""Gauss-Newton decomposition tests: known-value recovery and
device-vs-host float parity (SURVEY.md §4 item 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops.matdecomp import (
    air_mask,
    decompose_sinograms,
    gauss_newton_solve,
    prepare_decomposition,
)
from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.system import FanBeamGeometry
from dexct_tpu.utils.testing import gauss_newton_decompose_numpy


@pytest.fixture(scope="module")
def de_setup():
    """Reference DE protocol: detunedMV @ 9 mGy + 80 kV @ 1 mGy
    (main.py:101)."""
    ct = FanBeamGeometry(eid=True)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    ee, i0, mus = prepare_decomposition(ct, s1, s2)
    return ct, s1, s2, ee, i0, mus


def synth_counts(i0, mus, a_true):
    L = np.asarray(a_true) @ mus
    return (np.exp(-np.clip(L, -700.0, 700.0)) @ i0.T).T


class TestUnfilteredSpectra:
    """Regression: the reference's *shipped* kV spectra are raw-tube
    (unfiltered) — massive fluence at 2-20 keV where mu/rho ~ 5e2 cm^2/g.
    Round-2 bug: those bins dominated the a=0 Jacobian and pinned the exp
    clip on transiently negative iterates, so thick-tissue rays never
    converged (VMI RMSE ~1000 HU).  detectable_bins drops them from the
    solver table; this locks the fix with a synthetic unfiltered tube."""

    @pytest.fixture(scope="class")
    def unfiltered(self):
        ct = FanBeamGeometry(eid=True)
        s1 = kramers_spectrum(140.0, filtration_mm_al=0.0)
        s1.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0, filtration_mm_al=0.0)
        s2.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
        return prepare_decomposition(ct, s1, s2)

    def test_soft_bins_dropped(self, unfiltered):
        ee, i0, mus = unfiltered
        assert 3.0 < ee[0] <= 10.0  # undetectable tube tail removed
        # no pathological soft-tissue mu left in the table (bone keeps a
        # legitimately large photoelectric mu at its lowest kept bins)
        assert np.all(mus[0] < 60.0)

    def test_thick_tissue_ray_recovers_f32(self, unfiltered):
        ee, i0, mus = unfiltered
        a_true = np.array([[40.0, 0.0], [35.0, 0.0], [40.0, 2.0],
                           [0.05, 0.0], [20.0, 8.0]])
        y = synth_counts(i0, mus, a_true)
        a = np.asarray(gauss_newton_solve(
            jnp.asarray(y, jnp.float32), jnp.asarray(i0, jnp.float32),
            jnp.asarray(mus, jnp.float32), n_iters=50))
        np.testing.assert_allclose(a, a_true, atol=2e-3)

    def test_t_ref_sensitivity_plateau(self):
        """VERDICT round-2 item 9: the detectable-bin threshold is a
        behavioral fork vs the reference (which solves all bins in f64,
        matdecomp.py:116); pin that the *physics* doesn't depend on it.

        Sweep t_ref over {0.5, 1, 2, 5} g/cm^2 with the worst-case
        raw-tube (unfiltered) spectra.  Counts are synthesized from the
        UNPRUNED table (t_ref=0: full physics, every nonzero-fluence
        bin), then solved against each pruned table.  The recovered basis
        densities must sit on a plateau: mapped to a 70 keV VMI through
        each ray's own path length, movement <= 0.5 HU.

        Measured sweep (recorded in VALIDATION.md): plateau movement is
        ~1e-5 g/cm^2 (<< 0.01 HU) across [0.5, 5].  t_ref=0.1 is
        *excluded* and pinned separately: it re-admits 3-5 keV raw-tube
        bins, which reproduce the original thin-ray divergence the
        pruning exists to remove (a 2 g/cm^2 ray solves to a=[5.9, -1])
        — i.e. the fork vs the reference's all-bins-f64 behavior is not a
        free parameter below ~0.5 g/cm^2, and the chosen 1.0 sits mid-
        plateau."""
        ct = FanBeamGeometry(eid=True)
        s1 = kramers_spectrum(140.0, filtration_mm_al=0.0)
        s1.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0, filtration_mm_al=0.0)
        s2.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)

        ee0, i0_0, mus0 = prepare_decomposition(ct, s1, s2, t_ref=0.0)
        # (tissue, bone) area densities [g/cm^2]: grazing to thick+implant
        a_true = np.array([[2.0, 0.0], [10.0, 0.5], [21.2, 0.0],
                           [30.0, 3.0], [40.0, 8.0]])
        y = synth_counts(i0_0, mus0, a_true)

        from dexct_tpu.physics import xcom
        from dexct_tpu.physics.materials import BONE, TISSUE, WATER
        mu1_70 = float(xcom.mixatten(TISSUE.matcomp, 70.0))
        mu2_70 = float(xcom.mixatten(BONE.matcomp, 70.0))
        mu_w70 = float(xcom.mixatten(WATER.matcomp, 70.0))
        # geometric path length per ray [cm] for the HU mapping
        t_cm = a_true[:, 0] / TISSUE.density + a_true[:, 1] / BONE.density

        sols = {}
        for t_ref in [0.5, 1.0, 2.0, 5.0]:
            # y is the measurement and is table-independent; only the
            # solver table changes with t_ref.
            ee, i0, mus = prepare_decomposition(ct, s1, s2, t_ref=t_ref)
            a = np.asarray(gauss_newton_solve(
                jnp.asarray(y, jnp.float32), jnp.asarray(i0, jnp.float32),
                jnp.asarray(mus, jnp.float32), n_iters=50))
            sols[t_ref] = a

        ref = sols[1.0]
        for t_ref, a in sols.items():
            d = a - ref
            vmi_hu = 1000.0 * (d[:, 0] * mu1_70 + d[:, 1] * mu2_70) \
                / (t_cm * mu_w70)
            assert np.abs(vmi_hu).max() <= 0.5, (t_ref, vmi_hu)

        # below the plateau: t_ref=0.1 re-admits the undetectable tube
        # tail (bins under 5 keV) — the round-2 divergence regime
        ee01, _, _ = prepare_decomposition(ct, s1, s2, t_ref=0.1)
        ee05, _, _ = prepare_decomposition(ct, s1, s2, t_ref=0.5)
        assert ee01[0] < 5.0 <= ee05[0]


class TestPrepare:
    def test_union_grid(self, de_setup):
        ct, s1, s2, ee, i0, mus = de_setup
        # low-E bins whose photons cannot reach the detector through any
        # object are dropped from the solver table (detectable_bins), as
        # are zero-fluence bins (the synthetic linac endpoint has I0=0)
        assert 1.0 <= ee[0] <= 10.0 and ee[-1] >= 5900.0
        assert len(ee) == len(set(ee))
        assert np.all(np.diff(ee) > 0)
        assert i0.shape == (2, len(ee)) and mus.shape == (2, len(ee))

    def test_mass_attenuation_not_linear(self, de_setup):
        """Basis curves are mass attenuation (density multiply deliberately
        omitted, matdecomp.py:157-158): tissue at 60 keV ~ 0.205 cm^2/g."""
        ct, s1, s2, ee, i0, mus = de_setup
        idx = np.searchsorted(ee, 60.0)
        assert abs(mus[0, idx] - 0.205) < 0.01
        assert abs(mus[1, idx] - 0.315) < 0.03  # bone mass atten

    def test_interp_outside_support_is_zero(self, de_setup):
        """kV spectrum contributes nothing above its kVp on the union grid."""
        ct, s1, s2, ee, i0, mus = de_setup
        assert np.all(i0[1, ee > 150.0] == 0.0)


class TestRecovery:
    def test_float64_oracle_exact_recovery(self, de_setup):
        ct, s1, s2, ee, i0, mus = de_setup
        rng = np.random.default_rng(0)
        a_true = np.stack(
            [rng.uniform(0, 40, 200), rng.uniform(0, 12, 200)], -1
        )
        counts = synth_counts(i0, mus, a_true)
        a = gauss_newton_decompose_numpy(counts, i0, mus, 50)
        np.testing.assert_allclose(a, a_true, atol=1e-10)

    def test_tpu_path_float32_parity(self, de_setup):
        """float32 device solve within 1e-4 relative of float64 truth —
        the BASELINE.json parity bar."""
        ct, s1, s2, ee, i0, mus = de_setup
        rng = np.random.default_rng(1)
        a_true = np.stack(
            [rng.uniform(0, 40, 500), rng.uniform(0, 12, 500)], -1
        )
        counts = synth_counts(i0, mus, a_true)
        a = np.asarray(
            gauss_newton_solve(
                jnp.asarray(counts, jnp.float32),
                jnp.asarray(i0, jnp.float32),
                jnp.asarray(mus, jnp.float32),
                n_iters=50,
            )
        )
        rel = np.abs(a - a_true) / np.maximum(np.abs(a_true), 1.0)
        assert rel.max() < 1e-4

    def test_full_newton_mode_runs(self, de_setup):
        """The reference's full-Newton iteration is available as an option
        and agrees on easy (small-attenuation) pixels."""
        ct, s1, s2, ee, i0, mus = de_setup
        a_true = np.array([[2.0, 0.5], [5.0, 1.0]])
        counts = synth_counts(i0, mus, a_true)
        a = np.asarray(
            gauss_newton_solve(
                jnp.asarray(counts, jnp.float32),
                jnp.asarray(i0, jnp.float32),
                jnp.asarray(mus, jnp.float32),
                n_iters=50,
                method="newton",
            )
        )
        np.testing.assert_allclose(a, a_true, atol=1e-3)

    def test_pixel_blocking_invariant(self, de_setup):
        ct, s1, s2, ee, i0, mus = de_setup
        rng = np.random.default_rng(2)
        a_true = np.stack(
            [rng.uniform(0, 30, 70), rng.uniform(0, 8, 70)], -1
        )
        counts = synth_counts(i0, mus, a_true)
        args = (jnp.asarray(counts, jnp.float32),
                jnp.asarray(i0, jnp.float32),
                jnp.asarray(mus, jnp.float32))
        a1 = np.asarray(gauss_newton_solve(*args, n_iters=40, pixel_block=16))
        a2 = np.asarray(gauss_newton_solve(*args, n_iters=40, pixel_block=70))
        np.testing.assert_allclose(a1, a2, atol=1e-5)


class TestWarmCompression:
    """VERDICT round-2 item 5: the moment-compressed warm-phase table
    must not move the fixed point — the full-table polish owns it."""

    def test_compressed_vs_full_noiseless(self, de_setup):
        ct, s1, s2, ee, i0, mus = de_setup
        assert len(ee) > 64  # the compression actually engages
        rng = np.random.default_rng(7)
        a_true = np.stack([rng.uniform(0.0, 45.0, 4096),
                           rng.uniform(0.0, 10.0, 4096)], -1)
        y = synth_counts(i0, mus, a_true)
        sol = {}
        for nodes in (0, 32):
            sol[nodes] = np.asarray(gauss_newton_solve(
                jnp.asarray(y, jnp.float32), jnp.asarray(i0, jnp.float32),
                jnp.asarray(mus, jnp.float32), n_iters=12,
                warm_nodes=nodes))
        scale = np.abs(a_true).max()
        err = np.abs(sol[32] - sol[0]).max() / scale
        assert err < 1e-4, err
        # and both still recover the truth
        np.testing.assert_allclose(sol[32], a_true, atol=2e-3)

    def test_compressed_vs_full_noisy(self, de_setup):
        ct, s1, s2, ee, i0, mus = de_setup
        rng = np.random.default_rng(11)
        a_true = np.stack([rng.uniform(0.0, 40.0, 2048),
                           rng.uniform(0.0, 8.0, 2048)], -1)
        y = synth_counts(i0, mus, a_true)
        y = rng.poisson(np.maximum(y, 0.0)).astype(np.float64)
        sol = {}
        for nodes in (0, 32):
            sol[nodes] = np.asarray(gauss_newton_solve(
                jnp.asarray(y, jnp.float32), jnp.asarray(i0, jnp.float32),
                jnp.asarray(mus, jnp.float32), n_iters=12,
                warm_nodes=nodes))
        # identical data -> identical MLE root, to float32 polish noise
        err = np.abs(sol[32] - sol[0]).max() / np.abs(a_true).max()
        assert err < 1e-4, err


class TestSinogramDecomposition:
    def test_air_mask(self):
        s = np.array([[100.0, 96.0, 50.0], [10.0, 94.0, 99.0]])
        m = np.asarray(air_mask(s, 0.95))
        np.testing.assert_array_equal(
            m, [[True, True, False], [False, False, True]]
        )

    def test_decompose_sinograms_end_to_end(self, de_setup):
        ct, s1, s2, ee, i0, mus = de_setup
        # synth a sinogram-shaped field of known area densities
        v, c = 6, 40
        rng = np.random.default_rng(3)
        a1 = rng.uniform(0, 20, (v, c))
        a2 = rng.uniform(0, 6, (v, c))
        a_true = np.stack([a1.ravel(), a2.ravel()], -1)
        counts = synth_counts(i0, mus, a_true)
        sino1 = counts[0].reshape(v, c)
        sino2 = counts[1].reshape(v, c)
        # make a couple of air pixels (max counts at zero attenuation)
        a1[0, 0] = a2[0, 0] = 0.0
        a1[2, 5] = a2[2, 5] = 0.0
        a_true2 = np.stack([a1.ravel(), a2.ravel()], -1)
        counts = synth_counts(i0, mus, a_true2)
        sino1 = counts[0].reshape(v, c)
        sino2 = counts[1].reshape(v, c)
        m1, m2 = decompose_sinograms(ct, sino1, sino2, s1, s2, n_iters=40)
        m1, m2 = np.asarray(m1), np.asarray(m2)
        assert m1.shape == (v, c)
        # masked air pixels zeroed (matdecomp.py:204-205)
        assert m1[0, 0] == 0.0 and m2[2, 5] == 0.0
        # non-air pixels recovered
        keep = np.ones((v, c), bool)
        keep[0, 0] = keep[2, 5] = False
        np.testing.assert_allclose(m1[keep], a1[keep], atol=2e-3)
        np.testing.assert_allclose(m2[keep], a2[keep], atol=2e-3)


class TestImageDomainDecomposition:
    def test_thin_object_recovers_basis(self):
        """Image-domain 2x2 solve on a thin tissue cylinder: densities
        within a few % of truth (BH bias is small for thin paths), and
        a water pixel maps to ~(1, 0) in the (tissue, bone) basis."""
        import numpy as np
        from dexct_tpu.ops.matdecomp import image_domain_decomposition
        from dexct_tpu.physics import kramers_spectrum, linac_spectrum
        from dexct_tpu.pipeline.api import get_recon, get_sino
        from dexct_tpu.physics.materials import AIR, TISSUE, MaterialTable
        from dexct_tpu.system.geometry import FanBeamGeometry
        from dexct_tpu.system.phantom import VoxelPhantom

        N, dx = 96, 0.1  # thin: 4 cm tissue cylinder
        ys = (np.arange(N) + 0.5 - N / 2) * dx
        rr = np.hypot(ys[None, :], ys[:, None])
        lab = (rr <= 2.0).astype(np.uint8)
        ph = VoxelPhantom("thin", lab, MaterialTable([AIR, TISSUE]),
                          dx, dx, dx)
        ct = FanBeamGeometry(N_channels=128, N_proj=128, gamma_fan=0.9,
                             SID=60.0, SDD=100.0, h_iso=0.1, eid=True)
        s1 = linac_spectrum()
        s1.rescale_counts(1e6)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(1e6)
        _, log1 = get_sino(ct, ph, s1)
        _, log2 = get_sino(ct, ph, s2)
        r1, _ = get_recon(log1, ct, s1, N, N * dx, 0.8)
        r2, _ = get_recon(log2, ct, s2, N, N * dx, 0.8)
        a_t, a_b = image_domain_decomposition(r1, r2, s1, s2, ct)
        c = slice(N // 2 - 4, N // 2 + 4)
        a_t_c = float(np.asarray(a_t)[c, c].mean())
        a_b_c = float(np.asarray(a_b)[c, c].mean())
        assert abs(a_t_c - TISSUE.density) < 0.08 * TISSUE.density
        assert abs(a_b_c) < 0.1  # no spurious bone

    def test_basis_validation(self):
        import numpy as np
        import pytest
        from dexct_tpu.ops.matdecomp import image_domain_decomposition
        from dexct_tpu.physics import kramers_spectrum
        from dexct_tpu.physics.materials import BONE, TISSUE, WATER
        from dexct_tpu.system.geometry import FanBeamGeometry

        ct = FanBeamGeometry(N_channels=8, N_proj=8, gamma_fan=0.9,
                             SID=60.0, SDD=100.0, h_iso=0.1, eid=True)
        s = kramers_spectrum(80.0)
        z = np.zeros((4, 4))
        with pytest.raises(ValueError, match="2-basis"):
            image_domain_decomposition(z, z, s, s, ct,
                                       basis=(TISSUE, BONE, WATER))
