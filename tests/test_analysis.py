"""Analysis-layer tests: VMI, ROI metrics, registration, loaders, figures
(the reference plots.py machinery, SURVEY.md §3.5)."""

import numpy as np
import pytest

from dexct_tpu.analysis import (
    Roi,
    cnr,
    contrast,
    crop_img,
    make_vmi,
    measure_roi,
    noise,
    nonair_mask,
    register_phantom_to_recon,
    rescale_shift,
    rmse,
    vmi_metric_curve,
)
from dexct_tpu.physics import xcom
from dexct_tpu.physics.materials import BONE, TISSUE
from dexct_tpu.system import water_cylinder_phantom


class TestVmi:
    def test_pure_basis_recovers_hu(self):
        """A pixel of exactly 1 g/cm^3 tissue basis reads tissue HU."""
        m1 = np.full((4, 4), 1.06)  # tissue at its density
        m2 = np.zeros((4, 4))
        for e0 in (60.0, 80.0, 120.0):
            vmi = make_vmi(e0, m1, m2)
            mu_t = 1.06 * float(xcom.mixatten(TISSUE.matcomp, e0))
            mu_w = float(xcom.mixatten("H(11.2)O(88.8)", e0))
            expect = 1000.0 * (mu_t - mu_w) / mu_w
            np.testing.assert_allclose(vmi, expect, rtol=1e-6)

    def test_raw_mode(self):
        m1 = np.ones((2, 2))
        vmi = make_vmi(70.0, m1, np.zeros((2, 2)), HU=False)
        np.testing.assert_allclose(
            vmi, float(xcom.mixatten(TISSUE.matcomp, 70.0)), rtol=1e-6
        )

    def test_metric_curve(self):
        m1, m2 = np.ones((8, 8)), 0.5 * np.ones((8, 8))
        es = [40.0, 80.0, 120.0]
        vals = vmi_metric_curve(m1, m2, es, lambda v: float(v.mean()))
        assert vals.shape == (3,)
        assert vals[0] > vals[-1]  # HU of bone-ish mix falls with E


class TestRoiMetrics:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.img = rng.normal(100.0, 5.0, (64, 64))
        self.img[20:30, 20:30] += 50.0
        self.sig = Roi(20, 20, 10, 10)
        self.bg = Roi(45, 45, 10, 10)

    def test_measure_roi(self):
        u, v = measure_roi(self.img, self.sig)
        assert 140 < u < 160
        assert 0 < v < 60
        vals = measure_roi(self.img, (20, 20, 10, 10), give_roi=True)
        assert vals.shape == (10, 10)

    def test_cnr_contrast_noise(self):
        c = cnr(self.img, self.sig, self.bg)
        assert 4.0 < c < 12.0
        assert 40.0 < contrast(self.img, self.sig, self.bg) < 60.0
        assert 3.0 < noise(self.img, self.sig, self.bg) < 12.0

    def test_rmse_masked(self):
        a = np.zeros((8, 8))
        b = np.ones((8, 8))
        mask = np.zeros((8, 8), bool)
        mask[:4] = True
        assert rmse(a, b) == 1.0
        assert rmse(a, b, mask) == 1.0
        b[:4] = 0.0
        assert rmse(a, b, mask) == 0.0

    def test_crop(self):
        assert crop_img(self.img, 32).shape == (32, 32)

    def test_nonair_mask(self):
        hu = np.full((4, 4), -1000.0)
        hu[1, 1] = 0.0
        m = nonair_mask(hu)
        assert m.sum() == 1 and m[1, 1]


class TestRegistration:
    def test_rescale_shift_identity(self):
        rng = np.random.default_rng(1)
        img = rng.normal(size=(32, 32))
        out = rescale_shift(img, 32, 0, 0)
        np.testing.assert_allclose(out, img, atol=1e-12)

    def test_register_phantom_identity_grid(self):
        """Recon grid == phantom grid -> registration is the identity."""
        ph = water_cylinder_phantom(N=64, dx=0.25)
        out = register_phantom_to_recon(ph, 64, 64 * 0.25, energy_keV=80.0)
        np.testing.assert_allclose(out, ph.M_mono(80.0), atol=1e-6)

    def test_register_resamples_fov(self):
        ph = water_cylinder_phantom(N=64, dx=0.25)  # radius 6.4 cm
        out = register_phantom_to_recon(ph, 128, 8.0, energy_keV=80.0)
        assert out.shape == (128, 128)
        # center still water, and the 8 cm FOV sits inside the cylinder
        assert abs(out[64, 64]) < 1.0
        assert abs(out[4, 4]) < 1.0


class TestLoaders:
    def test_roundtrip_contract(self, tmp_path):
        from dexct_tpu.analysis.loaders import (
            load_basis_images,
            load_bhc_image,
            load_ct_image,
        )
        from dexct_tpu.utils.io import StageWriter

        rng = np.random.default_rng(2)
        w = StageWriter(str(tmp_path), "runA")
        hu = rng.normal(size=(32, 32)).astype(np.float32)
        w.acquisition("80kV", 1.0, recon_HU=hu)
        m1 = rng.normal(size=(32, 32)).astype(np.float32)
        m2 = rng.normal(size=(32, 32)).astype(np.float32)
        w.matdecomp("detunedMV", "80kV", 9.0, 1.0, mat_recons=[m1, m2])
        w.bhc("pelvis", "80kV", "bone", recon_HU=hu * 2)

        got = load_ct_image(str(tmp_path), "runA", "80kV", 1.0, 32)
        np.testing.assert_array_equal(got, hu)
        g1, g2 = load_basis_images(str(tmp_path), "runA", "detunedMV",
                                   "80kV", 9.0, 1.0, 32)
        np.testing.assert_array_equal(g1, m1)
        np.testing.assert_array_equal(g2, m2)
        gb = load_bhc_image(str(tmp_path), "runA", "pelvis", "80kV",
                            "bone", "HU", 32)
        np.testing.assert_array_equal(gb, hu * 2)


class TestFigures:
    def test_gallery_and_curves_render(self, tmp_path):
        pytest.importorskip("matplotlib")
        from dexct_tpu.analysis.figures import (
            dect_gallery_figure,
            metal_lac_figure,
            phantom_roi_figure,
            vmi_metric_figure,
        )

        rng = np.random.default_rng(3)
        img = rng.normal(0, 100, (64, 64))
        m1 = np.clip(rng.normal(1.0, 0.1, (64, 64)), 0, None)
        m2 = np.clip(rng.normal(0.3, 0.1, (64, 64)), 0, None)

        f1 = phantom_roi_figure([img], [Roi(10, 10, 8, 8)], ["test"])
        f2 = vmi_metric_figure(
            {"case": (m1, m2)}, [60.0, 80.0], metric="cnr",
            roi_signal=Roi(10, 10, 8, 8), roi_background=Roi(40, 40, 8, 8))
        f3 = dect_gallery_figure(img, img, m1, m2)
        f4 = metal_lac_figure()
        for i, f in enumerate([f1, f2, f3, f4]):
            f.savefig(tmp_path / f"fig{i}.png", dpi=50)

    def test_contrast_noise_panels_and_labels(self, tmp_path):
        pytest.importorskip("matplotlib")
        from dexct_tpu.analysis.figures import (
            contrast_noise_panels,
            label_panels,
        )

        rng = np.random.default_rng(5)
        m1 = np.clip(rng.normal(1.0, 0.1, (64, 64)), 0, None)
        m2 = np.clip(rng.normal(0.3, 0.1, (64, 64)), 0, None)
        hu = rng.normal(0, 100, (64, 64))
        sig = Roi(10, 10, 8, 8)
        bg = Roi(40, 40, 8, 8)
        panels = {
            "pelvis": {"MV-80kV": (m1, m2, np.arange(40, 140, 10))},
            "pelvis_steel": {"MV-80kV": (m1, m2, np.arange(40, 200, 24))},
        }
        base = {"pelvis": {"80kV": hu}}
        for metric in ("contrast", "noise"):
            f = contrast_noise_panels(panels, sig, bg, metric=metric,
                                      baselines=base)
            # two panels, both labelled (a)/(b) by label_panels
            texts = [t.get_text() for ax in f.axes for t in ax.texts]
            assert "(a)" in texts and "(b)" in texts
            f.savefig(tmp_path / f"panel_{metric}.png", dpi=50)

        # label_panels standalone: numbers + inside placement
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(1, 3)
        label_panels(ax, label_type="number", loc="inside",
                     label_format="{}.")
        texts = [t.get_text() for a in ax for t in a.texts]
        assert texts == ["1.", "2.", "3."]
