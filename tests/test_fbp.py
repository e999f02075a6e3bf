"""FBP reconstruction tests: ground-truth oracles and filter behavior
(SURVEY.md §4 items 1, 3)."""

import numpy as np
import pytest

from dexct_tpu.ops.fbp import fbp_recon, filter_sinogram, hu_image
from dexct_tpu.ops.filters import (
    WINDOWS,
    equiangular_ramp_kernel,
    filter_frequency_response,
)
from dexct_tpu.ops.siddon import material_path_sinogram, mono_sinogram
from dexct_tpu.system import (
    FanBeamGeometry,
    contrast_rods_phantom,
    water_cylinder_phantom,
)


@pytest.fixture(scope="module")
def cylinder_recon():
    ph = water_cylinder_phantom(N=128, dx=0.2)  # radius 10.24 cm
    ct = FanBeamGeometry(N_channels=256, N_proj=360, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0)
    mu = ph.materials.mu_table(np.array([60.0]))[:, 0]
    paths = material_path_sinogram(ph, ct)
    sino = mono_sinogram(paths, mu)
    img, _ = fbp_recon(sino, ct, 128, 26.0)
    return ph, ct, mu, np.asarray(img)


class TestFilters:
    def test_ramp_kernel_structure(self):
        g = equiangular_ramp_kernel(8, 0.01)
        center = 7
        assert g[center] == 1.0 / (8.0 * 0.01**2)
        assert g[center + 2] == 0.0 and g[center + 4] == 0.0
        assert g[center + 1] < 0.0 and g[center + 3] < 0.0
        np.testing.assert_allclose(g, g[::-1])  # symmetric

    def test_dc_suppression(self):
        """The ramp filter nearly annihilates constants (the finite kernel
        truncation leaves a small residual DC, <0.5% of peak gain)."""
        H, m = filter_frequency_response(64, 0.01, ramp=1.0, window="ramp")
        assert abs(H[0]) / abs(H).max() < 5e-3

    def test_cutoff(self):
        H, m = filter_frequency_response(64, 0.01, ramp=0.5, window="ramp")
        f_norm = np.arange(len(H)) / (m / 2.0)
        assert np.all(np.abs(H[f_norm > 0.51]) < 1e-10)

    def test_all_windows_valid(self):
        for w in WINDOWS:
            H, _ = filter_frequency_response(32, 0.01, 0.8, w)
            assert np.all(np.isfinite(H))

    def test_unknown_window_rejected(self):
        with pytest.raises(ValueError):
            filter_frequency_response(32, 0.01, 0.8, "boxcar")


class TestReconstruction:
    def test_water_cylinder_recovers_mu(self, cylinder_recon):
        """FBP(FP(water)) center ~ mu_water — the absolute-scale oracle."""
        ph, ct, mu, img = cylinder_recon
        center = img[56:72, 56:72]
        assert abs(center.mean() - mu[1]) / mu[1] < 0.005
        assert center.std() / mu[1] < 0.02

    def test_air_outside(self, cylinder_recon):
        ph, ct, mu, img = cylinder_recon
        assert abs(img[2, 2]) < 0.02 * mu[1] + 2e-3

    def test_hu_conversion(self, cylinder_recon):
        ph, ct, mu, img = cylinder_recon
        hu = np.asarray(hu_image(img, mu[1]))
        assert abs(hu[56:72, 56:72].mean()) < 10.0  # water ~ 0 HU
        assert hu[2, 2] < -950.0  # air ~ -1000 HU

    def test_matches_m_mono_oracle(self, cylinder_recon):
        """FBP-reconstructed HU vs the analytic M_mono ground truth
        (SURVEY.md §4 item 1), away from the cylinder edge."""
        ph, ct, mu, img = cylinder_recon
        hu = np.asarray(hu_image(img, mu[1]))
        gt = ph.M_mono(60.0)
        # compare in the interior (edge has bandlimited ringing):
        yy, xx = np.mgrid[0:128, 0:128]
        r = np.hypot((xx - 63.5) * 26.0 / 128, (yy - 63.5) * 26.0 / 128)
        inner = r < 7.0
        rmse = np.sqrt(np.mean((hu[inner] - gt[inner]) ** 2))
        assert rmse < 15.0  # HU

    def test_sharper_ramp_sharper_edge(self):
        """Higher Nyquist cutoff -> sharper cylinder edge (README.md:21)."""
        ph = water_cylinder_phantom(N=64, dx=0.4)
        ct = FanBeamGeometry(N_channels=128, N_proj=180,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        mu = ph.materials.mu_table(np.array([60.0]))[:, 0]
        sino = mono_sinogram(material_path_sinogram(ph, ct), mu)
        img_lo, _ = fbp_recon(sino, ct, 64, 26.0, ramp=0.3)
        img_hi, _ = fbp_recon(sino, ct, 64, 26.0, ramp=1.0)
        grad_lo = np.abs(np.diff(np.asarray(img_lo)[32])).max()
        grad_hi = np.abs(np.diff(np.asarray(img_hi)[32])).max()
        assert grad_hi > 1.5 * grad_lo

    def test_rod_contrast_ordering(self):
        """Reconstructed rod means preserve the material mu ordering."""
        ph = contrast_rods_phantom(N=128, dx=0.2)
        ct = FanBeamGeometry(N_channels=192, N_proj=256,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        e = np.array([70.0])
        mu = ph.materials.mu_table(e)[:, 0]
        sino = mono_sinogram(material_path_sinogram(ph, ct), mu)
        img, _ = fbp_recon(sino, ct, 128, 26.0)
        img = np.asarray(img)
        # rod centers at ring_r=0.25*W from center, angles 0/90/180/270
        ring = 0.25 * 128 * 0.2 / (26.0 / 128)  # in recon pixels
        c = 63.5
        means = {}
        for i, name in enumerate(["tissue", "bone", "adipose", "muscle"]):
            ang = 2 * np.pi * i / 4
            px, py = int(c + ring * np.cos(ang)), int(c + ring * np.sin(ang))
            means[name] = img[py - 2:py + 3, px - 2:px + 3].mean()
        assert means["bone"] > means["tissue"] > means["adipose"]

    def test_jit_dtype_is_float32(self, cylinder_recon):
        ph, ct, mu, img = cylinder_recon
        assert img.dtype == np.float32

    def test_short_scan_parker_weights(self):
        """A pi + fan short scan with Parker weighting reconstructs the
        same values as the full 2 pi scan."""
        ph = water_cylinder_phantom(N=96, dx=0.25)
        full = FanBeamGeometry(N_channels=128, N_proj=288,
                               gamma_fan=0.8230337, SID=60.0, SDD=100.0)
        rot = np.pi + full.gamma_fan
        n_short = int(288 * rot / (2 * np.pi))
        short = FanBeamGeometry(N_channels=128, N_proj=n_short,
                                gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                                rotation_total=rot)
        mu = ph.materials.mu_table(np.array([60.0]))[:, 0]
        sino_f = mono_sinogram(material_path_sinogram(ph, full), mu)
        sino_s = mono_sinogram(material_path_sinogram(ph, short), mu)
        img_f, _ = fbp_recon(sino_f, full, 96, 24.0, 0.8)
        img_s, _ = fbp_recon(sino_s, short, 96, 24.0, 0.8)
        img_f, img_s = np.asarray(img_f), np.asarray(img_s)
        cf = img_f[44:52, 44:52].mean()
        cs = img_s[44:52, 44:52].mean()
        assert abs(cs - mu[1]) / mu[1] < 0.02  # quantitative short scan
        assert abs(cs - cf) / mu[1] < 0.02

    def test_too_short_scan_rejected(self):
        from dexct_tpu.ops.fbp import parker_weights

        ct = FanBeamGeometry(N_channels=16, N_proj=16, gamma_fan=0.8,
                             rotation_total=2.0)  # < pi + fan
        with pytest.raises(ValueError):
            parker_weights(ct)

    def test_parallel_beam_geometry_end_to_end(self):
        """The parallel-beam extension: project + reconstruct a cylinder
        through the same get_recon dispatch."""
        from dexct_tpu.system import ParallelBeamGeometry

        ph = water_cylinder_phantom(N=96, dx=0.25)
        ct = ParallelBeamGeometry(N_channels=128, N_proj=180,
                                  detector_width=26.0)
        assert abs(ct.rotation_total - np.pi) < 1e-9
        mu = ph.materials.mu_table(np.array([60.0]))[:, 0]
        sino = mono_sinogram(material_path_sinogram(ph, ct), mu)
        # central channel sees the full diameter at every angle
        center = np.asarray(sino)[:, 63:65] * mu[1]
        img, _ = fbp_recon(sino, ct, 96, 24.0, 0.8)
        img = np.asarray(img)
        c = img[44:52, 44:52]
        assert abs(c.mean() - mu[1]) / mu[1] < 0.01
        assert abs(img[6, 48]) < 0.02 * mu[1] + 2e-3  # air above
