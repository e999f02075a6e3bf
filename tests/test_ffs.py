"""Flying focal spot (system/geometry.py ffs + ops/ffs.py).

Beyond-reference subsystem (the reference's FanBeamGeometry is static,
/root/reference/plots.py:109-111): in-plane focal-spot deflection with
interleaved-subset parallel rebinning.  Pins the measured round-3
numbers: the FFS rebin at C channels reaches ~62% of the standard
C-channel rebin error (most of the way to a 2C-channel scan), and the
reconstruction halves the radial-aliasing streak level at unchanged
amplitude.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops.fbp import fbp_recon
from dexct_tpu.ops.fbp_fast import parallel_rebin_plan, rebin_to_parallel
from dexct_tpu.ops.ffs import parallel_rebin_plan_ffs
from dexct_tpu.system.geometry import FanBeamGeometry

C, V = 64, 192
DISKS = [(0.0, 0.0, 9.0, 0.2), (4.0, -2.0, 1.5, 0.3),
         (-5.5, 3.0, 0.8, 0.5)]


def _geom(ffs="none", n_channels=C, **kw):
    return FanBeamGeometry(N_channels=n_channels, N_proj=V,
                           gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                           ffs=ffs, **kw)


def _chord_sino(g):
    """Exact line integrals of the disk set for every measured ray."""
    src, dirs = g.ray_geometry()
    out = 0.0
    for (x0, y0, r, mu) in DISKS:
        rel = np.stack([x0, y0]) - src
        dist = np.abs(dirs[..., 0] * rel[..., 1]
                      - dirs[..., 1] * rel[..., 0])
        out = out + mu * 2.0 * np.sqrt(np.maximum(r * r - dist * dist, 0.0))
    return out.astype(np.float32)


class TestFfsGeometry:
    def test_rays_hit_fixed_detector_cells(self):
        """Sources alternate +/- delta/2 tangentially; rays still pass
        through the NOMINAL detector cell positions (the detector does
        not ride the deflection)."""
        g = _geom("inplane")
        src, dirs = g.ray_geometry()
        betas, gammas = g.betas, g.gammas
        t_hat = np.stack([-np.sin(betas), np.cos(betas)], -1)
        nominal = 60.0 * np.stack([np.cos(betas), np.sin(betas)], -1)
        off = np.einsum("vck,vk->vc", src - nominal[:, None], t_hat)
        assert np.allclose(off[0::2], 0.5 * g.ffs_delta, atol=1e-12)
        assert np.allclose(off[1::2], -0.5 * g.ffs_delta, atol=1e-12)
        ang = betas[:, None] + gammas[None, :]
        det = nominal[:, None] - 100.0 * np.stack(
            [np.cos(ang), np.sin(ang)], -1)
        d = det - src
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        assert np.abs(d - dirs).max() < 1e-12

    def test_default_delta_interleaves_half_sample(self):
        """ffs_delta=None picks SID*dg/2 * SDD/(SDD-SID): the central
        radial samples of the two subsets interleave at ~half the
        sample spacing."""
        from dexct_tpu.ops.ffs import _t_of_gamma

        g = _geom("inplane")
        te = _t_of_gamma(g.gammas, +0.5 * g.ffs_delta, 60.0, 100.0)
        to = _t_of_gamma(g.gammas, -0.5 * g.ffs_delta, 60.0, 100.0)
        frac = (te - to)[C // 2] / np.diff(te).mean()
        assert 0.4 < abs(frac) < 0.6

    def test_static_geometry_unchanged(self):
        g = _geom()
        src, dirs = g.ray_geometry()
        ang = g.betas[:, None] + g.gammas[None, :]
        assert np.array_equal(dirs, -np.stack([np.cos(ang), np.sin(ang)],
                                              -1))

    def test_guards(self):
        from dexct_tpu.system.geometry import ConeBeamGeometry

        with pytest.raises(ValueError, match="even"):
            FanBeamGeometry(N_channels=C, N_proj=191, ffs="inplane")
        with pytest.raises(ValueError, match="unknown ffs"):
            FanBeamGeometry(N_channels=C, N_proj=V, ffs="zwobble")
        with pytest.raises(ValueError, match="fan-beam geometry only"):
            ConeBeamGeometry(N_channels=C, N_proj=V, N_rows=4,
                             ffs="inplane")
        with pytest.raises(ValueError, match="flying-focal-spot"):
            parallel_rebin_plan(_geom("inplane"), 96, 2 * C)
        with pytest.raises(ValueError, match="no in-plane"):
            parallel_rebin_plan_ffs(_geom(), 96, 2 * C)

    def test_fused_pipeline_rejects_ffs(self):
        from dexct_tpu.physics.spectrum import kramers_spectrum
        from dexct_tpu.pipeline.fused import pack_dect
        from dexct_tpu.system.phantom import water_cylinder_phantom

        ph = water_cylinder_phantom(N=48, dx=0.5)
        s = kramers_spectrum(80.0)
        with pytest.raises(ValueError, match="static focal"):
            pack_dect(_geom("inplane"), ph, s, s, 48, 20.0, 0.8)


class TestFfsRebin:
    def test_beats_standard_rebin_at_same_channels(self):
        """The quantitative FFS claim, sinogram domain: rebinning the
        interleaved subsets onto a 2C-radial-sample parallel grid is
        markedly more accurate than rebinning a static C-channel scan
        onto the same grid (measured 0.041 vs 0.066 rms), recovering
        most of a 2C-channel scan's accuracy (0.031)."""
        nt, n_th = 2 * C, V // 2
        idx, w, t0, dt = parallel_rebin_plan_ffs(_geom("inplane"),
                                                 n_th, nt)
        par_ffs = np.asarray(rebin_to_parallel(
            jnp.asarray(_chord_sino(_geom("inplane")))[None],
            jnp.asarray(idx), jnp.asarray(w), nt, taps=16)[0])

        def std_par(g):
            i2, w2, t02, dt2 = parallel_rebin_plan(g, n_th, nt)
            assert abs(t02 - t0) < 1e-9 and abs(dt2 - dt) < 1e-9
            return np.asarray(rebin_to_parallel(
                jnp.asarray(_chord_sino(g))[None], jnp.asarray(i2),
                jnp.asarray(w2), nt)[0])

        par_c = std_par(_geom())
        par_2c = std_par(_geom(n_channels=2 * C))
        thetas = np.arange(n_th) * (np.pi / n_th)
        ts = t0 + dt * np.arange(nt)
        tt, th = np.meshgrid(ts, thetas)
        truth = 0.0
        for (x0, y0, r, mu) in DISKS:
            d = np.abs(tt - (x0 * np.cos(th) + y0 * np.sin(th)))
            truth = truth + mu * 2.0 * np.sqrt(
                np.maximum(r * r - d * d, 0.0))
        m = np.abs(tt) < 0.9 * abs(t0)

        def rms(par):
            return float(np.sqrt(((par - truth)[m] ** 2).mean()))

        r_ffs, r_c, r_2c = rms(par_ffs), rms(par_c), rms(par_2c)
        assert r_ffs < 0.72 * r_c, (r_ffs, r_c)
        assert r_ffs < 1.6 * r_2c, (r_ffs, r_2c)


class TestFfsRecon:
    def test_amplitude_and_streak_suppression(self):
        """fbp_recon dispatches FFS geometries through the interleaved
        rebin path: water amplitude within 1%, and the radial-aliasing
        streak level in the uniform region under 0.7x the static-scan
        direct-fan recon (measured ~0.5x)."""
        N, fov = 128, 24.0
        img_f, _ = fbp_recon(_chord_sino(_geom("inplane")),
                             _geom("inplane"), N, fov, 0.8)
        img_0, _ = fbp_recon(_chord_sino(_geom()), _geom(), N, fov, 0.8)
        img_f, img_0 = np.asarray(img_f), np.asarray(img_0)
        c = (np.arange(N) + 0.5 - N / 2) * (fov / N)
        X, Y = np.meshgrid(c, c)
        water = ((X ** 2 + Y ** 2 < 36.0)
                 & ((X - 4.0) ** 2 + (Y + 2.0) ** 2 > 4.0)
                 & ((X + 5.5) ** 2 + (Y - 3.0) ** 2 > 1.44))
        assert abs(img_f[water].mean() / 0.2 - 1.0) < 0.01
        assert img_f[water].std() < 0.7 * img_0[water].std()

    def test_composed_de_pipeline_with_ffs(self):
        """The spectral forward model and GN decomposition are per-ray
        and geometry-agnostic: a full DE simulation on an FFS geometry
        runs through the composed pipeline and recovers the water
        cylinder (tissue-basis density ~1 g/cm^3)."""
        from dexct_tpu.physics.spectrum import kramers_spectrum, linac_spectrum
        from dexct_tpu.pipeline.api import simulate_dect
        from dexct_tpu.system.phantom import water_cylinder_phantom

        ph = water_cylinder_phantom(N=48, dx=0.5)
        ct = _geom("inplane")
        s1 = linac_spectrum(detuned=True)
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        out = simulate_dect(ct, ph, s1, s2, 48, 20.0, 0.8, n_iters=8)
        m1 = np.asarray(out.mat_recons[0])
        assert abs(m1[22:26, 22:26].mean() - 1.0) < 0.08
        hu = np.asarray(out.recon_HU[1])
        assert abs(hu[1, 1]) > 900.0  # air
