"""Metal artifact reduction: inpainting unit tests + streak reduction."""

import numpy as np
import pytest

import jax.numpy as jnp

from dexct_tpu.ops.mar import (
    interpolate_sinogram,
    mar_recon,
    metal_trace,
    segment_metal,
)
from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.physics.materials import AIR, Material, MaterialTable, WATER
from dexct_tpu.pipeline.api import get_sino
from dexct_tpu.system.geometry import FanBeamGeometry
from dexct_tpu.system.phantom import VoxelPhantom

TI = Material("titanium", 4.506, "Ti(100.0)")


class TestInterpolate:
    def test_interior_bridge(self):
        s = jnp.asarray([[0.0, 1.0, 99.0, 99.0, 4.0, 5.0]])
        m = jnp.asarray([[False, False, True, True, False, False]])
        out = np.asarray(interpolate_sinogram(s, m))
        np.testing.assert_allclose(out[0], [0, 1, 2, 3, 4, 5], atol=1e-6)

    def test_edge_extrapolation(self):
        s = jnp.asarray([[99.0, 99.0, 2.0, 3.0, 99.0]])
        m = jnp.asarray([[True, True, False, False, True]])
        out = np.asarray(interpolate_sinogram(s, m))
        np.testing.assert_allclose(out[0], [2, 2, 2, 3, 3], atol=1e-6)

    def test_fully_masked_view_unchanged(self):
        s = jnp.asarray([[1.0, 2.0, 3.0]])
        m = jnp.ones((1, 3), bool)
        np.testing.assert_allclose(np.asarray(interpolate_sinogram(s, m)),
                                   np.asarray(s))

    def test_unmasked_passthrough(self):
        rng = np.random.default_rng(0)
        s = jnp.asarray(rng.random((5, 16)))
        m = jnp.zeros((5, 16), bool)
        np.testing.assert_allclose(np.asarray(interpolate_sinogram(s, m)),
                                   np.asarray(s))


def _implant_phantom(N=128, dx=0.25, with_metal=True):
    ys = (np.arange(N) + 0.5 - N / 2) * dx
    rr = np.hypot(ys[None, :], ys[:, None])
    lab = (rr <= 10.0).astype(np.uint8)  # water body
    if with_metal:
        rod = np.hypot(ys[None, :] - 3.0, ys[:, None]) <= 0.6
        lab[rod] = 2
    return VoxelPhantom("imp", lab, MaterialTable([AIR, WATER, TI]),
                        dx, dx, dx)


class TestMarRecon:
    def _setup(self):
        ct = FanBeamGeometry(N_channels=192, N_proj=192, gamma_fan=0.9,
                             SID=60.0, SDD=100.0, h_iso=0.1, eid=True)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(1e6)
        return ct, spec

    def test_streak_reduction_and_reinsertion(self):
        ct, spec = self._setup()
        ph = _implant_phantom()
        ph_clean = _implant_phantom(with_metal=False)
        _, slog = get_sino(ct, ph, spec)
        _, slog_clean = get_sino(ct, ph_clean, spec)
        from dexct_tpu.pipeline.api import get_recon

        n, fov = 128, 32.0
        _, hu_gt = get_recon(slog_clean, ct, spec, n, fov, 0.8)
        _, hu0 = get_recon(slog, ct, spec, n, fov, 0.8)
        for method in ("li", "nmar"):
            _, hu1, diag = mar_recon(slog, ct, spec, n, fov, 0.8,
                                     method=method)
            mask = np.asarray(diag["metal_mask"])
            assert mask.sum() > 0
            # grow the exclusion zone a little around the implant
            body = (np.asarray(hu_gt) > -500) & ~mask
            ys = np.arange(n)
            cy, cx = np.where(mask)
            d2 = ((ys[:, None] - cy.mean()) ** 2
                  + (ys[None, :] - cx.mean()) ** 2)
            near = d2 < (4 * 0.6 / 0.25) ** 2
            sel = body & ~near
            err0 = np.sqrt(np.mean((np.asarray(hu0)[sel]
                                    - np.asarray(hu_gt)[sel]) ** 2))
            err1 = np.sqrt(np.mean((np.asarray(hu1)[sel]
                                    - np.asarray(hu_gt)[sel]) ** 2))
            assert err1 < 0.6 * err0, (method, err0, err1)
            # metal reinserted: implant still visible
            assert np.asarray(hu1)[mask].mean() > 1000.0

    def test_no_metal_passthrough(self):
        ct, spec = self._setup()
        ph = _implant_phantom(with_metal=False)
        _, slog = get_sino(ct, ph, spec)
        r, hu, diag = mar_recon(slog, ct, spec, 128, 32.0, 0.8)
        assert not bool(np.asarray(diag["metal_mask"]).any())
        assert diag["trace"] is None

    def test_trace_covers_shadow(self):
        ct, spec = self._setup()
        ph = _implant_phantom()
        _, slog = get_sino(ct, ph, spec)
        from dexct_tpu.pipeline.api import get_recon

        _, hu0 = get_recon(slog, ct, spec, 128, 32.0, 0.8)
        mask = segment_metal(hu0)
        tr = metal_trace(mask, ct, slog.shape, dx=32.0 / 128)
        tr = np.asarray(tr)
        # every view crosses the rod; none is fully shadowed
        assert (tr.sum(-1) > 0).all()
        assert (tr.sum(-1) < ct.N_channels // 4).all()


class TestStructuredAnatomy:
    def test_nmar_beats_li_with_bone(self):
        """Bone structures crossing the metal shadow: the LI bridge
        destroys their projections (new streaks ~cancel the removal),
        while NMAR's prior-normalized bridge preserves them — the
        method's defining property (Meyer 2010)."""
        from dexct_tpu.physics.materials import BONE
        from dexct_tpu.pipeline.api import get_recon

        N, dx = 128, 0.25
        ys = (np.arange(N) + 0.5 - N / 2) * dx
        rr = np.hypot(ys[None, :], ys[:, None])

        def phant(metal):
            lab = (rr <= 10.0).astype(np.uint8)
            lab[np.abs(rr - 6.5) <= 0.8] = 2
            for (by, bx) in ((0.0, -4.0), (2.5, 5.0)):
                lab[np.hypot(ys[None, :] - bx,
                             ys[:, None] - by) <= 1.2] = 2
            if metal:
                lab[np.hypot(ys[None, :] - 3.0, ys[:, None]) <= 0.6] = 3
            return VoxelPhantom(
                "s", lab, MaterialTable([AIR, WATER, BONE, TI]),
                dx, dx, dx)

        ct = FanBeamGeometry(N_channels=192, N_proj=192, gamma_fan=0.9,
                             SID=60.0, SDD=100.0, h_iso=0.1, eid=True)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(1e6)
        _, slog = get_sino(ct, phant(True), spec)
        _, slog_c = get_sino(ct, phant(False), spec)
        n, fov = 128, 32.0
        _, hu_gt = get_recon(slog_c, ct, spec, n, fov, 0.8)
        _, hu0 = get_recon(slog, ct, spec, n, fov, 0.8)
        errs = {}
        for meth in ("li", "nmar"):
            _, hu1, diag = mar_recon(slog, ct, spec, n, fov, 0.8,
                                     method=meth)
            mask = np.asarray(diag["metal_mask"])
            cy, cx = np.where(mask)
            yy = np.arange(n)
            d2 = ((yy[:, None] - cy.mean()) ** 2
                  + (yy[None, :] - cx.mean()) ** 2)
            sel = ((np.asarray(hu_gt) > -500) & ~mask
                   & (d2 >= (4 * 0.6 / 0.25) ** 2))
            errs[meth] = np.sqrt(np.mean(
                (np.asarray(hu1)[sel] - np.asarray(hu_gt)[sel]) ** 2))
        e0 = np.sqrt(np.mean((np.asarray(hu0)[sel]
                              - np.asarray(hu_gt)[sel]) ** 2))
        assert errs["nmar"] < 0.8 * errs["li"]
        assert errs["nmar"] < 0.75 * e0


class TestAnthropomorphicPelvis:
    def test_nmar_improves_li_degrades(self):
        """The implanted reference-style pelvis: LI-MAR makes the image
        WORSE (its bridges erase the pelvic bone projections crossing
        the shadow), NMAR improves it — the reason NMAR exists."""
        from dexct_tpu.pipeline.api import get_recon
        from dexct_tpu.system.phantom import pelvis_phantom

        ct = FanBeamGeometry(N_channels=192, N_proj=192, gamma_fan=0.9,
                             SID=60.0, SDD=100.0, h_iso=0.1, eid=True)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(1e6)
        ph = pelvis_phantom(N=192, dx=32.0 / 192, implant="titanium")
        ph0 = pelvis_phantom(N=192, dx=32.0 / 192)
        _, slog = get_sino(ct, ph, spec)
        _, slog0 = get_sino(ct, ph0, spec)
        n, fov = 192, 32.0
        _, hu_gt = get_recon(slog0, ct, spec, n, fov, 0.8)
        _, hu0 = get_recon(slog, ct, spec, n, fov, 0.8)
        errs = {}
        for meth in ("li", "nmar"):
            _, hu1, diag = mar_recon(slog, ct, spec, n, fov, 0.8,
                                     method=meth)
            m = np.asarray(diag["metal_mask"])
            cy, cx = np.where(m)
            yy = np.arange(n)
            d2 = ((yy[:, None] - cy.mean()) ** 2
                  + (yy[None, :] - cx.mean()) ** 2)
            sel = ((np.asarray(hu_gt) > -500) & ~m
                   & (d2 > 9.0 * m.sum() / np.pi))
            e0 = np.sqrt(np.mean(
                (np.asarray(hu0)[sel] - np.asarray(hu_gt)[sel]) ** 2))
            errs[meth] = np.sqrt(np.mean(
                (np.asarray(hu1)[sel] - np.asarray(hu_gt)[sel]) ** 2))
        assert errs["nmar"] < 0.8 * e0
        assert errs["li"] > e0  # LI degrades rich anatomy
