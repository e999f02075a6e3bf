"""Parameter-sweep tests: dose grids (noise scaling), ramp grids,
sweep-axis sharding (BASELINE.json config 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops.filters import filter_frequency_response
from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.pipeline.fused import pack_dect
from dexct_tpu.pipeline.sweep import (
    dose_sweep,
    ramp_sweep,
    sharded_dose_sweep,
    sweep_mesh,
)
from dexct_tpu.system import FanBeamGeometry, water_cylinder_phantom


@pytest.fixture(scope="module")
def packed():
    ct = FanBeamGeometry(N_channels=64, N_proj=96, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, eid=True)
    ph = water_cylinder_phantom(N=64, dx=0.35)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    return ct, pack_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=12)


class TestDoseSweep:
    def test_shapes_and_noise_scaling(self, packed):
        """Compound (EID) noise: image noise falls ~1/sqrt(dose)."""
        ct, (arrays, meta) = packed
        # tiny dose scales so quantum noise dominates the toy geometry
        scales = jnp.array([1e-5, 16e-5])
        out = dose_sweep(arrays, meta, scales, jax.random.PRNGKey(0),
                         noise="compound")
        assert out["recon_HU"].shape == (2, 2, 64, 64)
        assert out["mat_sinos"].shape == (2, 2, 96, 64)
        hu = np.asarray(out["recon_HU"])
        # subtract the shared deterministic structure (noiseless recon)
        clean = np.asarray(dose_sweep(
            arrays, meta, jnp.array([1.0]), jax.random.PRNGKey(0),
            noise="none")["recon_HU"])[0]
        roi = np.s_[24:40, 24:40]
        lo = (hu[0, 1] - clean[1])[roi].std()
        hi = (hu[1, 1] - clean[1])[roi].std()
        assert lo > 2.0 * hi > 0.0

    def test_noiseless_doses_identical(self, packed):
        ct, (arrays, meta) = packed
        scales = jnp.array([0.5, 2.0])
        out = dose_sweep(arrays, meta, scales, jax.random.PRNGKey(0),
                         noise="none")
        hu = np.asarray(out["recon_HU"])
        # without noise the HU images are dose-independent
        np.testing.assert_allclose(hu[0], hu[1], atol=0.3)

    def test_sharded_equals_single(self, packed):
        ct, (arrays, meta) = packed
        scales = jnp.linspace(0.5, 2.0, 8)
        key = jax.random.PRNGKey(3)
        single = dose_sweep(arrays, meta, scales, key)
        mesh = sweep_mesh(8)
        sharded = sharded_dose_sweep(mesh, arrays, meta, scales, key)
        np.testing.assert_allclose(
            np.asarray(sharded["recon_HU"]),
            np.asarray(single["recon_HU"]), atol=1e-3,
        )

    def test_2d_mesh_sweep_by_views(self, packed):
        """Composite sharding: dose grid over the 'sweep' axis AND the
        sinogram views over the 'views' axis (2x4 mesh) reproduces the
        single-device sweep."""
        from dexct_tpu.parallel.mesh import make_mesh

        ct, (arrays, meta) = packed
        scales = jnp.array([0.5, 2.0])
        key = jax.random.PRNGKey(7)
        single = dose_sweep(arrays, meta, scales, key, noise="none")
        mesh = make_mesh((2, 4), ("sweep", "views"))
        sharded = sharded_dose_sweep(mesh, arrays, meta, scales, key,
                                     noise="none")
        np.testing.assert_allclose(
            np.asarray(sharded["recon_HU"]),
            np.asarray(single["recon_HU"]), atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(sharded["mat_sinos"]),
            np.asarray(single["mat_sinos"]), atol=1e-4,
        )

    def test_bad_grid_size_rejected(self, packed):
        ct, (arrays, meta) = packed
        mesh = sweep_mesh(8)
        with pytest.raises(ValueError):
            sharded_dose_sweep(mesh, arrays, meta, jnp.ones(6),
                               jax.random.PRNGKey(0))


class TestSliceSweep:
    def test_multislice_phantom(self, packed):
        """3-slice volume: per-slice results equal per-slice single runs
        (BASELINE config 5 'multi-slice')."""
        from dexct_tpu.pipeline.fused import make_jitted_step
        from dexct_tpu.pipeline.sweep import slice_sweep

        ct, (arrays, meta) = packed
        base = np.asarray(arrays["labels"])
        vol = np.stack([base,
                        np.zeros_like(base),
                        np.roll(base, 5, axis=1)])
        out = slice_sweep(arrays, meta, jnp.asarray(vol))
        assert out["recon_HU"][0].shape == (3, 64, 64)
        # slice 0 == single-slice run
        single = make_jitted_step(meta)(arrays)
        np.testing.assert_allclose(
            np.asarray(out["recon_HU"][0][0]),
            np.asarray(single["recon_HU"][0]), atol=1e-5,
        )
        # the empty slice reconstructs to ~air everywhere
        hu_air = np.asarray(out["recon_HU"][0][1])
        assert hu_air.mean() < -900.0


class TestRampSweep:
    def test_sharpness_ordering(self, packed):
        ct, (arrays, meta) = packed
        Hs = []
        for ramp in (0.3, 1.0):
            H, m = filter_frequency_response(ct.N_channels, ct.dgamma,
                                             ramp, "sinc", "fan")
            Hs.append(H)
        out = np.asarray(ramp_sweep(
            arrays, meta, jnp.asarray(np.stack(Hs), jnp.float32)))
        assert out.shape == (2, 2, 64, 64)
        edge = lambda img: np.abs(np.diff(img[32])).max()
        assert edge(out[1, 1]) > 1.3 * edge(out[0, 1])
