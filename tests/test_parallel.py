"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 item 5)."""

import jax
import numpy as np
import pytest

from dexct_tpu.parallel import make_mesh, shard_arrays, sharded_dect_step, view_mesh
from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.pipeline.fused import make_jitted_step, pack_dect
from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom


@pytest.fixture(scope="module")
def packed():
    ct = FanBeamGeometry(N_channels=64, N_proj=64, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, eid=True)
    ph = contrast_rods_phantom(N=64, dx=0.35)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    return pack_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=15)


class TestMesh:
    def test_all_devices(self):
        m = make_mesh()
        assert m.devices.size == 8
        assert m.axis_names == ("views",)

    def test_view_mesh_subset(self):
        m = view_mesh(4)
        assert m.devices.size == 4

    def test_bad_sizes_rejected(self):
        with pytest.raises(ValueError):
            make_mesh((3,), ("views",))


class TestShardedPipeline:
    def test_sharded_equals_single_device(self, packed):
        """The 8-way view-sharded step reproduces the single-device result
        (device-count invariance — the distributed-correctness bar)."""
        arrays, meta = packed
        single = make_jitted_step(meta)(arrays)

        mesh = view_mesh(8)
        step = sharded_dect_step(mesh, meta, arrays.keys())
        sharded = step(shard_arrays(arrays, mesh))

        np.testing.assert_allclose(
            np.asarray(sharded["sino_raw"][0]),
            np.asarray(single["sino_raw"][0]), rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(sharded["mat_sinos"][1]),
            np.asarray(single["mat_sinos"][1]), atol=1e-4,
        )
        # reconstructions: psum of wedge partials == full backprojection
        np.testing.assert_allclose(
            np.asarray(sharded["recon_raw"][0]),
            np.asarray(single["recon_raw"][0]), atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(sharded["mat_recons"][0]),
            np.asarray(single["mat_recons"][0]), atol=1e-4,
        )

    def test_two_device_mesh(self, packed):
        arrays, meta = packed
        mesh = view_mesh(2)
        out = sharded_dect_step(mesh, meta, arrays.keys())(shard_arrays(arrays, mesh))
        single = make_jitted_step(meta)(arrays)
        np.testing.assert_allclose(
            np.asarray(out["recon_HU"][1]),
            np.asarray(single["recon_HU"][1]), atol=2e-2,
        )

    def test_output_shardings(self, packed):
        arrays, meta = packed
        mesh = view_mesh(8)
        out = sharded_dect_step(mesh, meta, arrays.keys())(shard_arrays(arrays, mesh))
        # sinograms stay view-sharded; images are replicated
        sino_shard = out["sino_raw"][0].sharding
        img_shard = out["recon_raw"][0].sharding
        assert sino_shard.is_fully_replicated is False
        assert img_shard.is_fully_replicated is True
