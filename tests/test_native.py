"""Native (C++) oracle tests: build, parity with NumPy and device paths."""

import numpy as np
import pytest

from dexct_tpu.utils import native
from dexct_tpu.utils.testing import siddon_paths_numpy


@pytest.fixture(scope="module")
def lib():
    lib = native.load_native()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestNative:
    def test_builds_and_reports_threads(self, lib):
        assert native.native_threads() >= 1

    def test_siddon_matches_numpy_oracle(self, lib):
        rng = np.random.default_rng(0)
        labels = rng.integers(0, 5, (40, 56)).astype(np.uint8)
        n = 400
        ang = rng.uniform(0, 2 * np.pi, n)
        src = 30.0 * np.stack([np.cos(ang), np.sin(ang)], -1)
        tgt = rng.uniform(-1.0, 1.0, (n, 2))
        d = tgt - src
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        got = native.siddon_trace_cpu(labels, src, d, 0.11, 0.15, 5)
        ref = siddon_paths_numpy(labels, src, d, 0.11, 0.15, 5)
        np.testing.assert_allclose(got, ref, atol=1e-9)

    def test_siddon_matches_device_path(self, lib):
        """The TPU-vs-CPU(float64) parity bar (SURVEY.md §4 item 4)."""
        import jax.numpy as jnp

        from dexct_tpu.ops.siddon import material_path_sinogram
        from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom

        ph = contrast_rods_phantom(N=64, dx=0.3)
        ct = FanBeamGeometry(N_channels=48, N_proj=32, gamma_fan=0.8,
                             SID=40.0, SDD=70.0)
        dev = np.asarray(material_path_sinogram(ph, ct))
        src, dirs = ct.ray_geometry()
        cpu = native.siddon_trace_cpu(
            ph.slice_labels(), src.reshape(-1, 2), dirs.reshape(-1, 2),
            ph.dx, ph.dy, ph.n_materials,
        ).reshape(dev.shape)
        np.testing.assert_allclose(dev, cpu, atol=5e-4)

    def test_counts_matches_numpy(self, lib):
        rng = np.random.default_rng(1)
        paths = rng.uniform(0, 10, (128, 3))
        mu = rng.uniform(0.01, 0.5, (3, 40))
        i0 = rng.uniform(1e3, 1e5, 40)
        got = native.counts_from_paths_cpu(paths, mu, i0)
        ref = np.exp(-(paths @ mu)) @ i0
        np.testing.assert_allclose(got, ref, rtol=1e-12)
