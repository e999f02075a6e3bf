"""Multi-slice (z-stack) pipeline batching (pipeline/zstack.py).

The reference's VoxelPhantom carries Nz slices but only ever scans one
z_index (plots.py:124-126, params.txt:16); the z-stack path batches the
full fused DE pipeline over slices with one vmapped program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.pipeline.fused import make_jitted_step, pack_dect
from dexct_tpu.pipeline.zstack import (
    make_jitted_zstack_step,
    pack_zstack,
    stack_phantom,
)
from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom

NZ = 4


@pytest.fixture(scope="module")
def system():
    ct = FanBeamGeometry(N_channels=64, N_proj=96, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, eid=True)
    ph = stack_phantom(contrast_rods_phantom, NZ, N=64, dx=0.4)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    return ct, ph, s1, s2


def test_stack_phantom_varies_slices(system):
    _, ph, _, _ = system
    assert ph.Nz == NZ
    assert ph.labels.shape == (NZ, 64, 64)
    # anatomy actually varies through the stack
    assert any(
        not np.array_equal(ph.labels[z], ph.labels[0])
        for z in range(1, NZ)
    )


@pytest.mark.parametrize("projector,recon", [
    ("siddon", "fan"),
    ("siddon_dominant", "parallel"),
    ("fourier", "parallel"),
])
def test_zstack_matches_per_slice(system, projector, recon):
    ct, ph, s1, s2 = system
    kw = dict(n_iters=8, projector=projector, recon=recon,
              recon_n_theta=64, recon_nt=128, n_theta=128)
    arrays, meta, axes = pack_zstack(ct, ph, s1, s2, 64, 20.0, 0.8, **kw)
    out = make_jitted_zstack_step(meta, axes)(arrays)
    assert out["recon_HU"][0].shape == (NZ, 64, 64)
    assert out["mat_sinos"][0].shape == (NZ, 96, 64)

    # shared tables must not have been stacked (memory contract)
    assert axes.get("src") is None and axes.get("i0_1") is None
    assert axes.get("labels") == 0

    # every slice equals its own single-slice run
    import dataclasses

    for z in (0, NZ - 1):
        ph_z = dataclasses.replace(ph, z_index=z)
        a1, m1 = pack_dect(ct, ph_z, s1, s2, 64, 20.0, 0.8, **kw)
        ref = make_jitted_step(m1)(a1)
        got = jax.tree.map(lambda x: np.asarray(x)[z], out)
        for key in ("recon_HU", "mat_recons", "sino_log"):
            for i in range(2):
                np.testing.assert_allclose(
                    got[key][i], np.asarray(ref[key][i]),
                    rtol=2e-4, atol=2e-4,
                    err_msg=f"{projector}/{key}[{i}] slice {z}",
                )


def test_zstack_noise_independent_per_slice(system):
    ct, ph, s1, s2 = system
    arrays, meta, axes = pack_zstack(
        ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=4, projector="siddon",
        recon="fan", noise="poisson", seed=7)
    assert axes["noise_key"] == 0
    out = make_jitted_zstack_step(meta, axes)(arrays)
    raw = np.asarray(out["sino_raw"][0])
    # slices with identical anatomy would still get distinct noise; here
    # just assert no two slices share the exact realization
    assert not np.array_equal(raw[0], raw[1])


def test_zstack_chunked_matches_full(system):
    ct, ph, s1, s2 = system
    arrays, meta, axes = pack_zstack(
        ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=6, projector="siddon",
        recon="fan")
    full = make_jitted_zstack_step(meta, axes)(arrays)
    chunked = make_jitted_zstack_step(meta, axes, z_chunk=2)(arrays)
    np.testing.assert_allclose(np.asarray(chunked["recon_HU"][0]),
                               np.asarray(full["recon_HU"][0]),
                               atol=1e-3)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divisible"):
        make_jitted_zstack_step(meta, axes, z_chunk=3)(arrays)


def test_zstack_z_subset(system):
    ct, ph, s1, s2 = system
    arrays, meta, axes = pack_zstack(
        ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=4, z_indices=[1, 3],
        projector="siddon", recon="fan")
    out = make_jitted_zstack_step(meta, axes)(arrays)
    assert out["recon_HU"][0].shape == (2, 64, 64)


def test_zstack_pair_trace_bit_identical(system):
    """Round-5 item 2: the slice-PAIRED trace (two slices per gather,
    traced outside the vmap) must reproduce the per-ray default
    bit-identically — the bundled and per-ray dominant plans are
    bit-identical by the planner's window contract, and the pair pack
    only re-decodes the same windows."""
    ct, ph, s1, s2 = system
    kw = dict(n_iters=8, projector="siddon_dominant", recon="parallel",
              recon_n_theta=64, recon_nt=128)
    ap, mp, axp = pack_zstack(ct, ph, s1, s2, 64, 20.0, 0.8, **kw)
    assert "dom_pack_pair_y" in ap and axp["dom_pack_pair_y"] == "pair"
    assert "dom_pack_y" not in ap  # per-slice packs dropped
    out_p = make_jitted_zstack_step(mp, axp)(ap)
    a0, m0, ax0 = pack_zstack(ct, ph, s1, s2, 64, 20.0, 0.8,
                              trace_pairs=False, **kw)
    assert "dom_pack_pair_y" not in a0
    out_0 = make_jitted_zstack_step(m0, ax0)(a0)
    for i in range(2):
        np.testing.assert_array_equal(
            np.asarray(out_p["sino_raw"][i]),
            np.asarray(out_0["sino_raw"][i]))
        np.testing.assert_allclose(
            np.asarray(out_p["recon_HU"][i]),
            np.asarray(out_0["recon_HU"][i]), atol=1e-4)


def test_zstack_pair_trace_odd_nz(system):
    """Odd Nz duplicates the final slice inside the last pair and
    discards its paths — outputs still match per-slice runs."""
    import dataclasses

    ct, ph, s1, s2 = system
    kw = dict(n_iters=8, projector="siddon_dominant", recon="parallel",
              recon_n_theta=64, recon_nt=128)
    a, m, ax = pack_zstack(ct, ph, s1, s2, 64, 20.0, 0.8,
                           z_indices=[0, 1, 2], **kw)
    out = make_jitted_zstack_step(m, ax)(a)
    assert out["recon_HU"][0].shape[0] == 3
    ph2 = dataclasses.replace(ph, z_index=2)
    a1, m1 = pack_dect(ct, ph2, s1, s2, 64, 20.0, 0.8, **kw)
    ref = make_jitted_step(m1)(a1)
    np.testing.assert_allclose(
        np.asarray(out["recon_HU"][0][2]),
        np.asarray(ref["recon_HU"][0]), rtol=2e-4, atol=2e-4)
