"""Rebinned parallel-beam reconstruction tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from dexct_tpu.ops.fbp_fast import (
    pack_filtered,
    parallel_backproject_multi,
    parallel_rebin_plan,
    rebin_to_parallel,
)
from dexct_tpu.ops.filters import filter_frequency_response
from dexct_tpu.ops.siddon import material_path_sinogram, mono_sinogram
from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.pipeline.fused import _filter_views, make_jitted_step, pack_dect
from dexct_tpu.system import FanBeamGeometry, water_cylinder_phantom


@pytest.fixture(scope="module")
def cyl():
    ph = water_cylinder_phantom(N=128, dx=0.2)
    ct = FanBeamGeometry(N_channels=256, N_proj=360, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0)
    mu = ph.materials.mu_table(np.array([60.0]))[:, 0]
    sino = mono_sinogram(material_path_sinogram(ph, ct), mu)
    return ph, ct, mu, sino


class TestRebin:
    def test_rebinned_profile_matches_chord(self, cyl):
        ph, ct, mu, sino = cyl
        idx, w, t0, dt = parallel_rebin_plan(ct, 256, 512)
        par = np.asarray(rebin_to_parallel(
            jnp.asarray(sino[None]), jnp.asarray(idx), jnp.asarray(w), 512))
        ts = t0 + dt * np.arange(512)
        chord = 2 * np.sqrt(np.clip(10.24**2 - ts**2, 0, None)) * mu[1]
        inner = np.abs(ts) < 9.0
        err = par[0, 0] - chord
        assert np.sqrt((err[inner] ** 2).mean()) < 0.05
        # every θ line sees the same centered cylinder
        assert par[0].std(axis=0).max() < 0.05

    def test_weights_cover_redundant_pair(self, cyl):
        ph, ct, mu, sino = cyl
        idx, w, t0, dt = parallel_rebin_plan(ct, 64, 128)
        # inside the fan the 8 tap weights sum to 1 (two half-weight rays)
        ts = t0 + dt * np.arange(128)
        inside = np.abs(ts) < ct.SID * np.sin(ct.gamma_fan / 2) - 0.5
        wsum = w.reshape(64, 128, 8).sum(-1)
        np.testing.assert_allclose(wsum[:, inside], 1.0, atol=1e-6)
        assert np.all(wsum[:, ~inside] <= 1.0 + 1e-6)

    def test_parallel_fbp_recovers_mu(self, cyl):
        ph, ct, mu, sino = cyl
        n_theta, nt = 256, 512
        idx, w, t0, dt = parallel_rebin_plan(ct, n_theta, nt)
        par = rebin_to_parallel(jnp.asarray(sino[None]), jnp.asarray(idx),
                                jnp.asarray(w), nt)
        H, m = filter_frequency_response(nt, dt, 0.8, "sinc", "parallel")
        q = _filter_views(par, 1.0, jnp.asarray(H, jnp.float32), m, dt)
        thetas = jnp.asarray(np.arange(n_theta) * np.pi / n_theta,
                             jnp.float32)
        img = np.asarray(parallel_backproject_multi(
            pack_filtered(q), 1, thetas, t0, dt, nt, 128, 26.0,
            np.pi / n_theta))[0]
        center = img[56:72, 56:72]
        assert abs(center.mean() - mu[1]) / mu[1] < 0.005
        assert abs(img[2, 2]) < 0.02 * mu[1] + 2e-3


class TestFusedParallelRecon:
    def _setup(self, recon):
        ct = FanBeamGeometry(N_channels=96, N_proj=128,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=True)
        ph = water_cylinder_phantom(N=96, dx=0.25)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        return pack_dect(ct, ph, s1, s2, 96, 22.0, 0.8, n_iters=15,
                         recon=recon, recon_n_theta=128, recon_nt=256)

    def test_fused_parallel_matches_fan(self):
        a_f, m_f = self._setup("fan")
        a_p, m_p = self._setup("parallel")
        out_f = make_jitted_step(m_f)(a_f)
        out_p = make_jitted_step(m_p)(a_p)
        h_f = np.asarray(out_f["recon_HU"][1])
        h_p = np.asarray(out_p["recon_HU"][1])
        r = np.hypot(*(np.mgrid[0:96, 0:96] - 47.5)) * 22.0 / 96
        inner = r < 8.0
        rms = np.sqrt(((h_f - h_p)[inner] ** 2).mean())
        assert rms < 25.0  # HU; resolution/interp differences only

    def test_sharded_parallel_recon(self):
        from dexct_tpu.parallel import (
            shard_arrays,
            sharded_dect_step,
            view_mesh,
        )

        arrays, meta = self._setup("parallel")
        single = make_jitted_step(meta)(arrays)
        mesh = view_mesh(8)
        out = sharded_dect_step(mesh, meta, arrays.keys())(
            shard_arrays(arrays, mesh))
        np.testing.assert_allclose(
            np.asarray(out["recon_raw"][0]),
            np.asarray(single["recon_raw"][0]), atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["mat_recons"][1]),
            np.asarray(single["mat_recons"][1]), atol=1e-4,
        )


class TestSymBackprojection:
    """Symmetry-packed BP is arithmetically identical to the standard
    packed BP (ops/fbp_fast.py pack_filtered_sym/parallel_backproject_sym)."""

    @pytest.mark.parametrize("nth,N,tfrac", [(32, 48, 1.3), (50, 45, 0.7),
                                             (64, 33, 1.0)])
    def test_matches_standard_bp(self, nth, N, tfrac):
        from dexct_tpu.ops.fbp_fast import (
            pack_filtered_sym,
            parallel_backproject_sym,
        )

        rng = np.random.default_rng(3)
        K, nt, fov = 4, 64, 20.0
        t_max = fov / 2 * tfrac
        dt = 2 * t_max / nt
        t0 = -t_max + dt / 2
        qs = jnp.asarray(rng.standard_normal((K, nth, nt)), jnp.float32)
        thetas = jnp.asarray(np.arange(nth) * (np.pi / nth), jnp.float32)
        ref = parallel_backproject_multi(pack_filtered(qs), K, thetas, t0,
                                         dt, nt, N, fov, np.pi / nth)
        sym = parallel_backproject_sym(pack_filtered_sym(qs), K,
                                       thetas[: nth // 2], t0, dt, nt, N,
                                       fov, np.pi / nth)
        ref, sym = np.asarray(ref), np.asarray(sym)
        scale = np.abs(ref).max()
        assert np.abs(ref - sym).max() < 3e-5 * scale

    @pytest.mark.parametrize("nth,N,tfrac", [(32, 48, 1.3), (11, 45, 0.7),
                                             (7, 33, 1.0)])
    def test_2fold_matches_standard_bp_any_wedge(self, nth, N, tfrac):
        """Point-mirror kernel == plain packed BP on ARBITRARY theta
        subsets (incl. odd counts and partial wedges) — this is the
        shard-local symmetry kernel of the view-sharded recon path."""
        from dexct_tpu.ops.fbp_fast import (
            pack_filtered_sym2,
            parallel_backproject_sym2,
        )

        rng = np.random.default_rng(11)
        K, nt, fov = 4, 64, 20.0
        t_max = fov / 2 * tfrac
        dt = 2 * t_max / nt
        t0 = -t_max + dt / 2
        qs = jnp.asarray(rng.standard_normal((K, nth, nt)), jnp.float32)
        # a wedge of arbitrary lines, not a uniform [0, pi) grid
        thetas = jnp.asarray(
            np.sort(rng.uniform(0.2, 1.4, nth)), jnp.float32)
        ref = parallel_backproject_multi(pack_filtered(qs), K, thetas, t0,
                                         dt, nt, N, fov, np.pi / nth)
        sym = parallel_backproject_sym2(pack_filtered_sym2(qs), K, thetas,
                                        t0, dt, nt, N, fov, np.pi / nth)
        ref, sym = np.asarray(ref), np.asarray(sym)
        assert np.abs(ref - sym).max() < 3e-5 * np.abs(ref).max()

    def test_odd_view_count_rejected_in_pack(self):
        from dexct_tpu.ops.fbp_fast import pack_filtered_sym, pack_filtered_sym8

        with pytest.raises(ValueError):
            pack_filtered_sym(jnp.zeros((2, 31, 16)))
        with pytest.raises(ValueError):
            pack_filtered_sym8(jnp.zeros((2, 30, 16)))

    @pytest.mark.parametrize("nth,N,tfrac", [(32, 48, 1.3), (64, 45, 0.8),
                                             (48, 33, 1.0)])
    def test_8fold_matches_standard_bp(self, nth, N, tfrac):
        """8-fold orbit kernel + 4-fold boundary pass == plain packed BP."""
        from dexct_tpu.ops.fbp_fast import (
            pack_filtered_sym,
            pack_filtered_sym8,
            parallel_backproject_sym,
            parallel_backproject_sym8,
        )

        rng = np.random.default_rng(7)
        K, nt, fov = 4, 64, 20.0
        t_max = fov / 2 * tfrac
        dt = 2 * t_max / nt
        t0 = -t_max + dt / 2
        qs = jnp.asarray(rng.standard_normal((K, nth, nt)), jnp.float32)
        thetas = jnp.asarray(np.arange(nth) * (np.pi / nth), jnp.float32)
        ref = parallel_backproject_multi(pack_filtered(qs), K, thetas, t0,
                                         dt, nt, N, fov, np.pi / nth)
        bsel = np.array([0, nth // 4, nth // 2, 3 * nth // 4])
        got = parallel_backproject_sym8(
            pack_filtered_sym8(qs), K, thetas[1: nth // 4], t0, dt, nt, N,
            fov, np.pi / nth,
        ) + parallel_backproject_sym(
            pack_filtered_sym(qs[:, bsel]), K, thetas[bsel[:2]], t0, dt,
            nt, N, fov, np.pi / nth,
        )
        ref, got = np.asarray(ref), np.asarray(got)
        assert np.abs(ref - got).max() < 3e-5 * np.abs(ref).max()

    def test_fused_step_sym_matches_plain(self):
        """par_sym=True (default) vs False produce the same pipeline
        output; odd recon_n_theta falls back to the standard BP."""
        ct = FanBeamGeometry(N_channels=128, N_proj=96, gamma_fan=0.8230337,
                             SID=60.0, SDD=100.0, eid=True)
        ph = water_cylinder_phantom(N=64, dx=0.35)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        outs = {}
        for sym in (True, False):
            a, m = pack_dect(ct, ph, s1, s2, 64, 20.0, 0.8, n_iters=10,
                             recon="parallel", recon_n_theta=96,
                             recon_nt=192, par_sym=sym)
            assert m.par_sym is sym
            outs[sym] = make_jitted_step(m)(a)
        hu_t = np.asarray(outs[True]["recon_HU"][1])
        hu_f = np.asarray(outs[False]["recon_HU"][1])
        np.testing.assert_allclose(hu_t, hu_f, atol=0.5)  # HU, fp roundoff
        mt = np.asarray(outs[True]["mat_recons"][0])
        mf = np.asarray(outs[False]["mat_recons"][0])
        np.testing.assert_allclose(mt, mf, atol=1e-4)


def test_sym8_blocked_pack_matches_table_pack():
    """Round-3 1024^2 path: the per-block-packed sym8 kernel must equal
    the whole-table variant bit-for-bit on the same data (identical
    arithmetic, only the pack materialization moves into the scan)."""
    from dexct_tpu.ops.fbp_fast import (
        pack_filtered_sym8,
        parallel_backproject_sym8,
        parallel_backproject_sym8_qs,
    )

    rng = np.random.default_rng(9)
    K, nth, nt, N, fov = 3, 40, 48, 40, 18.0
    dt = fov / nt
    t0 = -fov / 2 + dt / 2
    qs = jnp.asarray(rng.standard_normal((K, nth, nt)), jnp.float32)
    thetas = jnp.asarray(np.arange(nth) * (np.pi / nth), jnp.float32)
    a = parallel_backproject_sym8(
        pack_filtered_sym8(qs), K, thetas[1: nth // 4], t0, dt, nt, N,
        fov, np.pi / nth)
    b = parallel_backproject_sym8_qs(
        qs, K, thetas[1: nth // 4], t0, dt, nt, N, fov, np.pi / nth)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6 * float(jnp.abs(a).max()))


def test_allgather_sym8_branch_taken():
    """Round-5: the all_gather fallback must also run the 8-fold kernel
    (per-shard orbit slices via static axis_size), not the 2-fold."""
    import dexct_tpu.ops.fbp_fast as ff
    from dexct_tpu.parallel import shard_arrays, sharded_dect_step, view_mesh
    from dexct_tpu.system import FanBeamGeometry, water_cylinder_phantom

    ct = FanBeamGeometry(N_channels=96, N_proj=128, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, eid=True)
    ph = water_cylinder_phantom(N=96, dx=0.25)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    arrays, meta = pack_dect(ct, ph, s1, s2, 96, 22.0, 0.8, n_iters=10,
                             recon="parallel", recon_n_theta=128,
                             recon_nt=256)
    single = make_jitted_step(meta)(arrays)
    called = []
    orig = ff.pack_filtered_sym8_rows
    ff.pack_filtered_sym8_rows = (
        lambda q: (called.append(q.shape), orig(q))[1])
    try:
        mesh = view_mesh(4)
        out = sharded_dect_step(mesh, meta, arrays.keys())(
            shard_arrays(arrays, mesh))
    finally:
        ff.pack_filtered_sym8_rows = orig
    assert called and called[0][2] == 4
    np.testing.assert_allclose(
        np.asarray(out["recon_raw"][0]),
        np.asarray(single["recon_raw"][0]), atol=1e-4)
