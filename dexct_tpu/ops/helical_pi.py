"""Quasi-exact helical reconstruction: the cone-parallel PI method.

Round-3 helical-exactness path (VERDICT round-2 item 6).  The
generalized-Feldkamp path (:func:`~dexct_tpu.ops.conebeam.
helical_fdk_reconstruct`) averages the full 2*pi of redundant rays per
voxel; its conjugate copies sample different z, which leaves a
sloped-boundary artifact (~4% max on the z-varying sphere study) that
no fan-native window weighting removes — single-copy (Tam-Danielsson)
selection in FAN coordinates is not in-plane exact because the two
copies carry different 1/h^2 weights (measured 20%, ROADMAP).

The PI method fixes this by changing coordinates first (Turbell 2001,
the "PI-original" reconstruction):

1. **Cone-parallel rebin**: each detector row rebins azimuthally from
   (beta, gamma) to (theta, t) with theta = beta + gamma - pi/2 kept on
   the full unwrapped scan range (NOT folded to [0, pi), and NOT
   averaging conjugates — each parallel sample keeps its own source
   z).  One (theta, t) tap pattern serves all R rows: the fan table is
   laid out [V*C, R] so the bilinear rebin is 4 row-R gathers per bin.
2. **Parallel ramp filtering** along t per (theta-line, row), with the
   cone pre-weight cos(kappa) — in parallel coordinates the 2-D FBP
   weight is 1 (no 1/L^2), which is what makes single-copy coverage
   exact in-plane.
3. **TD-window backprojection**: voxel (x, y, z) at line theta has
   t = x cos + y sin (affine), in-plane source distance
   L = SID cos(gamma) + s (s the along-line coordinate), source height
   z_s = z0 + pitch * beta / 2pi, and detector row height (at-iso
   units) h = (z - z_s) * SID / L.  The ray is used only inside the
   Tam-Danielsson window
       -(P/4pi)(pi + 2 gamma) <= h <= (P/4pi)(pi - 2 gamma)
   (the projection of the previous/next helix turn).  The window is
   applied as an explicit PARTITION OF UNITY across every helix copy
   of the line: copies live at theta + m*pi with closed-form source
   heights (z_s steps by P/2 per half turn, gamma and the in-plane
   distance L alternate sign with m), so
   w = K(h_0) / sum_m K(h_m) with K the boundary-straddling tapered
   TD window — conjugate weights sum to exactly 1 even at the window
   edges and at detector clipping, and the reconstruction is the
   plain parallel-FBP integral  sum w q~ dtheta  (no per-voxel
   normalization of the FILTERED backprojection, which would reweight
   frequency content and shade the image).

Measured verdict (z-varying sphere study, tests/test_conebeam.py):
at this simulator's geometry envelope (SID 60 cm, cone angles <= ~4
degrees) the PI path's own resampling floor (~4% max on the matched
z-UNIFORM comparison — the azimuthal rebin + pi-coverage
discretization) exceeds the cone artifact it removes: z-varying
max/rms is 6-7%/1.7% vs the generalized-Feldkamp path's 4%/1.3%, and
gFDK stays ahead even at pitch = 6 with a 16-row detector.  The
gFDK path therefore remains the default helical reconstruction; this
module ships as the measured alternative (its advantage regime —
cone angles beyond ~5-10 degrees — lies outside the reference
protocol) and as the scaffold for a future exact (Katsevich) path,
whose rebin/partition machinery it shares.  Scope: circular orbits
(pitch = 0) have no TD window — use
:func:`~dexct_tpu.ops.conebeam.fdk_reconstruct`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["helical_pi_reconstruct"]


def _conepar_rebin_plan(ct, nt):
    """Host tables for the azimuthal rebin of one helical scan.

    Target grid: theta_j = beta_j + pi/2 (same count/spacing as views,
    so the unwrapped scan range maps 1:1), t_k symmetric over the fan.
    Returns (idx [nT*nt*4] int32 into V*C, w [nT*nt*4] f32, t0, dt,
    thetas [nT]); the backprojector recomputes each sample's source
    angle from (theta, t) in closed form.
    """
    sid = ct.SID
    v, c = ct.N_proj, ct.N_channels
    dgamma = ct.dgamma
    betas = np.asarray(ct.betas, np.float64)  # unwrapped, uniform
    dbeta = float(betas[1] - betas[0])
    gam_lim = ct.gamma_fan / 2.0
    t_max = sid * np.sin(gam_lim)
    dt = 2.0 * t_max / nt
    t0 = -t_max + 0.5 * dt
    # theta grid centered so beta_need(gamma=0) = betas maps 1:1
    thetas = betas - np.pi / 2.0
    ts = t0 + dt * np.arange(nt)

    tt, th = np.meshgrid(ts, thetas)  # [nT, nt]
    gam = np.arcsin(np.clip(tt / sid, -1.0, 1.0))
    # copy-A fan coordinates of line (theta, t):
    # beta = theta - gamma + pi/2, channel gamma
    # (theta = beta + gamma - pi/2, t = SID sin gamma — CLAUDE.md)
    beta_need = th + np.pi / 2.0 - gam
    fb = (beta_need - betas[0]) / dbeta
    ib0 = np.floor(fb).astype(np.int64)
    wb1 = (fb - ib0).astype(np.float64)
    valid_b = (ib0 >= 0) & (ib0 <= v - 2)
    ib0c = np.clip(ib0, 0, v - 2)
    fg = gam / dgamma - 0.5 + c / 2.0
    ig0 = np.clip(np.floor(fg), 0, c - 2).astype(np.int64)
    wg1 = np.clip(fg - ig0, 0.0, 1.0)
    valid = valid_b & (np.abs(gam) <= gam_lim)

    idx = np.stack([
        ib0c * c + ig0, ib0c * c + ig0 + 1,
        (ib0c + 1) * c + ig0, (ib0c + 1) * c + ig0 + 1,
    ], -1)
    w = np.stack([
        (1 - wb1) * (1 - wg1), (1 - wb1) * wg1,
        wb1 * (1 - wg1), wb1 * wg1,
    ], -1) * valid[..., None]
    return (idx.astype(np.int32).reshape(-1),
            w.astype(np.float32).reshape(-1),
            float(t0), float(dt),
            thetas.astype(np.float32))


@functools.partial(
    jax.jit,
    static_argnames=("n_matrix", "nz_out", "nt", "n_rows",
                     "view_block", "fov"),
)
def _pi_backproject(par, sid, row_h, n_rows, pitch, z0_src,
                    thetas, t0, dt, nt, n_matrix, nz_out, fov, dz_out,
                    z_lo, dtheta, *, view_block=8):
    """TD-windowed cone-parallel backprojection.

    par: [nT, nt, R] filtered cone-parallel stacks (row-minor so the
    (t0, t0+1) x (r0, r0+1) quad is ONE row-2R gather of the
    t-pair-packed table).  Returns [nz, N, N].
    """
    nT = par.shape[0]
    R = n_rows
    dtype = par.dtype
    N = n_matrix
    px_size = fov / N
    c_np = (np.arange(N) + 0.5 - N / 2.0) * px_size
    XX, YY = np.meshgrid(c_np, c_np)
    sel = np.nonzero((np.hypot(XX, YY) <= fov / 2.0).reshape(-1))[0]
    P = len(sel)
    X = jnp.asarray(XX.reshape(-1)[sel], dtype)
    Y = jnp.asarray(YY.reshape(-1)[sel], dtype)
    zc = jnp.asarray(z_lo + np.arange(nz_out) * dz_out, dtype)

    # t-pair pack: row (j, k) holds (par[j, k, :], par[j, k+1, :])
    nxt = jnp.concatenate([par[:, 1:], par[:, -1:]], axis=1)
    packed = jnp.concatenate([par, nxt], axis=-1).reshape(
        nT * nt, 2 * R)  # [nT*nt, 2R]

    vb = max(1, min(view_block, nT))
    while nT % vb:
        vb -= 1
    tb = thetas.reshape(nT // vb, vb)
    voff = jnp.arange(nT, dtype=jnp.int32).reshape(nT // vb, vb)

    def block(carry, args):
        num, den = carry
        th, vo = args
        ct_, st_ = jnp.cos(th), jnp.sin(th)
        t = X[None, :] * ct_[:, None] + Y[None, :] * st_[:, None]
        s = -X[None, :] * st_[:, None] + Y[None, :] * ct_[:, None]
        sg = jnp.clip(t / sid, -0.999, 0.999)
        gam = jnp.arcsin(sg)
        cg = jnp.sqrt(1.0 - sg * sg)
        # ray direction is -e for copy A, so the in-plane distance from
        # the source to the voxel is SID cos(gamma) - s
        L = sid * cg - s
        L = jnp.maximum(L, 1e-3)
        beta = th[:, None] + 0.5 * np.pi - gam
        z_s = z0_src + pitch * beta / (2.0 * np.pi)
        cidx = (t - t0) / dt
        c0 = jnp.clip(jnp.floor(cidx), 0, nt - 2)
        fc = jnp.clip(cidx - c0, 0.0, 1.0)
        w_in = jnp.where((cidx >= 0.0) & (cidx <= nt - 1.0), 1.0, 0.0)

        qp = pitch / (4.0 * np.pi)
        taper = 0.5 * row_h
        # copy-m geometry (theta + m*pi): gamma and s flip with odd m
        L_odd = jnp.maximum(sid * cg + s, 1e-3)
        th_lo = thetas[0] - 1e-6
        th_hi = thetas[-1] + 1e-6

        def kfun(h, g):
            top = qp * (np.pi - 2.0 * g)
            bot = -qp * (np.pi + 2.0 * g)
            in_det = jnp.where(jnp.abs(h) <= 0.5 * row_h * (R + 1.0),
                               1.0, 0.0)
            return (jnp.clip((h - bot) / taper + 0.5, 0.0, 1.0)
                    * jnp.clip((top - h) / taper + 0.5, 0.0, 1.0)
                    * in_det)

        def one_slice(z):
            h = (z - z_s) * sid / L
            k0 = kfun(h, gam)
            ksum = k0
            for m in range(-4, 5):
                if m == 0:
                    continue
                odd = m % 2
                beta_m = beta + m * np.pi + (2.0 * gam if odd else 0.0)
                zs_m = z0_src + pitch * beta_m / (2.0 * np.pi)
                Lm = L_odd if odd else L
                gm = -gam if odd else gam
                hm = (z - zs_m) * sid / Lm
                th_m = th[:, None] + m * np.pi
                ok = jnp.where((th_m >= th_lo) & (th_m <= th_hi),
                               1.0, 0.0)
                ksum = ksum + kfun(hm, gm) * ok
            w_td = k0 / jnp.maximum(ksum, 1e-6)
            ridx = h / row_h - 0.5 + R / 2.0
            r0 = jnp.clip(jnp.floor(ridx), 0, max(R - 2, 0))
            fr = jnp.clip(ridx - r0, 0.0, 1.0)
            w_z = jnp.where((ridx >= -0.5) & (ridx <= R - 0.5), 1.0, 0.0)
            idx = (vo[:, None] * nt + c0.astype(jnp.int32))
            rows = packed[idx.reshape(-1)].reshape(idx.shape + (2 * R,))
            r0i = r0.astype(jnp.int32)
            # row select from the 2R-wide fetched quad (rows r0, r0+1
            # of both t taps) via a one-hot contraction over R
            onehot0 = (jnp.arange(R, dtype=jnp.int32)[None, None, :]
                       == r0i[..., None]).astype(dtype)
            onehot1 = (jnp.arange(R, dtype=jnp.int32)[None, None, :]
                       == jnp.minimum(r0i + 1, R - 1)[..., None]
                       ).astype(dtype)
            ta = rows[..., :R]
            tbv = rows[..., R:]
            v00 = jnp.sum(ta * onehot0, -1)
            v01 = jnp.sum(ta * onehot1, -1)
            v10 = jnp.sum(tbv * onehot0, -1)
            v11 = jnp.sum(tbv * onehot1, -1)
            val = ((v00 * (1 - fc) + v10 * fc) * (1 - fr)
                   + (v01 * (1 - fc) + v11 * fc) * fr)
            w = w_in * w_z * w_td
            return (jnp.sum(val * w, axis=0), jnp.sum(w, axis=0))

        dn, dd = jax.lax.map(one_slice, zc)
        return (num + dn, den + dd), None

    acc0 = (jnp.zeros((nz_out, P), dtype), jnp.zeros((nz_out, P), dtype))
    (num, den), _ = jax.lax.scan(block, acc0, (tb, voff))
    # partition weights sum to 1 per line, each line spans d(theta) of
    # parallel angle -> the plain parallel-FBP integral
    out = num * dtheta
    vol = jnp.zeros((nz_out, N * N), dtype)
    vol = vol.at[:, jnp.asarray(sel)].set(out)
    return vol.reshape(nz_out, N, N)


def helical_pi_reconstruct(sino_log, geometry, n_matrix, fov, ramp, *,
                           z_out=None, nt=None, window="sinc",
                           view_block=8):
    """Cone-parallel PI reconstruction -> [nz, N, N] in cm^-1.

    ``sino_log``: [V, R, C] helical line integrals
    (:func:`~dexct_tpu.ops.conebeam.cone_sinogram` on a
    :class:`~dexct_tpu.system.geometry.HelicalConeBeamGeometry`).
    See the module docstring for the method; use the generalized-
    Feldkamp path for pitch = 0.
    """
    from .filters import filter_frequency_response

    ct = geometry
    V, R, C = sino_log.shape
    if R != ct.N_rows:
        raise ValueError(f"sinogram has {R} rows, geometry {ct.N_rows}")
    pitch = float(getattr(ct, "pitch", 0.0))
    if abs(pitch) < 1e-9:
        raise ValueError(
            "pitch = 0 has no Tam-Danielsson window; use fdk_reconstruct")
    if getattr(ct, "ffs", "none") != "none":
        raise ValueError(
            "the PI rebinning assumes a static focal spot; "
            "reconstruct z-FFS scans with helical_fdk_reconstruct")
    nt = int(2 * C) if nt is None else int(nt)
    dtype = jnp.result_type(sino_log.dtype, jnp.float32)

    if z_out is None:
        travel = pitch * ct.rotation_total / (2.0 * np.pi)
        half = 0.4 * travel
        nz = max(int(2.0 * half / ct.h_iso), 1)
        z_out = (np.arange(nz) + 0.5) * (2.0 * half / nz) - half
    z_out = np.asarray(z_out, np.float64)
    dz = float(z_out[1] - z_out[0]) if len(z_out) > 1 else float(ct.h_iso)

    # cone pre-weight (cos kappa per row) then azimuthal rebin per row
    cosk = ct.SID / np.sqrt(ct.SID ** 2 + np.asarray(ct.z_iso) ** 2)
    pw = sino_log.astype(dtype) * jnp.asarray(cosk, dtype)[None, :, None]
    idx, w, t0, dt, thetas = _conepar_rebin_plan(ct, nt)
    table = pw.transpose(0, 2, 1).reshape(V * C, R)  # [V*C, R]
    # theta-chunked gathers: the [bins, 4, R] tap intermediate lane-pads
    # its small trailing dims when materialized (the CLAUDE.md packing
    # rule; same blowup class as the round-3 rebin_to_parallel OOM), so
    # bound the padded temp to ~150 MB
    idx_j = jnp.asarray(idx)
    w_j = jnp.asarray(w).reshape(-1, 4)
    n_bins = V * nt

    def chunk(args):
        ii, ww = args
        taps = table[ii].reshape(-1, 4, R)
        return jnp.einsum("bt,btr->br", ww, taps,
                          precision=jax.lax.Precision.HIGHEST)

    max_bins = max((150 << 20) // (4 * 128 * 4), nt)
    if n_bins <= max_bins:
        par = chunk((idx_j, w_j))
    else:
        n_chunks = -(-n_bins // max_bins)
        while n_bins % n_chunks:
            n_chunks += 1
        b = n_bins // n_chunks
        par = jax.lax.map(
            chunk, (idx_j.reshape(n_chunks, b * 4),
                    w_j.reshape(n_chunks, b, 4))).reshape(n_bins, R)
    par = par.reshape(V, nt, R)

    # parallel ramp filter along t, per (theta-line, row)
    H, m = filter_frequency_response(nt, dt, ramp, window, "parallel")
    spec = jnp.fft.rfft(par, n=m, axis=1)
    par = jnp.fft.irfft(spec * jnp.asarray(H, dtype)[None, :, None],
                        n=m, axis=1)[:, :nt] * dt

    # source height z0 at beta = 0 (betas start at 0, z symmetric about
    # the scan center)
    z0_src = float(np.asarray(ct.source_z)[0])
    return _pi_backproject(
        par, float(ct.SID), float(ct.h_iso), int(R),
        pitch, z0_src, jnp.asarray(thetas, dtype), t0, dt, nt,
        int(n_matrix), int(len(z_out)), float(fov), dz, float(z_out[0]),
        float(ct.rotation_total / V), view_block=int(view_block))
