"""Exact helical reconstruction: Katsevich filtered backprojection.

The theoretically-exact member of the helical family (ROADMAP "exact
helical = Katsevich, still open"; the reference is strictly 2-D —
plots.py:124-126 — so this whole subsystem is beyond-reference).  The
generalized-Feldkamp path (:func:`~dexct_tpu.ops.conebeam.
helical_fdk_reconstruct`) carries a ~4% sloped-boundary artifact that
is *intrinsic* to the interpolating-FDK class (round-3 window study);
Katsevich's inversion formula has no such term — its error budget is
pure discretization.

Implementation follows the native cone-beam (curved detector)
factorization of Noo, Pack & Heuscher 2003 (Phys. Med. Biol. 48), in
this package's coordinates (CLAUDE.md conventions: source at
``SID*(cos b, sin b)``, channel ``g`` ray direction
``-(cos(b+g), sin(b+g))``, detector rows at iso heights ``z_iso``
relative to the source plane):

1. **Derivative at constant ray direction**: the ray direction depends
   on ``b + g`` only, so the fixed-direction chain rule is
   ``g1 = dg/db - dg/dg`` — the beta partial a 4th-order centered
   difference, the gamma partial (by default) an exact spectral
   derivative apodized with the same windowed rolloff as the 2-D fan
   filter, which matches the chain's in-plane MTF to the package's
   fan/FDK reconstructions (see :func:`_fixed_direction_derivative`
   for why the literal fixed-direction stencil must NOT be used, and
   for the measured stencil-vs-spectral study).
2. **Cone-length weight** ``cos k = SID/sqrt(SID^2+h^2)`` per row.
3. **Forward kappa rebinning**: the kappa-plane K(b, psi) through the
   source and the helix points at ``b+psi, b+2 psi`` intersects the
   detector cylinder in the line (verified numerically to 1e-15 in
   this geometry's sign conventions)::

       h_kappa(psi, g) = (P/2pi) * (psi cos g  -  (psi/tan psi) sin g)

   Resampling every view onto the ``n_psi`` kappa-lines is a dense
   [n_psi, C, R] x [V, R, C] contraction (two-tap row lerp encoded as
   a one-hot-weighted matrix — rows are the lane-sized axis, so this
   runs on the MXU instead of a per-element gather, per the CLAUDE.md
   "no vectorized gather in kernels" rule).
4. **Hilbert filtering along the kappa-line** in the fan-angle
   variable, kernel ``(1/pi) / sin(g - g')`` (band-limited: odd taps
   ``2 dg / (pi sin(j dg))``), FFT convolution.
5. **Backward rebinning** to detector rows at the smallest-|psi| root
   of ``h_kappa(psi, g) = h`` (host-inverted on a dense psi grid,
   two-tap over psi — again a dense [C, R, n_psi] contraction).
6. **PI-interval backprojection** with weight ``1/v`` (v the in-plane
   distance ``SID - x.(cos b, sin b)`` — NOT the 1/L^2 of FDK) over
   exactly the views where the voxel projects inside the
   Tam-Danielsson window (the projection of the adjacent helix turns;
   in these conventions ``-(P/4pi)(pi-2g)/cos g <= h <=
   +(P/4pi)(pi+2g)/cos g``), with a small complementary taper at the
   window edges (the two PI endpoints see the same spatial line, so
   feathered end weights summing to 1 stay consistent).

Scope/requirements: uniform unwrapped helical view grid, TD window
inside the detector (``pitch <= R h_iso 4pi cos gm / (2(pi+2 gm))``,
checked), output z range limited to voxels whose full PI interval is
inside the scan (checked).  ``pitch = 0`` has no PI window — use
:func:`~dexct_tpu.ops.conebeam.fdk_reconstruct`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["katsevich_reconstruct"]


def _kappa_height(psi, gam, c):
    """h_kappa(psi, g) in iso units; c = pitch/2pi.  psi=0 is the
    analytic limit  -c sin g  (psi/tan psi -> 1)."""
    psi = np.asarray(psi, np.float64)
    ratio = np.where(np.abs(psi) < 1e-12, 1.0,
                     psi / np.tan(np.where(np.abs(psi) < 1e-12, 1.0,
                                           psi)))
    return c * (psi * np.cos(gam) - ratio * np.sin(gam))


def _cr_weights(t):
    """Catmull-Rom weights for taps at offsets (-1, 0, 1, 2) from the
    floor index, fraction ``t`` in [0, 1].  Interpolating (reproduces
    the samples exactly at t=0,1) and C^1 — the standard 4-tap cubic."""
    t = np.asarray(t, np.float64)
    t2, t3 = t * t, t * t * t
    return np.stack([-0.5 * t + t2 - 0.5 * t3,
                     1.0 - 2.5 * t2 + 1.5 * t3,
                     0.5 * t + 2.0 * t2 - 1.5 * t3,
                     -0.5 * t2 + 0.5 * t3], axis=-1)


def _plan(ct, n_psi, interp="linear"):
    """Host tables for one helical geometry.

    Returns (Wf [n_psi, C, R], Wb [C, R, n_psi], kern [L] fft kernel
    spectrum prep inputs, psi grid) — all float32 numpy.

    ``interp``: "linear" (2-tap) or "cubic" (4-tap Catmull-Rom, edge
    taps clamped) for BOTH resamplings.  Measured
    (tools/bench_katsevich_interp.py): cubic trims ~0.5% at high pitch
    but its clamped edge taps near the TD boundary add a ~0.7%
    amplitude bias, so linear is the default.
    """
    P = float(ct.pitch)
    sid = float(ct.SID)
    C, R = int(ct.N_channels), int(ct.N_rows)
    gam = np.asarray(ct.gammas, np.float64)
    h_iso = float(ct.h_iso)
    c = P / (2.0 * np.pi)
    gm = 0.5 * float(ct.gamma_fan)

    # TD window must fit the detector (else the PI data is truncated)
    h_need = (abs(P) / (4.0 * np.pi)) * (np.pi + 2.0 * gm) / np.cos(gm)
    h_det = 0.5 * R * h_iso
    if h_need > h_det + 1e-9:
        raise ValueError(
            f"TD window ({h_need:.3f} cm at iso) exceeds the detector "
            f"half-height ({h_det:.3f} cm): reduce pitch below "
            f"{abs(P) * h_det / h_need:.3f} cm/turn or add rows")

    psi_max = 0.5 * np.pi + gm + 0.35
    psis = np.linspace(-psi_max, psi_max, n_psi)

    # forward rebin: row interpolation of h_kappa(psi_p, gam_c)
    hk = _kappa_height(psis[:, None], gam[None, :], c)  # [n_psi, C]
    ridx = hk / h_iso - 0.5 + R / 2.0
    r0 = np.clip(np.floor(ridx), 0, R - 2).astype(np.int64)
    fr = np.clip(ridx - r0, 0.0, 1.0)
    Wf = np.zeros((n_psi, C, R), np.float64)
    ii, jj = np.meshgrid(np.arange(n_psi), np.arange(C), indexing="ij")
    if interp == "cubic":
        w4 = _cr_weights(fr)  # [n_psi, C, 4]
        for k, off in enumerate((-1, 0, 1, 2)):
            np.add.at(Wf, (ii, jj, np.clip(r0 + off, 0, R - 1)),
                      w4[..., k])
    else:
        Wf[ii, jj, r0] = 1.0 - fr
        Wf[ii, jj, r0 + 1] = fr

    # backward rebin: smallest-|psi| root of h_kappa(psi, g) = h_row,
    # walked outward from psi=0 on a fine grid (h_kappa is monotone
    # near 0 — slope c cos g — but not over the whole psi range)
    fine = np.linspace(-psi_max, psi_max, 8192)
    mid = 4096  # index of psi ~ 0
    Wb = np.zeros((C, R, n_psi), np.float64)
    dpsi = psis[1] - psis[0]
    rows_h = np.asarray(ct.z_iso, np.float64)
    for ci in range(C):
        hfine = _kappa_height(fine, gam[ci], c)
        h0 = hfine[mid]
        for ri in range(R):
            h = rows_h[ri]
            # walk up (h > h0) or down from psi = 0 to the 1st crossing
            if h >= h0:
                seg = hfine[mid:]
                k = np.searchsorted(np.maximum.accumulate(seg), h)
                if k >= len(seg):
                    continue  # row outside the kappa family: unused
                lo = mid + k - 1
            else:
                seg = hfine[mid::-1]
                k = np.searchsorted(np.maximum.accumulate(-seg), -h)
                if k >= len(seg):
                    continue
                lo = mid - k
            h_lo, h_hi = hfine[lo], hfine[lo + 1]
            t = 0.0 if h_hi == h_lo else (h - h_lo) / (h_hi - h_lo)
            psi_hat = fine[lo] + t * (fine[lo + 1] - fine[lo])
            pidx = (psi_hat - psis[0]) / dpsi
            p0 = int(np.clip(np.floor(pidx), 0, n_psi - 2))
            fp = np.clip(pidx - p0, 0.0, 1.0)
            if interp == "cubic":
                w4 = _cr_weights(fp)
                for k, off in enumerate((-1, 0, 1, 2)):
                    Wb[ci, ri, int(np.clip(p0 + off, 0, n_psi - 1))] \
                        += w4[k]
            else:
                Wb[ci, ri, p0] = 1.0 - fp
                Wb[ci, ri, p0 + 1] = fp
    return Wf.astype(np.float32), Wb.astype(np.float32), psis


def _hilbert_kernel(C, dgamma, L):
    """Band-limited (1/pi)/sin(g) convolution taps, length-L circular
    layout (odd taps 2 dg / (pi sin(j dg)), even taps 0)."""
    k = np.zeros(L, np.float64)
    j = np.arange(1, C)
    odd = j[j % 2 == 1]
    vals = 2.0 * dgamma / (np.pi * np.sin(odd * dgamma))
    k[odd] = vals
    k[L - odd] = -vals  # antisymmetric
    return k


@functools.partial(
    jax.jit,
    static_argnames=("n_matrix", "nz_out", "n_rows", "view_block",
                     "fov", "interp", "slice_window", "sid", "dgamma",
                     "dz_out", "z0", "pitch", "dbeta", "taper"),
)
def _katsevich_backproject(gf, betas, src_z, sid, dgamma, row_h, n_rows,
                           pitch, n_matrix, nz_out, fov, dz_out, z0,
                           beta_mid, dbeta, taper, *, view_block=8,
                           interp="linear", slice_window=True):
    """PI-window backprojection of the Katsevich-filtered data.

    Same traversal structure as the gFDK backprojector
    (:func:`~dexct_tpu.ops.conebeam._helical_backproject`: view-block
    scan, per-slice vmap, one 4-tap gather per voxel per view) with
    the Katsevich weighting: amplitude ``1/v`` (in-plane distance, not
    1/L^2), the sharp-tapered TD window instead of the 2*pi window,
    and NO weight normalization — the PI integral itself is exact.

    ``slice_window``: the tapered TD window is hard-zero once |zt|
    exceeds the maximum kappa-window height, i.e. a view only feeds
    slices within D = Hmax*(SID + fov/2)/SID of its source z — so each
    view block dynamic-slice-updates only the L = O(pitch/dz) slices
    it can reach instead of all ``nz_out`` (the gFDK slice-window
    trick; results identical, per-slice cost O(views-per-turn)).
    Auto-disabled when the scan is short enough that L >= nz_out.
    """
    V, R, C = gf.shape
    dtype = gf.dtype
    N = n_matrix
    px_size = fov / N
    c_np = (np.arange(N) + 0.5 - N / 2.0) * px_size
    XX, YY = np.meshgrid(c_np, c_np)
    sel = np.nonzero((np.hypot(XX, YY) <= fov / 2.0).reshape(-1))[0]
    Pn = len(sel)
    X = jnp.asarray(XX.reshape(-1)[sel], dtype)
    Y = jnp.asarray(YY.reshape(-1)[sel], dtype)
    zc = jnp.asarray(z0 + np.arange(nz_out) * dz_out, dtype)
    qp = pitch / (4.0 * np.pi)

    vb = max(1, min(view_block, V))
    while V % vb:
        vb -= 1
    bb = betas.reshape(V // vb, vb)
    zb = src_z.reshape(V // vb, vb)
    voff = jnp.arange(V, dtype=jnp.int32).reshape(V // vb, vb)

    L = Dz = None
    if slice_window:
        try:  # statics only — falls back to the full scan if any
            # parameter arrives traced (never the case from
            # katsevich_reconstruct, whose scalars come from geometry)
            gm = 0.5 * C * float(dgamma)
            hmax = (abs(float(qp)) * (np.pi + 2.0 * gm) / np.cos(gm)
                    + 0.5 * float(taper))
            Dz = hmax * (float(sid) + 0.5 * float(fov)) / float(sid)
            span_z = ((vb - 1) * abs(float(dbeta)) * abs(float(pitch))
                      / (2.0 * np.pi))
            Lw = int(np.ceil((2.0 * Dz + span_z) / float(dz_out) + 3.1))
            if 0 < Lw <= nz_out - 2 and float(dz_out) > 0:
                L = Lw
        except (TypeError, jax.errors.TracerArrayConversionError,
                jax.errors.ConcretizationTypeError):
            L = None

    def block(carry, args):
        acc = carry
        beta, sz, vo = args
        cb, sb = jnp.cos(beta), jnp.sin(beta)
        ell = sid - (X[None, :] * cb[:, None] + Y[None, :] * sb[:, None])
        vt = -X[None, :] * sb[:, None] + Y[None, :] * cb[:, None]
        gam = jnp.arctan2(-vt, ell)
        inv_h = jax.lax.rsqrt(ell * ell + vt * vt)
        cidx = gam / dgamma - 0.5 + C / 2.0
        c0 = jnp.clip(jnp.floor(cidx), 0, C - 2)
        fc = jnp.clip(cidx - c0, 0.0, 1.0)
        w_in = jnp.where((cidx >= 0.0) & (cidx <= C - 1.0), 1.0, 0.0)
        w_amp = w_in / jnp.maximum(ell, 1e-3)
        cg = jnp.cos(gam)
        htop = qp * (np.pi + 2.0 * gam) / cg
        hbot = -qp * (np.pi - 2.0 * gam) / cg

        qb = gf[vo]
        qb_r1 = jnp.concatenate([qb[:, 1:], qb[:, -1:]], 1)
        if interp == "cubic":
            # 4 row taps (r0-1 .. r0+2, edges replicated == clamped)
            # x 2 channel taps in one 8-wide packed row
            qb_rm1 = jnp.concatenate([qb[:, :1], qb[:, :-1]], 1)
            qb_r2 = jnp.concatenate([qb_r1[:, 1:], qb_r1[:, -1:]], 1)
            row_taps = (qb_rm1, qb, qb_r1, qb_r2)
        else:
            row_taps = (qb, qb_r1)
        taps = []
        for rt in row_taps:
            taps.append(rt)
            taps.append(jnp.concatenate([rt[..., 1:], rt[..., -1:]], -1))
        packed_flat = jnp.stack(taps, -1).reshape(vb * R * C, len(taps))
        voff_b = jnp.arange(vb, dtype=jnp.int32)

        def one_slice(z):
            zt = (z - sz)[:, None] * sid * inv_h
            ridx = zt / row_h - 0.5 + R / 2.0
            r0 = jnp.clip(jnp.floor(ridx), 0, max(R - 2, 0))
            fr = jnp.clip(ridx - r0, 0.0, 1.0)
            w_z = jnp.where((ridx >= -0.5) & (ridx <= R - 0.5), 1.0, 0.0)
            # +0.5: weight is 1/2 ON the window boundary, so the two
            # PI endpoints (the same spatial line) sum to exactly 1 —
            # without it each end loses taper/2 of coverage and the
            # amplitude deficit scales like taper/(c*pi) (measured
            # 0.72/0.87/0.91 at pitch 2/4/5.5 before the fix)
            w_td = (jnp.clip((zt - hbot) / taper + 0.5, 0.0, 1.0)
                    * jnp.clip((htop - zt) / taper + 0.5, 0.0, 1.0))
            w = w_amp * w_z * w_td
            idx = (r0.astype(jnp.int32) * C + c0.astype(jnp.int32)
                   + voff_b[:, None] * (R * C))
            rows = packed_flat[idx.reshape(-1)].reshape(
                idx.shape + (len(taps),))
            if interp == "cubic":
                fr2, fr3 = fr * fr, fr * fr * fr
                wr = (-0.5 * fr + fr2 - 0.5 * fr3,
                      1.0 - 2.5 * fr2 + 1.5 * fr3,
                      0.5 * fr + 2.0 * fr2 - 1.5 * fr3,
                      -0.5 * fr2 + 0.5 * fr3)
            else:
                wr = (1.0 - fr, fr)
            val = sum(
                wj * (rows[..., 2 * j] * (1 - fc)
                      + rows[..., 2 * j + 1] * fc)
                for j, wj in enumerate(wr))
            return jnp.sum(val * w, axis=0)

        if L is not None:
            k0 = jnp.clip(
                jnp.floor((jnp.min(sz) - Dz - z0) / dz_out) - 1.0,
                0.0, float(nz_out - L)).astype(jnp.int32)
            zw = jax.lax.dynamic_slice(zc, (k0,), (L,))
            contrib = jax.vmap(one_slice)(zw)
            return jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(acc, (k0, 0), (L, Pn))
                + contrib, (k0, 0)), None
        return acc + jax.vmap(one_slice)(zc), None

    acc0 = jnp.zeros((nz_out, Pn), dtype)
    acc, _ = jax.lax.scan(block, acc0, (bb, zb, voff))
    # global -1/(2 pi): the inversion formula is
    # f(x) = -(1/2pi) int dlambda / v(lambda, x) * gF  (Noo-Pack-
    # Heuscher 2003 eq. 26 adapted to these conventions)
    out = acc * (-dbeta / (2.0 * np.pi))
    vol = jnp.zeros((nz_out, N * N), dtype)
    vol = vol.at[:, jnp.asarray(sel)].set(out)
    return vol.reshape(nz_out, N, N)


def _fixed_direction_derivative(g, dbeta, dgamma, *, deriv="stencil4",
                                ramp=0.8, window="sinc"):
    """``g1 = dg/dbeta - dg/dgamma`` — the derivative at constant ray
    direction (direction depends on ``beta + gamma`` only, so the
    fixed-direction chain rule subtracts the two partials).  The beta
    partial is a 4th-order centered difference (measured non-limiting:
    96 -> 384 views/turn moves the z-varying study < 0.3%); the gamma
    partial is selected by ``deriv``:

    * ``"stencil4"`` — 4th-order centered difference.  Its transfer
      ``(8 sin(w h) - sin(2 w h)) / (6 h)`` rolls off to 0.85x the
      ideal ``w`` at half-Nyquist and 0 at Nyquist, i.e. it carries a
      fixed low-pass that is NOT matched to any fan-FBP window.
    * ``"spectral"`` — exact FFT derivative ``i w`` apodized by the
      SAME windowed rolloff family the 2-D fan filter uses
      (:func:`~dexct_tpu.ops.filters._window`, default Shepp-Logan at
      0.8 Nyquist).  This matches the Katsevich chain's in-plane MTF
      to the package's fan/FDK reconstructions.

    Measured traps (z-varying sphere study, R=16):

    * Do NOT implement this as the literal fixed-direction stencil
      ``[g(b+db, g-db) - g(b-db, g+db)] / 2db``: at protocol view
      sampling ``db`` spans several channels, so that stencil
      low-passes the data tangentially (measured on the 2-D reduction
      at 96 views/turn: off-center disk reconstructs at 0.60-0.85 of
      truth — a resolution artifact, not a formula error; the split
      form restores 0.997-1.00).
    * Stencil order sets an MTF-mismatch floor vs the windowed-ramp
      fan truth: 2nd-order differences leave 6.8% max interior error,
      4th-order 4.3% — of which 3.3% reproduces on a z-UNIFORM object,
      i.e. it is in-plane resolution mismatch, not helical error.  An
      UNapodized spectral derivative overshoots to 10% (ringing); the
      window-matched spectral derivative removes the mismatch term:
      z-varying sphere 3.3% -> 1.7% max (0.4% rms) at clinical pitch.
      The remainder is detector-row z-sampling, not the filter chain
      (halving h_iso at pitch 5.5 halves it: 3.9% -> 1.6%) — the
      VALIDATION.md helical-exactness rows.

    Edges replicate (edge views sit outside every interior PI
    interval; edge channels see air; the spectral path zero-pads,
    exact for log sinograms whose edge channels see air)."""

    def pad2(a, ax):
        first = jnp.take(a, jnp.array([0]), axis=ax)
        last = jnp.take(a, jnp.array([a.shape[ax] - 1]), axis=ax)
        return jnp.concatenate([first, first, a, last, last], axis=ax)

    V, C = g.shape[0], g.shape[-1]
    gb = pad2(g, 0)
    d_b = (8.0 * (gb[3:3 + V] - gb[1:1 + V])
           - (gb[4:4 + V] - gb[0:V])) / (12.0 * dbeta)
    if deriv == "spectral":
        from .filters import _window
        L = 1
        while L < 2 * C:
            L *= 2
        f = np.fft.rfftfreq(L, d=dgamma)  # cycles / radian
        f_nyq = 0.5 / dgamma
        apod = _window(f / f_nyq, ramp, window)
        # host->device transfer must be REAL (complex64 transfers are
        # unimplemented on the tunnel backend — CLAUDE.md); promote to
        # the imaginary axis on device
        mult_im = jnp.asarray((2.0 * np.pi) * f * apod, jnp.float32)
        spec = jnp.fft.rfft(g, n=L, axis=-1) * (1j * mult_im)
        d_c = jnp.fft.irfft(spec, n=L, axis=-1)[..., :C].astype(g.dtype)
    else:
        gc = pad2(g, g.ndim - 1)
        d_c = (8.0 * (gc[..., 3:3 + C] - gc[..., 1:1 + C])
               - (gc[..., 4:4 + C] - gc[..., 0:C])) / (12.0 * dgamma)
    return d_b - d_c


def katsevich_reconstruct(sino_log, geometry, n_matrix, fov, *,
                          z_out=None, n_psi=128, view_block=8,
                          taper=None, interp="linear",
                          deriv="spectral", ramp=0.8, window="sinc"):
    """Katsevich exact helical FBP -> [nz, N, N] in cm^-1.

    ``sino_log``: [V, R, C] helical line integrals
    (:func:`~dexct_tpu.ops.conebeam.cone_sinogram` on a
    :class:`~dexct_tpu.system.geometry.HelicalConeBeamGeometry`).
    ``z_out`` defaults to the slice range whose PI intervals fit the
    scan.  ``n_psi``: number of kappa filtering lines.  ``taper``:
    TD-window edge feather in iso-height cm (default half a row).

    ``deriv``/``ramp``/``window`` select the fixed-direction gamma
    derivative (:func:`_fixed_direction_derivative`).  The default
    window-matched spectral derivative gives the chain the SAME
    in-plane MTF as the package's fan/FDK reconstructions at the same
    ``ramp``/``window`` — apodization enters Katsevich through the
    derivative step, which is where the inversion formula's only
    |w|-shaped factor lives.  ``deriv="stencil4"`` is the
    finite-difference variant (its fixed rolloff costs ~3% MTF-
    mismatch error vs a ramp-0.8 fan truth; measured, VALIDATION.md).

    ``interp``: "linear" (default) or "cubic" (4-tap Catmull-Rom in
    the kappa row rebinning, the psi back-rebinning, and the
    backprojector's detector-row interpolation).  Measured: cubic buys
    ~0.5% on the z-varying study at high pitch but introduces a ~0.7%
    amplitude bias through the clamped edge taps near the TD boundary,
    so linear stays the default.
    """
    arrays, statics = _host_prep(
        sino_log.shape, geometry, n_matrix, fov, z_out=z_out,
        n_psi=n_psi, view_block=view_block, taper=taper, interp=interp,
        deriv=deriv, ramp=ramp, window=window,
        dtype=jnp.result_type(sino_log.dtype, jnp.float32))
    return _filter_backproject_chain(
        sino_log.astype(arrays["betas"].dtype), arrays["betas"],
        arrays["src_z"], arrays["Wf"], arrays["Wb"], arrays["kern_im"],
        arrays["cosk"], **statics)


def _host_prep(sino_shape, geometry, n_matrix, fov, *, z_out, n_psi,
               view_block, taper, interp, deriv, ramp, window, dtype):
    """Validation + host tables shared by the single-device and the
    view-sharded (:mod:`dexct_tpu.parallel.katsevich`) entry points.
    Returns ``(arrays, statics)`` for :func:`_filter_backproject_chain`.
    """
    ct = geometry
    V, R, C = sino_shape
    if R != ct.N_rows:
        raise ValueError(f"sinogram has {R} rows, geometry {ct.N_rows}")
    pitch = float(getattr(ct, "pitch", 0.0))
    if abs(pitch) < 1e-9:
        raise ValueError(
            "pitch = 0 has no PI window; use fdk_reconstruct")
    if getattr(ct, "ffs", "none") != "none":
        raise ValueError(
            "the Katsevich chain assumes a static focal spot; "
            "reconstruct z-FFS scans with helical_fdk_reconstruct")
    dgamma = float(ct.dgamma)
    dbeta = float(ct.rotation_total / V)
    betas = np.asarray(ct.betas, np.float64)
    src_z = np.asarray(ct.source_z, np.float64)
    gm = 0.5 * float(ct.gamma_fan)

    if z_out is None:
        # PI interval half-length <= (pi/2 + gm) * dbeta of views
        margin = (0.5 * np.pi + gm + 0.5) * pitch / (2.0 * np.pi)
        lo, hi = src_z[0] + margin, src_z[-1] - margin
        if hi <= lo:
            raise ValueError("scan too short for any full PI interval")
        nz = max(int((hi - lo) / ct.h_iso), 1)
        z_out = lo + (np.arange(nz) + 0.5) * (hi - lo) / nz
    z_out = np.asarray(z_out, np.float64)
    dz = float(z_out[1] - z_out[0]) if len(z_out) > 1 else float(ct.h_iso)

    if interp not in ("linear", "cubic"):
        raise ValueError(f"interp must be 'linear'|'cubic', got {interp}")
    Wf, Wb, _ = _plan(ct, int(n_psi), interp)

    if deriv not in ("spectral", "stencil4"):
        raise ValueError(
            f"deriv must be 'spectral'|'stencil4', got {deriv}")
    if taper is None:
        taper = 0.5 * float(ct.h_iso)
    # cone-length weight per row (stage 2)
    cosk = ct.SID / np.sqrt(ct.SID ** 2 + np.asarray(ct.z_iso) ** 2)
    # Hilbert kernel spectrum (stage 4): real antisymmetric -> purely
    # imaginary FFT; ship the imaginary part as a REAL array (complex
    # host->device transfers are unimplemented on the tunnel backend —
    # CLAUDE.md)
    L = 1
    while L < 3 * C:
        L *= 2
    kern_im = np.imag(np.fft.fft(_hilbert_kernel(C, dgamma, L)))
    arrays = {
        "betas": jnp.asarray(betas, dtype),
        "src_z": jnp.asarray(src_z, dtype),
        "Wf": jnp.asarray(Wf),
        "Wb": jnp.asarray(Wb),
        "kern_im": jnp.asarray(kern_im, jnp.float32),
        "cosk": jnp.asarray(cosk, dtype),
    }
    statics = dict(
        dbeta=dbeta, dgamma=dgamma, deriv=deriv, ramp=ramp,
        window=window, fft_len=int(L), sid=float(ct.SID),
        row_h=float(ct.h_iso), n_rows=int(R), pitch=pitch,
        n_matrix=int(n_matrix), nz_out=int(len(z_out)),
        fov=float(fov), dz_out=dz, z0=float(z_out[0]),
        beta_mid=float(0.5 * (betas[0] + betas[-1])),
        taper=float(taper), view_block=int(view_block), interp=interp)
    return arrays, statics


def _filter_backproject_chain(g, betas, src_z, Wf, Wb, kern_im, cosk, *,
                              dbeta, dgamma, deriv, ramp, window,
                              fft_len, sid, row_h, n_rows, pitch,
                              n_matrix, nz_out, fov, dz_out, z0,
                              beta_mid, taper, view_block, interp,
                              halo=0, axis_name=None):
    """Stages 1-6 of the Katsevich chain on a (possibly view-sharded)
    ``[V(+2*halo), R, C]`` block.

    Stages 1-5 are per-view apart from the beta stencil's +-2-view
    support; the sharded caller
    (:func:`dexct_tpu.parallel.katsevich.sharded_katsevich_reconstruct`)
    passes ``halo=2`` with neighbour views attached (scan-end shards
    edge-replicated, matching the unsharded pad), so the cropped
    interior is identical to the single-device chain.  Under
    ``axis_name`` the volume partial sums over the mesh axis — the
    SURVEY §2.7 all-reduce-of-partial-backprojections pattern applied
    to the exact helical family.
    """
    dtype = g.dtype
    C = g.shape[-1]
    # 1. derivative at constant ray direction (split chain rule)
    g1 = _fixed_direction_derivative(g, dbeta, dgamma, deriv=deriv,
                                     ramp=ramp, window=window)
    if halo:
        g1 = g1[halo:-halo]
    # 2. cone-length weight per row
    g1 = g1 * cosk[None, :, None]
    # 3. forward kappa rebinning (dense MXU contraction)
    gk = jnp.einsum("vrc,pcr->vpc", g1, Wf,
                    precision=jax.lax.Precision.HIGHEST)
    # 4. Hilbert filter along the kappa-line
    spec = jnp.fft.fft(gk, n=fft_len, axis=-1) \
        * (1j * kern_im)[None, None, :]
    gh = jnp.real(jnp.fft.ifft(spec, axis=-1))[..., :C].astype(dtype)
    # 5. backward rebinning to detector rows
    gf = jnp.einsum("vpc,crp->vrc", gh, Wb,
                    precision=jax.lax.Precision.HIGHEST)
    # 6. PI backprojection
    vol = _katsevich_backproject(
        gf, betas, src_z, sid, dgamma, row_h, n_rows, pitch, n_matrix,
        nz_out, fov, dz_out, z0, beta_mid, dbeta, taper,
        view_block=view_block, interp=interp)
    if axis_name is not None:
        vol = jax.lax.psum(vol, axis_name)
    return vol
