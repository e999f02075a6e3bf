"""Flat-panel (equidistant-detector) cone-beam reconstruction.

The reference's geometry is strictly equiangular
(/root/reference/params.txt:18 "fan_beam"); this module adds the other
standard detector: a FLAT panel with equally spaced columns — the CBCT
bench / C-arm configuration
(:class:`~dexct_tpu.system.geometry.FlatPanelConeBeamGeometry`).

Flat-detector Feldkamp (Feldkamp-Davis-Kress 1984, equispaced form):

* pre-weight each projection by the panel cosine
  ``SID / sqrt(SID^2 + u^2 + v^2)`` (u, v at the isocenter scale);
* filter along columns with the EQUIDISTANT ramp
  (:func:`~dexct_tpu.ops.filters.parallel_ramp_kernel` at ``du_iso``
  spacing — the equiangular ``(gamma/sin gamma)^2`` correction does not
  apply to a flat panel);
* voxel-driven backprojection at ``u = SID*t/ell``, ``v = SID*z/ell``
  with the ``SID^2/ell^2`` magnification weight (``ell`` = source->voxel
  distance along the central ray) and the half-redundancy ``dbeta/2``
  of a full 2*pi orbit — or, for a C-arm SHORT SCAN
  (``rotation_total`` in [pi + gamma_fan, 2*pi)), Parker redundancy
  weights in the panel's true fan angles.

TPU mapping: identical gather discipline to the cylindrical paths —
the four bilinear (column, row) taps of ALL M stacked volumes ride one
4*M-float gather row per (voxel, view), and the in-plane geometry is
computed once per view block and shared across z-slices
(cf. :func:`~dexct_tpu.ops.conebeam._helical_backproject`).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["fdk_flat_reconstruct", "flat_cone_sinogram",
           "offset_detector_weights"]


def offset_detector_weights(geometry, *, feather=None):
    """Half-fan redundancy weights w[C] for an OFFSET-detector scan.

    The standard CBCT field-of-view trick: shift the panel laterally
    (a large ``det_offset_ch``) so one side of the fan covers a much
    larger radius, and recover the missing side from the conjugate
    rays half a turn later.  Over a full 2*pi orbit a line (beta,
    gamma) is then measured TWICE only in the overlap band
    |gamma| <= gamma_ov around the central ray (gamma_ov = the smaller
    of the panel's two half-fans) and once outside it, so uniform
    dbeta/2 weighting shades the periphery.  Wang's weights (Wang
    1993) restore a flat response: a smooth transition
    ``w = sin^2(pi/4 * (1 + g/f))`` across the feathered overlap with
    the exact partition ``w(g) + w(-g) = 1``, doubled outside the
    overlap on the measured side.  Composes with the backprojector's
    dbeta/2 so every line integrates to weight dbeta.

    ``feather``: overlap half-width used for the transition [rad]
    (default: the full overlap band; must not exceed it).  Requires
    the overlap to span at least two channels — beyond that offset the
    scan no longer covers Radon space.
    """
    ct = geometry
    gam = np.asarray(ct.gammas, np.float64)
    g_lo, g_hi = -gam[0], gam[-1]  # half-fans (lo side is gamma < 0)
    if min(g_lo, g_hi) <= 0:
        raise ValueError(
            "offset so large the panel no longer covers the central "
            "ray: the scan misses Radon lines entirely")
    g_ov = min(g_lo, g_hi)
    dg_min = float(np.diff(gam).min())
    if g_ov < 2.0 * dg_min:
        raise ValueError(
            f"overlap band ({g_ov:.4f} rad) narrower than two channels"
            " — not enough conjugate data to feather")
    f = g_ov if feather is None else float(feather)
    if not 0.0 < f <= g_ov + 1e-12:
        raise ValueError(f"feather {f:.4f} outside (0, {g_ov:.4f}]")
    # orient so the SHORT side is gamma < 0 (weights ramp up through
    # the overlap toward the long side); mirror if offset is negative
    sgn = 1.0 if g_hi >= g_lo else -1.0
    g = sgn * gam
    w = np.where(
        g < -f, 0.0,
        np.where(g > f, 1.0,
                 np.sin(np.pi / 4.0 * (1.0 + g / f)) ** 2))
    # doubled: composes with the dbeta/2 full-orbit convention so a
    # once-measured line (weight 1 here) integrates to dbeta
    return 2.0 * w


@functools.partial(
    jax.jit,
    static_argnames=("n_matrix", "nz_out", "fov", "view_block",
                     "pair_mode"),
)
def _flat_backproject(q, betas, sid, du_iso, dv_iso, off_c, off_r,
                      n_rows, n_matrix, nz_out, fov, dz_out, dbeta, *,
                      view_block=8, pair_mode=False):
    """Voxel-driven flat-detector FDK backprojection.

    q: filtered projections [V, R, C] or [M, V, R, C] (stacked volumes
    share taps and weights).  Returns [nz, N, N] / [M, nz, N, N].
    ``pair_mode`` (static; decided by the same worst-case row-spacing
    rule as the cylindrical paths): slice pairs share one
    4-row x 2-channel window gather — identical arithmetic on
    identical taps, half the slice gathers.
    """
    squeeze = q.ndim == 3
    q4 = q[None] if squeeze else q
    M, V, R, C = q4.shape
    qt = jnp.moveaxis(q4, 0, 1)  # [V, M, R, C]
    dtype = q.dtype
    N = n_matrix
    px_size = fov / N
    c_np = (np.arange(N) + 0.5 - N / 2.0) * px_size
    XX, YY = np.meshgrid(c_np, c_np)
    in_circle = np.hypot(XX, YY) <= fov / 2.0
    sel = np.nonzero(in_circle.reshape(-1))[0]
    P = len(sel)
    X = jnp.asarray(XX.reshape(-1)[sel], dtype)
    Y = jnp.asarray(YY.reshape(-1)[sel], dtype)
    zc = jnp.asarray((np.arange(nz_out) + 0.5 - nz_out / 2.0) * dz_out,
                     dtype)

    vb = max(1, min(view_block, V))
    while V % vb:
        vb -= 1
    bb = betas.reshape(V // vb, vb)
    voff = jnp.arange(V, dtype=jnp.int32).reshape(V // vb, vb)

    def block(carry, args):
        acc = carry
        beta, vo = args
        cb, sb = jnp.cos(beta), jnp.sin(beta)
        ell = sid - (X[None, :] * cb[:, None] + Y[None, :] * sb[:, None])
        vt = -X[None, :] * sb[:, None] + Y[None, :] * cb[:, None]
        u = -sid * vt / ell  # iso-scaled panel column coordinate
        cidx = u / du_iso - 0.5 - off_c + C / 2.0
        c0 = jnp.clip(jnp.floor(cidx), 0, C - 2)
        fc = jnp.clip(cidx - c0, 0.0, 1.0)
        w_in = jnp.where((cidx >= 0.0) & (cidx <= C - 1.0), 1.0, 0.0)
        w_amp = w_in * (sid * sid) / (ell * ell)

        qb = qt[vo]  # [vb, M, R, C]
        qb_c1 = jnp.concatenate([qb[..., 1:], qb[..., -1:]], -1)
        if pair_mode:
            two = jnp.stack([qb, qb_c1], -1)  # [vb, M, R, C, 2]
            wins = jnp.stack(
                [two if dr == 0 else jnp.concatenate(
                    [two[:, :, dr:],
                     jnp.repeat(two[:, :, -1:], dr, 2)], 2)
                 for dr in range(4)], -2)  # [vb, M, R, C, 4, 2]
            packed_flat = wins.transpose(0, 2, 3, 1, 4, 5).reshape(
                vb * R * C, M * 8)
        else:
            qb_r1 = jnp.concatenate([qb[:, :, 1:], qb[:, :, -1:]], 2)
            qb_r1c1 = jnp.concatenate(
                [qb_r1[..., 1:], qb_r1[..., -1:]], -1)
            packed_flat = jnp.stack(
                [qb, qb_c1, qb_r1, qb_r1c1], -1
            ).transpose(0, 2, 3, 1, 4).reshape(vb * R * C, M * 4)
        voff_b = jnp.arange(vb, dtype=jnp.int32)

        def row_geom(z):
            v = sid * z / ell  # iso-scaled panel row coordinate
            ridx = v / dv_iso - 0.5 - off_r + R / 2.0
            r0 = jnp.clip(jnp.floor(ridx), 0, max(R - 2, 0))
            fr = jnp.clip(ridx - r0, 0.0, 1.0)
            w_z = jnp.where((ridx >= -0.5) & (ridx <= R - 0.5), 1.0,
                            0.0)
            return r0, fr, w_z

        def one_slice(z):
            r0, fr, w_z = row_geom(z)
            idx = (r0.astype(jnp.int32) * C + c0.astype(jnp.int32)
                   + voff_b[:, None] * (R * C))
            rows = packed_flat[idx.reshape(-1)].reshape(
                idx.shape + (M, 4))
            fcm, frm = fc[..., None], fr[..., None]
            top = rows[..., 0] * (1 - fcm) + rows[..., 1] * fcm
            bot = rows[..., 2] * (1 - fcm) + rows[..., 3] * fcm
            val = top * (1 - frm) + bot * frm  # [vb, P, M]
            return jnp.sum(val * (w_amp * w_z)[..., None], axis=0)

        def one_pair(z2):
            (r0a, fra, wza), (r0b, frb, wzb) = (row_geom(z2[0]),
                                                row_geom(z2[1]))
            r_base = jnp.minimum(jnp.minimum(r0a, r0b), float(R - 4))
            idx = (r_base.astype(jnp.int32) * C + c0.astype(jnp.int32)
                   + voff_b[:, None] * (R * C))
            rows = packed_flat[idx.reshape(-1)].reshape(
                idx.shape + (M, 4, 2))
            fcm = fc[..., None, None]
            rows_c = rows[..., 0] * (1 - fcm) + rows[..., 1] * fcm
            dr_ids = jnp.arange(4, dtype=dtype)
            outs = []
            for r0, fr, w_z in ((r0a, fra, wza), (r0b, frb, wzb)):
                sub = (r0 - r_base)[..., None]
                wrow = (jnp.where(dr_ids == sub, 1.0 - fr[..., None],
                                  0.0)
                        + jnp.where(dr_ids == sub + 1.0,
                                    fr[..., None], 0.0))
                val = jnp.sum(rows_c * wrow[..., None, :], axis=-1)
                outs.append(jnp.sum(val * (w_amp * w_z)[..., None],
                                    axis=0))
            return jnp.stack(outs)

        if pair_mode:
            ne = (nz_out // 2) * 2
            dn = jax.vmap(one_pair)(zc[:ne].reshape(-1, 2)).reshape(
                ne, P, M)
            if nz_out % 2:
                dn1 = one_pair(jnp.stack([zc[-1], zc[-1]]))
                dn = jnp.concatenate([dn, dn1[:1]], 0)
        else:
            dn = jax.vmap(one_slice)(zc)
        return acc + dn, None

    acc0 = jnp.zeros((nz_out, P, M), dtype)
    acc, _ = jax.lax.scan(block, acc0, (bb, voff))
    out = acc * (0.5 * dbeta)  # full-orbit redundancy 2
    vol = jnp.zeros((nz_out, N * N, M), dtype)
    vol = vol.at[:, jnp.asarray(sel)].set(out)
    vol = jnp.moveaxis(vol.reshape(nz_out, N, N, M), -1, 0)
    return vol[0] if squeeze else vol


def fdk_flat_reconstruct(sino_log, geometry, n_matrix, fov, ramp, *,
                         nz_out=None, dz_out=None, window="sinc",
                         view_block=8, redundancy="auto",
                         offset_feather=None):
    """Flat-detector FDK -> volume(s) [nz, N, N] in cm^-1.

    ``sino_log``: [V, R, C] (or a stack [M, V, R, C] — all volumes
    reconstruct in one multi-volume backprojection pass) from a
    :class:`~dexct_tpu.system.geometry.FlatPanelConeBeamGeometry` scan.
    Output z-grid defaults to one slice per ``h_iso`` centered on z=0,
    as the cylindrical FDK.  Full 2*pi orbits use the dbeta/2
    redundancy weight; shorter orbits down to pi + gamma_fan get
    Parker weights (the C-arm short scan).

    ``redundancy``: ``"full"`` (uniform), ``"offset"`` (half-fan
    Wang weights — :func:`offset_detector_weights`, for
    OFFSET-DETECTOR scans; requires a full 2*pi orbit), or ``"auto"``
    (offset weighting when ``|det_offset_ch| >= 2`` channels, the
    FOV-enlargement regime; plain otherwise).
    """
    from .filters import _next_pow2, _window, parallel_ramp_kernel

    ct = geometry
    if not getattr(ct, "flat_panel", False):
        raise ValueError(
            "fdk_flat_reconstruct is the flat-panel path; cylindrical "
            "detectors reconstruct with ops.conebeam.fdk_reconstruct")
    if sino_log.ndim not in (3, 4):
        raise ValueError("sino_log must be [V, R, C] or [M, V, R, C]")
    V, R, C = sino_log.shape[-3:]
    if R != ct.N_rows or C != ct.N_channels:
        raise ValueError(f"sinogram [{V},{R},{C}] does not match the "
                         f"geometry ({ct.N_rows} rows x "
                         f"{ct.N_channels} channels)")
    nz = R if nz_out is None else int(nz_out)
    dz = float(ct.h_iso if dz_out is None else dz_out)
    dtype = jnp.result_type(sino_log.dtype, jnp.float32)

    du = float(ct.du_iso)
    u = np.asarray(ct.u_iso)  # [C]
    v = np.asarray(ct.z_iso)  # [R] iso-scale row heights
    w = jnp.asarray(
        ct.SID / np.sqrt(ct.SID ** 2 + u[None, :] ** 2
                         + v[:, None] ** 2), dtype)  # [R, C]

    g = parallel_ramp_kernel(C, du)
    m = _next_pow2(2 * C)
    gpad = np.zeros(m, np.float64)
    gpad[: 2 * C - 1] = g
    gpad = np.roll(gpad, -(C - 1))
    H = np.fft.rfft(gpad).real
    f_norm = np.arange(len(H)) / (m / 2.0)
    H = H * _window(f_norm, ramp, window)

    if redundancy not in ("auto", "full", "offset"):
        raise ValueError(f"unknown redundancy mode {redundancy!r}")
    if redundancy == "auto":
        redundancy = ("offset" if abs(ct.det_offset_ch) >= 2.0
                      else "full")

    pw = sino_log.astype(dtype) * w
    if redundancy == "offset":
        if ct.rotation_total < 2.0 * np.pi - 1e-6:
            raise ValueError(
                "offset-detector scans need the full 2*pi orbit (the "
                "missing fan side comes from conjugate views half a "
                "turn later)")
        w_off = offset_detector_weights(ct, feather=offset_feather)
        pw = pw * jnp.asarray(w_off, dtype)
    elif ct.rotation_total < 2.0 * np.pi - 1e-6:
        # C-arm short scan (pi + fan): Parker redundancy weights.
        # parker_weights is written in TRUE fan angles (ct.gammas is
        # the exact atan grid here), so it applies verbatim; its 2x
        # convention composes with the backprojector's dbeta/2 to give
        # each once-measured line weight dbeta.  Raises if the orbit
        # is shorter than pi + gamma_fan.
        from .fbp import parker_weights

        wp = jnp.asarray(parker_weights(ct), dtype)  # [V, C]
        pw = pw * wp[:, None, :]
    spec = jnp.fft.rfft(pw, n=m, axis=-1)
    q = jnp.fft.irfft(spec * jnp.asarray(H, dtype), n=m,
                      axis=-1)[..., :C] * du

    from .conebeam import _helical_pair_ok

    return _flat_backproject(
        q, jnp.asarray(ct.betas, dtype), float(ct.SID), du,
        float(ct.h_iso), float(ct.det_offset_ch),
        float(ct.det_offset_row), int(R), int(n_matrix), int(nz),
        float(fov), dz, float(ct.rotation_total / V),
        view_block=int(view_block),
        pair_mode=_helical_pair_ok(float(ct.SID), float(fov),
                                   float(ct.h_iso), dz, int(nz),
                                   int(R)))


def flat_cone_sinogram(phantom, geometry, spec, *, noise="none",
                       key=None):
    """Polyenergetic flat-panel acquisition -> (counts, log sinogram).

    Convenience mirror of :func:`~dexct_tpu.ops.conebeam.cone_sinogram`
    — the trace and spectral chain are detector-agnostic, only the ray
    geometry differs (exact flat-panel rays from
    ``geometry.ray_geometry_3d``).
    """
    from . import spectral as sp_ops
    from .conebeam import cone_material_paths

    paths = cone_material_paths(phantom, geometry)
    mu_t = jnp.asarray(phantom.materials.mu_table(spec.E), jnp.float32)
    i0 = sp_ops.effective_fluence(spec, geometry)
    counts = sp_ops.counts_from_paths(paths, mu_t,
                                      jnp.asarray(i0, jnp.float32))
    if noise != "none":
        if key is None:
            key = jax.random.PRNGKey(0)
        counts = sp_ops.sample_noise(key, counts, noise)
    slog = sp_ops.log_sinogram(counts, float(np.sum(i0)))
    return counts, slog
