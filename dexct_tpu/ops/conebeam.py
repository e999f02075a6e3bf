"""Circular cone-beam projection and FDK reconstruction (3-D extension).

The reference is strictly 2-D slice-based (``z_index`` selects one slice,
/root/reference/plots.py:124-126, params.txt:16); this module extends the
framework to true 3-D acquisition over a circular source trajectory:

* :func:`trace_paths_3d` — the exact 3-D Siddon DDA, the direct
  generalization of :mod:`dexct_tpu.ops.siddon`: a bounded
  ``Nx+Ny+Nz+2``-step ``lax.scan`` vmapped over rays, one scalar gather
  per traversal step, per-*material* path accumulation so the energy
  axis stays MXU matmuls (:mod:`dexct_tpu.ops.spectral`).
* :func:`cone_material_paths` / :func:`cone_sinogram` — host wrappers
  deriving the ray grid from
  :class:`~dexct_tpu.system.geometry.ConeBeamGeometry`.
* :func:`fdk_reconstruct` — Feldkamp-Davis-Kress filtered backprojection
  for the cylindrical-detector geometry: row-wise fan pre-weighting
  ``cos(gamma) * SID/sqrt(SID^2 + z_iso^2)``, the shared sinc-windowed
  ramp along channels, and a voxel-driven backprojection with bilinear
  (channel, row) detector interpolation and the ``1/h^2``
  source-distance weight.  When the output grid places a slice at
  z = 0 (odd ``nz_out``, or explicit ``dz_out``), that slice equals the
  2-D equiangular fan FBP of the central detector row exactly (the
  geometry guarantees it).  The default even-``nz_out`` grid samples at
  z = +-dz/2, so ``test_central_rows_match_fan`` pins the *average* of
  the two central slices instead (ADVICE round 2).

TPU shape notes: the backprojection shares one in-plane (gamma, h)
computation across all z-slices of a view block and packs the two
channel taps of both detector rows into one row-4 gather per (voxel,
view) — the same gather-count discipline as :mod:`ops/fbp_fast`
(CLAUDE.md: gather COUNT, not fetch width, sets the rate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ConeDominantUnsupported", "validate_cone_hbm",
           "trace_paths_3d",
           "trace_cone_dominant", "trace_cone_dominant_bundled",
           "cone_material_paths", "cone_sinogram", "fdk_reconstruct",
           "helical_fdk_reconstruct", "fdk_tilted_reconstruct",
           "project_volume_3d",
           "cone_cg_recon", "cone_pwls_recon", "simulate_cone_dect"]

_BIG = 1e30


class ConeDominantUnsupported(ValueError):
    """The packed dominant cone kernel cannot handle this input
    (capability limit, not a bug) — callers may fall back to the DDA."""



@functools.partial(jax.jit, static_argnames=("n_materials", "n_steps"))
def trace_paths_3d(labels, src, dirs, dx, dy, dz, *, n_materials,
                   n_steps=None):
    """Exact per-material radiological paths for 3-D rays.

    Parameters
    ----------
    labels : int array [Nz, Ny, Nx] — material label per voxel.
    src, dirs : float arrays [..., 3] — origins / unit directions (x,y,z).
    dx, dy, dz : voxel sizes [cm].  The grid is centered on the origin.
    n_materials : static — number of material labels.
    n_steps : static — trip count; default Nx+Ny+Nz+2 (exact bound on
        the number of voxels a 3-D ray can cross).

    Returns ``paths [..., n_materials]``; ``paths.sum(-1)`` is the
    in-grid chord length.
    """
    nz, ny, nx = labels.shape
    k = n_steps if n_steps is not None else nx + ny + nz + 2
    dtype = jnp.result_type(src.dtype, jnp.float32)
    flat_labels = labels.reshape(-1).astype(jnp.int32)

    batch_shape = src.shape[:-1]
    p = src.reshape(-1, 3).astype(dtype)
    d = dirs.reshape(-1, 3).astype(dtype)
    n_rays = p.shape[0]

    g0 = (-0.5 * nx * dx, -0.5 * ny * dy, -0.5 * nz * dz)
    cells = (dx, dy, dz)
    dims = (nx, ny, nz)

    def axis_setup(i):
        pi, di = p[:, i], d[:, i]
        ok = jnp.abs(di) > 1e-12
        safe = jnp.where(ok, di, 1.0)
        t_lo = (g0[i] - pi) / safe
        t_hi = (g0[i] + dims[i] * cells[i] - pi) / safe
        inside = (pi >= g0[i]) & (pi <= g0[i] + dims[i] * cells[i])
        tmin = jnp.where(ok, jnp.minimum(t_lo, t_hi),
                         jnp.where(inside, -_BIG, _BIG))
        tmax = jnp.where(ok, jnp.maximum(t_lo, t_hi),
                         jnp.where(inside, _BIG, -_BIG))
        return ok, safe, tmin, tmax

    setup = [axis_setup(i) for i in range(3)]
    t_in = jnp.maximum(
        jnp.maximum(setup[0][2], jnp.maximum(setup[1][2], setup[2][2])), 0.0)
    t_out = jnp.minimum(setup[0][3], jnp.minimum(setup[1][3], setup[2][3]))
    hit = t_in < t_out
    t_out = jnp.where(hit, t_out, t_in)

    eps = 1e-6 * (dx + dy + dz)

    def cell_and_crossing(i):
        pi, di = p[:, i], d[:, i]
        ok, safe, _, _ = setup[i]
        e = pi + (t_in + eps) * di
        idx = jnp.clip(jnp.floor((e - g0[i]) / cells[i]),
                       0, dims[i] - 1).astype(jnp.int32)
        plane = g0[i] + (idx + (di > 0)) * cells[i]
        t_next = jnp.where(ok, (plane - pi) / safe, _BIG).astype(dtype)
        dt = jnp.where(ok, cells[i] / jnp.abs(safe), _BIG).astype(dtype)
        step = jnp.where(ok, jnp.sign(di), 0.0).astype(jnp.int32)
        return idx, t_next, dt, step

    (ix, tnx, dtx, sx) = cell_and_crossing(0)
    (iy, tny, dty, sy) = cell_and_crossing(1)
    (iz, tnz, dtz, sz) = cell_and_crossing(2)

    acc = jnp.zeros((n_rays, n_materials), dtype)
    t0 = t_in.astype(dtype)
    t_outc = t_out.astype(dtype)

    def step(carry, _):
        t, ix, iy, iz, tnx, tny, tnz, acc = carry
        t_min = jnp.minimum(jnp.minimum(tnx, tny), tnz)
        t_next = jnp.maximum(jnp.minimum(t_min, t_outc), t)
        seg = t_next - t
        lab = flat_labels[(iz * ny + iy) * nx + ix]
        acc = acc + seg[:, None] * jax.nn.one_hot(lab, n_materials,
                                                  dtype=dtype)
        # advance the axis whose crossing is nearest (ties: x, then y)
        take_x = tnx <= jnp.minimum(tny, tnz)
        take_y = (~take_x) & (tny <= tnz)
        take_z = ~(take_x | take_y)
        ix = jnp.clip(jnp.where(take_x, ix + sx, ix), 0, nx - 1)
        iy = jnp.clip(jnp.where(take_y, iy + sy, iy), 0, ny - 1)
        iz = jnp.clip(jnp.where(take_z, iz + sz, iz), 0, nz - 1)
        tnx = jnp.where(take_x, tnx + dtx, tnx)
        tny = jnp.where(take_y, tny + dty, tny)
        tnz = jnp.where(take_z, tnz + dtz, tnz)
        return (t_next, ix, iy, iz, tnx, tny, tnz, acc), None

    (_, _, _, _, _, _, _, acc), _ = jax.lax.scan(
        step, (t0, ix, iy, iz, tnx, tny, tnz, acc), None, length=k)
    return acc.reshape(*batch_shape, n_materials)


def _cone_dominant_cached(phantom, geometry, src, dirs, labels_np,
                          group=16, trace_bundle=8):
    """Packed dominant cone trace with host plans + pack tables cached
    on the phantom/geometry objects (the standalone one-shot path used
    to pay ~2.5 s of replan/repack per call — BASELINE.md).

    Prefers the BUNDLED kernel (the fused cone pipeline's tracer,
    :func:`plan_cone_dominant_bundled`) under the same eligibility
    guards as ``pipeline.cone.pack_cone_dect``, falling back to the
    cached per-ray plan.  Raises :class:`ConeDominantUnsupported` when
    no packed kernel fits (callers fall back to the DDA).
    """
    from .siddon import _arr_fingerprint, _geom_key, _obj_cache

    nz, ny, nx = labels_np.shape
    d = np.asarray(dirs).reshape(-1, 3)
    dom = np.maximum(np.abs(d[:, 0]), np.abs(d[:, 1]))
    max_slope = float(np.max(np.abs(d[:, 2]) / np.maximum(dom, 1e-12)))
    lb, _ = validate_cone_dominant((nz, ny, nx), phantom.n_materials,
                                   phantom.dx, phantom.dy, phantom.dz,
                                   max_slope, group)
    gc = _obj_cache(geometry)
    pc = _obj_cache(phantom)
    gkey = _geom_key(src, dirs)
    src_a = np.asarray(src)
    lab_key = (_arr_fingerprint(labels_np), nz, ny, nx)

    # same eligibility guards as pipeline.cone.pack_cone_dect: 3-bit
    # labels (the 30-column shared window), [V, R, C, 3] rays, and the
    # wider W=3 pack under the 512 MiB table guard
    if (trace_bundle and lb == 3 and min(ny, nx) >= 30
            and src_a.ndim == 4 and 4 * nz * ny * nx * 3 * 2 <= 512 << 20):
        bkey = ("cone_bplan", gkey, nz, ny, nx, float(phantom.dx),
                float(phantom.dy), float(phantom.dz), int(group),
                int(trace_bundle))
        bplan = gc.get(bkey)
        if bplan is None:
            bplan = gc[bkey] = plan_cone_dominant_bundled(
                src_a, np.asarray(dirs), (nz, ny, nx), phantom.dx,
                phantom.dy, phantom.dz, lbits=lb, group=int(group),
                bundle=int(trace_bundle))
        if bplan["frac_bundled"] >= 0.25:
            pkey = ("cone_packw", lab_key, int(group), lb,
                    int(bplan["words"]))
            packs = pc.get(pkey)
            if packs is None:
                labj = jnp.asarray(labels_np)
                packs = pc[pkey] = (
                    build_cone_pack(labj, group, lb,
                                    words=bplan["words"]),
                    build_cone_pack(labj.transpose(0, 2, 1), group, lb,
                                    words=bplan["words"]))
            return trace_cone_dominant_bundled(
                labels_np, src_a, dirs, phantom.dx, phantom.dy,
                phantom.dz, n_materials=phantom.n_materials, plan=bplan,
                packs=packs)

    key = ("cone_plan", gkey)
    plan = gc.get(key)
    if plan is None:
        plan = gc[key] = plan_cone_dominant(d)
    pkey = ("cone_pack", lab_key, int(group), lb)
    packs = pc.get(pkey)
    if packs is None:
        labj = jnp.asarray(labels_np)
        packs = pc[pkey] = (build_cone_pack(labj, group, lb),
                            build_cone_pack(labj.transpose(0, 2, 1),
                                            group, lb))
    return trace_cone_dominant(
        labels_np, np.asarray(src, np.float32),
        np.asarray(dirs, np.float32), phantom.dx, phantom.dy,
        phantom.dz, n_materials=phantom.n_materials, group=group,
        plan=plan, packs=packs)


def cone_material_paths(phantom, geometry, *, dtype=jnp.float32,
                        view_block=None, method="auto"):
    """[N_proj, N_rows, N_channels, n_materials] exact cone-beam paths.

    ``method='auto'`` uses the packed dominant-axis kernel
    (:func:`trace_cone_dominant` — two row-32 gathers per ray per
    16-row group, ~25x the DDA) whenever its constraints hold (square
    in-plane cells, divisible dims, < 32 labels, small cone z-slope)
    and falls back to the sequential DDA otherwise; ``'dda'`` /
    ``'dominant'`` force a path.  ``view_block`` bounds device memory
    on the DDA path: views trace in ``lax.map`` chunks of that many
    (default: all at once below 2e7 rays).
    """
    src, dirs = geometry.ray_geometry_3d()
    labels_np = np.asarray(phantom.labels).astype(np.int32)
    if method in ("auto", "dominant"):
        try:
            return _cone_dominant_cached(phantom, geometry, src, dirs,
                                         labels_np)
        except ConeDominantUnsupported:
            # capability limits only — genuine input errors propagate
            if method == "dominant":
                raise
    labels = jnp.asarray(labels_np)
    V = src.shape[0]
    n_rays = int(np.prod(src.shape[:-1]))
    if view_block is None:
        view_block = V if n_rays <= int(2e7) else max(1, V // 8)
    src = jnp.asarray(src, dtype)
    dirs = jnp.asarray(dirs, dtype)
    if view_block >= V:
        return trace_paths_3d(labels, src, dirs, phantom.dx, phantom.dy,
                              phantom.dz, n_materials=phantom.n_materials)
    while V % view_block:
        view_block -= 1
    sb = src.reshape(V // view_block, view_block, *src.shape[1:])
    db = dirs.reshape(V // view_block, view_block, *dirs.shape[1:])
    out = jax.lax.map(
        lambda ab: trace_paths_3d(labels, ab[0], ab[1], phantom.dx,
                                  phantom.dy, phantom.dz,
                                  n_materials=phantom.n_materials),
        (sb, db))
    return out.reshape(V, *src.shape[1:-1], phantom.n_materials)


def cone_sinogram(phantom, geometry, spectrum, *, dtype=jnp.float32,
                  view_block=None):
    """Polyenergetic cone-beam acquisition -> (counts, log sinogram).

    Mirrors the 2-D ``get_sino`` contract (/root/reference/main.py:120)
    with an extra detector-row axis: both outputs are
    [N_proj, N_rows, N_channels].
    """
    from . import spectral as sp_ops

    paths = cone_material_paths(phantom, geometry, dtype=dtype,
                                view_block=view_block)
    mu_t = jnp.asarray(phantom.materials.mu_table(spectrum.E), dtype)
    i0 = sp_ops.effective_fluence(spectrum, geometry)
    counts = sp_ops.counts_from_paths(paths, mu_t, jnp.asarray(i0, dtype))
    sino_log = sp_ops.log_sinogram(counts, float(np.sum(i0)))
    return counts, sino_log


def _fdk_filter_zffs(sino_log, ct, ramp, window, dtype):
    """Filtered, preweighted projections for a z-FFS scan [V, R, C]
    (or a stack [M, V, R, C] — the weight broadcasts).

    Identical filter chain to the static FDK path except the cone
    factor uses each view subset's TRUE deflected-ray cone angle,
    ``cos(kappa) = SDD/sqrt(SDD^2 + (z_det[r] - delta_v)^2)``
    (``delta_v = 0`` recovers ``SID/sqrt(SID^2 + z_iso^2)`` exactly).
    """
    from .filters import filter_frequency_response

    V, R, C = sino_log.shape[-3:]
    cosg = np.cos(ct.gammas)  # [C]
    z_det = np.asarray(ct.z_iso) * ct.SDD / ct.SID  # [R]
    off = np.asarray(ct.ffs_view_offsets, np.float64)  # [V]
    cosk = ct.SDD / np.sqrt(ct.SDD ** 2
                            + (z_det[None, :] - off[:, None]) ** 2)
    w = jnp.asarray(cosg[None, None, :] * cosk[:, :, None] * ct.SID,
                    dtype)
    H, m = filter_frequency_response(C, ct.dgamma, ramp, window, "fan")
    pw = sino_log.astype(dtype) * w
    spec = jnp.fft.rfft(pw, n=m, axis=-1)
    return jnp.fft.irfft(spec * jnp.asarray(H, dtype), n=m,
                         axis=-1)[..., :C] * ct.dgamma


def fdk_reconstruct(sino_log, geometry, n_matrix, fov, ramp, *,
                    nz_out=None, dz_out=None, window="sinc",
                    view_block=8):
    """FDK cone-beam reconstruction -> volume [nz_out, N, N] in cm^-1.

    ``sino_log``: [N_proj, N_rows, N_channels] line-integral data from
    :func:`cone_sinogram`.  Row pitch/count come from ``geometry``
    (:class:`~dexct_tpu.system.geometry.ConeBeamGeometry`); the output
    z-grid defaults to one slice per detector row at isocenter pitch.
    The filter is the shared sinc-windowed ramp
    (:mod:`dexct_tpu.ops.filters`) applied along channels per
    (view, row), after the FDK cone pre-weight.
    """
    from .filters import filter_frequency_response

    ct = geometry
    if abs(getattr(ct, "pitch", 0.0)) > 1e-12:
        raise ValueError(
            "geometry has a helical pitch; use helical_fdk_reconstruct "
            "(the circular FDK assumes a z=0 source orbit)"
        )
    if abs(getattr(ct, "tilt", 0.0)) > 1e-12:
        raise ValueError(
            "geometry has a gantry tilt; use fdk_tilted_reconstruct "
            "(the circular FDK assumes a z=0 source orbit)")
    if getattr(ct, "flat_panel", False):
        raise ValueError(
            "flat-panel geometries reconstruct with "
            "ops.flatpanel.fdk_flat_reconstruct (equidistant columns; "
            "this FDK assumes an equiangular cylindrical detector)")
    V, R, C = sino_log.shape
    if R != ct.N_rows:
        raise ValueError(f"sinogram has {R} rows, geometry {ct.N_rows}")
    nz = R if nz_out is None else int(nz_out)
    dz = float(ct.h_iso if dz_out is None else dz_out)
    dtype = jnp.result_type(sino_log.dtype, jnp.float32)

    if getattr(ct, "ffs", "none") == "z":
        # Z flying focal spot: per-view source deflection + per-parity
        # cone preweight + per-view detector-row offsets — needs the
        # general backprojector (the packed multi-volume path assumes
        # one shared row grid).  Circular orbit => constant window
        # center; the den normalization reduces exactly to the
        # circular dbeta sum at full coverage.
        q = _fdk_filter_zffs(sino_log, ct, ramp, window, dtype)
        off = np.asarray(ct.ffs_view_offsets, np.float64)
        row_off = off * ct.SID / (ct.SDD * ct.h_iso)
        z0 = (0.5 - nz / 2.0) * dz
        beta_c = np.full(nz, 0.5 * ct.rotation_total)
        return _helical_backproject(
            q, jnp.asarray(ct.betas, dtype), jnp.asarray(off, dtype),
            jnp.asarray(row_off, dtype), jnp.asarray(beta_c, dtype),
            float(ct.SID), float(ct.dgamma), float(ct.h_iso), int(R),
            0.0, int(n_matrix), int(nz), float(fov), dz, float(z0),
            view_block=int(view_block), weighting="full",
            pair_mode=_helical_pair_ok(float(ct.SID), float(fov),
                                       float(ct.h_iso), dz, int(nz),
                                       int(R)))

    # FDK pre-weight: the 2-D fan weighting cos(gamma) * SID
    # (ops/fbp.filter_sinogram) times the cone factor cos(kappa) =
    # SID/sqrt(SID^2 + z_iso^2); filter/scale conventions identical to
    # the fan path so the central slice matches it exactly
    cosg = np.cos(ct.gammas)  # [C]
    cosk = ct.SID / np.sqrt(ct.SID ** 2 + np.asarray(ct.z_iso) ** 2)  # [R]
    w = jnp.asarray(cosg[None, :] * cosk[:, None] * ct.SID, dtype)

    H, m = filter_frequency_response(C, ct.dgamma, ramp, window, "fan")
    pw = sino_log.astype(dtype) * w[None]
    spec = jnp.fft.rfft(pw, n=m, axis=-1)
    q = jnp.fft.irfft(spec * jnp.asarray(H, dtype), n=m,
                      axis=-1)[..., :C] * ct.dgamma

    betas = jnp.asarray(ct.betas, dtype)
    # K=1 case of the shared multi-volume backprojector (one tap
    # geometry/pack/gather body to maintain, not three)
    orbit4 = _fdk_orbit4_ok(V, int(n_matrix), ct.rotation_total)
    return _fdk_backproject_multi(
        q[None], betas, float(ct.SID), float(ct.dgamma), float(ct.h_iso),
        int(R), int(n_matrix), int(nz), float(fov), dz,
        float(ct.rotation_total / V), view_block=int(view_block),
        pair_mode=_fdk_pair_ok(float(ct.SID), float(fov),
                               float(ct.h_iso), dz, int(nz), int(R)),
        orbit4=orbit4)[0]

@functools.partial(
    jax.jit,
    static_argnames=("n_matrix", "nz_out", "fov", "view_block",
                     "weighting", "axis_name", "pair_mode", "dbeta",
                     "pitch", "dz_out", "dgamma"),
)
def _helical_backproject(q, betas, src_z, row_off, beta_c, sid, dgamma,
                         row_h, n_rows, pitch, n_matrix, nz_out, fov,
                         dz_out, z0, *, view_block=8, weighting="full",
                         axis_name=None, pair_mode=False, dbeta=None):
    """Generalized-Feldkamp backprojection for a helical orbit.

    Per voxel, views inside a 2*pi window centered on the source's
    passage of the voxel's z (|beta - beta_c(z)| <= pi) contribute with
    the circular-FDK 1/L^2 weight; the accumulated weight normalizes
    partially-covered voxels (Wang et al. 1993 helical Feldkamp).  In
    the full-coverage limit (every view weight 1 over one turn) the
    normalization reduces exactly to the circular dbeta sum.

    ``beta_c``: [nz_out] per-slice window-center view angle (the
    wrapper computes ``beta_mid + 2*pi*z/pitch``, or a constant for a
    circular orbit).  ``row_off``: [N_proj] additive detector-row
    offset in row units — the exact z-flying-focal-spot term
    ``delta_v*SID/(SDD*row_h)`` (``src_z`` then carries the deflected
    source z ``sz + delta_v``); zeros for a static spot.

    ``q`` may be [V, R, C] (one volume) or [M, V, R, C]: the M stacked
    sinograms share every tap index and window weight, so the four
    bilinear taps of ALL volumes ride one 4*M-float gather row (the
    fused DE pipeline's 4-volume trick, as in
    :func:`_fdk_backproject_multi`) and the VPU-heavy window math is
    paid once.  With ``axis_name`` set (shard_map over a view axis),
    the numerator/denominator accumulators are psum'd across shards
    BEFORE the coverage normalization — each shard feeds its view
    wedge, the window partition stays globally exact.

    ``pair_mode`` (static; callers decide via :func:`_fdk_pair_ok` —
    the same worst-case adjacent-slice row-spacing rule as the circular
    FDK): output z-slices process in PAIRS sharing one
    4-detector-row x 2-channel window gather (8*M floats), halving the
    slice gather count; per-slice bilinear row weights select inside
    the window, so the result is identical arithmetic on identical
    taps.

    ``dbeta`` (static view spacing, radians) enables the SLICE-WINDOWED
    scan: every weighting's view window is hard-zero beyond a known
    |beta - beta_c| half-width, i.e. a view only feeds slices within
    ~one pitch of its source z — so each view block processes a
    dynamic-slice window of L = O(pitch/dz_out) slices instead of all
    nz_out (dynamic_update_slice accumulation; window starts are
    even-aligned so the z-pair grouping matches the full scan exactly).
    For an n-turn scan this cuts the backprojection gather count ~n×
    and makes long helical scans O(views-per-turn) per slice.  Callers
    must guarantee each ``view_block`` of ``betas`` spans at most
    (vb-1)*dbeta (contiguous uniformly spaced views — true for every
    geometry in the package, including per-shard wedges).  ``None``
    keeps the full-scan path; results are identical either way (the
    window bound is conservative and the dropped terms are exact
    zeros).
    """
    squeeze = q.ndim == 3
    q4 = q[None] if squeeze else q
    M, V, R, C = q4.shape
    qt = jnp.moveaxis(q4, 0, 1)  # [V, M, R, C]: view-major for qb = qt[vo]
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
    vb = max(1, min(view_block, V))
    while V % vb:
        vb -= 1
    bb = betas.reshape(V // vb, vb)
    zb = src_z.reshape(V // vb, vb)
    rob = row_off.reshape(V // vb, vb)
    voff = jnp.arange(V, dtype=jnp.int32).reshape(V // vb, vb)

    # slice grid, padded to even length with a DUPLICATE of the last
    # slice (same z => same row window, so a (last, dup) tail pair is
    # the existing odd-tail semantics); the pad row is dropped at the
    # end
    npad = nz_out + (nz_out % 2)
    zc = (jnp.asarray(z0, dtype)
          + jnp.arange(nz_out, dtype=dtype) * dz_out)
    if npad != nz_out:
        zcp = jnp.concatenate([zc, zc[-1:]])
        bcp = jnp.concatenate([beta_c, beta_c[-1:]]).astype(dtype)
    else:
        zcp = zc
        bcp = beta_c.astype(dtype)

    # static slice-window length (see docstring): every weighting is
    # hard-zero beyond |beta - beta_c| = hw*pi, so a view block spanning
    # (vb-1)*dbeta feeds at most `need` consecutive slices
    L = None
    if dbeta is not None and abs(pitch) > 1e-12 and npad > 4:
        hw = _helical_window_halfwidth(weighting, C, dgamma)
        s_abs = 2.0 * np.pi * abs(dz_out / pitch)  # slice step in beta_c
        span = (2.0 * hw * np.pi + (vb - 1) * abs(dbeta)) / s_abs
        Lw = int(np.ceil(span + 3.1))  # even-floor start + float margin
        Lw += Lw % 2
        if Lw <= npad - 2:
            L = Lw

    def block(carry, args):
        num, den = carry
        beta, sz, ro, vo = args
        cb, sb = jnp.cos(beta), jnp.sin(beta)
        ell = sid - (X[None, :] * cb[:, None] + Y[None, :] * sb[:, None])
        vt = -X[None, :] * sb[:, None] + Y[None, :] * cb[:, None]
        gam = jnp.arctan2(-vt, ell)
        h2 = ell * ell + vt * vt
        inv_h = jax.lax.rsqrt(h2)
        cidx = gam / dgamma - 0.5 + C / 2.0
        c0 = jnp.clip(jnp.floor(cidx), 0, C - 2)
        fc = jnp.clip(cidx - c0, 0.0, 1.0)
        w_in = jnp.where((cidx >= 0.0) & (cidx <= C - 1.0), 1.0, 0.0)
        w_amp = w_in / h2

        qb = qt[vo]  # [vb, M, R, C]
        qb_c1 = jnp.concatenate([qb[..., 1:], qb[..., -1:]], -1)
        if pair_mode:
            # 4-row x 2-channel windows: row r holds rows r..r+3
            # (edge-replicated; rows past R-4 are never gathered since
            # the window base clamps there)
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
            qb_r1c1 = jnp.concatenate([qb_r1[..., 1:], qb_r1[..., -1:]],
                                      -1)
            packed_flat = jnp.stack(
                [qb, qb_c1, qb_r1, qb_r1c1], -1
            ).transpose(0, 2, 3, 1, 4).reshape(vb * R * C, M * 4)
        voff_b = jnp.arange(vb, dtype=jnp.int32)

        def row_geom(z):
            zt = (z - sz)[:, None] * sid * inv_h  # [vb, P]
            ridx = zt / row_h - 0.5 + R / 2.0 + ro[:, None]
            r0 = jnp.clip(jnp.floor(ridx), 0, max(R - 2, 0))
            fr = jnp.clip(ridx - r0, 0.0, 1.0)
            w_z = jnp.where((ridx >= -0.5) & (ridx <= R - 0.5), 1.0, 0.0)
            return zt, r0, fr, w_z

        def win_weight(z, bc, zt, w_z):
            if weighting == "td":
                # Tam-Danielsson window: use a ray for a voxel only
                # while the voxel projects between the detector traces
                # of the previous/next helix turn (curved-detector
                # bounds from the pi-line chord 2*SID*cos g):
                #   h in [-(P/4pi)(pi+2g)/cos g, +(P/4pi)(pi-2g)/cos g]
                qp = pitch / (4.0 * np.pi)
                cg = jnp.cos(gam)
                htop = qp * (np.pi - 2.0 * gam) / cg
                hbot = -qp * (np.pi + 2.0 * gam) / cg
                taper = 0.5 * row_h
                w_td = (jnp.clip((zt - hbot) / taper, 0.0, 1.0)
                        * jnp.clip((htop - zt) / taper, 0.0, 1.0))
                arc = jnp.where(jnp.abs(beta - bc) <= 1.5 * np.pi,
                                1.0, 0.0)
                w = w_z * w_td * arc[:, None]
            elif weighting == "cosz":
                # smooth z-distance redundancy weighting (Tang-style
                # 3-D weighted helical FDK): favor the conjugate copy
                # whose detector-row height is smaller; the den
                # normalization turns the kernel into a proper
                # conjugate partition of unity per voxel.
                arc = jnp.where(jnp.abs(beta - bc) <= 1.5 * np.pi,
                                1.0, 0.0)
                # kernel scale: the half-turn feed P/2 (the conjugate
                # copies' zt differ by ~P/2); epsilon floor keeps den
                # covered in the coverage gaps between turns
                hmax = 0.5 * jnp.abs(pitch) + 0.25 * row_h
                kz = jnp.cos(jnp.clip(zt / hmax, -1.0, 1.0)
                             * (0.5 * np.pi)) ** 2 + 1e-3
                w = w_z * kz * arc[:, None]
            elif weighting == "short":
                # voxel-centered short scan (pi + fan) with Parker
                # weights: in-plane exact (the 2-D short-scan identity,
                # ops/fbp.parker_weights) while halving the window's
                # source-z spread — the dominant helical z-blur term.
                gm = 0.5 * C * dgamma
                d = (beta - bc)[:, None]
                alpha = d + 0.5 * np.pi + gm  # 0 .. pi + 2*gm in-scan
                g = gam
                lo_den = jnp.maximum(gm - g, 1e-3)
                hi_den = jnp.maximum(gm + g, 1e-3)
                w_lo = jnp.sin((0.25 * np.pi)
                               * jnp.clip(alpha / lo_den, 0.0, 2.0)) ** 2
                w_hi = jnp.sin((0.25 * np.pi) * jnp.clip(
                    (np.pi + 2.0 * gm - alpha) / hi_den, 0.0, 2.0)) ** 2
                w_park = jnp.where(
                    alpha < 2.0 * (gm - g), w_lo,
                    jnp.where(alpha > np.pi - 2.0 * g, w_hi, 1.0))
                in_scan = ((alpha >= 0.0)
                           & (alpha <= np.pi + 2.0 * gm))
                w = w_z * jnp.where(in_scan, w_park, 0.0)
            elif weighting == "pair":
                # Conjugate-pair z-preference weighting (Tang-style 3-D
                # weighted helical FDK).  Every line appears twice in
                # the voxel's 2*pi window: at (beta, gam) and at the
                # conjugate view beta' = beta + pi + 2*gam (gamma' =
                # -gam).  The fan redundancy identity makes the two
                # contributions interchangeable in-plane (same reason
                # Parker weights are exact), so a SMOOTH pairwise
                # partition w + w' = 1 that prefers the copy with the
                # smaller detector-row height |zt| keeps the in-plane
                # sum exact while suppressing the large-cone-angle copy
                # whose z-inconsistency drives the helical artifact.
                d = (beta - bc)[:, None]
                two_g = 2.0 * gam
                dbc = jnp.where(d > -two_g, -(np.pi - two_g),
                                (np.pi + two_g))
                sz_conj = sz[:, None] + dbc * pitch / (2.0 * np.pi)
                h_own = h2 * inv_h
                h_conj = jnp.maximum(2.0 * sid * jnp.cos(gam) - h_own,
                                     1e-3)
                zt_c = (z - sz_conj) * sid / h_conj
                hdet = 0.5 * row_h * R + 0.5 * row_h
                # scale ~ quarter feed: the two copies' zt spread is
                # +-P/4 over the window; in-plane exactness is carried
                # by the pairwise partition, so the kernel can be sharp
                scale = jnp.maximum(0.25 * jnp.abs(pitch), 0.75 * row_h)

                def kfun(t):
                    return jnp.cos(jnp.clip(t / scale, -1.0, 1.0)
                                   * (0.5 * np.pi)) ** 2 + 1e-4

                k_own = kfun(zt)
                # a conjugate that falls off the detector cannot carry
                # its share: claim the full pair weight instead
                k_c = kfun(zt_c) * jnp.where(jnp.abs(zt_c) <= hdet,
                                             1.0, 0.0)
                w_pair = k_own / (k_own + k_c + 1e-30)
                w_win = jnp.where(jnp.abs(d) <= np.pi, 1.0, 0.0)
                w = w_z * w_pair * w_win
            elif weighting == "feather":
                # feathered window edge: the hard +-pi cutoff enters/
                # leaves per voxel mid-view and streaks; a cos^2 taper
                # over the outer delta of the (overcomplete) 1.25*pi
                # half-window removes the discontinuity and the den
                # normalization keeps the partition exact.
                d = jnp.abs(beta - bc) / np.pi  # 0..
                w_win = jnp.cos(jnp.clip((d - 0.75) / 0.5, 0.0, 1.0)
                                * (0.5 * np.pi)) ** 2
                w = w_z * w_win[:, None]
            else:
                w_win = jnp.where(jnp.abs(beta - bc) <= np.pi, 1.0, 0.0)
                w = w_z * w_win[:, None]
            return w

        def one_slice(z, bc):
            zt, r0, fr, w_z = row_geom(z)
            w = win_weight(z, bc, zt, w_z)
            idx = (r0.astype(jnp.int32) * C + c0.astype(jnp.int32)
                   + voff_b[:, None] * (R * C))
            rows = packed_flat[idx.reshape(-1)].reshape(
                idx.shape + (M, 4))
            fcm, frm = fc[..., None], fr[..., None]
            top = rows[..., 0] * (1 - fcm) + rows[..., 1] * fcm
            bot = rows[..., 2] * (1 - fcm) + rows[..., 3] * fcm
            val = top * (1 - frm) + bot * frm  # [vb, P, M]
            return (jnp.sum(val * (w_amp * w)[..., None], axis=0),
                    jnp.sum(w, axis=0))

        def one_pair(z2, bc2):
            # both slices' bilinear row brackets sit inside one 4-row
            # window (pair_mode eligibility): ONE 8*M-float gather
            # serves the pair
            ga, gb = row_geom(z2[0]), row_geom(z2[1])
            r_base = jnp.minimum(jnp.minimum(ga[1], gb[1]),
                                 float(R - 4))
            idx = (r_base.astype(jnp.int32) * C + c0.astype(jnp.int32)
                   + voff_b[:, None] * (R * C))
            rows = packed_flat[idx.reshape(-1)].reshape(
                idx.shape + (M, 4, 2))
            fcm = fc[..., None, None]
            rows_c = rows[..., 0] * (1 - fcm) + rows[..., 1] * fcm
            # [vb, P, M, 4]: channel-lerped window rows
            dr_ids = jnp.arange(4, dtype=dtype)
            nums, dens = [], []
            for (zt, r0, fr, w_z), z, bc in ((ga, z2[0], bc2[0]),
                                             (gb, z2[1], bc2[1])):
                w = win_weight(z, bc, zt, w_z)
                sub = (r0 - r_base)[..., None]  # 0..2 in window rows
                wrow = (jnp.where(dr_ids == sub, 1.0 - fr[..., None],
                                  0.0)
                        + jnp.where(dr_ids == sub + 1.0, fr[..., None],
                                    0.0))  # [vb, P, 4]
                val = jnp.sum(rows_c * wrow[..., None, :], axis=-1)
                nums.append(jnp.sum(val * (w_amp * w)[..., None],
                                    axis=0))
                dens.append(jnp.sum(w, axis=0))
            return jnp.stack(nums), jnp.stack(dens)

        def pairs_of(zw, bw):
            pn, pd = jax.vmap(one_pair)(zw.reshape(-1, 2),
                                        bw.reshape(-1, 2))
            return pn.reshape(-1, P, M), pd.reshape(-1, P)

        def slices_of(zw, bw):
            return jax.vmap(one_slice)(zw, bw)

        if L is not None:
            # slice-windowed scan: only the L slices whose view window
            # can reach this block update; k0 is EVEN so the z-pair
            # grouping matches the full scan's exactly
            s_tr = bcp[1] - bcp[0]
            hwpi = _helical_window_halfwidth(weighting, C, dgamma) \
                * np.pi
            # exact lower bound of the nonzero slice range (sign-robust:
            # min over both block endpoints x both window edges)
            kmin = jnp.minimum(
                jnp.minimum((beta[0] - hwpi - bcp[0]) / s_tr,
                            (beta[0] + hwpi - bcp[0]) / s_tr),
                jnp.minimum((beta[-1] - hwpi - bcp[0]) / s_tr,
                            (beta[-1] + hwpi - bcp[0]) / s_tr))
            k0 = jnp.clip(2.0 * jnp.floor(0.5 * kmin),
                          0.0, float(npad - L)).astype(jnp.int32)
            zw = jax.lax.dynamic_slice(zcp, (k0,), (L,))
            bw = jax.lax.dynamic_slice(bcp, (k0,), (L,))
            dn, dd = (pairs_of if pair_mode else slices_of)(zw, bw)
            num = jax.lax.dynamic_update_slice(
                num,
                jax.lax.dynamic_slice(num, (k0, 0, 0), (L, P, M)) + dn,
                (k0, 0, 0))
            den = jax.lax.dynamic_update_slice(
                den, jax.lax.dynamic_slice(den, (k0, 0), (L, P)) + dd,
                (k0, 0))
            return (num, den), None
        dn, dd = (pairs_of if pair_mode else slices_of)(zcp, bcp)
        return (num + dn, den + dd), None

    acc0 = (jnp.zeros((npad, P, M), dtype),
            jnp.zeros((npad, P), dtype))
    (num, den), _ = jax.lax.scan(block, acc0, (bb, zb, rob, voff))
    num, den = num[:nz_out], den[:nz_out]
    if axis_name is not None:  # global coverage across view shards
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    out = jnp.where(den[..., None] > 0,
                    num / jnp.maximum(den, 1e-30)[..., None], 0.0)
    out = out * (2.0 * np.pi)
    vol = jnp.zeros((nz_out, N * N, M), dtype)
    vol = vol.at[:, jnp.asarray(sel)].set(out)
    vol = jnp.moveaxis(vol.reshape(nz_out, N, N, M), -1, 0)
    return vol[0] if squeeze else vol


def _helical_window_halfwidth(weighting, n_channels, dgamma):
    """Hard-zero |beta - beta_c| half-width of each gFDK weighting, in
    units of pi — THE single source of truth for the slice-windowed
    scan's bounds (both the static L and the traced k0 use it; it must
    match the zero sets in ``win_weight``)."""
    return {"full": 1.0, "pair": 1.0, "feather": 1.2501,
            "td": 1.5, "cosz": 1.5,
            "short": 0.5 + 0.5 * n_channels * dgamma / np.pi}[weighting]


@jax.jit
def _trilinear_volume_sample(vol, zi, yi, xi):
    """Trilinear sample of ``vol [..., nz, ny, nx]`` at continuous
    indices ``zi/yi/xi`` (broadcastable to the output shape); points
    outside the index box return 0."""
    nz, ny, nx = vol.shape[-3:]
    z0 = jnp.clip(jnp.floor(zi), 0, nz - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(yi), 0, ny - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xi), 0, nx - 2).astype(jnp.int32)
    fz = jnp.clip(zi - z0, 0.0, 1.0)
    fy = jnp.clip(yi - y0, 0.0, 1.0)
    fx = jnp.clip(xi - x0, 0.0, 1.0)
    ok = ((zi >= 0.0) & (zi <= nz - 1.0) & (yi >= 0.0)
          & (yi <= ny - 1.0) & (xi >= 0.0) & (xi <= nx - 1.0))
    acc = 0.0
    for dz_ in (0, 1):
        wz = fz if dz_ else 1.0 - fz
        for dy_ in (0, 1):
            wy = fy if dy_ else 1.0 - fy
            for dx_ in (0, 1):
                wx = fx if dx_ else 1.0 - fx
                acc = acc + (wz * wy * wx) * vol[..., z0 + dz_,
                                                 y0 + dy_, x0 + dx_]
    return acc * ok


def fdk_tilted_reconstruct(sino_log, geometry, n_matrix, fov, ramp, *,
                           nz_out=None, dz_out=None, window="sinc",
                           view_block=8):
    """Gantry-tilted circular cone-beam FDK -> [nz, N, N] cm^-1 on the
    PATIENT-frame grid.

    ``geometry``:
    :class:`~dexct_tpu.system.geometry.TiltedConeBeamGeometry`.  A
    tilted scan is EXACTLY a standard circular scan of the rigidly
    rotated patient, so the reconstruction is the existing packed FDK
    run in the gantry frame (``geometry.untilted()``, on a grid
    enlarged to cover the rotated patient box) followed by ONE
    trilinear affine resample back onto the patient grid — the
    classic clinical shear-stack, done in a single gather pass.
    ``tilt = 0`` reproduces :func:`fdk_reconstruct` exactly (same
    grid, and the resample degenerates to identity-position sampling).

    Accepts ``[V, R, C]`` or stacked ``[M, V, R, C]`` sinograms (the
    stacked form shares the multi-volume packed backprojection).
    Patient points whose gantry-frame image falls outside the scanned
    FOV cylinder come back 0 (the clinical reduced-coverage corners of
    a tilted acquisition).
    """
    ct = geometry
    tau = float(getattr(ct, "tilt", 0.0))
    single = sino_log.ndim == 3
    stack = sino_log[None] if single else sino_log
    V, R, C = stack.shape[-3:]
    if R != ct.N_rows:
        raise ValueError(f"sinogram has {R} rows, geometry {ct.N_rows}")
    nz = R if nz_out is None else int(nz_out)
    dz = float(ct.h_iso if dz_out is None else dz_out)
    ct_g = ct.untilted() if hasattr(ct, "untilted") else ct
    if abs(tau) < 1e-12:
        out = jnp.stack([
            fdk_reconstruct(s, ct_g, n_matrix, fov, ramp, nz_out=nz,
                            dz_out=dz, window=window,
                            view_block=view_block) for s in stack])
        return out[0] if single else out

    # gantry grid covering R_x(-tau) of the patient grid, at the same
    # pixel/slice pitch
    c_t, s_t = abs(np.cos(tau)), abs(np.sin(tau))
    px = fov / n_matrix
    z_half = 0.5 * nz * dz
    # x is unchanged by the tilt, so the gantry grid must cover the
    # FULL patient fov in x even when the rotated y-z box is narrower
    fov_g = max(fov, fov * c_t + 2.0 * z_half * s_t) + 2.0 * px
    n_g = int(-(-fov_g / px // 2) * 2)
    fov_g = n_g * px
    zg_half = 0.5 * fov * s_t + z_half * c_t + dz
    nz_g = int(-(-2.0 * zg_half / dz // 2) * 2)
    # ONE multi-volume packed backprojection for the whole stack (all
    # M volumes' bilinear taps ride one gather row — the same kernel
    # and flags fdk_reconstruct uses, so M=1 is bit-equal to it)
    from .filters import filter_frequency_response

    dtf = jnp.result_type(stack.dtype, jnp.float32)
    cosg = np.cos(ct_g.gammas)
    cosk = ct_g.SID / np.sqrt(ct_g.SID ** 2
                              + np.asarray(ct_g.z_iso) ** 2)
    w = jnp.asarray(cosg[None, :] * cosk[:, None] * ct_g.SID, dtf)
    Hf, m = filter_frequency_response(C, ct_g.dgamma, ramp, window,
                                      "fan")
    q = jnp.fft.irfft(
        jnp.fft.rfft(stack.astype(dtf) * w[None, None], n=m, axis=-1)
        * jnp.asarray(Hf, dtf), n=m, axis=-1)[..., :C] * ct_g.dgamma
    vols = _fdk_backproject_multi(
        q, jnp.asarray(ct_g.betas, dtf), float(ct_g.SID),
        float(ct_g.dgamma), float(ct_g.h_iso), int(R), int(n_g),
        int(nz_g), float(fov_g), dz,
        float(ct_g.rotation_total / V), view_block=int(view_block),
        pair_mode=_fdk_pair_ok(float(ct_g.SID), float(fov_g),
                               float(ct_g.h_iso), dz, int(nz_g),
                               int(R)),
        orbit4=_fdk_orbit4_ok(V, int(n_g), ct_g.rotation_total))

    # patient grid -> gantry coords: R_x(-tau)
    dtype = vols.dtype
    xs = jnp.asarray((np.arange(n_matrix) + 0.5 - n_matrix / 2) * px,
                     dtype)
    zs = jnp.asarray((np.arange(nz) + 0.5 - nz / 2) * dz, dtype)
    ct_, st_ = np.cos(tau), np.sin(tau)
    y_g = ct_ * xs[None, :] + st_ * zs[:, None]  # [nz, N] (y axis)
    z_g = -st_ * xs[None, :] + ct_ * zs[:, None]
    px_g = fov_g / n_g
    yi = (y_g / px_g + n_g / 2 - 0.5)[:, :, None]
    zi = (z_g / dz + nz_g / 2 - 0.5)[:, :, None]
    xi = (xs / px_g + n_g / 2 - 0.5)[None, None, :]
    out = _trilinear_volume_sample(
        vols, jnp.broadcast_to(zi, (nz, n_matrix, n_matrix)),
        jnp.broadcast_to(yi, (nz, n_matrix, n_matrix)),
        jnp.broadcast_to(xi, (nz, n_matrix, n_matrix)))
    return out[0] if single else out


def helical_fdk_reconstruct(sino_log, geometry, n_matrix, fov, ramp, *,
                            z_out=None, window="sinc", view_block=8,
                            weighting="full"):
    """Helical generalized-Feldkamp reconstruction -> [nz, N, N] cm^-1.

    ``geometry``: :class:`~dexct_tpu.system.geometry.HelicalConeBeamGeometry`
    (``pitch = 0`` delegates to the circular :func:`fdk_reconstruct`).
    ``z_out``: 1-D array of output slice z positions [cm]; defaults to
    one slice per ``h_iso`` across the central 80% of the source travel
    (the ends lack a full 2*pi window).  Filtering is identical to the
    circular FDK; each voxel backprojects over the 2*pi of views
    centered on the source's passage of its z, normalized by the
    accumulated window weight.

    ``weighting`` selects the per-voxel view-window weights (round-3
    study, measured on the z-varying sphere phantom of
    tests/test_conebeam.py; VALIDATION.md "helical" rows):

    * ``"full"`` (default): hard 2*pi window + weight normalization.
      Exact (<=1e-4) for z-uniform objects; sloped-boundary z-artifact
      ~4% max / ~1.1% rms at pitch = R*h/2.  Measured BEST.
    * ``"feather"``: cos^2-tapered window edge (equal to full within
      0.1%).
    * ``"short"``: voxel-centered pi+fan Parker window — halves the
      source-z spread but the short-scan in-plane residual dominates
      (~7%).
    * ``"pair"``: Tang-style conjugate-pair z-preference partition
      (~ equal to full; sharper kernels degrade).
    * ``"cosz"``, ``"td"``: z-kernel and Tam-Danielsson single-copy
      windows — the TD pi-window is NOT in-plane exact in native fan
      coordinates (conjugate 1/h^2 asymmetry, ~20%); kept for study.

    The residual z-varying artifact is intrinsic to the
    interpolating-gFDK class (it grows with edge sharpness, not with
    pitch); the exact-helical alternative is
    :func:`~dexct_tpu.ops.katsevich.katsevich_reconstruct`.  Measured
    (z-varying sphere, max interior error vs matched fan truth,
    round-3 spectral-derivative chain): clinical pitch (~R*h/2) gFDK's
    2-pi view redundancy still edges it (1.2% vs 1.7%); at R=16 and
    2.75x that pitch they tie (4.0% vs 3.9%); with few rows at high
    pitch (R=8, pitch 5.5) gFDK's window interpolation explodes to
    ~20% while Katsevich holds 3.9% — the regime the exact method
    exists for.
    """
    from .filters import filter_frequency_response

    ct = geometry
    if sino_log.ndim not in (3, 4):
        raise ValueError("sino_log must be [V, R, C] or [M, V, R, C]")
    V, R, C = sino_log.shape[-3:]
    if R != ct.N_rows:
        raise ValueError(f"sinogram has {R} rows, geometry {ct.N_rows}")
    if abs(getattr(ct, "pitch", 0.0)) < 1e-12:
        kw = {}
        if z_out is not None:
            zo = np.asarray(z_out, np.float64)
            dzs = np.diff(zo)
            if len(zo) > 1 and not np.allclose(dzs, dzs[0]):
                raise ValueError("z_out must be uniformly spaced")
            dz0 = float(dzs[0]) if len(zo) > 1 else float(ct.h_iso)
            if abs(zo.mean()) > 1e-9 + 1e-6 * abs(dz0):
                raise ValueError(
                    "circular FDK slice grids are centered on z=0; "
                    f"got mean z {zo.mean():g}")
            kw = dict(nz_out=len(zo), dz_out=dz0)
        if sino_log.ndim == 4:  # stacked convenience path
            return jnp.stack([
                fdk_reconstruct(s, ct, n_matrix, fov, ramp,
                                window=window, view_block=view_block,
                                **kw) for s in sino_log])
        return fdk_reconstruct(sino_log, ct, n_matrix, fov, ramp,
                               window=window, view_block=view_block,
                               **kw)
    dtype = jnp.result_type(sino_log.dtype, jnp.float32)

    if z_out is None:
        travel = ct.pitch * ct.rotation_total / (2.0 * np.pi)
        half = 0.4 * travel
        nz = max(int(2.0 * half / ct.h_iso), 1)
        z_out = (np.arange(nz) + 0.5) * (2.0 * half / nz) - half
    z_out = np.asarray(z_out, np.float64)
    if len(z_out) > 1:
        dzs = np.diff(z_out)
        if not np.allclose(dzs, dzs[0]):
            raise ValueError("z_out must be uniformly spaced")
        dz = float(dzs[0])
    else:
        dz = float(ct.h_iso)

    zffs = getattr(ct, "ffs", "none") == "z"
    if zffs:
        if weighting not in ("full", "feather"):
            raise ValueError(
                "z-FFS helical reconstruction supports the 'full' and "
                f"'feather' weightings (got {weighting!r}); the other "
                "study windows assume a static spot")
        q = _fdk_filter_zffs(sino_log, ct, ramp, window, dtype)
    else:
        cosg = np.cos(ct.gammas)
        cosk = ct.SID / np.sqrt(ct.SID ** 2 + np.asarray(ct.z_iso) ** 2)
        w = jnp.asarray(cosg[None, :] * cosk[:, None] * ct.SID, dtype)
        H, m = filter_frequency_response(C, ct.dgamma, ramp, window,
                                         "fan")
        pw = sino_log.astype(dtype) * w[None]
        spec = jnp.fft.rfft(pw, n=m, axis=-1)
        q = jnp.fft.irfft(spec * jnp.asarray(H, dtype), n=m,
                          axis=-1)[..., :C] * ct.dgamma

    if weighting not in ("td", "full", "cosz", "feather", "pair",
                         "short"):
        raise ValueError(f"unknown helical weighting {weighting!r}")
    off = np.asarray(ct.ffs_view_offsets, np.float64)  # zeros if none
    sz = np.asarray(ct.source_z, np.float64) + off
    row_off = off * ct.SID / (ct.SDD * ct.h_iso)
    beta_c = 0.5 * ct.rotation_total + 2.0 * np.pi * z_out / ct.pitch
    return _helical_backproject(
        q, jnp.asarray(ct.betas, dtype), jnp.asarray(sz, dtype),
        jnp.asarray(row_off, dtype), jnp.asarray(beta_c, dtype),
        float(ct.SID), float(ct.dgamma), float(ct.h_iso), int(R),
        float(ct.pitch), int(n_matrix), int(len(z_out)), float(fov),
        dz, float(z_out[0]),
        view_block=int(view_block), weighting=weighting,
        pair_mode=_helical_pair_ok(float(ct.SID), float(fov),
                                   float(ct.h_iso), dz, len(z_out),
                                   int(R)),
        dbeta=(float(ct.betas[1] - ct.betas[0]) if V > 1 else None))


@functools.partial(jax.jit, static_argnames=("n_steps",))
def project_volume_3d(vol, src, dirs, dx, dy, dz, *, n_steps=None):
    """Exact line integrals of a continuous mu volume [Nz, Ny, Nx].

    The same bounded 3-D Siddon DDA as :func:`trace_paths_3d`, but
    accumulating ``segment_length * vol[cell]`` instead of per-material
    one-hots — a LINEAR operator in ``vol``, so ``jax.linear_transpose``
    yields the EXACT adjoint backprojector for free.  To keep the
    function structurally linear (transposable), the integer DDA state
    scans over geometry ONLY, emitting per-step (cell index, segment
    length); the vol contraction is a single gather-weighted sum
    outside the scan.  The adjoint lowers to scatter-adds (~10x slower
    than gathers on this TPU — tools/bench_gather.py), so the pair is
    the *iterative*-recon building block; FDK remains the fast analytic
    path.  Memory: the [n_steps, n_rays] segment table materializes —
    chunk rays for large scans.
    """
    nz, ny, nx = vol.shape
    k = n_steps if n_steps is not None else nx + ny + nz + 2
    dtype = jnp.result_type(vol.dtype, jnp.float32)
    vol_flat = vol.reshape(-1).astype(dtype)

    batch_shape = src.shape[:-1]
    p = src.reshape(-1, 3).astype(dtype)
    d = dirs.reshape(-1, 3).astype(dtype)

    g0 = (-0.5 * nx * dx, -0.5 * ny * dy, -0.5 * nz * dz)
    cells = (dx, dy, dz)
    dims = (nx, ny, nz)

    def axis_setup(i):
        pi, di = p[:, i], d[:, i]
        ok = jnp.abs(di) > 1e-12
        safe = jnp.where(ok, di, 1.0)
        t_lo = (g0[i] - pi) / safe
        t_hi = (g0[i] + dims[i] * cells[i] - pi) / safe
        inside = (pi >= g0[i]) & (pi <= g0[i] + dims[i] * cells[i])
        tmin = jnp.where(ok, jnp.minimum(t_lo, t_hi),
                         jnp.where(inside, -_BIG, _BIG))
        tmax = jnp.where(ok, jnp.maximum(t_lo, t_hi),
                         jnp.where(inside, _BIG, -_BIG))
        return ok, safe, tmin, tmax

    setup = [axis_setup(i) for i in range(3)]
    t_in = jnp.maximum(
        jnp.maximum(setup[0][2], jnp.maximum(setup[1][2], setup[2][2])), 0.0)
    t_out = jnp.minimum(setup[0][3], jnp.minimum(setup[1][3], setup[2][3]))
    t_out = jnp.where(t_in < t_out, t_out, t_in)
    eps = 1e-6 * (dx + dy + dz)

    def cell_and_crossing(i):
        pi, di = p[:, i], d[:, i]
        ok, safe, _, _ = setup[i]
        e = pi + (t_in + eps) * di
        idx = jnp.clip(jnp.floor((e - g0[i]) / cells[i]),
                       0, dims[i] - 1).astype(jnp.int32)
        plane = g0[i] + (idx + (di > 0)) * cells[i]
        t_next = jnp.where(ok, (plane - pi) / safe, _BIG).astype(dtype)
        dt = jnp.where(ok, cells[i] / jnp.abs(safe), _BIG).astype(dtype)
        step = jnp.where(ok, jnp.sign(di), 0.0).astype(jnp.int32)
        return idx, t_next, dt, step

    (ix, tnx, dtx, sx) = cell_and_crossing(0)
    (iy, tny, dty, sy) = cell_and_crossing(1)
    (iz, tnz, dtz, sz) = cell_and_crossing(2)

    t0 = t_in.astype(dtype)
    t_outc = t_out.astype(dtype)

    def step(carry, _):
        t, ix, iy, iz, tnx, tny, tnz = carry
        t_min = jnp.minimum(jnp.minimum(tnx, tny), tnz)
        t_next = jnp.maximum(jnp.minimum(t_min, t_outc), t)
        seg = t_next - t
        lin = (iz * ny + iy) * nx + ix
        take_x = tnx <= jnp.minimum(tny, tnz)
        take_y = (~take_x) & (tny <= tnz)
        take_z = ~(take_x | take_y)
        ix = jnp.clip(jnp.where(take_x, ix + sx, ix), 0, nx - 1)
        iy = jnp.clip(jnp.where(take_y, iy + sy, iy), 0, ny - 1)
        iz = jnp.clip(jnp.where(take_z, iz + sz, iz), 0, nz - 1)
        tnx = jnp.where(take_x, tnx + dtx, tnx)
        tny = jnp.where(take_y, tny + dty, tny)
        tnz = jnp.where(take_z, tnz + dtz, tnz)
        return (t_next, ix, iy, iz, tnx, tny, tnz), (lin, seg)

    _, (lin_all, seg_all) = jax.lax.scan(
        step, (t0, ix, iy, iz, tnx, tny, tnz), None, length=k)
    acc = jnp.sum(seg_all * vol_flat[lin_all], axis=0)
    return acc.reshape(batch_shape)


def cone_cg_recon(sino, geometry, vol_shape, voxel, *, n_iters=30,
                  x0=None):
    """Conjugate-gradient least-squares cone-beam reconstruction.

    Solves ``min_x ||A x - sino||²`` with A the exact 3-D Siddon
    projector (:func:`project_volume_3d`) over the geometry's ray grid
    and A^T its ``jax.linear_transpose`` — the 3-D analog of
    :func:`dexct_tpu.ops.iterative.cg_recon`.  ``vol_shape``:
    (Nz, Ny, Nx); ``voxel``: (dx, dy, dz) [cm].  Returns
    ``(volume [Nz, Ny, Nx] cm^-1, residual-norm history)``.
    """
    from .iterative import _cg

    src, dirs = geometry.ray_geometry_3d()
    src = jnp.asarray(src, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    dx, dy, dz = (float(v) for v in voxel)

    def apply_fn(vol):
        return project_volume_3d(vol, src, dirs, dx, dy, dz)

    if x0 is None:
        x0 = jnp.zeros(tuple(vol_shape), jnp.float32)
    return _cg(apply_fn, jnp.asarray(sino, jnp.float32), x0, n_iters, 0.0)


# ---------------------------------------------------------------------------
# Packed dominant-axis cone trace — the 3-D analog of the 2-D
# 16-row-group kernel (ops/siddon_fast.py).  A cone-beam ray's z-slope
# is small (|dz/d_inplane| <= tan(cone_half_angle)), so across one
# 16-row group it spans at most TWO z-layers whenever
# 16 * cell * max_slope <= dz; the group then needs just two row-32
# gathers (one per bracketing layer) instead of ~16 scalar DDA gathers.
# Exactness: each row-band splits at the x-column crossing AND the
# z-plane crossing (3 sub-segments), each labeled at its midpoint cell.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("labels_shape", "n_materials", "group", "lbits",
                     "group_block", "words", "bundle"),
)
def _trace_cone_dominant(packed_z, labels_shape, src, dirs, dx, dy, dzc,
                         *, n_materials, group=16, lbits=3,
                         group_block=4, words=None, bundle=1):
    """Exact cone paths for in-plane-y-dominant rays via packed marching.

    packed_z: [(Ny/group * Nx) * Nz, 2*group*W] — LAYER-INTERLEAVED
    row-window packs (:func:`build_cone_pack`): row ``base * Nz + L``
    holds layer L's window words followed by layer L+1's (clamped at
    Nz-1), so the group's two bracketing z-layers arrive in ONE row
    gather.  src/dirs: [R, 3] with |dir_y| >= |dir_x| and a z-slope
    small enough that one group spans <= 2 layers (callers must enforce
    ``group * dy * max|dz/dy| <= dzc``).

    ``bundle > 1``: rays arrive bundle-TRANSPOSED (member b of bundle
    nb at flat position ``b * (R/bundle) + nb``) and each bundle shares
    ONE anchor+layer gather per group — the cone analog of the 2-D
    bundled tracer (ops/siddon_fast.py).  Exactness requires every
    bundle to satisfy BOTH window contracts per group: the shared
    ``cpw*words`` column window covers all members' columns AND all
    members' z-layers sit in the shared {L, L+1} bracket
    (:func:`plan_cone_dominant_bundled` enforces both; the caller
    passes its matching ``words``).
    """
    from .siddon_fast import _rowwin_cols_per_word, _rowwin_words

    nz, ny, nx = labels_shape
    cpw = _rowwin_cols_per_word(lbits)
    W = _rowwin_words(group, lbits) if words is None else int(words)
    lmask = (1 << lbits) - 1
    x0 = -0.5 * nx * dx
    y0 = -0.5 * ny * dy
    z0 = -0.5 * nz * dzc
    dtype = jnp.result_type(src.dtype, jnp.float32)
    p = src.astype(dtype)
    d = dirs.astype(dtype)
    n_rays = p.shape[0]
    if bundle > 1 and n_rays % bundle:
        raise ValueError(
            f"ray count {n_rays} not a multiple of bundle {bundle}")
    shp = (bundle, n_rays // bundle) if bundle > 1 else (n_rays,)
    p = p.reshape(*shp, 3)
    d = d.reshape(*shp, 3)

    px, py, pz = p[..., 0], p[..., 1], p[..., 2]
    dxr, dyr, dzr = d[..., 0], d[..., 1], d[..., 2]
    okx = jnp.abs(dxr) > 1e-12
    okz = jnp.abs(dzr) > 1e-12
    sdx = jnp.where(okx, dxr, 1.0)
    sdy = dyr
    sdz = jnp.where(okz, dzr, 1.0)

    def slab(pi, di, ok, safe, g0, n, cell):
        t_lo = (g0 - pi) / safe
        t_hi = (g0 + n * cell - pi) / safe
        inside = (pi >= g0) & (pi <= g0 + n * cell)
        tmin = jnp.where(ok, jnp.minimum(t_lo, t_hi),
                         jnp.where(inside, -_BIG, _BIG))
        tmax = jnp.where(ok, jnp.maximum(t_lo, t_hi),
                         jnp.where(inside, _BIG, -_BIG))
        return tmin, tmax

    txmin, txmax = slab(px, dxr, okx, sdx, x0, nx, dx)
    tzmin, tzmax = slab(pz, dzr, okz, sdz, z0, nz, dzc)
    t_lo_glob = jnp.maximum(jnp.maximum(txmin, tzmin), 0.0)
    t_hi_glob = jnp.minimum(txmax, tzmax)

    inv_dx = 1.0 / dx
    inv_dz = 1.0 / dzc

    def subband(i_row):
        y_lo = y0 + i_row * dy
        ta = (y_lo - py) / sdy
        tb = (y_lo + dy - py) / sdy
        tA = jnp.maximum(jnp.minimum(ta, tb), t_lo_glob)
        tB = jnp.minimum(jnp.maximum(ta, tb), t_hi_glob)
        valid = tA < tB
        tAc = jnp.where(valid, tA, 0.0)
        tBc = jnp.where(valid, tB, 0.0)
        xa = px + tAc * dxr
        xb = px + tBc * dxr
        ja = jnp.clip(jnp.floor((xa - x0) * inv_dx), 0, nx - 1)
        jb = jnp.clip(jnp.floor((xb - x0) * inv_dx), 0, nx - 1)
        return tAc, tBc, ja.astype(jnp.int32), jb.astype(jnp.int32), valid

    def group_contrib(ig):
        rows = [subband(group * ig + k) for k in range(group)]
        jm = jnp.full(shp, nx, jnp.int32)
        lzm = jnp.full(shp, nz, jnp.int32)
        for tA, tB, ja, jb, valid in rows:
            jm = jnp.minimum(jm, jnp.where(valid, jnp.minimum(ja, jb), nx))
            za = jnp.clip(jnp.floor((pz + tA * dzr - z0) * inv_dz),
                          0, nz - 1).astype(jnp.int32)
            zb = jnp.clip(jnp.floor((pz + tB * dzr - z0) * inv_dz),
                          0, nz - 1).astype(jnp.int32)
            lzm = jnp.minimum(lzm, jnp.where(valid,
                                             jnp.minimum(za, zb), nz))
        if bundle > 1:
            jm = jm.min(axis=0)   # one shared anchor + layer bracket
            lzm = lzm.min(axis=0)
        anchor = jnp.clip(jm, 0, nx - cpw * W)
        L = jnp.clip(lzm, 0, max(nz - 2, 0))
        base = ig * nx + anchor
        # ONE row gather fetches both bracketing layers (interleaved
        # table rows: base * nz + L holds layers L and L+1)
        codes = packed_z[base * nz + L]
        gw = group * W
        codes_a = codes[:, :gw]
        codes_b = codes[:, gw:]
        if bundle > 1:
            anchor = anchor[None, :]
            L = L[None, :]

        out = 0.0
        for k, (tA, tB, ja, jb, valid) in enumerate(rows):
            j_hi = jnp.maximum(ja, jb)
            t_c = (x0 + j_hi * dx - px) / sdx
            t_c = jnp.where(okx, t_c, _BIG)
            # z-plane between layers L and L+1
            t_zc = (z0 + (L + 1) * dzc - pz) / sdz
            t_zc = jnp.where(okz, t_zc, _BIG)
            t1 = jnp.clip(jnp.minimum(t_c, t_zc), tA, tB)
            t2 = jnp.clip(jnp.maximum(t_c, t_zc), tA, tB)

            wa = [codes_a[:, W * k + w] for w in range(W)]
            wb = [codes_b[:, W * k + w] for w in range(W)]
            if bundle > 1:
                wa = [w_[None, :] for w_ in wa]
                wb = [w_[None, :] for w_ in wb]

            def lab_from(ws, rel):
                sel = ws[W - 1] >> (lbits * (rel - cpw * (W - 1)))
                for w in range(W - 2, -1, -1):
                    sel = jnp.where(rel <= cpw * w + cpw - 1,
                                    ws[w] >> (lbits * (rel - cpw * w)), sel)
                return sel & lmask

            def seg(ts, te):
                ln = jnp.where(valid, jnp.maximum(te - ts, 0.0), 0.0)
                mid = 0.5 * (ts + te)
                col = jnp.clip(jnp.floor((px + mid * dxr - x0) * inv_dx),
                               0, nx - 1).astype(jnp.int32)
                rel = jnp.clip(col - anchor, 0, cpw * W - 1)
                izm = jnp.clip(jnp.floor((pz + mid * dzr - z0) * inv_dz),
                               0, nz - 1).astype(jnp.int32)
                in_b = jnp.clip(izm - L, 0, 1) == 1
                lab = jnp.where(in_b, lab_from(wb, rel),
                                lab_from(wa, rel))
                return ln, lab

            for ts, te in ((tA, t1), (t1, t2), (t2, tB)):
                ln, lab = seg(ts, te)
                out = out + ln[..., None] * jax.nn.one_hot(
                    lab, n_materials, dtype=dtype)
        return out

    n_groups = ny // group
    acc0 = jnp.zeros((*shp, n_materials), dtype)
    block = max(1, min(group_block, n_groups))
    while n_groups % block:
        block -= 1

    def step(acc, b):
        def one(kk, a):
            return a + group_contrib(b * block + kk)

        return jax.lax.fori_loop(0, block, one, acc), None

    acc, _ = jax.lax.scan(step, acc0, jnp.arange(n_groups // block))
    return acc.reshape(n_rays, n_materials)


def validate_cone_dominant(labels_shape, n_materials, dx, dy, dz,
                           max_slope, group=16):
    """The SINGLE capability check for the packed dominant cone kernel
    (used by :func:`trace_cone_dominant` and
    ``pipeline.cone.pack_cone_dect`` — keeps them from drifting).
    Raises :class:`ConeDominantUnsupported`; returns (lbits, words).
    """
    from .siddon_fast import (_rowwin_cols_per_word, _rowwin_words,
                              rowwin_lbits)

    nz, ny, nx = labels_shape
    if abs(dx - dy) > 1e-9 * max(dx, dy):
        raise ConeDominantUnsupported(
            "cone dominant tracing requires square in-plane cells")
    if n_materials > 31:
        raise ConeDominantUnsupported(
            "cone dominant tracing supports < 32 labels")
    lb = rowwin_lbits(n_materials)
    W = _rowwin_words(group, lb)
    if (ny % group or nx % group
            or min(ny, nx) < _rowwin_cols_per_word(lb) * W):
        raise ConeDominantUnsupported(
            f"grid {ny}x{nx} does not fit group={group} windows")
    if group * dx * max_slope > dz * (1.0 + 1e-9):
        raise ConeDominantUnsupported(
            f"cone z-slope too steep for group={group}: "
            f"{group} * {dx} * {max_slope:.4f} > dz={dz}; use "
            "trace_paths_3d")
    # layer-interleaved rows hold BOTH bracketing layers (2*group*W
    # words) and both orientations pack: 2 (orient) * 2 (layers)
    table_bytes = 4 * nz * (ny // group) * nx * group * W * 4
    if table_bytes > 512 << 20:
        raise ConeDominantUnsupported(
            f"packed cone tables would need {table_bytes >> 20} MiB HBM; "
            "use trace_paths_3d for volumes this large")
    return lb, W


def validate_cone_hbm(n_matrix, nz_out, n_volumes=4, *, n_zslab=1,
                      orbit4=True, budget_bytes=12 << 30):
    """Volume-state HBM estimate for the fused cone pipeline (VERDICT
    round-2 item 8: the guard extended to the sharded case).

    The FDK stage's resident state per chip: the (leg-folded)
    accumulator [nz_local, P, legs*K], the scattered full-grid buffer
    [legs*K, nz_local, N^2] before recomposition, and the output
    volumes [K, nz_local, N^2] — all shrink with ``n_zslab``.  Raises
    with a concrete ``n_zslab`` recommendation when the estimate
    exceeds ``budget_bytes`` (~12 GiB usable of a 16 GiB v5e, leaving
    room for the trace tables and gather blocks, which are separately
    bounded).  Returns the per-chip byte estimate.
    """
    import numpy as _np

    if nz_out % max(n_zslab, 1):
        raise ConeDominantUnsupported(
            f"nz_out={nz_out} not divisible by n_zslab={n_zslab}")
    nz_local = nz_out // max(n_zslab, 1)
    P = int(_np.pi / 4.0 * n_matrix * n_matrix)
    legs = 4 if orbit4 else 1
    acc = nz_local * P * legs * n_volumes * 4
    scatter = legs * n_volumes * nz_local * n_matrix * n_matrix * 4
    out = n_volumes * nz_local * n_matrix * n_matrix * 4
    gather_block = 400 << 20  # the kernel's own per-block bound
    total = acc + scatter + out + gather_block
    if total > budget_bytes:
        need = -(-total * n_zslab // budget_bytes)
        raise ConeDominantUnsupported(
            f"cone FDK volume state ~{total >> 20} MiB/chip exceeds the "
            f"{budget_bytes >> 30} GiB budget at nz_out={nz_out}, "
            f"N={n_matrix}; shard the z axis: n_zslab>={need} "
            "(pack_cone_dect_sharded(..., n_zslab=...))")
    return total


def build_cone_pack(labels3, group, lbits, words=None):
    """Layer-interleaved row-window pack for the dominant cone kernel.

    [Nz, Ny, Nx] labels -> [(Ny/group * Nx) * Nz, 2*group*W] int32:
    row ``base * Nz + L`` = layer L's pack row ``base`` followed by
    layer L+1's (clamped), so both bracketing layers of a row group
    arrive in ONE row gather.  Built with one vmapped
    :func:`~dexct_tpu.ops.siddon_fast.pack_labels_rowwin` (per-layer
    calls would compile/launch Nz times).  ``words`` widens the per-row
    window (the bundled tracer's shared-window contract).
    """
    from .siddon_fast import pack_labels_rowwin

    pz = jax.vmap(
        lambda l: pack_labels_rowwin(l, group, lbits, words=words))(labels3)
    pz_next = jnp.concatenate([pz[1:], pz[-1:]], axis=0)
    paired = jnp.concatenate([pz, pz_next], axis=-1)  # [nz, Gnx, 2gW]
    return paired.transpose(1, 0, 2).reshape(
        paired.shape[1] * paired.shape[0], paired.shape[2])


def plan_cone_dominant(dirs3, pad_to=1024):
    """Host-side 3-D ray partition by in-plane dominant axis.

    Returns (idx_y, idx_x, inv_perm, n_y, n_x) exactly as
    :func:`~dexct_tpu.ops.siddon_fast.plan_dominant_split` but from
    [..., 3] directions (the z component rides along).
    """
    from .siddon_fast import plan_dominant_split

    return plan_dominant_split(np.asarray(dirs3).reshape(-1, 3)[:, :2],
                               pad_to=pad_to)


def plan_cone_dominant_bundled(src, dirs, labels_shape, dx, dy, dzc, *,
                               lbits=3, group=16, words=3, bundle=8,
                               pad_rays=1024, pad_bundles=128):
    """Host-side bundled ray partition for the dominant cone tracer.

    The cone analog of
    :func:`~dexct_tpu.ops.siddon_fast.plan_dominant_split_bundled`:
    bundles are runs of ``bundle`` consecutive same-dominance channels
    within one (view, detector-row), sharing ONE anchor+layer gather
    per ``group`` image rows.  src/dirs: [V, R, C, 3] view-major ray
    arrays.  A bundle is eligible only when, for EVERY row group, (a)
    the shared ``cpw*words``-column window covers all members' columns
    (same linear-extrapolation bound as 2-D) and (b) all members'
    z-layers sit inside one shared {L, L+1} bracket — the layer range
    is evaluated at the group-boundary marched coordinates (z is
    linear and monotone along the ray, so boundaries bound the range;
    clipping in the kernel only shrinks it).  Ineligible bundles and
    run tails go to the per-ray ``rest`` arrays, so the plan is always
    exact.

    Returns the same dict contract as the 2-D planner (``bun_y``/
    ``bun_x`` transposed member-major, ``rest_y``/``rest_x``, ``inv``
    into the four concatenated padded outputs, counts and the
    ``bundle``/``words``/``group``/``lbits`` to call the kernel with).
    """
    from .siddon_fast import _rowwin_cols_per_word

    src = np.asarray(src)
    dirs = np.asarray(dirs)
    if src.ndim != 4 or src.shape[-1] != 3:
        raise ValueError("cone bundled planning needs [V, R, C, 3] ray "
                         "arrays (bundles are same-view same-row runs)")
    V, R, C, _ = dirs.shape
    s2 = src.reshape(-1, 3)
    d2 = dirs.reshape(-1, 3)
    y_dom = np.abs(d2[:, 1]) >= np.abs(d2[:, 0])
    cpw = _rowwin_cols_per_word(lbits)
    win = cpw * words
    nz, ny, nx = labels_shape
    z0 = -0.5 * nz * dzc

    def side(mask, swap):
        cols = [1, 0, 2] if swap else [0, 1, 2]
        sd = s2[:, cols]
        dd = d2[:, cols]
        fny = nx if swap else ny      # marched row count
        frow = dx if swap else dy     # marched row cell
        fcol = dy if swap else dx     # column cell
        half = 0.5 * fny * frow
        # FIXED channel blocks (vectorized; a run-based chunking like
        # the 2-D planner gains only the few dominance-straddling
        # blocks per row but costs a 30 s Python loop over V*R rows):
        # block k of a (view, row) bundles iff all its channels share
        # this dominance
        nb_per = C // bundle
        cb = nb_per * bundle
        idx_f = np.arange(V * R * C).reshape(V * R, C)
        mask_f = mask.reshape(V * R, C)
        idx = idx_f[:, :cb].reshape(V * R, nb_per, bundle)
        mask3 = mask_f[:, :cb].reshape(V * R, nb_per, bundle)
        blk_ok = mask3.all(-1)
        bun = idx[blk_ok]                      # [NB, B]
        rest = list(idx[~blk_ok][mask3[~blk_ok]])  # this side's strays
        rest.extend(idx_f[:, cb:][mask_f[:, cb:]].tolist())  # C tail
        if len(bun):
            bd = dd[bun]  # [NB, B, 3]
            bs = sd[bun]
            with np.errstate(divide="ignore", invalid="ignore"):
                slope = bd[..., 0] / bd[..., 1]      # d_col / d_row
                zslope = bd[..., 2] / bd[..., 1]     # d_z / d_row
            ends = np.array([-half, half])[:, None, None]
            x_ext = bs[..., 0] + (ends - bs[..., 1]) * slope  # [2,NB,B]
            spread = (x_ext.max(-1) - x_ext.min(-1)).max(0) / fcol
            smax = np.abs(slope).max(-1)
            col_ok = (np.isfinite(spread)
                      & (np.floor(group * smax) + 3 + np.ceil(spread)
                         <= win))
            # z-layer bracket: layers at every group boundary, clipped
            # exactly as the kernel clips
            n_groups = fny // group
            yb = (-half + np.arange(n_groups + 1) * group
                  * frow)[:, None, None]               # [G+1, 1, 1]
            z_b = bs[..., 2] + (yb - bs[..., 1]) * zslope  # [G+1,NB,B]
            lay = np.clip(np.floor((z_b - z0) / dzc), 0,
                          nz - 1)                      # [G+1, NB, B]
            # per-group range per member = boundary pair min/max
            lo = np.minimum(lay[:-1], lay[1:])         # [G, NB, B]
            hi = np.maximum(lay[:-1], lay[1:])
            z_ok = ((hi.max(-1) - lo.min(-1)) <= 1).all(0) \
                & np.isfinite(z_b).all((0, 2))
            ok = col_ok & z_ok
            rest.extend(bun[~ok].reshape(-1).tolist())
            bun = bun[ok]
        nb = len(bun)
        nbp = max(pad_bundles, -(-max(nb, 1) // pad_bundles) * pad_bundles)
        bun_p = (np.concatenate([bun, np.repeat(bun[-1:], nbp - nb, 0)])
                 if nb else np.zeros((nbp, bundle), np.int64))
        order = bun_p.T.reshape(-1)
        rest = np.asarray(rest, np.int64)
        n_rest = len(rest)
        rp = max(pad_rays, -(-max(n_rest, 1) // pad_rays) * pad_rays)
        rest_p = (np.pad(rest, (0, rp - n_rest), mode="edge") if n_rest
                  else np.zeros(rp, np.int64))
        return bun_p, nbp, nb, order, rest_p, n_rest

    by = side(y_dom, False)
    bx = side(~y_dom, True)
    inv = np.zeros(V * R * C, np.int64)
    off = 0
    for bun_p, nbp, nb, order, rest_p, n_rest in (by, bx):
        if nb:
            nb_i, b_i = np.meshgrid(np.arange(nb), np.arange(bundle),
                                    indexing="ij")
            inv[bun_p[:nb].reshape(-1)] = off + (b_i * nbp
                                                 + nb_i).reshape(-1)
        off += bundle * nbp
        if n_rest:
            inv[rest_p[:n_rest]] = off + np.arange(n_rest)
        off += len(rest_p)
    return {
        "bun_y": by[3].astype(np.int32), "nb_y": by[2], "nbp_y": by[1],
        "rest_y": by[4].astype(np.int32), "n_rest_y": by[5],
        "bun_x": bx[3].astype(np.int32), "nb_x": bx[2], "nbp_x": bx[1],
        "rest_x": bx[4].astype(np.int32), "n_rest_x": bx[5],
        "inv": inv.astype(np.int32),
        "frac_bundled": (by[2] + bx[2]) * bundle / max(V * R * C, 1),
        "bundle": bundle, "words": words, "group": group, "lbits": lbits,
    }


def trace_cone_dominant(labels3, src, dirs, dx, dy, dz, *, n_materials,
                        group=16, plan=None, packs=None):
    """Exact cone-beam paths via dominant-axis packed marching.

    Requirements (:class:`ConeDominantUnsupported` otherwise — callers
    can fall back to :func:`trace_paths_3d`): square in-plane cells,
    dims divisible by ``group``, window fit on both in-plane dims,
    < 32 materials, a z-slope bound
    ``group * cell * max|dz_dir/dominant_dir| <= dz`` (one row group
    then spans at most two z-layers), and packed tables under 512 MiB
    (see :func:`validate_cone_dominant`).  ``plan`` (from
    :func:`plan_cone_dominant`) and ``packs=(pack_y, pack_x)`` (from
    :func:`build_cone_pack` at the default words) let repeated calls
    skip the host replan / eager repack.
    """
    nz, ny, nx = labels3.shape
    d = np.asarray(dirs).reshape(-1, 3)
    dom = np.maximum(np.abs(d[:, 0]), np.abs(d[:, 1]))
    max_slope = float(np.max(np.abs(d[:, 2]) / np.maximum(dom, 1e-12)))
    lb, W = validate_cone_dominant((nz, ny, nx), n_materials, dx, dy, dz,
                                   max_slope, group)

    idx_y, idx_x, inv, n_y, n_x = (plan_cone_dominant(d) if plan is None
                                   else plan)
    if packs is None:
        labels3 = jnp.asarray(labels3)
        pack_y = build_cone_pack(labels3, group, lb)
        pack_x = build_cone_pack(labels3.transpose(0, 2, 1), group, lb)
    else:
        pack_y, pack_x = packs

    src2 = jnp.asarray(np.asarray(src).reshape(-1, 3))
    dirs2 = jnp.asarray(d)
    batch_shape = np.asarray(src).shape[:-1]

    out_y = _trace_cone_dominant(
        pack_y, (nz, ny, nx), src2[idx_y], dirs2[idx_y], dx, dy, dz,
        n_materials=n_materials, group=group, lbits=lb)[:max(n_y, 1)]
    # x-dominant rays march the transposed in-plane grid (z unchanged)
    swap = jnp.asarray([1, 0, 2])
    out_x = _trace_cone_dominant(
        pack_x, (nz, nx, ny), src2[idx_x][:, swap], dirs2[idx_x][:, swap],
        dy, dx, dz, n_materials=n_materials, group=group,
        lbits=lb)[:max(n_x, 1)]
    cat = jnp.concatenate([out_y[:n_y], out_x[:n_x]], axis=0)
    return cat[jnp.asarray(inv)].reshape(*batch_shape, n_materials)


@functools.partial(
    jax.jit,
    static_argnames=("labels_shape", "n_materials", "group", "lbits",
                     "words", "bundle"))
def _trace_cone_bundled_core(pack_y, pack_x, src2, dirs2, bun_y, rest_y,
                             bun_x, rest_x, inv, dx, dy, dzc, *,
                             labels_shape, n_materials, group, lbits,
                             words, bundle):
    """One jitted program for the four bundled-cone-plan kernels + the
    inverse permutation (mirrors ops/siddon_fast._trace_bundled_core)."""
    nz, ny, nx = labels_shape
    swap = jnp.asarray([1, 0, 2])
    kern = functools.partial(_trace_cone_dominant, n_materials=n_materials,
                             group=group, lbits=lbits, words=words)
    cat = jnp.concatenate([
        kern(pack_y, (nz, ny, nx), src2[bun_y], dirs2[bun_y],
             dx, dy, dzc, bundle=bundle),
        kern(pack_y, (nz, ny, nx), src2[rest_y], dirs2[rest_y],
             dx, dy, dzc),
        kern(pack_x, (nz, nx, ny), src2[bun_x][:, swap],
             dirs2[bun_x][:, swap], dy, dx, dzc, bundle=bundle),
        kern(pack_x, (nz, nx, ny), src2[rest_x][:, swap],
             dirs2[rest_x][:, swap], dy, dx, dzc),
    ], axis=0)
    return cat[inv]


def trace_cone_dominant_bundled(labels3, src, dirs, dx, dy, dz, *,
                                n_materials, plan, packs=None):
    """Exact cone paths via the BUNDLED dominant-axis fast path.

    ``plan`` comes from :func:`plan_cone_dominant_bundled` on the SAME
    [V, R, C, 3] geometry; ``packs=(pack_y, pack_x)`` supplies
    precomputed :func:`build_cone_pack` tables at the plan's
    group/lbits/words.  Bit-identical to :func:`trace_cone_dominant`
    (the planner only bundles rays whose shared column window and
    z-layer bracket provably cover them; the rest run per-ray over the
    same packs)."""
    nz, ny, nx = labels3.shape
    batch_shape = np.asarray(src).shape[:-1]
    src2 = jnp.asarray(np.asarray(src, np.float32).reshape(-1, 3))
    dirs2 = jnp.asarray(np.asarray(dirs, np.float32).reshape(-1, 3))
    g, w, lb, B = plan["group"], plan["words"], plan["lbits"], plan["bundle"]
    if packs is None:
        labels3 = jnp.asarray(labels3)
        packs = (build_cone_pack(labels3, g, lb, words=w),
                 build_cone_pack(labels3.transpose(0, 2, 1), g, lb,
                                 words=w))
    dev = plan.get("_dev")
    if dev is None:
        dev = plan["_dev"] = tuple(
            jnp.asarray(plan[k])
            for k in ("bun_y", "rest_y", "bun_x", "rest_x", "inv"))
    out = _trace_cone_bundled_core(
        packs[0], packs[1], src2, dirs2, *dev, dx, dy, dz,
        labels_shape=(int(nz), int(ny), int(nx)),
        n_materials=int(n_materials), group=int(g), lbits=int(lb),
        words=int(w), bundle=int(B))
    return out.reshape(*batch_shape, n_materials)


def simulate_cone_dect(ct, phantom, spec1, spec2, n_matrix, fov, ramp, *,
                       n_iters=10, noise="none", key=None,
                       recon="auto", mask_thresh=0.95, do_recon=True,
                       heel=None, **recon_kw):
    """Full 3-D dual-energy cone-beam pipeline: trace ONCE -> two
    polyenergetic acquisitions -> per-ray GN decomposition -> FDK (or
    helical Feldkamp) of both HU volumes and both basis-material
    volumes.

    The 3-D analog of :func:`dexct_tpu.pipeline.api.simulate_dect`
    (reference main loop, /root/reference/main.py:101-176): the
    decomposition solver is geometry-agnostic, so the cone data
    decomposes row-by-row with the identical
    :mod:`~dexct_tpu.ops.matdecomp` machinery.  Returns a dict with
    ``sino_raw``/``sino_log`` pairs [V, R, C], ``mat_sinos`` [V, R, C]
    (g/cm²), ``recon_HU`` pair and ``mat_recons`` pair (volumes
    [nz, N, N]).  ``recon='helical'`` selects
    :func:`helical_fdk_reconstruct` (for
    :class:`~dexct_tpu.system.geometry.HelicalConeBeamGeometry`);
    ``recon='katsevich'`` selects the exact
    :func:`~dexct_tpu.ops.katsevich.katsevich_reconstruct`; ``ramp``
    feeds its window-matched spectral derivative, so the exact path
    reconstructs at the SAME in-plane MTF as the fan/gFDK paths.
    """
    from . import matdecomp as md
    from . import spectral as sp_ops

    dtype = jnp.float32
    if heel is not None and heel.d0_cm == 0.0:
        heel = None
    paths = cone_material_paths(phantom, ct)
    mu_t1 = jnp.asarray(phantom.materials.mu_table(spec1.E), dtype)
    mu_t2 = jnp.asarray(phantom.materials.mu_table(spec2.E), dtype)
    if heel is not None:
        # anode heel (ops/heel.py): per-row fluence tables, per-row air
        # normalization, and the row-vmapped exact decomposition
        from .heel import (counts_from_paths_heel, heel_fluence,
                           heel_second_moment)

        i0r_1 = heel_fluence(spec1, ct, heel)
        i0r_2 = heel_fluence(spec2, ct, heel)
        c1 = counts_from_paths_heel(paths, mu_t1, i0r_1, dtype=dtype)
        c2 = counts_from_paths_heel(paths, mu_t2, i0r_2, dtype=dtype)
    else:
        i0_1 = sp_ops.effective_fluence(spec1, ct)
        i0_2 = sp_ops.effective_fluence(spec2, ct)
        c1 = sp_ops.counts_from_paths(paths, mu_t1,
                                      jnp.asarray(i0_1, dtype))
        c2 = sp_ops.counts_from_paths(paths, mu_t2,
                                      jnp.asarray(i0_2, dtype))
    if noise != "none":
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        v1 = v2 = None
        if noise == "compound" and heel is not None:
            v1 = counts_from_paths_heel(
                paths, mu_t1, heel_second_moment(spec1, ct, heel),
                dtype=dtype)
            v2 = counts_from_paths_heel(
                paths, mu_t2, heel_second_moment(spec2, ct, heel),
                dtype=dtype)
        elif noise == "compound":
            i2_1 = jnp.asarray(sp_ops.second_moment_fluence(spec1, ct),
                               dtype)
            i2_2 = jnp.asarray(sp_ops.second_moment_fluence(spec2, ct),
                               dtype)
            v1 = sp_ops.counts_from_paths(paths, mu_t1, i2_1)
            v2 = sp_ops.counts_from_paths(paths, mu_t2, i2_2)
        c1 = sp_ops.sample_noise(k1, c1, noise, var=v1)
        c2 = sp_ops.sample_noise(k2, c2, noise, var=v2)
    if heel is not None:
        air1 = jnp.asarray(i0r_1.sum(-1), dtype)[None, :, None]
        air2 = jnp.asarray(i0r_2.sum(-1), dtype)[None, :, None]
        log1 = sp_ops.log_sinogram(c1, air1)
        log2 = sp_ops.log_sinogram(c2, air2)
        from .heel import decompose_cone_sinograms_heel

        mat1, mat2 = decompose_cone_sinograms_heel(
            ct, c1, c2, spec1, spec2, heel, n_iters=n_iters,
            mask_thresh=mask_thresh)
    else:
        log1 = sp_ops.log_sinogram(c1, float(np.sum(i0_1)))
        log2 = sp_ops.log_sinogram(c2, float(np.sum(i0_2)))

        _, dec_i0, dec_mus = md.prepare_decomposition(ct, spec1, spec2)
        flat = jnp.stack([c1.reshape(-1), c2.reshape(-1)])
        ab = md.gauss_newton_solve(
            flat, jnp.asarray(dec_i0, dtype), jnp.asarray(dec_mus, dtype),
            n_iters=n_iters)
        mask = (c1 >= mask_thresh * jnp.max(c1)).reshape(-1)  # air rays
        #                                                 (SURVEY §2.5)
        mat1 = jnp.where(mask, 0.0, ab[:, 0]).reshape(c1.shape)
        mat2 = jnp.where(mask, 0.0, ab[:, 1]).reshape(c1.shape)

    if not do_recon:  # forward-projection-only config skips the
        #   reconstruction stage (the dominant cost) entirely
        return {
            "sino_raw": (c1, c2),
            "sino_log": (log1, log2),
            "mat_sinos": (mat1, mat2),
            "recon_raw": (None, None),
            "recon_HU": (None, None),
            "mat_recons": (None, None),
        }
    if recon == "auto":  # helical geometries MUST NOT hit circular FDK
        if getattr(ct, "flat_panel", False):
            recon = "flat"
        elif abs(getattr(ct, "tilt", 0.0)) > 1e-12:
            recon = "tilted"
        else:
            recon = ("helical" if abs(getattr(ct, "pitch", 0.0)) > 1e-12
                     else "fdk")
    if recon == "katsevich":
        # exact helical path; ``ramp`` apodizes its spectral
        # fixed-direction derivative (the chain's only |w| factor), so
        # the in-plane MTF matches the fan/gFDK reconstructions
        from .katsevich import katsevich_reconstruct

        vols = [np.asarray(katsevich_reconstruct(
                    s, ct, n_matrix, fov, ramp=ramp, **recon_kw))
                for s in (log1, log2, mat1, mat2)]
    elif recon == "helical":
        # one stacked multi-volume gFDK call: all four volumes' taps
        # ride one 16-float gather row, window math paid once
        stacked = helical_fdk_reconstruct(
            jnp.stack([log1, log2, mat1, mat2]), ct, n_matrix, fov,
            ramp, **recon_kw)
        vols = [np.asarray(v) for v in stacked]
    elif recon == "tilted":
        # gantry-frame multi-volume FDK + one shear resample
        stacked = fdk_tilted_reconstruct(
            jnp.stack([log1, log2, mat1, mat2]), ct, n_matrix, fov,
            ramp, **recon_kw)
        vols = [np.asarray(v) for v in stacked]
    elif recon == "flat":
        from .flatpanel import fdk_flat_reconstruct

        stacked = fdk_flat_reconstruct(
            jnp.stack([log1, log2, mat1, mat2]), ct, n_matrix, fov,
            ramp, **recon_kw)
        vols = [np.asarray(v) for v in stacked]
    else:
        vols = [np.asarray(fdk_reconstruct(s, ct, n_matrix, fov, ramp,
                                           **recon_kw))
                for s in (log1, log2, mat1, mat2)]
    # same 10-cm-water-calibrated effective mu the 2-D pipeline uses
    from ..pipeline.api import effective_water_mu

    mu_w1 = effective_water_mu(spec1, ct)
    mu_w2 = effective_water_mu(spec2, ct)
    hu = [1000.0 * (vols[0] - mu_w1) / mu_w1,
          1000.0 * (vols[1] - mu_w2) / mu_w2]
    return {
        "sino_raw": (c1, c2),
        "sino_log": (log1, log2),
        "mat_sinos": (mat1, mat2),
        "recon_raw": (vols[0], vols[1]),
        "recon_HU": tuple(hu),
        "mat_recons": (vols[2], vols[3]),
    }


def _fdk_orbit4_ok(n_proj, n_matrix, rotation_total):
    """Static eligibility of the quarter-turn FDK orbit fold: uniform
    full-2*pi view grid closed under the quarter turn and an even
    recon matrix (shared by fdk_reconstruct and pipeline/cone.py so
    the two sites can never diverge)."""
    return bool(n_proj % 4 == 0 and n_matrix % 2 == 0
                and abs(rotation_total - 2.0 * np.pi) < 1e-9)


def _fdk_pair_ok(sid, fov, row_h, dz_out, nz_out, n_rows):
    """Static decision: can output z-slices pair over a 4-detector-row
    window?  Worst-case adjacent-slice detector-row spacing must stay
    under 2 (callers hold these as Python floats; the kernel's are
    traced)."""
    h_min = max(sid - fov / 2.0, 1e-6)
    spacing = abs(dz_out) * sid / (h_min * row_h)
    return (nz_out % 2 == 0 and nz_out >= 2 and n_rows >= 4
            and spacing <= 1.9)


def _helical_pair_ok(sid, fov, row_h, dz_out, nz_out, n_rows):
    """Pair eligibility for :func:`_helical_backproject`: same
    row-spacing rule as :func:`_fdk_pair_ok` but odd slice counts are
    allowed (the kernel pairs the even prefix and runs the last slice
    per-slice)."""
    h_min = max(sid - fov / 2.0, 1e-6)
    spacing = abs(dz_out) * sid / (h_min * row_h)
    return nz_out >= 2 and n_rows >= 4 and spacing <= 1.9


@functools.partial(
    jax.jit,
    static_argnames=("n_matrix", "nz_out", "fov", "view_block",
                     "pair_mode", "orbit4", "bf16_taps", "pair_seq"),
)
def _fdk_backproject_multi(qs, betas, sid, dgamma, row_h, n_rows,
                           n_matrix, nz_out, fov, dz_out, dbeta,
                           z_center=0.0, *,
                           view_block=8, pair_mode=False, orbit4=False,
                           bf16_taps=False, pair_seq=True):
    """Voxel-driven FDK backprojection of K filtered stacks at once.

    qs: [K, V, R, C].  One (channel, row) tap geometry pass serves all
    K volumes — the row gather packs both channel taps of the
    bracketing detector rows of every image (the cone analog of
    ``ops/fbp_fast.fan_backproject_multi``).  Adjacent OUTPUT z-slices
    read adjacent detector rows (ridx spacing = dz_out*SID*inv_h/row_h
    <= ~1.5 at default settings), so when the worst-case spacing stays
    under 2, z-slices process in PAIRS over a 4-detector-row window —
    one row-8K gather serves two slices, halving the gather count
    (the discipline of CLAUDE.md).  Falls back to the per-slice 2-row
    path otherwise.  Returns [K, nz, N, N].

    ``orbit4`` (round 3): a uniform full-2*pi view grid with V % 4 == 0
    is closed under the quarter-turn — view i + V/4 at the 90-degree-
    rotated pixel has EXACTLY the same (gamma, h^2, detector-row)
    coordinates as view i at p (rotations preserve the source-voxel
    radius, so unlike the 2-D mirror pairing even ridx is shared).
    The four orbit legs {i, i+V/4, i+V/2, i+3V/4} are concatenated
    into the image axis (K_eff = 4K), ONE gather serves all four, and
    the legs recompose with three rot90s after the scan: 4x fewer
    gathers at 4x the row width (32K floats in pair mode).  Validated
    equal to orbit4=False within float-rounding in tests.
    """
    K, V, R, C = qs.shape
    dtype = qs.dtype
    N = n_matrix
    px_size = fov / N
    c_np = (np.arange(N) + 0.5 - N / 2.0) * px_size
    XX, YY = np.meshgrid(c_np, c_np)
    in_circle = np.hypot(XX, YY) <= fov / 2.0
    sel = np.nonzero(in_circle.reshape(-1))[0]
    P = len(sel)
    X = jnp.asarray(XX.reshape(-1)[sel], dtype)
    Y = jnp.asarray(YY.reshape(-1)[sel], dtype)
    # z_center shifts the slice grid (zslab sharding: each shard owns a
    # contiguous slab of the global z grid)
    zc = (jnp.arange(nz_out, dtype=dtype) + 0.5 - nz_out / 2.0) * dz_out \
        + z_center

    n_legs = 4 if orbit4 else 1
    if orbit4 and (V % 4 or N % 2):
        raise ValueError("orbit4 needs V % 4 == 0 and an even matrix")
    vq = V // n_legs
    row_floats = (8 if pair_mode else 4) * n_legs * K
    vb = max(1, min(view_block, vq))
    # bound one z-window's gathered block (vb * P rows of row_floats) to
    # ~400 MB — the wide orbit4 rows otherwise OOM at trace time
    while vb > 1 and vb * P * row_floats * 4 > (400 << 20):
        vb -= 1
    while vq % vb:
        vb -= 1
    bb = betas[:vq].reshape(vq // vb, vb)
    voff = jnp.arange(vq, dtype=jnp.int32).reshape(vq // vb, vb)

    def block(acc, args):
        beta, vo = args
        cb, sb = jnp.cos(beta), jnp.sin(beta)
        ell = sid - (X[None, :] * cb[:, None] + Y[None, :] * sb[:, None])
        vt = -X[None, :] * sb[:, None] + Y[None, :] * cb[:, None]
        gam = jnp.arctan2(-vt, ell)
        h2 = ell * ell + vt * vt
        inv_h = jax.lax.rsqrt(h2)
        cidx = gam / dgamma - 0.5 + C / 2.0
        c0 = jnp.clip(jnp.floor(cidx), 0, C - 2)
        fc = jnp.clip(cidx - c0, 0.0, 1.0)
        w_in = jnp.where((cidx >= 0.0) & (cidx <= C - 1.0), 1.0, 0.0)
        w_amp = w_in / h2

        if orbit4:
            # orbit legs stacked into the image axis: [4K, vb, R, C]
            qb = jnp.concatenate(
                [qs[:, vo + l * vq] for l in range(n_legs)], axis=0)
        else:
            qb = qs[:, vo]  # [K, vb, R, C]
        Ke = n_legs * K  # image axis width after leg folding
        voff_b = jnp.arange(vb, dtype=jnp.int32)
        fce = fc[..., None]

        def shift_r(x, n):
            return jnp.concatenate([x[:, :, n:],
                                    jnp.repeat(x[:, :, -1:], n, 2)], 2) \
                if n else x

        def shift_c(x):
            return jnp.concatenate([x[..., 1:], x[..., -1:]], -1)

        def ridx_of(z):
            return z * sid * inv_h / row_h - 0.5 + R / 2.0

        def interp_at(cr, win, ridx):
            """Bilinear value of one slice from channel-interp'd window
            rows ``cr [vb, P, 4, K]`` fetched at base row ``win``:
            selects rows r0-win, r0-win+1 by where-chain (no second
            gather)."""
            r0 = jnp.clip(jnp.floor(ridx), 0, max(R - 2, 0))
            fr = jnp.clip(ridx - r0, 0.0, 1.0)
            w_z = jnp.where((ridx >= -0.5) & (ridx <= R - 0.5), 1.0, 0.0)
            rel = jnp.clip(r0 - win, 0, 2).astype(jnp.int32)
            top = cr[..., 2, :]
            bot = cr[..., 3, :]
            for w in (1, 0):
                pick = (rel == w)[..., None]
                top = jnp.where(pick, cr[..., w, :], top)
                bot = jnp.where(pick, cr[..., w + 1, :], bot)
            fre = fr[..., None]
            return (top * (1 - fre) + bot * fre), (w_amp * w_z)

        if pair_mode:
            # 4-row window pack: taps (r+w, c+t) for w<4, t<2 -> row-8K
            vars_ = []
            for w in range(4):
                qr = shift_r(qb, w)
                vars_ += [qr, shift_c(qr)]
            packed_flat = jnp.stack(vars_, -1).transpose(
                1, 2, 3, 4, 0).reshape(vb * R * C, 8 * Ke)
            if bf16_taps:
                # halve the gathered row bytes (the orbit4-pair row-32K
                # f32 rows sit past the ~256 B width knee); values
                # convert back to f32 right after the gather so all
                # interpolation/accumulation stays f32
                packed_flat = packed_flat.astype(jnp.bfloat16)

            def one_pair(z2):
                ra_idx = ridx_of(z2[0])
                rb_idx = ridx_of(z2[1])
                win = jnp.clip(
                    jnp.floor(jnp.minimum(ra_idx, rb_idx)),
                    0, max(R - 4, 0))
                idx = (win.astype(jnp.int32) * C + c0.astype(jnp.int32)
                       + voff_b[:, None] * (R * C))
                rows = packed_flat[idx.reshape(-1)].reshape(
                    idx.shape + (4, 2, Ke)).astype(dtype)
                # taps (row w, ctap t)
                cr = (rows[..., 0, :] * (1 - fce[..., None, :])
                      + rows[..., 1, :] * fce[..., None, :])  # [vb,P,4,K]
                va, wa_ = interp_at(cr, win, ra_idx)
                vb_, wb2 = interp_at(cr, win, rb_idx)
                return (jnp.sum(va * wa_[..., None], axis=0),
                        jnp.sum(vb_ * wb2[..., None], axis=0))

            if pair_seq:
                # sequence the z-pairs: the vmap batches ALL pairs'
                # gathered rows into one [nz/2 * vb * P, row] buffer
                # (3.2 GB at the cone bench shape — profiled as an HBM
                # materialization round-trip, ~40% of the FDK stage);
                # lax.map keeps one pair's rows in flight at a time
                pa, pb = jax.lax.map(one_pair, zc.reshape(-1, 2))
            else:
                pa, pb = jax.vmap(one_pair)(zc.reshape(-1, 2))
            contrib = jnp.stack([pa, pb], 1).reshape(nz_out, P, Ke)
            return acc + contrib, None

        qb_c1 = shift_c(qb)
        qb_r1 = shift_r(qb, 1)
        qb_r1c1 = shift_c(qb_r1)
        packed_flat = jnp.stack(
            [qb, qb_c1, qb_r1, qb_r1c1], -1
        ).transpose(1, 2, 3, 4, 0).reshape(vb * R * C, 4 * Ke)

        def one_slice(z):
            ridx = ridx_of(z)
            r0 = jnp.clip(jnp.floor(ridx), 0, max(R - 2, 0))
            fr = jnp.clip(ridx - r0, 0.0, 1.0)
            w_z = jnp.where((ridx >= -0.5) & (ridx <= R - 0.5), 1.0, 0.0)
            idx = (r0.astype(jnp.int32) * C + c0.astype(jnp.int32)
                   + voff_b[:, None] * (R * C))
            rows = packed_flat[idx.reshape(-1)].reshape(
                idx.shape + (4, Ke))
            fre = fr[..., None]
            top = rows[..., 0, :] * (1 - fce) + rows[..., 1, :] * fce
            bot = rows[..., 2, :] * (1 - fce) + rows[..., 3, :] * fce
            val = top * (1 - fre) + bot * fre  # [vb, P, K]
            return jnp.sum(val * (w_amp * w_z)[..., None], axis=0)

        return acc + jax.vmap(one_slice)(zc), None

    acc0 = jnp.zeros((nz_out, P, n_legs * K), dtype)
    acc, _ = jax.lax.scan(block, acc0, (bb, voff))
    out = acc.transpose(2, 0, 1) * dbeta  # [n_legs*K, nz, P]
    vol = jnp.zeros((n_legs * K, nz_out, N * N), dtype)
    vol = vol.at[:, :, jnp.asarray(sel)].set(out)
    vol = vol.reshape(n_legs, K, nz_out, N, N)
    if not orbit4:
        return vol[0]
    # leg l accumulated view (i + l*V/4) values at the UNROTATED pixel;
    # they belong at the quarter-turn-rotated pixel rot^l(p), so the leg
    # images recompose with pure layout ops (no gathers): out[p'] =
    # sum_l leg_l[rot^{-l}(p')] = sum_l rot90(leg_l, -l).
    return sum(jnp.rot90(vol[l], -l, axes=(-2, -1)) for l in range(4))


def cone_pwls_recon(sino_log, counts, geometry, vol_shape, voxel, *,
                    n_iters=60, beta=1e-2, delta=5e-3, nonneg=True,
                    x0=None, power_iters=12, sigma_e=0.0, var_ratio=1.0):
    """3-D penalized weighted least-squares statistical reconstruction.

    The volumetric analog of
    :func:`dexct_tpu.ops.iterative.pwls_recon`: count-weighted data
    term over the exact 3-D Siddon operator
    (:func:`project_volume_3d`, exact adjoint via
    ``jax.linear_transpose``) plus the 6-neighbor edge-preserving
    Huber penalty, solved by FISTA in one ``lax.scan``.  ``beta`` is
    relative to ||A^T W A|| (scale-free).  Warm-start ``x0`` from
    :func:`fdk_reconstruct` to cut iterations several-fold.  Returns
    the [Nz, Ny, Nx] volume in cm^-1.
    """
    from .iterative import _pwls_fista, pwls_weights

    src, dirs = geometry.ray_geometry_3d()
    src = jnp.asarray(src, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    dx, dy, dz = (float(v) for v in voxel)

    def apply_fn(vol):
        return project_volume_3d(vol, src, dirs, dx, dy, dz)

    y = jnp.asarray(sino_log, jnp.float32)
    w = pwls_weights(counts, sigma_e=sigma_e, var_ratio=var_ratio)
    if x0 is None:
        x0 = jnp.zeros(tuple(vol_shape), jnp.float32)
    return _pwls_fista(apply_fn, y, w, jnp.asarray(x0, jnp.float32),
                       int(n_iters), float(beta), float(delta),
                       bool(nonneg), int(power_iters))
