"""Packed multi-image fan-beam backprojection — the TPU fast path.

All sinograms of a DE study (two log sinograms + two basis-material
sinograms) share identical backprojection geometry.  This op computes the
per-(view, pixel) channel coordinate ONCE and fetches, with a single
row-slice gather, both linear-interpolation taps of ALL K images: the
packed table row (v, c) holds ``(q_k[c] ..., q_k[c+1] ...)`` for k < K.
Row-slice gathers on this TPU cost the same as scalar gathers (~1e9 idx/s,
measured in tools/bench_gather.py), so the whole 4-image reconstruction
costs ~N_proj * N_matrix^2 gathers instead of 8x that many.

Same math as ops/fbp.fan_backproject (Kak & Slaney equiangular weighting);
validated against it in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "parallel_backproject_sym8_qs",
    "pack_filtered",
    "fan_backproject_multi",
    "parallel_rebin_plan",
    "rebin_to_parallel",
    "parallel_backproject_multi",
    "pack_filtered_sym",
    "parallel_backproject_sym",
    "pack_filtered_sym2",
    "parallel_backproject_sym2",
    "pack_filtered_sym8",
    "parallel_backproject_sym8",
]


def pack_filtered(qs):
    """[K, V, C] filtered sinograms -> packed [V*C, 2K] tap table."""
    K, V, C = qs.shape
    q_next = jnp.concatenate([qs[..., 1:], qs[..., -1:]], axis=-1)
    # row (v, c) = (q_0[c..], .., q_{K-1}[c], q_0[c+1], .., q_{K-1}[c+1])
    packed = jnp.concatenate([qs, q_next], axis=0)  # [2K, V, C]
    return packed.transpose(1, 2, 0).reshape(V * C, 2 * K)


@functools.partial(
    jax.jit,
    static_argnames=("n_images", "n_channels", "n_matrix", "view_block"),
)
def fan_backproject_multi(packed, n_images, betas, sid, dgamma, n_channels,
                          n_matrix, fov, dbeta, *, view_block=32):
    """Backproject K images from a packed tap table.

    packed: [V*C, 2K] from :func:`pack_filtered` (K = n_images static).
    Returns [K, n_matrix, n_matrix].
    """
    K = n_images
    dtype = packed.dtype
    V = betas.shape[0]
    C = n_channels
    px_size = fov / n_matrix
    half = n_matrix / 2.0
    coord = (jnp.arange(n_matrix, dtype=dtype) + 0.5 - half) * px_size
    X = jnp.broadcast_to(coord[None, :], (n_matrix, n_matrix)).reshape(-1)
    Y = jnp.broadcast_to(coord[:, None], (n_matrix, n_matrix)).reshape(-1)

    n_blocks = -(-V // view_block)
    pad = n_blocks * view_block - V
    bp = jnp.pad(betas.astype(dtype), (0, pad))
    vw = jnp.pad(jnp.ones((V,), dtype), (0, pad))
    bb = bp.reshape(n_blocks, view_block)
    wb = vw.reshape(n_blocks, view_block)
    voff = (jnp.arange(n_blocks * view_block, dtype=jnp.int32)
            % jnp.int32(max(V, 1))).reshape(n_blocks, view_block) * C

    def block(acc, args):
        beta, wv, vo = args  # [B], [B], [B]
        cb, sb = jnp.cos(beta), jnp.sin(beta)
        vr = X[None, :] * cb[:, None] + Y[None, :] * sb[:, None] - sid
        vt = -X[None, :] * sb[:, None] + Y[None, :] * cb[:, None]
        gamma = jnp.arctan2(-vt, -vr)
        inv_l2 = 1.0 / (vr * vr + vt * vt)
        c = gamma / dgamma - 0.5 + C / 2.0
        c0 = jnp.clip(jnp.floor(c), 0, C - 2)
        f = jnp.clip(c - c0, 0.0, 1.0)
        inside = (c >= 0.0) & (c <= C - 1.0)
        w = jnp.where(inside, inv_l2, 0.0) * wv[:, None]  # [B, P]
        idx = vo[:, None] + c0.astype(jnp.int32)  # [B, P]
        rows = packed[idx.reshape(-1)].reshape(idx.shape + (2 * K,))
        taps = rows[..., :K] * (1.0 - f)[..., None] \
            + rows[..., K:] * f[..., None]  # [B, P, K]
        acc = acc + jnp.einsum("bp,bpk->kp", w, taps,
                               precision=jax.lax.Precision.HIGHEST)
        return acc, None

    acc0 = jnp.zeros((K, n_matrix * n_matrix), dtype)
    acc, _ = jax.lax.scan(block, acc0, (bb, wb, voff))
    return (acc * dbeta).reshape(K, n_matrix, n_matrix)


# ---------------------------------------------------------------------------
# Rebinned parallel-beam reconstruction (the fastest recon path)
# ---------------------------------------------------------------------------
#
# A full 2π equiangular fan acquisition samples every line twice; rebinning
# to parallel coordinates (θ = β + γ - π/2 ∈ [0, π), t = SID sin γ) halves
# the backprojected views and averages the redundant copies.  Parallel
# backprojection needs no arctan/1/L² — the channel coordinate is AFFINE in
# the pixel coordinates — so the per-view cost collapses to one packed
# gather plus a handful of VPU ops.  This is the standard rebinned-FBP of
# commercial scanners (slight resolution trade documented in tests).


def parallel_rebin_plan(geometry, n_theta=512, nt=1024, t_max=None):
    """Host tables mapping a fan sinogram onto a (θ, t) parallel grid.

    Returns (idx [nθ*nt, 8], w [nθ*nt, 8], t0, dt): for each parallel bin,
    the two redundant fan samples (bilinear in β and γ, averaged).
    """
    if abs(geometry.rotation_total - 2.0 * np.pi) > 1e-3:
        raise ValueError(
            "parallel rebinning requires a full 2*pi fan acquisition "
            f"(rotation_total={geometry.rotation_total}); use the direct "
            "fan backprojector for partial scans"
        )
    if getattr(geometry, "ffs", "none") != "none":
        raise ValueError(
            "this plan assumes a static focal spot; flying-focal-spot "
            "scans rebin through ops.ffs.parallel_rebin_plan_ffs")
    sid = geometry.SID
    v, c = geometry.N_proj, geometry.N_channels
    dgamma = geometry.dgamma
    dbeta = geometry.rotation_total / v
    gam_lim = geometry.gamma_fan / 2.0
    if t_max is None:
        t_max = sid * np.sin(gam_lim)
    dt = 2.0 * t_max / nt
    t0 = -t_max + 0.5 * dt
    thetas = np.arange(n_theta) * (np.pi / n_theta)
    ts = t0 + dt * np.arange(nt)

    tt, th = np.meshgrid(ts, thetas)  # [nθ, nt]
    sin_g = np.clip(tt / sid, -1.0, 1.0)
    gam = np.arcsin(sin_g)
    valid = np.abs(gam) <= gam_lim

    def fan_taps(beta, gamma):
        """Bilinear taps of (beta [wraps], gamma [clamped]) -> idx, w x4."""
        fb = np.mod(beta, 2.0 * np.pi) / dbeta
        ib0 = np.floor(fb).astype(np.int64)
        wb1 = fb - ib0
        ib1 = np.mod(ib0 + 1, v)
        ib0 = np.mod(ib0, v)
        fg = gamma / dgamma - 0.5 + c / 2.0
        ig0 = np.clip(np.floor(fg), 0, c - 2).astype(np.int64)
        wg1 = np.clip(fg - ig0, 0.0, 1.0)
        idx = np.stack([
            ib0 * c + ig0, ib0 * c + ig0 + 1,
            ib1 * c + ig0, ib1 * c + ig0 + 1,
        ], -1)
        w = np.stack([
            (1 - wb1) * (1 - wg1), (1 - wb1) * wg1,
            wb1 * (1 - wg1), wb1 * wg1,
        ], -1)
        return idx, w

    # copy A: (β = θ - γ + π/2, γ); copy B: the conjugate ray
    # (β' = θ + γ + 3π/2, γ' = -γ)
    idx_a, w_a = fan_taps(th - gam + np.pi / 2.0, gam)
    idx_b, w_b = fan_taps(th + gam + 1.5 * np.pi, -gam)
    idx = np.concatenate([idx_a, idx_b], -1).reshape(-1, 8)
    w = 0.5 * np.concatenate([w_a, w_b], -1).reshape(-1, 8)
    w = w * valid.reshape(-1, 1)
    # FLAT layout: a resident [nθ*nt, 8] table pads its trailing 8 to
    # the 128-lane tile (16x HBM; measured z-stack OOM driver)
    return (idx.astype(np.int32).reshape(-1),
            w.astype(np.float32).reshape(-1), float(t0), float(dt))


@functools.partial(jax.jit, static_argnames=("nt", "quad", "taps"))
def rebin_to_parallel(sinos, idx, w, nt, quad=False, taps=8):
    """[K, V, C] fan sinograms -> [K, nθ, nt] parallel sinograms.

    idx/w are FLAT [nθ*nt*taps] tables (``taps`` taps per parallel bin,
    ordered as adjacent-channel pairs; 8 for the standard plan, 16 for
    the flying-focal-spot plan of :mod:`dexct_tpu.ops.ffs`; flattened
    so the resident arrays don't pad their tap dim to the lane tile).
    nθ is inferred from the table length, so θ-sharded tables under
    shard_map produce the local wedge.

    Large grids process in θ chunks: the gathered [bins*4, 2K] rows
    lane-pad 2K -> 128 when XLA materializes them, which at the
    1440x2048 high-res grid blew a 738 MB temp up to 16.9 GB (round-3
    OOM); bounding the chunk keeps the padded temp under ~150 MB.

    ``quad=True`` (valid only for :func:`parallel_rebin_plan` tables,
    where view ib1 is always the NEXT row of ib0): each bilinear quad
    is ONE row-4K fetch of a channel- and view-rolled table — 2
    gathers per bin.  MEASURED SLOWER at the 1024^2 scale (1.815 vs
    1.769/1.730 s e2e: building the three rolled table copies costs
    more than the count halving saves), so the 4-gather pair path is
    the default; the halo-sharded tables (quarter-major buffer breaks
    row adjacency) must keep quad=False regardless.
    """
    k = sinos.shape[0]
    n_theta = idx.size // (taps * nt)
    vc = sinos.shape[1] * sinos.shape[2]
    table = sinos.reshape(k, -1).T  # [V*C, K]
    # the 8 taps per parallel bin are two bilinear quads: per fan copy,
    # (ib0, ig0) (ib0, ig0+1) (ib1, ig0) (ib1, ig0+1) with ib1 = ib0+1
    # (mod V) and ig1 = ig0+1 — so ONE row of a channel-rolled AND
    # view-rolled table fetches the whole quad: 2 gathers per bin
    # instead of 8 (gather COUNT sets the rate, CLAUDE.md).  The view
    # roll by -C wraps v=V-1 to v=0, exactly the periodic grid.
    c1 = jnp.roll(table, -1, axis=0)
    if quad:
        if taps != 8:
            raise ValueError("quad fetch is defined for 8-tap plans only")
        v1 = jnp.roll(table, -sinos.shape[2], axis=0)
        v1c1 = jnp.roll(c1, -sinos.shape[2], axis=0)
        tab = jnp.concatenate([table, c1, v1, v1c1], axis=1)  # [V*C,4K]
        starts = idx.reshape(-1, 8)[:, 0::4].reshape(-1)  # [bins*2]
        g_per = 2
    else:
        tab = jnp.concatenate([table, c1], axis=1)  # [V*C, 2K]
        starts = idx.reshape(-1, taps)[:, 0::2].reshape(-1)
        g_per = taps // 2
    w8 = w.reshape(-1, taps)
    n_bins = n_theta * nt
    # tap-pair weight expansion matrix: wexp[p, e*K+k] = w2[p, e] — the
    # [gathered-row, 2, K] reinterpret it replaces tiles its trailing
    # K=4 to the (8, 128) tile (a 28 ms relayout copy per step at the
    # 1024^2 scale, profiled); the matmul + leading-split-sum route
    # below is relayout-free
    sel2 = jnp.concatenate(
        [jnp.eye(2, dtype=jnp.float32)[:, :1].repeat(k, 1),
         jnp.eye(2, dtype=jnp.float32)[:, 1:].repeat(k, 1)], axis=1)

    def chunk_vals(args):
        st, wc = args  # [B*g_per], [B, taps]
        if quad:
            rows = tab[st].reshape(-1, taps, k)
            return jnp.einsum("rt,rtk->rk", wc, rows,
                              precision=jax.lax.Precision.HIGHEST)
        g = tab[st]  # [B*g_per, 2K]
        w2 = wc.reshape(-1, 2)  # row-major split: pairs per gathered row
        wexp = jnp.matmul(w2, sel2,
                          precision=jax.lax.Precision.HIGHEST)
        p = (g * wexp).reshape(-1, g_per, 2 * k).sum(1)  # [B, 2K]
        return p[:, :k] + p[:, k:]

    # chunk bound: padded gather temp = B*g_per rows * 128 lanes * 4 B
    max_bins = max((150 << 20) // (g_per * 128 * 4), nt)
    if n_bins <= max_bins:
        vals = chunk_vals((starts, w8))
    else:
        n_chunks = -(-n_bins // max_bins)
        while n_bins % n_chunks:
            n_chunks += 1
        b = n_bins // n_chunks
        vals = jax.lax.map(
            chunk_vals,
            (starts.reshape(n_chunks, b * g_per),
             w8.reshape(n_chunks, b, taps)),
        ).reshape(n_bins, k)
    return vals.T.reshape(k, n_theta, nt)


@functools.partial(
    jax.jit,
    static_argnames=("n_images", "nt", "n_matrix", "fov", "view_block",
                     "fov_mask"),
)
def parallel_backproject_multi(packed, n_images, thetas, t0, dt, nt,
                               n_matrix, fov, dtheta, *, view_block=64,
                               fov_mask=True):
    """Backproject K images from packed parallel-beam taps.

    packed: [nθ*nt, 2K] from :func:`pack_filtered` of the filtered
    parallel sinograms.  Channel coordinate per (θ, pixel) is affine:
    c = (x cosθ + y sinθ - t0) / dt.

    fov_mask=True backprojects only pixels inside the scan FOV circle
    (r <= fov/2; ~21% fewer gathers on the inscribed square) and zeroes
    the corners — the standard circular-FOV convention.
    """
    K = n_images
    dtype = packed.dtype
    n_th = thetas.shape[0]
    px_size = fov / n_matrix
    half = n_matrix / 2.0
    coord = (jnp.arange(n_matrix, dtype=dtype) + 0.5 - half) * px_size
    X = jnp.broadcast_to(coord[None, :], (n_matrix, n_matrix)).reshape(-1)
    Y = jnp.broadcast_to(coord[:, None], (n_matrix, n_matrix)).reshape(-1)

    pix_idx = None
    if fov_mask:
        # static in-circle pixel list (host-computed from static shapes)
        c_np = (np.arange(n_matrix) + 0.5 - half) * px_size
        rr = np.hypot(c_np[None, :], c_np[:, None]).reshape(-1)
        inside = np.nonzero(rr <= fov / 2.0)[0]
        pad_to = -(-len(inside) // 8) * 8
        pix = np.pad(inside, (0, pad_to - len(inside)),
                     constant_values=inside[-1] if len(inside) else 0)
        pix_idx = jnp.asarray(pix.astype(np.int32))
        X = X[pix_idx]
        Y = Y[pix_idx]

    n_blocks = -(-n_th // view_block)
    pad = n_blocks * view_block - n_th
    thp = jnp.pad(thetas.astype(dtype), (0, pad))
    vw = jnp.pad(jnp.ones((n_th,), dtype), (0, pad))
    tb = thp.reshape(n_blocks, view_block)
    wb = vw.reshape(n_blocks, view_block)
    voff = (jnp.arange(n_blocks * view_block, dtype=jnp.int32)
            % jnp.int32(max(n_th, 1))).reshape(n_blocks, view_block) * nt

    def block(acc, args):
        th, wv, vo = args
        ct_, st_ = jnp.cos(th), jnp.sin(th)
        c = (X[None, :] * ct_[:, None] + Y[None, :] * st_[:, None]
             - t0) / dt
        c0 = jnp.clip(jnp.floor(c), 0, nt - 2)
        f = jnp.clip(c - c0, 0.0, 1.0)
        inside = (c >= 0.0) & (c <= nt - 1.0)
        w = jnp.where(inside, 1.0, 0.0) * wv[:, None]
        idx = vo[:, None] + c0.astype(jnp.int32)
        rows = packed[idx.reshape(-1)].reshape(idx.shape + (2 * K,))
        taps = rows[..., :K] * (1.0 - f)[..., None] \
            + rows[..., K:] * f[..., None]
        return acc + jnp.einsum("bp,bpk->kp", w, taps,
                               precision=jax.lax.Precision.HIGHEST), None

    acc0 = jnp.zeros((K, X.shape[0]), dtype)
    acc, _ = jax.lax.scan(block, acc0, (tb, wb, voff))
    acc = acc * dtheta
    if pix_idx is not None:
        full = jnp.zeros((K, n_matrix * n_matrix), dtype)
        acc = full.at[:, pix_idx].set(acc)
    return acc.reshape(K, n_matrix, n_matrix)


# ---------------------------------------------------------------------------
# Symmetry-packed parallel backprojection (4x fewer gathers)
# ---------------------------------------------------------------------------
#
# On a uniform theta grid over [0, pi), view v + n_theta/2 is exactly
# theta_v + pi/2, and its channel coordinate at pixel (x, y) equals view
# v's at the 90-degree-rotated pixel (y, -x).  The t grid is symmetric
# (t_{nt-1-k} = -t_k), so the point-mirrored pixel -p reads the SAME view
# at taps (nt-2-c0, nt-1-c0) with fraction 1-f.  Packing both paired
# views x both mirror orientations x K images x 2 taps into one 8K-float
# row lets ONE gather serve FOUR (pixel, view) contributions: the loop
# runs over the y>0 half of the FOV disc and the first n_theta/2 views
# only.  Measured on v5e: row-32 gathers issue at 0.54x the row-8 rate,
# so the 4x count reduction nets ~2.2x on the backprojection stage.
# Exactly the same arithmetic as parallel_backproject_multi (validated
# bitwise-tolerance in tests); single-device only — theta-sharded wedges
# cannot pair v with v + n_theta/2 locally.


def _disc_gather_maps(g_list, full_flat, N, z_index):
    """Full-image gather maps for the symmetry-BP recomposition.

    Replaces the final ``full.at[:, full_flat].set(out)`` disc scatter
    (measured 38 ms/call at 1024² — TPU scatters run ~1 GB/s) with
    plain row-K gathers from the accumulator: ``g_full[i]`` is pixel
    i's slot in the accumulator extended by one zero row at
    ``z_index`` (out-of-FOV pixels land there, preserving the disc
    mask exactly).
    """
    out = []
    for g in g_list:
        gf = np.full(N * N, z_index, np.int64)
        gf[full_flat] = g
        out.append(jnp.asarray(gf))
    return out


def pack_filtered_sym(qs):
    """[K, V, T] filtered parallel sinograms -> packed [V/2*T, 8K] rows.

    Row (v, j), v < V/2, holds for q in (view v, view v+V/2):
    (q[j], q[j+1], q[T-2-j], q[T-1-j]), each group K-wide.
    """
    K, V, T = qs.shape
    if V % 2:
        raise ValueError("pack_filtered_sym requires an even view count")
    v2 = V // 2

    def groups(q):
        nxt = jnp.concatenate([q[..., 1:], q[..., -1:]], -1)
        rev = q[..., ::-1]  # rev[j] = q[T-1-j]
        m0 = jnp.concatenate([rev[..., 1:], rev[..., -1:]], -1)
        return [q, nxt, m0, rev]

    packed = jnp.concatenate(groups(qs[:, :v2]) + groups(qs[:, v2:]),
                             axis=0)  # [8K, V/2, T]
    return packed.transpose(1, 2, 0).reshape(v2 * T, 8 * K)


@functools.partial(
    jax.jit,
    static_argnames=("n_images", "nt", "n_matrix", "fov", "view_block"),
)
def parallel_backproject_sym(packed, n_images, thetas_half, t0, dt, nt,
                             n_matrix, fov, dtheta, *, view_block=64):
    """Backproject K images from symmetry-packed parallel-beam taps.

    packed: [V/2*nt, 8K] from :func:`pack_filtered_sym`; thetas_half: the
    first V/2 view angles (uniform grid over [0, pi)).  Returns
    [K, n_matrix, n_matrix] with the circular-FOV mask applied —
    identical output to ``parallel_backproject_multi(fov_mask=True)``.
    """
    K = n_images
    dtype = packed.dtype
    v2 = thetas_half.shape[0]
    N = n_matrix
    px_size = fov / N
    half = N / 2.0

    # --- host-side (static-shape) slot and recomposition tables ---
    c_np = (np.arange(N) + 0.5 - half) * px_size
    XX, YY = np.meshgrid(c_np, c_np)  # [iy, ix]
    in_circle = (np.hypot(XX, YY) <= fov / 2.0).reshape(-1)
    y_pos = (np.arange(N * N) // N) >= N // 2  # c[iy] > 0
    slot_sel = np.nonzero(in_circle & y_pos)[0]
    P_real = len(slot_sel)
    P = max(-(-P_real // 8) * 8, 8)
    slot_flat = np.pad(slot_sel, (0, P - P_real),
                       constant_values=slot_sel[-1] if P_real else 0)
    valid_np = np.zeros(P, np.float32)
    valid_np[:P_real] = 1.0
    slot_of = np.full(N * N, -1, np.int64)
    slot_of[slot_sel] = np.arange(P_real)

    full_sel = np.nonzero(in_circle)[0]
    Pf = max(-(-len(full_sel) // 8) * 8, 8)
    full_flat = np.pad(full_sel, (0, Pf - len(full_sel)),
                       constant_values=full_sel[-1] if len(full_sel) else 0)
    iy, ix = full_flat // N, full_flat % N
    mir_iy, mir_ix = N - 1 - iy, N - 1 - ix
    # views-a contribution: own slot (y>0) or the point-mirrored C slot
    g1 = np.where(iy >= N // 2,
                  slot_of[iy * N + ix],
                  2 * P + slot_of[mir_iy * N + mir_ix])
    # views-b contribution: rotated B slot (x<0) or rotated+mirrored D slot
    g2 = np.where(ix < N // 2,
                  P + slot_of[mir_ix * N + iy],
                  3 * P + slot_of[ix * N + mir_iy])
    assert (slot_of[np.where(iy >= N // 2, iy * N + ix,
                             mir_iy * N + mir_ix)] >= 0).all()
    assert (slot_of[np.where(ix < N // 2, mir_ix * N + iy,
                             ix * N + mir_iy)] >= 0).all()

    X = jnp.asarray(XX.reshape(-1)[slot_flat], dtype)
    Y = jnp.asarray(YY.reshape(-1)[slot_flat], dtype)
    valid = jnp.asarray(valid_np, dtype)

    # bound the per-block gather working set (view_block * P rows of 4K
    # floats each) to ~1.7 GB — large matrices otherwise OOM at trace
    view_block = max(8, min(view_block, (13 << 20) // max(P, 1)))
    view_block = min(view_block, max(-(-v2 // 8) * 8, 8))
    n_blocks = -(-v2 // view_block)
    pad = n_blocks * view_block - v2
    thp = jnp.pad(thetas_half.astype(dtype), (0, pad))
    vw = jnp.pad(jnp.ones((v2,), dtype), (0, pad))
    tb = thp.reshape(n_blocks, view_block)
    wb = vw.reshape(n_blocks, view_block)
    voff = (jnp.arange(n_blocks * view_block, dtype=jnp.int32)
            % jnp.int32(max(v2, 1))).reshape(n_blocks, view_block) * nt

    # stacked-(u, v) contraction + static 0/1 tap-pair folding (same
    # structure as the 8-fold kernels — avoids the sliced-taps
    # intermediates and their gather-row relayout copy, profiled at
    # bench scale in round 4).  Groups per pack_filtered_sym row:
    # A=(0,1) B=(4,5) normal; C=(2,3) D=(6,7) mirrored.
    sa_np = np.zeros((8 * K, 4 * K), np.float32)
    sb_np = np.zeros((8 * K, 4 * K), np.float32)
    for j, (g, mirrored) in enumerate(
            [(0, False), (4, False), (2, True), (6, True)]):
        for k in range(K):
            if mirrored:
                sa_np[(g + 1) * K + k, j * K + k] = 1.0
                sb_np[g * K + k, j * K + k] = 1.0
            else:
                sa_np[g * K + k, j * K + k] = 1.0
                sb_np[(g + 1) * K + k, j * K + k] = 1.0
    Sa = jnp.asarray(sa_np)
    Sb = jnp.asarray(sb_np)

    def block(acc, args):
        th, wv, vo = args
        ct_, st_ = jnp.cos(th), jnp.sin(th)
        c = (X[None, :] * ct_[:, None] + Y[None, :] * st_[:, None]
             - t0) / dt
        c0 = jnp.clip(jnp.floor(c), 0, nt - 2)
        f = jnp.clip(c - c0, 0.0, 1.0)
        inside = (c >= 0.0) & (c <= nt - 1.0)
        w = jnp.where(inside, 1.0, 0.0) * wv[:, None] * valid[None, :]
        idx = vo[:, None] + c0.astype(jnp.int32)
        rows = packed[idx.reshape(-1)].reshape(idx.shape + (8 * K,))
        u = w * (1.0 - f)
        v = w * f
        hi = jax.lax.Precision.HIGHEST
        AB = jnp.einsum("ubp,bpc->upc", jnp.stack([u, v]), rows,
                        precision=hi)  # [2, P, 8K]
        sel = (jnp.matmul(AB[0], Sa, precision=hi)
               + jnp.matmul(AB[1], Sb, precision=hi))
        return acc + sel.T, None

    acc0 = jnp.zeros((4 * K, P), dtype)
    acc, _ = jax.lax.scan(block, acc0, (tb, wb, voff))
    # recompose the full disc by gathering each pixel's two contributions
    accT = acc.reshape(4, K, P).transpose(0, 2, 1).reshape(4 * P, K)
    accz = jnp.concatenate([accT, jnp.zeros((1, K), dtype)], 0)
    g1f, g2f = _disc_gather_maps([g1, g2], full_flat, N, 4 * P)
    full = (accz[g1f] + accz[g2f]).T * dtheta
    return full.reshape(K, N, N)


# ---------------------------------------------------------------------------
# 2-fold (point-mirror only) symmetry-packed parallel backprojection
# ---------------------------------------------------------------------------
#
# The point-mirror pairing is view-LOCAL: pixel -p reads the SAME theta
# line as p at taps (nt-2-c0, nt-1-c0) with fraction 1-f (symmetric t
# grid), so — unlike the 4/8-fold kernels, which pair views across the
# [0, pi) grid — it works on ANY subset of theta lines.  This is the
# symmetry kernel for the view-sharded recon path (each shard owns an
# arbitrary theta wedge): half the gathers of the plain packed BP at
# 2x the row width (row-16 for K=4; measured 1.40e8 vs 1.69e8 rows/s,
# net ~1.66x on the sharded BP stage).


def pack_filtered_sym2(qs):
    """[K, V, T] filtered parallel sinograms -> packed [V*T, 4K] rows.

    Row (v, j) holds (q[j], q[j+1], q[T-2-j], q[T-1-j]) per image.
    """
    K, V, T = qs.shape

    def groups(q):
        nxt = jnp.concatenate([q[..., 1:], q[..., -1:]], -1)
        rev = q[..., ::-1]  # rev[j] = q[T-1-j]
        m0 = jnp.concatenate([rev[..., 1:], rev[..., -1:]], -1)
        return [q, nxt, m0, rev]

    packed = jnp.concatenate(groups(qs), axis=0)  # [4K, V, T]
    return packed.transpose(1, 2, 0).reshape(V * T, 4 * K)


@functools.partial(
    jax.jit,
    static_argnames=("n_images", "nt", "n_matrix", "fov", "view_block"),
)
def parallel_backproject_sym2(packed, n_images, thetas, t0, dt, nt,
                              n_matrix, fov, dtheta, *, view_block=64):
    """Backproject K images from point-mirror-packed parallel taps.

    packed: [V*nt, 4K] from :func:`pack_filtered_sym2`; thetas: the V
    view angles (any subset of [0, pi) — e.g. one shard's wedge).
    Output identical to ``parallel_backproject_multi(fov_mask=True)``.
    """
    K = n_images
    dtype = packed.dtype
    v = thetas.shape[0]
    N = n_matrix
    px_size = fov / N
    half = N / 2.0

    # host-side static tables: loop pixels = y>0 half of the FOV disc
    c_np = (np.arange(N) + 0.5 - half) * px_size
    XX, YY = np.meshgrid(c_np, c_np)
    in_circle = (np.hypot(XX, YY) <= fov / 2.0).reshape(-1)
    y_pos = (np.arange(N * N) // N) >= N // 2
    slot_sel = np.nonzero(in_circle & y_pos)[0]
    P_real = len(slot_sel)
    P = max(-(-P_real // 8) * 8, 8)
    slot_flat = np.pad(slot_sel, (0, P - P_real),
                       constant_values=slot_sel[-1] if P_real else 0)
    valid_np = np.zeros(P, np.float32)
    valid_np[:P_real] = 1.0
    slot_of = np.full(N * N, -1, np.int64)
    slot_of[slot_sel] = np.arange(P_real)

    full_sel = np.nonzero(in_circle)[0]
    Pf = max(-(-len(full_sel) // 8) * 8, 8)
    full_flat = np.pad(full_sel, (0, Pf - len(full_sel)),
                       constant_values=full_sel[-1] if len(full_sel) else 0)
    iy, ix = full_flat // N, full_flat % N
    mir_iy, mir_ix = N - 1 - iy, N - 1 - ix
    # own slot (y>0, A bucket) or the point-mirrored slot (C bucket)
    g1 = np.where(iy >= N // 2,
                  slot_of[iy * N + ix],
                  P + slot_of[mir_iy * N + mir_ix])
    assert (slot_of[np.where(iy >= N // 2, iy * N + ix,
                             mir_iy * N + mir_ix)] >= 0).all()

    X = jnp.asarray(XX.reshape(-1)[slot_flat], dtype)
    Y = jnp.asarray(YY.reshape(-1)[slot_flat], dtype)
    valid = jnp.asarray(valid_np, dtype)

    view_block = max(8, min(view_block, (13 << 20) // max(P, 1)))
    view_block = min(view_block, max(-(-v // 8) * 8, 8))
    n_blocks = -(-v // view_block)
    pad = n_blocks * view_block - v
    thp = jnp.pad(thetas.astype(dtype), (0, pad))
    vw = jnp.pad(jnp.ones((v,), dtype), (0, pad))
    tb = thp.reshape(n_blocks, view_block)
    wb = vw.reshape(n_blocks, view_block)
    voff = (jnp.arange(n_blocks * view_block, dtype=jnp.int32)
            % jnp.int32(max(v, 1))).reshape(n_blocks, view_block) * nt

    def block(acc, args):
        th, wv, vo = args
        ct_, st_ = jnp.cos(th), jnp.sin(th)
        c = (X[None, :] * ct_[:, None] + Y[None, :] * st_[:, None]
             - t0) / dt
        c0 = jnp.clip(jnp.floor(c), 0, nt - 2)
        f = jnp.clip(c - c0, 0.0, 1.0)
        inside = (c >= 0.0) & (c <= nt - 1.0)
        w = jnp.where(inside, 1.0, 0.0) * wv[:, None] * valid[None, :]
        idx = vo[:, None] + c0.astype(jnp.int32)
        rows = packed[idx.reshape(-1)].reshape(idx.shape + (4 * K,))
        u = w * (1.0 - f)
        v_ = w * f
        hi = jax.lax.Precision.HIGHEST
        # stacked-(u, v) contraction + 0/1 tap folding (see the sym8
        # kernels): groups A=(0,1) normal, C=(2,3) mirrored
        AB = jnp.einsum("ubp,bpc->upc", jnp.stack([u, v_]), rows,
                        precision=hi)  # [2, P, 4K]
        sel = (jnp.matmul(AB[0], Sa, precision=hi)
               + jnp.matmul(AB[1], Sb, precision=hi))
        return acc + sel.T, None

    sa_np = np.zeros((4 * K, 2 * K), np.float32)
    sb_np = np.zeros((4 * K, 2 * K), np.float32)
    for j, (g, mirrored) in enumerate([(0, False), (2, True)]):
        for k in range(K):
            if mirrored:
                sa_np[(g + 1) * K + k, j * K + k] = 1.0
                sb_np[g * K + k, j * K + k] = 1.0
            else:
                sa_np[g * K + k, j * K + k] = 1.0
                sb_np[(g + 1) * K + k, j * K + k] = 1.0
    Sa = jnp.asarray(sa_np)
    Sb = jnp.asarray(sb_np)

    acc0 = jnp.zeros((2 * K, P), dtype)
    acc, _ = jax.lax.scan(block, acc0, (tb, wb, voff))
    accT = acc.reshape(2, K, P).transpose(0, 2, 1).reshape(2 * P, K)
    accz = jnp.concatenate([accT, jnp.zeros((1, K), dtype)], 0)
    (g1f,) = _disc_gather_maps([g1], full_flat, N, 2 * P)
    full = accz[g1f].T * dtheta
    return full.reshape(K, N, N)


# ---------------------------------------------------------------------------
# 8-fold symmetry-packed parallel backprojection
# ---------------------------------------------------------------------------
#
# With theta_i = i*pi/V (theta_0 = 0) the view grid is also closed under
# the TRANSPOSE reflection theta -> pi/2 - theta, whose channel coordinate
# at pixel (x, y) equals theta's at the swapped pixel (y, x), and under
# theta -> pi - theta (the x-flip pixel (-x, y)).  The full orbit of view
# i is {i, V/2-i, V/2+i, V-i}; one 64-float gather row then serves EIGHT
# (pixel, view) contributions (4 orbit views x point mirror), so the loop
# covers views i in (0, V/4) over the y>=0 half-disc — half the gathers
# of the 4-fold packing, and measured FASTER per row (the 32 MiB packed
# table has half the rows at double the width).  The four self-paired
# boundary views {0, V/4, V/2, 3V/4} are handled by the 4-fold kernel on
# a 4-view sub-sinogram (see pipeline/fused.py).


def _sym8_pixel_tables(N, fov, px_size):
    """Host-side pixel/symmetry tables shared by the 8-fold kernels.

    Returns (slot_flat, valid_np, full_flat, g1, g2, g3, g4, XX, YY, P)
    — the y>=0 half-disc slot list, its validity mask, the full-disc
    pixel list, and the four accumulator-bucket gather maps
    (A/B/C/D x point-mirror) used to recompose the disc.
    """
    half = N / 2.0
    c_np = (np.arange(N) + 0.5 - half) * px_size
    XX, YY = np.meshgrid(c_np, c_np)  # [iy, ix]
    in_circle = (np.hypot(XX, YY) <= fov / 2.0).reshape(-1)
    ys = YY.reshape(-1)
    slot_sel = np.nonzero(in_circle & (ys >= 0))[0]
    P_real = len(slot_sel)
    P = max(-(-P_real // 8) * 8, 8)
    slot_flat = np.pad(slot_sel, (0, P - P_real),
                       constant_values=slot_sel[-1] if P_real else 0)
    valid_np = np.zeros(P, np.float32)
    valid_np[:P_real] = 1.0
    slot_of = np.full(N * N, -1, np.int64)
    slot_of[slot_sel] = np.arange(P_real)

    full_sel = np.nonzero(in_circle)[0]
    Pf = max(-(-len(full_sel) // 8) * 8, 8)
    full_flat = np.pad(full_sel, (0, Pf - len(full_sel)),
                       constant_values=full_sel[-1] if len(full_sel) else 0)
    iy, ix = full_flat // N, full_flat % N
    miy, mix = N - 1 - iy, N - 1 - ix
    xv, yv = c_np[ix], c_np[iy]
    g1 = np.where(yv >= 0, 0 * P + slot_of[iy * N + ix],
                  4 * P + slot_of[miy * N + mix])
    g2 = np.where(xv < 0, 1 * P + slot_of[mix * N + iy],
                  5 * P + slot_of[ix * N + miy])
    g3 = np.where(xv > 0, 2 * P + slot_of[ix * N + iy],
                  6 * P + slot_of[mix * N + miy])
    g4 = np.where(yv >= 0, 3 * P + slot_of[iy * N + mix],
                  7 * P + slot_of[miy * N + ix])
    for g in (g1, g2, g3, g4):  # every referenced slot must exist
        assert (g % P < P_real).all() if P_real else True
    return slot_flat, valid_np, full_flat, g1, g2, g3, g4, XX, YY, P


def pack_filtered_sym8(qs):
    """[K, V, T] filtered parallel sinograms -> packed [(V/4-1)*T, 16K].

    Row (i', j) with view i = i'+1 holds, for q over the orbit views
    (i, V/2+i, V/2-i, V-i): (q[j], q[j+1], q[T-2-j], q[T-1-j]),
    each group K-wide.
    """
    K, V, T = qs.shape
    if V % 4 or V < 8:
        raise ValueError("pack_filtered_sym8 requires V % 4 == 0, V >= 8")
    ia = np.arange(1, V // 4)

    def groups(q):
        nxt = jnp.concatenate([q[..., 1:], q[..., -1:]], -1)
        rev = q[..., ::-1]
        m0 = jnp.concatenate([rev[..., 1:], rev[..., -1:]], -1)
        return [q, nxt, m0, rev]

    packed = jnp.concatenate(
        groups(qs[:, ia]) + groups(qs[:, V // 2 + ia])
        + groups(qs[:, V // 2 - ia]) + groups(qs[:, V - ia]),
        axis=0)  # [16K, V/4-1, T]
    return packed.transpose(1, 2, 0).reshape(len(ia) * T, 16 * K)


def pack_filtered_sym8_rows(qsel):
    """[K, n_orb, 4, T] explicit orbit members -> packed [n_orb*T, 16K].

    Same packing (and member order: theta, pi/2+theta, pi/2-theta,
    pi-theta) as :func:`pack_filtered_sym8`, but with the four orbit
    members supplied explicitly instead of sliced from a contiguous
    global [K, V, T] grid.  The halo-sharded 8-fold BP gathers them
    from the local + reflection-partner filtered wedges using the orbit
    tables built by :func:`dexct_tpu.parallel.halo.plan_sym8_orbits`.
    """
    K, n_orb, _, T = qsel.shape

    def groups(q):
        nxt = jnp.concatenate([q[..., 1:], q[..., -1:]], -1)
        rev = q[..., ::-1]
        m0 = jnp.concatenate([rev[..., 1:], rev[..., -1:]], -1)
        return [q, nxt, m0, rev]

    packed = jnp.concatenate(
        groups(qsel[:, :, 0]) + groups(qsel[:, :, 1])
        + groups(qsel[:, :, 2]) + groups(qsel[:, :, 3]),
        axis=0)  # [16K, n_orb, T]
    return packed.transpose(1, 2, 0).reshape(n_orb * T, 16 * K)


@functools.partial(
    jax.jit,
    static_argnames=("n_images", "nt", "n_matrix", "fov", "view_block"),
)
def parallel_backproject_sym8(packed, n_images, thetas_q, t0, dt, nt,
                              n_matrix, fov, dtheta, *, view_block=64):
    """Backproject K images from 8-fold symmetry-packed taps.

    packed: [(V/4-1)*nt, 16K] from :func:`pack_filtered_sym8`;
    thetas_q: view angles i = 1 .. V/4-1 of the uniform grid
    theta_i = i*pi/V.  Returns the [K, n_matrix, n_matrix] FOV-masked
    partial image of those 4*(V/4-1) views — add the boundary-view
    image (4-fold kernel on views {0, V/4, V/2, 3V/4}) for the full
    reconstruction.
    """
    K = n_images
    dtype = packed.dtype
    vq = thetas_q.shape[0]
    N = n_matrix
    px_size = fov / N
    half = N / 2.0

    # accumulator block offsets: [A+, B+, C+, D+, A-, B-, C-, D-]
    # A: view i at p;        B: view V/2+i at rot90(p) = (-y, x);
    # C: view V/2-i at (y, x); D: view V-i at (-x, y); '-' = point mirror
    (slot_flat, valid_np, full_flat, g1, g2, g3, g4, XX, YY,
     P) = _sym8_pixel_tables(N, fov, px_size)

    X = jnp.asarray(XX.reshape(-1)[slot_flat], dtype)
    Y = jnp.asarray(YY.reshape(-1)[slot_flat], dtype)
    valid = jnp.asarray(valid_np, dtype)

    # bound the per-block gather working set (view_block * P rows of 8K
    # floats each) to ~1.7 GB — 1024^2 reconstructions otherwise OOM
    view_block = max(8, min(view_block, (7 << 20) // max(P, 1)))
    view_block = min(view_block, max(-(-vq // 8) * 8, 8))
    n_blocks = -(-vq // view_block)
    pad = n_blocks * view_block - vq
    thp = jnp.pad(thetas_q.astype(dtype), (0, pad))
    vw = jnp.pad(jnp.ones((vq,), dtype), (0, pad))
    tb = thp.reshape(n_blocks, view_block)
    wb = vw.reshape(n_blocks, view_block)
    voff = (jnp.arange(n_blocks * view_block, dtype=jnp.int32)
            % jnp.int32(max(vq, 1))).reshape(n_blocks, view_block) * nt

    # Static tap-selection matrices (same construction as the qs
    # variant): contracting the RAW gathered rows with stacked (u, v)
    # weights and folding tap pairs via two 0/1 matmuls avoids the
    # per-group sliced-taps intermediates, whose [B, P, 16K] relayout
    # copy the round-4 headline trace measured at ~7.5 ms/call
    # (copy.1569: 1.7 GB at ~220 GB/s).
    sa_np = np.zeros((16 * K, 8 * K), np.float32)
    sb_np = np.zeros((16 * K, 8 * K), np.float32)
    for j, (g, mirrored) in enumerate(
            [(0, False), (4, False), (8, False), (12, False),
             (2, True), (6, True), (10, True), (14, True)]):
        for k in range(K):
            if mirrored:  # lerp_m: wa on group g+1, wb on group g
                sa_np[(g + 1) * K + k, j * K + k] = 1.0
                sb_np[g * K + k, j * K + k] = 1.0
            else:         # lerp: wa on group g, wb on group g+1
                sa_np[g * K + k, j * K + k] = 1.0
                sb_np[(g + 1) * K + k, j * K + k] = 1.0
    Sa = jnp.asarray(sa_np)
    Sb = jnp.asarray(sb_np)

    def block(acc, args):
        th, wv, vo = args
        ct_, st_ = jnp.cos(th), jnp.sin(th)
        c = (X[None, :] * ct_[:, None] + Y[None, :] * st_[:, None]
             - t0) / dt
        c0 = jnp.clip(jnp.floor(c), 0, nt - 2)
        f = jnp.clip(c - c0, 0.0, 1.0)
        inside = (c >= 0.0) & (c <= nt - 1.0)
        w = jnp.where(inside, 1.0, 0.0) * wv[:, None] * valid[None, :]
        idx = vo[:, None] + c0.astype(jnp.int32)
        rows = packed[idx.reshape(-1)].reshape(idx.shape + (16 * K,))
        u = w * (1.0 - f)
        v = w * f
        hi = jax.lax.Precision.HIGHEST
        AB = jnp.einsum("ubp,bpc->upc", jnp.stack([u, v]), rows,
                        precision=hi)  # [2, P, 16K]
        sel = (jnp.matmul(AB[0], Sa, precision=hi)
               + jnp.matmul(AB[1], Sb, precision=hi))
        return acc + sel.T, None

    acc0 = jnp.zeros((8 * K, P), dtype)
    acc, _ = jax.lax.scan(block, acc0, (tb, wb, voff))
    accT = acc.reshape(8, K, P).transpose(0, 2, 1).reshape(8 * P, K)
    accz = jnp.concatenate([accT, jnp.zeros((1, K), dtype)], 0)
    g1f, g2f, g3f, g4f = _disc_gather_maps([g1, g2, g3, g4], full_flat,
                                           N, 8 * P)
    full = (accz[g1f] + accz[g2f] + accz[g3f] + accz[g4f]).T * dtheta
    return full.reshape(K, N, N)


@functools.partial(
    jax.jit,
    static_argnames=("n_images", "nt", "n_matrix", "fov", "view_block"),
)
def parallel_backproject_sym8_qs(qs, n_images, thetas_q, t0, dt, nt,
                                 n_matrix, fov, dtheta, *, view_block=64):
    """8-fold symmetry BP with PER-BLOCK tap packing (the 1024^2 path).

    Same math and output as
    ``parallel_backproject_sym8(pack_filtered_sym8(qs), ...)``, but the
    16K-float gather rows are built inside each scan block from the raw
    filtered sinograms ``qs [K, V, T]`` instead of materializing the
    whole [(V/4-1)*T, 16K] table up front.  The whole-run table OOMs
    above G=1024 (XLA lays the wide stacked copies out channel-minor and
    pads 64 lanes to the 128 tile — CLAUDE.md packing rule); a
    [vb*T, 16K] block is ~16 MB and measured FASTER in the cone analog
    (per-view-block packing was 2.3x in ops/conebeam FDK).
    """
    K = n_images
    dtype = qs.dtype
    V = qs.shape[1]
    vq = thetas_q.shape[0]
    T = qs.shape[2]
    if T != nt:
        raise ValueError(f"qs channel dim {T} != nt {nt}")
    N = n_matrix
    px_size = fov / N
    half = N / 2.0

    c_np = (np.arange(N) + 0.5 - half) * px_size
    XX, YY = np.meshgrid(c_np, c_np)  # [iy, ix]
    in_circle = (np.hypot(XX, YY) <= fov / 2.0).reshape(-1)
    ys = YY.reshape(-1)
    slot_sel = np.nonzero(in_circle & (ys >= 0))[0]
    P_real = len(slot_sel)
    P = max(-(-P_real // 8) * 8, 8)
    slot_flat = np.pad(slot_sel, (0, P - P_real),
                       constant_values=slot_sel[-1] if P_real else 0)
    valid_np = np.zeros(P, np.float32)
    valid_np[:P_real] = 1.0
    slot_of = np.full(N * N, -1, np.int64)
    slot_of[slot_sel] = np.arange(P_real)

    full_sel = np.nonzero(in_circle)[0]
    Pf = max(-(-len(full_sel) // 8) * 8, 8)
    full_flat = np.pad(full_sel, (0, Pf - len(full_sel)),
                       constant_values=full_sel[-1] if len(full_sel) else 0)
    iy, ix = full_flat // N, full_flat % N
    miy, mix = N - 1 - iy, N - 1 - ix
    xv, yv = c_np[ix], c_np[iy]
    g1 = np.where(yv >= 0, 0 * P + slot_of[iy * N + ix],
                  4 * P + slot_of[miy * N + mix])
    g2 = np.where(xv < 0, 1 * P + slot_of[mix * N + iy],
                  5 * P + slot_of[ix * N + miy])
    g3 = np.where(xv > 0, 2 * P + slot_of[ix * N + iy],
                  6 * P + slot_of[mix * N + miy])
    g4 = np.where(yv >= 0, 3 * P + slot_of[iy * N + mix],
                  7 * P + slot_of[miy * N + ix])

    X = jnp.asarray(XX.reshape(-1)[slot_flat], dtype)
    Y = jnp.asarray(YY.reshape(-1)[slot_flat], dtype)
    valid = jnp.asarray(valid_np, dtype)

    # bound the per-block gather working set as in the packed variant
    view_block = max(8, min(view_block, (7 << 20) // max(P, 1)))
    view_block = min(view_block, max(-(-vq // 8) * 8, 8))
    n_blocks = -(-vq // view_block)
    pad = n_blocks * view_block - vq
    thp = jnp.pad(thetas_q.astype(dtype), (0, pad))
    vw = jnp.pad(jnp.ones((vq,), dtype), (0, pad))
    tb = thp.reshape(n_blocks, view_block)
    wb = vw.reshape(n_blocks, view_block)
    # absolute orbit-base view ids i = 1..vq (padded entries repeat i=1
    # at weight 0)
    ids = (jnp.arange(n_blocks * view_block, dtype=jnp.int32)
           % jnp.int32(max(vq, 1)) + 1).reshape(n_blocks, view_block)
    vb_ = view_block
    voff_loc = jnp.arange(vb_, dtype=jnp.int32) * nt

    # Static tap-selection matrices: the per-bucket lerp
    #   taps[:, out] = wa * rows[:, colA(out)] + wb * rows[:, colB(out)]
    # becomes two dense [16K, 8K] 0/1 matmuls HOISTED OUTSIDE the pixel
    # reduction:  acc += (sum_b u.rows) @ Sa + (sum_b v.rows) @ Sb with
    # u = w*(1-f), v = w*f.  This removes the [B, P, K]-piece
    # intermediates whose 4-wide lane dim padded 32x and forced ~400 ms
    # of layout copies at the 1024^2 scale (round-3 profile).
    sa = np.zeros((16 * K, 8 * K), np.float32)
    sb = np.zeros((16 * K, 8 * K), np.float32)
    for j, (g, mirrored) in enumerate(
            [(0, False), (4, False), (8, False), (12, False),
             (2, True), (6, True), (10, True), (14, True)]):
        for k in range(K):
            if mirrored:  # lerp_m: wa on group g+1, wb on group g
                sa[(g + 1) * K + k, j * K + k] = 1.0
                sb[g * K + k, j * K + k] = 1.0
            else:         # lerp: wa on group g, wb on group g+1
                sa[g * K + k, j * K + k] = 1.0
                sb[(g + 1) * K + k, j * K + k] = 1.0
    Sa = jnp.asarray(sa)
    Sb = jnp.asarray(sb)

    def block(acc, args):
        th, wv, ids_b = args
        # per-block 16K-wide pack of the orbit views {i, V/2+i, V/2-i,
        # V-i} (group order identical to pack_filtered_sym8)
        legs = [qs[:, ids_b], qs[:, V // 2 + ids_b],
                qs[:, V // 2 - ids_b], qs[:, V - ids_b]]  # [K, B, T] each

        def groups(q):
            nxt = jnp.concatenate([q[..., 1:], q[..., -1:]], -1)
            rev = q[..., ::-1]
            m0 = jnp.concatenate([rev[..., 1:], rev[..., -1:]], -1)
            return [q, nxt, m0, rev]

        gs = []
        for leg in legs:
            gs += groups(leg)
        packed_b = jnp.stack(gs, axis=-1)  # [K, B, T, 16]
        packed_b = packed_b.transpose(1, 2, 3, 0).reshape(vb_ * nt, 16 * K)

        ct_, st_ = jnp.cos(th), jnp.sin(th)
        c = (X[None, :] * ct_[:, None] + Y[None, :] * st_[:, None]
             - t0) / dt
        c0 = jnp.clip(jnp.floor(c), 0, nt - 2)
        f = jnp.clip(c - c0, 0.0, 1.0)
        inside = (c >= 0.0) & (c <= nt - 1.0)
        w = jnp.where(inside, 1.0, 0.0) * wv[:, None] * valid[None, :]
        idx = voff_loc[:, None] + c0.astype(jnp.int32)
        rows = packed_b[idx.reshape(-1)].reshape(idx.shape + (16 * K,))
        u = w * (1.0 - f)
        v = w * f
        hi = jax.lax.Precision.HIGHEST
        # ONE pass over the gathered rows for both lerp halves: the
        # [B, P, 16K] rows tensor is ~1.8 GB per block, and two separate
        # "bp,bpc->pc" einsums each stream it from HBM (profiled at
        # 2x112 ms of the 474 ms BP stage at 1024^2) — stacking (u, v)
        # into one contraction halves that traffic
        AB = jnp.einsum("ubp,bpc->upc", jnp.stack([u, v]), rows,
                        precision=hi)  # [2, P, 16K]
        # HIGHEST here too: the TPU default matmul precision would
        # truncate the accumulated partials to bf16 every block
        sel = (jnp.matmul(AB[0], Sa, precision=hi)
               + jnp.matmul(AB[1], Sb, precision=hi))
        return acc + sel.T, None

    acc0 = jnp.zeros((8 * K, P), dtype)
    acc, _ = jax.lax.scan(block, acc0, (tb, wb, ids))
    accT = acc.reshape(8, K, P).transpose(0, 2, 1).reshape(8 * P, K)
    accz = jnp.concatenate([accT, jnp.zeros((1, K), dtype)], 0)
    g1f, g2f, g3f, g4f = _disc_gather_maps([g1, g2, g3, g4], full_flat,
                                           N, 8 * P)
    full = (accz[g1f] + accz[g2f] + accz[g3f] + accz[g4f]).T * dtheta
    return full.reshape(K, N, N)
