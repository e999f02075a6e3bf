"""Exact Siddon projection via row-band prefix sums — the TPU fast path.

The classic Siddon DDA is a sequential per-ray walk (ops/siddon.py keeps it
as the oracle).  This module computes the *same exact* per-material path
lengths with a fully data-parallel formulation tuned to what this TPU does
fast (flat row-slice gathers at ~1e9 idx/s; no per-element scatter/gather
in Pallas):

For ray r and image row-band i (y in [y_i, y_i+dy)) the traversal inside
the band runs from parameter tA to tB.  X-plane crossings inside a band are
equally spaced, so the contribution decomposes into

    len_first * onehot(label[i, j_first])
  + len_last  * onehot(label[i, j_last])        (when the band spans >1 cell)
  + (dx/|dir_x|) * (P[i, j_hi] - P[i, j_lo+1])  (interior cells)

where ``P[i, j, m] = sum_{x<j} onehot(label[i, x], m)`` is a per-row
exclusive prefix sum over material one-hots.  Each band needs exactly TWO
row-slice gathers from a packed table whose row j carries
``(P[i, j+1, :], label[i, j])`` — the prefix at j_hi is recovered as
``P[j_hi+1] - onehot(label[j_hi])`` from the same fetched row.  Bands are
independent: no scan dependency, no variable trip counts; a horizontal ray
crossing 512 cells in one band costs the same two gathers.

Exactness: identical to Siddon's alpha-merging up to float addition order
(validated against the float64 oracle and the DDA path in tests).

Supports n_materials <= PACK_WIDTH-1 (=7 by default; pelvis with implant
uses 7).  Wider material tables fall back to ops/siddon.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pack_prefix_table", "trace_paths_fast", "PACK_WIDTH",
           "pack_labels_2band", "pack_labels_rowwin8", "pack_labels_rowwin",
           "pack_labels_rowwin16", "plan_dominant_split",
           "plan_dominant_split_bundled", "select_dominant_pack",
           "trace_paths_dominant", "trace_paths_dominant_bundled"]

PACK_WIDTH = 8
_BIG = 1e30


def pack_prefix_table(labels, n_materials, dtype=jnp.float32):
    """[Ny, Nx] labels -> packed [Ny*Nx, PACK_WIDTH] prefix/label table.

    Row (i*Nx + j) = (P[i, j+1, 0:n_mat], pad..., label[i, j]) with P the
    per-row exclusive one-hot prefix sum (inclusive at j+1).
    """
    if n_materials > PACK_WIDTH - 1:
        raise ValueError(
            f"packed prefix table supports <= {PACK_WIDTH - 1} materials"
        )
    ny, nx = labels.shape
    lab = labels.astype(jnp.int32)
    oh = jax.nn.one_hot(lab, PACK_WIDTH - 1, dtype=dtype)  # [ny, nx, w-1]
    pref = jnp.cumsum(oh, axis=1)  # inclusive prefix = P[i, j+1]
    packed = jnp.concatenate([pref, lab[..., None].astype(dtype)], axis=-1)
    return packed.reshape(ny * nx, PACK_WIDTH)


@functools.partial(
    jax.jit, static_argnames=("labels_shape", "n_materials", "row_block")
)
def trace_paths_fast(packed, labels_shape, src, dirs, dx, dy, *,
                     n_materials, row_block=32):
    """Exact per-material radiological paths, band-parallel formulation.

    packed: output of :func:`pack_prefix_table`.
    labels_shape: static (Ny, Nx).
    src, dirs: [..., 2] ray origins / unit directions (world coords,
        grid centered at origin as in ops/siddon.py).
    Returns paths [..., n_materials].
    """
    ny, nx = labels_shape
    x0 = -0.5 * nx * dx
    y0 = -0.5 * ny * dy
    dtype = jnp.result_type(src.dtype, jnp.float32)

    batch_shape = src.shape[:-1]
    p = src.reshape(-1, 2).astype(dtype)
    d = dirs.reshape(-1, 2).astype(dtype)
    n_rays = p.shape[0]

    px, py = p[:, 0], p[:, 1]
    dxr, dyr = d[:, 0], d[:, 1]

    okx = jnp.abs(dxr) > 1e-12
    oky = jnp.abs(dyr) > 1e-12
    sdx = jnp.where(okx, dxr, 1.0)
    sdy = jnp.where(oky, dyr, 1.0)

    # global entry/exit from the x-slab (y handled per band)
    tx_lo = (x0 - px) / sdx
    tx_hi = (x0 + nx * dx - px) / sdx
    inside_x = (px >= x0) & (px <= x0 + nx * dx)
    txmin = jnp.where(okx, jnp.minimum(tx_lo, tx_hi),
                      jnp.where(inside_x, -_BIG, _BIG))
    txmax = jnp.where(okx, jnp.maximum(tx_lo, tx_hi),
                      jnp.where(inside_x, _BIG, -_BIG))
    t_lo_glob = jnp.maximum(txmin, 0.0)
    inv_abs_dx = jnp.where(okx, dx / jnp.abs(sdx), 0.0)

    def band_contrib(i0, n_bands):
        """Contributions of rows [i0, i0+n_bands) for all rays.

        Returns [n_rays, n_materials] sum over the block's bands.
        """
        ii = i0 + jnp.arange(n_bands)  # [B]
        y_lo = y0 + ii * dy  # [B]
        y_hi = y_lo + dy

        # band entry/exit parameters [B, R]
        ta = (y_lo[:, None] - py[None, :]) / sdy[None, :]
        tb = (y_hi[:, None] - py[None, :]) / sdy[None, :]
        tA = jnp.minimum(ta, tb)
        tB = jnp.maximum(ta, tb)
        in_band_y = (py[None, :] >= y_lo[:, None]) & (py[None, :] < y_hi[:, None])
        tA = jnp.where(oky[None, :], tA, jnp.where(in_band_y, -_BIG, _BIG))
        tB = jnp.where(oky[None, :], tB, jnp.where(in_band_y, _BIG, -_BIG))
        tA = jnp.maximum(tA, t_lo_glob[None, :])
        tB = jnp.minimum(tB, txmax[None, :])
        valid = tA < tB
        tA = jnp.where(valid, tA, 0.0)
        tB = jnp.where(valid, tB, 0.0)

        xa = px[None, :] + tA * dxr[None, :]
        xb = px[None, :] + tB * dxr[None, :]
        ja = jnp.clip(jnp.floor((xa - x0) / dx), 0, nx - 1).astype(jnp.int32)
        jb = jnp.clip(jnp.floor((xb - x0) / dx), 0, nx - 1).astype(jnp.int32)
        j_lo = jnp.minimum(ja, jb)
        j_hi = jnp.maximum(ja, jb)

        base = (ii[:, None] * nx).astype(jnp.int32)
        row_lo = packed[(base + j_lo).reshape(-1)].reshape(
            n_bands, n_rays, PACK_WIDTH)
        row_hi = packed[(base + j_hi).reshape(-1)].reshape(
            n_bands, n_rays, PACK_WIDTH)

        lab_lo = row_lo[..., -1].astype(jnp.int32)
        lab_hi = row_hi[..., -1].astype(jnp.int32)
        oh_lo = jax.nn.one_hot(lab_lo, n_materials, dtype=dtype)
        oh_hi = jax.nn.one_hot(lab_hi, n_materials, dtype=dtype)
        P_lo1 = row_lo[..., :n_materials]  # P[j_lo + 1]
        P_hi1 = row_hi[..., :n_materials]  # P[j_hi + 1]

        multi = j_hi > j_lo

        # crossing parameters of the planes bounding the first/last cells
        # (the cells containing tA and tB respectively)
        going_right = dxr[None, :] > 0
        j_first = jnp.where(going_right, j_lo, j_hi)
        j_last = jnp.where(going_right, j_hi, j_lo)
        plane_first = x0 + (j_first + going_right) * dx
        plane_last = x0 + (j_last + (~going_right)) * dx
        t_first = (plane_first - px[None, :]) / sdx[None, :]
        t_last = (plane_last - px[None, :]) / sdx[None, :]
        len_first = jnp.clip(t_first - tA, 0.0, None)
        len_last = jnp.clip(tB - t_last, 0.0, None)
        oh_first = jnp.where(going_right[..., None], oh_lo, oh_hi)
        oh_last = jnp.where(going_right[..., None], oh_hi, oh_lo)

        # interior cells j_lo+1 .. j_hi-1: s * (P[j_hi] - P[j_lo+1]),
        # with P[j_hi] = P[j_hi+1] - onehot(label[j_hi])
        interior = inv_abs_dx[None, :, None] * (P_hi1 - oh_hi - P_lo1)

        single_len = (tB - tA)[..., None] * oh_lo
        contrib = jnp.where(
            multi[..., None],
            len_first[..., None] * oh_first
            + len_last[..., None] * oh_last
            + interior,
            single_len,
        )
        contrib = jnp.where(valid[..., None], contrib, 0.0)
        return contrib.sum(0)

    # bound the widest live temp ([row_block, n_rays, 8] f32) to ~128 MB
    budget = max(1, (1 << 22) // max(n_rays, 1))
    row_block = max(1, min(row_block, ny, budget))
    while ny % row_block:  # static trace-time adjustment
        row_block -= 1
    n_blocks = ny // row_block

    def block_step(acc, b):
        return acc + band_contrib(b * row_block, row_block), None

    acc0 = jnp.zeros((n_rays, n_materials), dtype)
    acc, _ = jax.lax.scan(block_step, acc0, jnp.arange(n_blocks))
    return acc.reshape(*batch_shape, n_materials)


# ---------------------------------------------------------------------------
# Dominant-axis packed marching: the fastest exact path
# ---------------------------------------------------------------------------
#
# A ray with |dir_y| >= |dir_x| crosses at most TWO cells inside one image
# row band, and at most THREE distinct columns across two adjacent bands
# (total x-drift <= 2 cells).  Packing the 2x3 label window of a band PAIR
# into one int32 (5 bits/label) turns the traversal into ONE scalar gather
# per ray per two rows — 4x fewer gathers than the DDA — while staying
# exactly Siddon.  Rays are split by dominant axis on the host (the
# geometry is static) and the x-dominant population runs the same kernel
# on the transposed phantom.

_LBITS = 5  # supports < 32 material labels
_LMASK = (1 << _LBITS) - 1


def pack_labels_2band(labels):
    """[Ny, Nx] labels -> [Ny/2 * Nx] int32 codes of the 2x3 window.

    code bits [5*(c + 3*r)] hold labels[2*i + r, j + c] (columns clamped
    at Nx-1).  Ny must be even; labels must be < 32.
    """
    ny, nx = labels.shape
    if ny % 2:
        raise ValueError("Ny must be even for 2-band packing")
    lab = labels.astype(jnp.int32)
    cols = [lab, jnp.roll(lab, -1, 1).at[:, -1].set(lab[:, -1])]
    cols.append(jnp.roll(cols[1], -1, 1).at[:, -1].set(cols[1][:, -1]))
    code = jnp.zeros((ny // 2, nx), jnp.int32)
    for r in range(2):
        for c in range(3):
            code = code | (cols[c][r::2] << (_LBITS * (c + 3 * r)))
    return code.reshape(-1)


def pack_labels_rowwin8(labels):
    """[Ny, Nx] labels -> [Ny/8 * Nx, 16] int32 row-window codes.

    Row ``g * Nx + a`` packs, for each of the 8 image rows ``8 g + k``,
    the 10-column label window starting at column ``a`` into two int32s:
    ``[..., 2 k]`` holds columns a..a+5 (5 bits each), ``[..., 2 k + 1]``
    columns a+4..a+9 (columns clamped at Nx-1).  A y-dominant ray drifts
    at most one column per row, so one row-16 gather at the group's
    min-column anchor serves all 8 rows — the TPU's measured in-scan
    gather rate is set by gather COUNT, not fetch width (CLAUDE.md), so
    this is ~4x fewer gather issues than the 2-band packing.
    Ny must be a multiple of 8; labels must be < 32.
    """
    ny, nx = labels.shape
    if ny % 8:
        raise ValueError("Ny must be a multiple of 8 for row-window packing")
    lab = labels.astype(jnp.int32)
    cols = [lab]
    for _ in range(9):
        nxt = jnp.roll(cols[-1], -1, 1).at[:, -1].set(cols[-1][:, -1])
        cols.append(nxt)
    w0 = jnp.zeros((ny, nx), jnp.int32)
    w1 = jnp.zeros((ny, nx), jnp.int32)
    for c in range(6):
        w0 = w0 | (cols[c] << (_LBITS * c))
        w1 = w1 | (cols[c + 4] << (_LBITS * c))
    # [ny, nx, 2] -> [ny/8, 8, nx, 2] -> [ny/8, nx, 8, 2] -> [G*nx, 16]
    w = jnp.stack([w0, w1], -1).reshape(ny // 8, 8, nx, 2)
    return w.transpose(0, 2, 1, 3).reshape(ny // 8 * nx, 16)


def _rowwin_cols_per_word(lbits):
    return 30 // lbits  # labels per int32 (5 bits -> 6; 3 bits -> 10)


def rowwin_lbits(n_materials):
    """Label bit width for the row-window packs: 3 bits when the label
    set fits (n_materials <= 8 — the PACK_WIDTH regime every fast path
    already requires), else 5.  Pack and trace sites derive this from
    the SAME n_materials so the layouts always agree."""
    return 3 if n_materials <= 8 else 5


def select_dominant_pack(ny, nx, n_materials, dx, dy, group=16):
    """Pick the (pack_fn, kernel_fn, group) for the dominant-axis path.

    The SINGLE selection used by :func:`trace_paths_dominant`,
    ``pipeline.fused.pack_dect`` and ``parallel.halo.pack_dect_sharded``
    — the guards must agree with the kernels that consume the packs:

    * < 32 material labels (5-bit fields; raises otherwise),
    * square cells (the window width budgets exactly one column of
      drift per image row, which holds only for dy <= dx; the
      transposed x-dominant pass needs dx <= dy too — raises on
      anisotropic grids),
    * the window must fit BOTH grid dimensions (the x-dominant kernel
      runs on the transposed labels, so ``ny`` is its column count).

    Returns ``(pack_fn, kernel_fn, grp)`` where grp in {2, 8, group}.
    """
    if n_materials > 31:
        raise ValueError(
            "dominant-axis packed tracing supports < 32 material labels "
            f"(got {n_materials}); use ops.siddon.trace_paths"
        )
    if abs(dx - dy) > 1e-9 * max(abs(dx), abs(dy)):
        raise ValueError(
            "dominant-axis packed tracing requires square cells "
            f"(dx={dx}, dy={dy}): a y-dominant ray drifts at most one "
            "column per row only when dy <= dx, and the transposed pass "
            "needs the converse; use ops.siddon.trace_paths"
        )
    lb = rowwin_lbits(n_materials)
    win = _rowwin_cols_per_word(lb) * _rowwin_words(group, lb)
    if (group > 8 and ny % group == 0 and nx % group == 0
            and min(ny, nx) >= win):
        return (functools.partial(pack_labels_rowwin, group=group,
                                  lbits=lb),
                functools.partial(_trace_dominant_grp, group=group,
                                  lbits=lb),
                int(group))
    if ny % 8 == 0 and nx % 8 == 0 and min(ny, nx) >= 10:
        return pack_labels_rowwin8, _trace_dominant8, 8
    if ny % 2 or nx % 2 or min(ny, nx) < 3:
        raise ValueError(
            f"grid {ny}x{nx} fits no packed dominant kernel (needs even "
            "dims >= 3); use ops.siddon.trace_paths"
        )
    return pack_labels_2band, _trace_dominant, 2


def _rowwin_words(group, lbits=5):
    """int32 words per row for a ``group``-row window pack: the window
    must cover the <= group+1-column span of a y-dominant ray across
    ``group`` rows (30//lbits labels per int32)."""
    return -(-(group + 2) // _rowwin_cols_per_word(lbits))


def rowwin_slope_max(group, words, lbits):
    """Largest folded slope |d_minor/d_major| a ``group``-row window of
    ``words`` int32s per row can cover exactly: the ray's column span
    across the group is <= floor(group*s) + 2, so the
    ``cpw*words``-column window suffices iff
    ``s <= (cpw*words - 2) / group``."""
    return (_rowwin_cols_per_word(lbits) * words - 2) / group


def pack_labels_rowwin(labels, group, lbits=5, words=None):
    """[Ny, Nx] labels -> [Ny/group * Nx, group*W] int32 row-window codes.

    Row ``g * Nx + a`` packs, for each of the ``group`` image rows
    ``group * g + k``, the label window starting at column ``a`` into
    ``W = ceil((group+2)/cpw)`` int32s (``cpw = 30 // lbits`` labels per
    word): word ``[..., W k + w]`` holds columns a+cpw*w .. a+cpw*w+cpw-1
    (``lbits`` bits each, columns clamped at Nx-1).  A y-dominant ray
    drifts at most one column per row, so one row-``group*W`` gather at
    the group's min-column anchor serves all ``group`` rows — the
    in-scan gather rate is set by gather COUNT, not fetch width
    (CLAUDE.md), so doubling the group halves the trace cost as long as
    the wider row still streams (measured through row-48: group=16
    beats group=8 by ~25% on the trace stage; row-192 falls off the
    width cliff).  ``lbits=3`` (labels < 8 — the PACK_WIDTH regime)
    packs 10 columns per word, keeping wide groups under the cliff.
    Ny must be a multiple of ``group``; labels must be < 2**lbits.

    ``words`` overrides the per-row word count W (default: wide enough
    for any y-dominant slope).  A NARROWER window (e.g. words=1 at
    group=32) is exact only for rays whose folded slope is
    <= :func:`rowwin_slope_max` — the slope-adaptive tracer partitions
    rays so each bucket's kernel/pack pair satisfies its bound.
    """
    ny, nx = labels.shape
    if ny % group:
        raise ValueError(f"Ny must be a multiple of {group} for "
                         "row-window packing")
    cpw = _rowwin_cols_per_word(lbits)
    W = _rowwin_words(group, lbits) if words is None else int(words)
    lab = labels.astype(jnp.int32)
    cols = [lab]
    for _ in range(cpw * W - 1):
        nxt = jnp.roll(cols[-1], -1, 1).at[:, -1].set(cols[-1][:, -1])
        cols.append(nxt)
    words = []
    for w in range(W):
        acc = jnp.zeros((ny, nx), jnp.int32)
        for c in range(cpw):
            acc = acc | (cols[cpw * w + c] << (lbits * c))
        words.append(acc)
    # [ny,nx,W] -> [ny/g, g, nx, W] -> [ny/g, nx, g, W] -> [G*nx, g*W]
    w = jnp.stack(words, -1).reshape(ny // group, group, nx, W)
    return w.transpose(0, 2, 1, 3).reshape(ny // group * nx, group * W)


def pack_labels_rowwin16(labels):
    """[Ny, Nx] labels -> [Ny/16 * Nx, 48] int32 row-window codes
    (:func:`pack_labels_rowwin` at group=16)."""
    return pack_labels_rowwin(labels, 16)


def pack_labels_rowwin_multi(labels_list, group, lbits=5, words=None):
    """Z label images -> one [Ny/group * Nx, Z*group*W] row-window pack.

    Slice-major concatenation of :func:`pack_labels_rowwin` per slice:
    one gather row then carries every slice's window, and the
    ``n_slices`` tracer decodes them from slice offset ``z*group*W``.
    All slices must share the grid shape."""
    packs = [pack_labels_rowwin(lab, group, lbits=lbits, words=words)
             for lab in labels_list]
    return jnp.concatenate(packs, axis=1)


def plan_dominant_split(dirs, pad_to=1024):
    """Host-side ray partition by dominant axis.

    dirs: [..., 2] unit directions (NumPy).  Returns
    (idx_y, idx_x, inv_perm): padded index arrays of the y-dominant and
    x-dominant rays plus the inverse permutation mapping
    concat(out_y[:n_y], out_x[:n_x]) back to input order.
    """
    d = np.asarray(dirs).reshape(-1, 2)
    y_dom = np.abs(d[:, 1]) >= np.abs(d[:, 0])
    idx_y = np.nonzero(y_dom)[0]
    idx_x = np.nonzero(~y_dom)[0]

    def pad(a):
        if len(a) == 0:
            return np.zeros(pad_to, np.int32)
        m = -(-len(a) // pad_to) * pad_to
        return np.pad(a, (0, m - len(a)), mode="edge").astype(np.int32)

    inv = np.empty(d.shape[0], np.int64)
    inv[np.concatenate([idx_y, idx_x]).astype(np.int64)] = np.arange(
        d.shape[0])
    return pad(idx_y), pad(idx_x), inv.astype(np.int32), len(idx_y), len(idx_x)


def plan_dominant_split_bundled(src, dirs, labels_shape, dx, dy, *,
                                lbits=3, group=16, words=3, bundle=8,
                                pad_rays=1024, pad_bundles=128):
    """Host-side bundled ray partition for the dominant-axis tracer.

    The measured trace rate is set by gather COUNT, not fetch width
    (CLAUDE.md), and the B near-parallel adjacent channels of one fan
    view access almost the same label window in every row group — so
    letting a bundle of B rays share ONE anchor and one row-window
    gather per group divides the dominant gather cost by B (measured
    1.26x on the 1024^2 trace stage; window coverage 100% of bundles on
    the high-res fan geometry).

    src, dirs: [V, C, 2] NumPy view-major ray arrays — bundles are runs
    of ``bundle`` consecutive same-dominance channels within one view.
    labels_shape, dx, dy: the marched grid (y-dominant frame; the
    x-dominant side is planned on the swapped frame internally).

    A bundle is eligible only when the shared ``cpw*words``-column
    window provably covers every member's columns in every row group:
    ``floor(group*s_max) + 3 + ceil(spread)`` <= window, with ``spread``
    the bundle's worst in-grid column divergence (linear in y, so the
    extremes bound it).  Ineligible bundles and run tails go to the
    per-ray ``rest`` arrays — the plan is always exact, bundling is
    only a fast path for the rays it covers.

    Returns a dict:
      ``bun_y``/``bun_x``: [bundle * NBp] int32 ray indices in
        bundle-TRANSPOSED order (member b of bundle nb at position
        ``b * NBp + nb`` — the layout the ``bundle=`` kernel requires),
      ``rest_y``/``rest_x``: padded per-ray leftover indices,
      ``nb_y``/``nb_x``/``n_rest_y``/``n_rest_x``: real counts,
      ``inv``: [V*C] int32 positions of every input ray in
        ``concat(out_bun_y, out_rest_y, out_bun_x, out_rest_x)`` (the
        four FULL padded kernel outputs, in that order),
      ``frac_bundled``, plus the ``bundle``/``words``/``group``/
      ``lbits`` the kernels must be called with.
    """
    src = np.asarray(src)
    dirs = np.asarray(dirs)
    if src.ndim != 3 or src.shape[-1] != 2:
        raise ValueError("bundled planning needs [V, C, 2] ray arrays "
                         "(bundles are consecutive same-view channels)")
    V, C, _ = dirs.shape
    s2 = src.reshape(-1, 2)
    d2 = dirs.reshape(-1, 2)
    y_dom = np.abs(d2[:, 1]) >= np.abs(d2[:, 0])
    cpw = _rowwin_cols_per_word(lbits)
    win = cpw * words
    ny, nx = labels_shape

    def side(mask, swap):
        sd = s2[:, ::-1] if swap else s2
        dd = d2[:, ::-1] if swap else d2
        fny = nx if swap else ny
        fdx = dx if swap else dy  # transposed pass swaps cell sizes too
        fdy = dy if swap else dx
        half = 0.5 * fny * fdx
        # FIXED channel blocks (vectorized): block k of a view bundles
        # iff all its channels share this dominance.  Measured identical
        # coverage to run-based chunking on the fan geometries (the
        # dominance boundary costs at most 2 straddling blocks per
        # view) at half the host planning time.
        nb_per = C // bundle
        cb = nb_per * bundle
        idx_f = np.arange(V * C).reshape(V, C)
        mask_f = mask.reshape(V, C)
        idx = idx_f[:, :cb].reshape(V, nb_per, bundle)
        mask3 = mask_f[:, :cb].reshape(V, nb_per, bundle)
        blk_ok = mask3.all(-1)
        bun = idx[blk_ok].astype(np.int64)
        rest = list(idx[~blk_ok][mask3[~blk_ok]])
        rest.extend(idx_f[:, cb:][mask_f[:, cb:]].tolist())
        if len(bun):
            bd = dd[bun]  # [NB, B, 2]
            bs = sd[bun]
            with np.errstate(divide="ignore", invalid="ignore"):
                slope = bd[..., 0] / bd[..., 1]
            # column position is linear in the marched coordinate, so
            # the in-grid divergence is bounded by the two extremes
            x_ext = (bs[..., 0]
                     + (np.array([-half, half])[:, None, None]
                        - bs[..., 1]) * slope)  # [2, NB, B]
            spread = (x_ext.max(-1) - x_ext.min(-1)).max(0) / fdy
            smax = np.abs(slope).max(-1)
            need = np.floor(group * smax) + 3 + np.ceil(spread)
            ok = np.isfinite(need) & (need <= win)
            rest.extend(bun[~ok].reshape(-1).tolist())
            bun = bun[ok]
        nb = len(bun)
        nbp = max(pad_bundles, -(-max(nb, 1) // pad_bundles) * pad_bundles)
        bun_p = (np.concatenate([bun, np.repeat(bun[-1:], nbp - nb, 0)])
                 if nb else np.zeros((nbp, bundle), np.int64))
        order = bun_p.T.reshape(-1)  # member-major (transposed) layout
        rest = np.asarray(rest, np.int64)
        n_rest = len(rest)
        rp = max(pad_rays, -(-max(n_rest, 1) // pad_rays) * pad_rays)
        rest_p = (np.pad(rest, (0, rp - n_rest), mode="edge") if n_rest
                  else np.zeros(rp, np.int64))
        return bun_p, nbp, nb, order, rest_p, n_rest

    by = side(y_dom, False)
    bx = side(~y_dom, True)
    inv = np.zeros(V * C, np.int64)
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
    n_dom = int(y_dom.sum())
    return {
        "bun_y": by[3].astype(np.int32), "nb_y": by[2], "nbp_y": by[1],
        "rest_y": by[4].astype(np.int32), "n_rest_y": by[5],
        "bun_x": bx[3].astype(np.int32), "nb_x": bx[2], "nbp_x": bx[1],
        "rest_x": bx[4].astype(np.int32), "n_rest_x": bx[5],
        "inv": inv.astype(np.int32),
        "frac_bundled": (by[2] + bx[2]) * bundle / max(V * C, 1),
        "bundle": bundle, "words": words, "group": group, "lbits": lbits,
    }


@functools.partial(
    jax.jit,
    static_argnames=("labels_shape", "n_materials", "group", "lbits",
                     "words", "bundle"))
def _trace_bundled_core(pack_y, pack_x, src2, dirs2, bun_y, rest_y,
                        bun_x, rest_x, inv, dx, dy, *, labels_shape,
                        n_materials, group, lbits, words, bundle):
    """One jitted program for the four bundled-plan kernels + the inverse
    permutation (the eager four-program version pays per-dispatch tunnel
    latency; fusing them also lets XLA overlap the y/x populations)."""
    ny, nx = labels_shape
    kern = functools.partial(_trace_dominant_grp, group=group, lbits=lbits,
                             words=words, n_materials=n_materials)
    cat = jnp.concatenate([
        kern(pack_y, (ny, nx), src2[bun_y], dirs2[bun_y], dx, dy,
             bundle=bundle),
        kern(pack_y, (ny, nx), src2[rest_y], dirs2[rest_y], dx, dy),
        kern(pack_x, (nx, ny), src2[bun_x][:, ::-1], dirs2[bun_x][:, ::-1],
             dy, dx, bundle=bundle),
        kern(pack_x, (nx, ny), src2[rest_x][:, ::-1],
             dirs2[rest_x][:, ::-1], dy, dx),
    ], axis=0)
    return cat[inv]


def trace_paths_dominant_bundled(labels, src, dirs, dx, dy, *,
                                 n_materials, plan, packs=None):
    """Exact Siddon paths via the bundled dominant-axis fast path.

    ``plan`` comes from :func:`plan_dominant_split_bundled` on the SAME
    [V, C, 2] geometry.  Runs four kernels (bundled + leftover per
    dominant side) over ONE ``words``-wide pack per side and
    inverse-permutes, all in one jitted program; exactness is the
    planner's window contract.  ``packs=(pack_y, pack_x)`` supplies
    precomputed :func:`pack_labels_rowwin` tables (same group/lbits/
    words) so repeated calls skip the ~2x17 ms eager packing.  The
    plan's index arrays are device-cached inside ``plan`` on first use.
    """
    V, C = src.shape[:2]
    src2 = jnp.asarray(src).reshape(-1, 2)
    dirs2 = jnp.asarray(dirs).reshape(-1, 2)
    ny, nx = labels.shape
    g, w, lb, B = plan["group"], plan["words"], plan["lbits"], plan["bundle"]
    if packs is None:
        labels = jnp.asarray(labels)
        packs = (pack_labels_rowwin(labels, g, lbits=lb, words=w),
                 pack_labels_rowwin(labels.T, g, lbits=lb, words=w))
    dev = plan.get("_dev")
    if dev is None:
        dev = plan["_dev"] = tuple(
            jnp.asarray(plan[k])
            for k in ("bun_y", "rest_y", "bun_x", "rest_x", "inv"))
    out = _trace_bundled_core(
        packs[0], packs[1], src2, dirs2, *dev, dx, dy,
        labels_shape=(int(ny), int(nx)), n_materials=int(n_materials),
        group=int(g), lbits=int(lb), words=int(w), bundle=int(B))
    return out.reshape(V, C, n_materials)


@functools.partial(
    jax.jit,
    static_argnames=("labels_shape", "n_materials", "band_block"),
)
def _trace_dominant(packed2, labels_shape, src, dirs, dx, dy, *,
                    n_materials, band_block=8):
    """Exact paths for y-dominant rays (|dir_y| >= |dir_x|) via 2-band
    packed marching.  src/dirs: [R, 2]."""
    ny, nx = labels_shape
    x0 = -0.5 * nx * dx
    y0 = -0.5 * ny * dy
    dtype = jnp.result_type(src.dtype, jnp.float32)
    p = src.astype(dtype)
    d = dirs.astype(dtype)
    n_rays = p.shape[0]

    px, py = p[:, 0], p[:, 1]
    dxr, dyr = d[:, 0], d[:, 1]
    okx = jnp.abs(dxr) > 1e-12
    sdx = jnp.where(okx, dxr, 1.0)
    sdy = dyr  # |dyr| >= |dxr| and |d| = 1 -> never ~0 for this population

    tx_lo = (x0 - px) / sdx
    tx_hi = (x0 + nx * dx - px) / sdx
    inside_x = (px >= x0) & (px <= x0 + nx * dx)
    txmin = jnp.where(okx, jnp.minimum(tx_lo, tx_hi),
                      jnp.where(inside_x, -_BIG, _BIG))
    txmax = jnp.where(okx, jnp.maximum(tx_lo, tx_hi),
                      jnp.where(inside_x, _BIG, -_BIG))
    t_lo_glob = jnp.maximum(txmin, 0.0)

    inv_dx = 1.0 / dx

    def subband(i_row, anchor_known=None):
        """tA/tB/ja/jb/valid for one row band (vectorized over rays)."""
        y_lo = y0 + i_row * dy
        ta = (y_lo - py) / sdy
        tb = (y_lo + dy - py) / sdy
        tA = jnp.maximum(jnp.minimum(ta, tb), t_lo_glob)
        tB = jnp.minimum(jnp.maximum(ta, tb), txmax)
        valid = tA < tB
        tAc = jnp.where(valid, tA, 0.0)
        tBc = jnp.where(valid, tB, 0.0)
        xa = px + tAc * dxr
        xb = px + tBc * dxr
        ja = jnp.clip(jnp.floor((xa - x0) * inv_dx), 0, nx - 1)
        jb = jnp.clip(jnp.floor((xb - x0) * inv_dx), 0, nx - 1)
        return tAc, tBc, ja.astype(jnp.int32), jb.astype(jnp.int32), valid

    def pair_contrib(i2):
        """Contribution of band pair i2 (rows 2 i2, 2 i2 + 1): [R, M]."""
        rows = []
        for k in range(2):
            rows.append(subband(2 * i2 + k))
        jmins = [jnp.minimum(r[2], r[3]) for r in rows]
        jm = jnp.minimum(
            jnp.where(rows[0][4], jmins[0], nx),
            jnp.where(rows[1][4], jmins[1], nx),
        )
        anchor = jnp.clip(jm, 0, nx - 3)
        code = packed2[i2 * nx + anchor]  # ONE gather per ray per 2 rows

        out = 0.0
        for k, (tA, tB, ja, jb, valid) in enumerate(rows):
            # the single interior plane sits at the left edge of the
            # higher cell; clamping its crossing into [tA, tB] makes the
            # one-cell case fall out automatically
            j_hi = jnp.maximum(ja, jb)
            t_c = (x0 + j_hi * dx - px) / sdx
            t_c = jnp.where(okx, jnp.clip(t_c, tA, tB), tA)
            rel_a = jnp.clip(ja - anchor, 0, 2)
            rel_b = jnp.clip(jb - anchor, 0, 2)
            lab_a = (code >> (_LBITS * (rel_a + 3 * k))) & _LMASK
            lab_b = (code >> (_LBITS * (rel_b + 3 * k))) & _LMASK
            va = jnp.where(valid, t_c - tA, 0.0)
            vb = jnp.where(valid, tB - t_c, 0.0)
            out = out + va[:, None] * jax.nn.one_hot(
                lab_a, n_materials, dtype=dtype)
            out = out + vb[:, None] * jax.nn.one_hot(
                lab_b, n_materials, dtype=dtype)
        return out

    n_pairs = ny // 2
    block = max(1, min(band_block, n_pairs))
    while n_pairs % block:
        block -= 1

    def step(acc, b):
        def one(kk, a):
            return a + pair_contrib(b * block + kk)

        return jax.lax.fori_loop(0, block, one, acc), None

    acc0 = jnp.zeros((n_rays, n_materials), dtype)
    acc, _ = jax.lax.scan(step, acc0, jnp.arange(n_pairs // block))
    return acc


@functools.partial(
    jax.jit,
    static_argnames=("labels_shape", "n_materials", "group_block"),
)
def _trace_dominant8(packed8, labels_shape, src, dirs, dx, dy, *,
                     n_materials, group_block=4):
    """Exact paths for y-dominant rays via 8-row-group window marching.

    One row-16 int32 gather per ray per EIGHT image rows (vs per two for
    the 2-band kernel): the group's shared anchor is the min column over
    its 8 row-bands, and the 10-column per-row windows in ``packed8``
    (:func:`pack_labels_rowwin8`) cover the <= 9-column drift of a
    y-dominant ray across 8 rows.  src/dirs: [R, 2].
    """
    ny, nx = labels_shape
    x0 = -0.5 * nx * dx
    y0 = -0.5 * ny * dy
    dtype = jnp.result_type(src.dtype, jnp.float32)
    p = src.astype(dtype)
    d = dirs.astype(dtype)
    n_rays = p.shape[0]

    px, py = p[:, 0], p[:, 1]
    dxr, dyr = d[:, 0], d[:, 1]
    okx = jnp.abs(dxr) > 1e-12
    sdx = jnp.where(okx, dxr, 1.0)
    sdy = dyr

    tx_lo = (x0 - px) / sdx
    tx_hi = (x0 + nx * dx - px) / sdx
    inside_x = (px >= x0) & (px <= x0 + nx * dx)
    txmin = jnp.where(okx, jnp.minimum(tx_lo, tx_hi),
                      jnp.where(inside_x, -_BIG, _BIG))
    txmax = jnp.where(okx, jnp.maximum(tx_lo, tx_hi),
                      jnp.where(inside_x, _BIG, -_BIG))
    t_lo_glob = jnp.maximum(txmin, 0.0)

    inv_dx = 1.0 / dx

    def subband(i_row):
        y_lo = y0 + i_row * dy
        ta = (y_lo - py) / sdy
        tb = (y_lo + dy - py) / sdy
        tA = jnp.maximum(jnp.minimum(ta, tb), t_lo_glob)
        tB = jnp.minimum(jnp.maximum(ta, tb), txmax)
        valid = tA < tB
        tAc = jnp.where(valid, tA, 0.0)
        tBc = jnp.where(valid, tB, 0.0)
        xa = px + tAc * dxr
        xb = px + tBc * dxr
        ja = jnp.clip(jnp.floor((xa - x0) * inv_dx), 0, nx - 1)
        jb = jnp.clip(jnp.floor((xb - x0) * inv_dx), 0, nx - 1)
        return tAc, tBc, ja.astype(jnp.int32), jb.astype(jnp.int32), valid

    def group_contrib(i8):
        """Contribution of rows 8 i8 .. 8 i8 + 7: [R, M]."""
        rows = [subband(8 * i8 + k) for k in range(8)]
        jm = jnp.full((n_rays,), nx, jnp.int32)
        for tA, tB, ja, jb, valid in rows:
            jm = jnp.minimum(jm, jnp.where(valid, jnp.minimum(ja, jb), nx))
        anchor = jnp.clip(jm, 0, nx - 10)
        codes = packed8[i8 * nx + anchor]  # [R, 16]: ONE gather per 8 rows

        out = 0.0
        for k, (tA, tB, ja, jb, valid) in enumerate(rows):
            j_hi = jnp.maximum(ja, jb)
            t_c = (x0 + j_hi * dx - px) / sdx
            t_c = jnp.where(okx, jnp.clip(t_c, tA, tB), tA)
            w0, w1 = codes[:, 2 * k], codes[:, 2 * k + 1]

            def lab_at(j):
                rel = jnp.clip(j - anchor, 0, 9)
                lo = w0 >> (_LBITS * rel)
                hi = w1 >> (_LBITS * (rel - 4))
                return jnp.where(rel <= 5, lo, hi) & _LMASK

            va = jnp.where(valid, t_c - tA, 0.0)
            vb = jnp.where(valid, tB - t_c, 0.0)
            out = out + va[:, None] * jax.nn.one_hot(
                lab_at(ja), n_materials, dtype=dtype)
            out = out + vb[:, None] * jax.nn.one_hot(
                lab_at(jb), n_materials, dtype=dtype)
        return out

    n_groups = ny // 8
    acc0 = jnp.zeros((n_rays, n_materials), dtype)
    if group_block == 0:
        # single fori over all groups: no scan peeling (XLA peels the
        # first scan step, materializing its code gather in the wrong
        # layout + a 17 ms relayout copy per dominant side)
        return jax.lax.fori_loop(
            0, n_groups, lambda g, a: a + group_contrib(g), acc0)
    block = max(1, min(group_block, n_groups))
    while n_groups % block:
        block -= 1

    def step(acc, b):
        def one(kk, a):
            return a + group_contrib(b * block + kk)

        return jax.lax.fori_loop(0, block, one, acc), None

    acc, _ = jax.lax.scan(step, acc0, jnp.arange(n_groups // block))
    return acc


@functools.partial(
    jax.jit,
    static_argnames=("labels_shape", "n_materials", "group", "lbits",
                     "group_block", "words", "bundle", "n_slices",
                     "_stub_gather"),
)
def _trace_dominant_grp(packed, labels_shape, src, dirs, dx, dy, *,
                        n_materials, group, lbits=5, group_block=4,
                        words=None, bundle=1, n_slices=1,
                        _stub_gather=False):
    """Exact paths for y-dominant rays via ``group``-row window marching.

    One row-``group*W`` int32 gather per ray per ``group`` image rows:
    the group's shared anchor is the min column over its row-bands, and
    the cpw*W-column per-row windows in ``packed``
    (:func:`pack_labels_rowwin`, same ``lbits`` AND ``words``) cover the
    <= group+1-column drift of a y-dominant ray across the group.
    src/dirs: [R, 2].  With an explicit ``words`` narrower than the
    default, exactness requires every ray's folded slope to satisfy
    :func:`rowwin_slope_max` (the adaptive planner's bucket contract).

    ``bundle > 1``: rays arrive in BUNDLE-TRANSPOSED order — member b
    of bundle nb at flat position ``b * (R/bundle) + nb`` — and each
    bundle shares ONE anchor (its min) and one gather per group.  The
    measured trace rate is set by gather COUNT (CLAUDE.md), so bundling
    the near-parallel adjacent channels of a fan view divides the
    dominant cost by the bundle size; the transposed [B, NB] layout
    keeps the big NB axis in the lane dimension (a [NB, B] layout pads
    B=8 to the 128-lane tile).  Exactness then requires the window to
    also cover the bundle's in-grid column spread
    (:func:`plan_dominant_split_bundled` builds bundles that satisfy
    this and routes the rest to the unbundled kernel); the caller
    passes a matching wider ``words``.

    ``n_slices > 1``: ``packed`` holds Z slices' row windows
    concatenated slice-major per row (``[G*nx, Z*group*W]`` — build
    with :func:`pack_labels_rowwin_multi`); ONE gather per group
    serves every slice and only the label decode repeats, returning
    ``[n_rays, Z, M]``.  The round-5 z-stack lever: the measured trace
    rate is gather-COUNT-bound through ~256-byte rows (CLAUDE.md), so
    a 2-slice pack at row-2*g*W traces two slices for one slice's
    gathers.
    """
    cpw = _rowwin_cols_per_word(lbits)
    W = _rowwin_words(group, lbits) if words is None else int(words)
    lmask = (1 << lbits) - 1
    ny, nx = labels_shape
    x0 = -0.5 * nx * dx
    y0 = -0.5 * ny * dy
    dtype = jnp.result_type(src.dtype, jnp.float32)
    p = src.astype(dtype)
    d = dirs.astype(dtype)
    n_rays = p.shape[0]
    if bundle > 1 and n_rays % bundle:
        raise ValueError(
            f"ray count {n_rays} not a multiple of bundle {bundle}")
    # bundled rays keep the [B, NB] shape end-to-end so the per-bundle
    # gather rows broadcast as sublane scalars inside fused elementwise
    # decode — widening them to per-ray [R, g*W] rows is a materialized
    # copy that was measured to cost MORE than the saved gathers
    shp = (bundle, n_rays // bundle) if bundle > 1 else (n_rays,)
    p = p.reshape(*shp, 2)
    d = d.reshape(*shp, 2)

    px, py = p[..., 0], p[..., 1]
    dxr, dyr = d[..., 0], d[..., 1]
    okx = jnp.abs(dxr) > 1e-12
    sdx = jnp.where(okx, dxr, 1.0)
    sdy = dyr

    tx_lo = (x0 - px) / sdx
    tx_hi = (x0 + nx * dx - px) / sdx
    inside_x = (px >= x0) & (px <= x0 + nx * dx)
    txmin = jnp.where(okx, jnp.minimum(tx_lo, tx_hi),
                      jnp.where(inside_x, -_BIG, _BIG))
    txmax = jnp.where(okx, jnp.maximum(tx_lo, tx_hi),
                      jnp.where(inside_x, _BIG, -_BIG))
    t_lo_glob = jnp.maximum(txmin, 0.0)

    inv_dx = 1.0 / dx

    def subband(i_row):
        y_lo = y0 + i_row * dy
        ta = (y_lo - py) / sdy
        tb = (y_lo + dy - py) / sdy
        tA = jnp.maximum(jnp.minimum(ta, tb), t_lo_glob)
        tB = jnp.minimum(jnp.maximum(ta, tb), txmax)
        valid = tA < tB
        tAc = jnp.where(valid, tA, 0.0)
        tBc = jnp.where(valid, tB, 0.0)
        xa = px + tAc * dxr
        xb = px + tBc * dxr
        ja = jnp.clip(jnp.floor((xa - x0) * inv_dx), 0, nx - 1)
        jb = jnp.clip(jnp.floor((xb - x0) * inv_dx), 0, nx - 1)
        return tAc, tBc, ja.astype(jnp.int32), jb.astype(jnp.int32), valid

    def group_contrib(ig):
        """Contribution of rows group*ig .. group*ig + group-1:
        [*shp, M]."""
        rows = [subband(group * ig + k) for k in range(group)]
        jm = jnp.full(shp, nx, jnp.int32)
        for tA, tB, ja, jb, valid in rows:
            jm = jnp.minimum(jm, jnp.where(valid, jnp.minimum(ja, jb), nx))
        if bundle > 1:
            jm = jm.min(axis=0)  # one shared anchor per bundle
        anchor = jnp.clip(jm, 0, nx - cpw * W)
        if _stub_gather:
            # profiling knob (tools/bench_adaptive_trace.py): replace
            # the per-ray gather with one loop-dependent row broadcast
            # to expose the kernel's non-gather compute floor.  WRONG
            # results — never set in production paths.
            codes = jnp.broadcast_to(
                jax.lax.dynamic_slice_in_dim(packed, ig * nx, 1)[0],
                (anchor.shape[0], n_slices * group * W))
        else:
            codes = packed[ig * nx + anchor]  # [R or NB, g*W]: ONE
            #                                   gather per group
        anchor_b = anchor[None, :] if bundle > 1 else anchor

        outs = [0.0] * n_slices
        for k, (tA, tB, ja, jb, valid) in enumerate(rows):
            j_hi = jnp.maximum(ja, jb)
            t_c = (x0 + j_hi * dx - px) / sdx
            t_c = jnp.where(okx, jnp.clip(t_c, tA, tB), tA)
            va = jnp.where(valid, t_c - tA, 0.0)
            vb = jnp.where(valid, tB - t_c, 0.0)
            # the ray geometry (segment lengths, window columns) is
            # slice-independent: a multi-slice pack re-decodes labels
            # per slice from the SAME gathered row, sharing the whole
            # subband math — the z-stack's per-slice trace cost then
            # scales with decode, not gather count
            for z in range(n_slices):
                # per-bundle words broadcast over the B axis inside the
                # fused shift/select — no widened per-ray code table
                ws = [codes[:, z * group * W + W * k + w]
                      for w in range(W)]
                if bundle > 1:
                    ws = [w_[None, :] for w_ in ws]

                def lab_at(j, ws=ws):
                    # shifts on the non-selected words may be negative;
                    # the where() discards those lanes (same contract
                    # the 8-row kernel relies on)
                    rel = jnp.clip(j - anchor_b, 0, cpw * W - 1)
                    sel = ws[W - 1] >> (lbits * (rel - cpw * (W - 1)))
                    for w in range(W - 2, -1, -1):
                        sel = jnp.where(rel <= cpw * w + cpw - 1,
                                        ws[w] >> (lbits * (rel - cpw * w)),
                                        sel)
                    return sel & lmask

                outs[z] = outs[z] + va[..., None] * jax.nn.one_hot(
                    lab_at(ja), n_materials, dtype=dtype)
                outs[z] = outs[z] + vb[..., None] * jax.nn.one_hot(
                    lab_at(jb), n_materials, dtype=dtype)
        return outs[0] if n_slices == 1 else jnp.stack(outs, axis=-2)

    n_groups = ny // group
    out_shape = ((n_rays, n_materials) if n_slices == 1
                 else (n_rays, n_slices, n_materials))
    acc_shape = (*shp, n_materials) if n_slices == 1 \
        else (*shp, n_slices, n_materials)
    acc0 = jnp.zeros(acc_shape, dtype)
    if group_block == 0:
        acc = jax.lax.fori_loop(
            0, n_groups, lambda g, a: a + group_contrib(g), acc0)
        return acc.reshape(out_shape)
    block = max(1, min(group_block, n_groups))
    while n_groups % block:
        block -= 1

    def step(acc, b):
        def one(kk, a):
            return a + group_contrib(b * block + kk)

        return jax.lax.fori_loop(0, block, one, acc), None

    acc, _ = jax.lax.scan(step, acc0, jnp.arange(n_groups // block))
    return acc.reshape(out_shape)


def _trace_dominant16(packed16, labels_shape, src, dirs, dx, dy, *,
                      n_materials, group_block=4):
    """:func:`_trace_dominant_grp` at group=16 (one row-48 int32 gather
    per ray per 16 image rows)."""
    return _trace_dominant_grp(packed16, labels_shape, src, dirs, dx, dy,
                               n_materials=n_materials, group=16,
                               group_block=group_block)


def trace_paths_dominant(labels, src, dirs, dx, dy, *, n_materials,
                         plan=None, group=8, packs=None):
    """Exact Siddon paths via dominant-axis packed marching.

    ``group=8`` (default): one row-16 int32 gather per ray per eight
    image rows (~16x fewer gather issues than the DDA); ``group=2``: the
    2-band single-int32 kernel (one scalar gather per two rows).  Both
    are exactly Siddon.  Requires square cells (the transposed pass
    swaps the roles of dx and dy), even Ny/Nx, and < 32 materials —
    :func:`select_dominant_pack` enforces all three.
    ``plan`` (from :func:`plan_dominant_split` on the flattened dirs) is
    rebuilt when omitted.
    """
    batch_shape = src.shape[:-1]
    src2 = src.reshape(-1, 2)
    dirs2 = dirs.reshape(-1, 2)
    if plan is None:
        plan = plan_dominant_split(np.asarray(dirs2))
    idx_y, idx_x, inv, n_y, n_x = plan

    ny, nx = labels.shape
    pack, kern, _ = select_dominant_pack(ny, nx, n_materials, dx, dy,
                                         group=group)
    if packs is None:
        labels = jnp.asarray(labels)
        pack_y = pack(labels)
        pack_x = pack(labels.T)
    else:
        pack_y, pack_x = packs

    src2 = jnp.asarray(src2)
    dirs2 = jnp.asarray(dirs2)
    out_y = kern(
        pack_y, (ny, nx), src2[idx_y], dirs2[idx_y], dx, dy,
        n_materials=n_materials,
    )[:max(n_y, 1)]
    # x-dominant rays march the transposed grid with swapped coordinates
    out_x = kern(
        pack_x, (nx, ny), src2[idx_x][:, ::-1], dirs2[idx_x][:, ::-1],
        dy, dx, n_materials=n_materials,
    )[:max(n_x, 1)]
    cat = jnp.concatenate([out_y[:n_y], out_x[:n_x]], axis=0)
    out = cat[jnp.asarray(inv)]
    return out.reshape(*batch_shape, n_materials)
