"""Multi-slice (z-stack) batching of the fused DE pipeline.

The reference's ``VoxelPhantom`` carries an Nz-deep label volume but its
driver only ever scans one ``z_index`` slice (params.txt:16,
plots.py:124-126).  Here the slice axis is a first-class vmap batch
(VERDICT.md round-1 item 9): ``pack_zstack`` packs every requested slice,
keeps arrays that are identical across slices un-stacked (geometry, ray
plans, spectra, rebin tables — the bulk of the gather-table footprint),
and ``zstack_step`` vmaps :func:`~dexct_tpu.pipeline.fused.dect_step`
over the per-slice arrays only.  One compiled program reconstructs the
whole stack; XLA batches the trace/GN/BP kernels across slices.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .fused import dect_step, pack_dect

__all__ = ["pack_zstack", "zstack_step", "make_jitted_zstack_step"]


def pack_zstack(ct, phantom, spec1, spec2, n_matrix, fov, ramp, *,
                z_indices=None, **pack_kw):
    """Lower an Nz-slice scan to ``(arrays, meta, in_axes)``.

    z_indices defaults to every slice of the phantom.  Returns the same
    array dict as :func:`pack_dect` with per-slice entries stacked on a
    new leading axis; ``in_axes`` is the matching vmap axis spec (0 for
    stacked keys, None for shared ones).
    """
    zs = list(range(phantom.Nz)) if z_indices is None else list(z_indices)
    if not zs:
        raise ValueError("empty z_indices")
    # Round-5 slice-PAIRED tracing: the dominant ray plan depends only
    # on geometry, so TWO slices' 3-bit labels pack into one gather row
    # (row-2*g*W — at the measured ~256 B width cliff, CLAUDE.md) and
    # the tracer runs OUTSIDE the per-slice vmap, two slices per
    # gather.  Measured at Nz=8/512² on the v5e (tools/bench_zstack.py):
    # per-ray pairs 242 ms/slice, bundled pairs 251, round-3 per-slice
    # default 258 — bit-identical sinograms all three.  The win is
    # bounded by the DECODE floor (~60% of the trace budget repeats per
    # slice; only the gather count halves), so per-ray pairs are the
    # default: the bundled plan's wider shared windows add pack cost
    # without beating the per-ray pair row at this width.
    # ``trace_pairs=False`` restores the round-3 per-slice trace.
    trace_pairs = bool(pack_kw.pop("trace_pairs", True)) and len(zs) > 1
    pack_kw.setdefault("trace_bundle", 0)
    packs = []
    meta = None
    for z in zs:
        ph_z = dataclasses.replace(phantom, z_index=int(z))
        if meta is not None and meta.projector in ("siddon",
                                                   "siddon_dominant"):
            # geometry/spectra/ray plans are slice-independent for the
            # grid projectors — rebuild ONLY the label-derived arrays
            # (the full pack_dect re-runs the host ray planner and
            # spectral prep per slice: ~10 s/slice at headline scale)
            a = dict(packs[0])
            lab = jnp.asarray(ph_z.slice_labels().astype(np.int32))
            a["labels"] = lab
            if meta.projector == "siddon_dominant":
                from ..ops.siddon_fast import (pack_labels_rowwin,
                                               rowwin_lbits,
                                               select_dominant_pack)

                lb = rowwin_lbits(meta.n_materials)
                if meta.fp_meta[0] == "bundled":
                    _, grp, _b, w = meta.fp_meta
                    a["dom_pack_y"] = pack_labels_rowwin(
                        lab, int(grp), lbits=lb, words=int(w))
                    a["dom_pack_x"] = pack_labels_rowwin(
                        lab.T, int(grp), lbits=lb, words=int(w))
                else:
                    ny_l, nx_l = lab.shape
                    pack, _, _g = select_dominant_pack(
                        ny_l, nx_l, meta.n_materials, meta.dx, meta.dy,
                        group=int(meta.fp_meta[2]))
                    a["dom_pack_y"] = pack(lab)
                    a["dom_pack_x"] = pack(lab.T)
            packs.append(a)
            continue
        a, m = pack_dect(ct, ph_z, spec1, spec2, n_matrix, fov, ramp,
                         **pack_kw)
        if meta is not None and m != meta:
            raise ValueError("slices produced differing static meta")
        meta = m
        packs.append(a)
    if meta.projector == "fourier" and len(meta.fp_meta) == 6:
        # force the gather-based Fourier tap path: under the z-chunk
        # lax.map the rolled-copy packed table materializes channel-minor
        # (16 x 512 MB at 512² — OOM; see ops/fourier._radon_from_images)
        meta = meta._replace(fp_meta=meta.fp_meta + (False,))

    arrays, in_axes = {}, {}
    for k in packs[0]:
        vals = [p[k] for p in packs]
        shared = all(
            v.shape == vals[0].shape and v.dtype == vals[0].dtype
            and bool(jnp.all(v == vals[0])) for v in vals[1:]
        )
        if k == "noise_key" and len(zs) > 1:
            # independent noise per slice
            base = vals[0]
            vals = [jax.random.fold_in(base, int(z)) for z in zs]
            shared = False
        if shared:
            arrays[k] = vals[0]
            in_axes[k] = None
        else:
            arrays[k] = jnp.stack(vals)
            in_axes[k] = 0
    if all(ax is None for ax in in_axes.values()):
        # identical slices: still batch over labels so vmap has an axis
        arrays["labels"] = jnp.stack([p["labels"] for p in packs])
        in_axes["labels"] = 0
    bundled = (meta.projector == "siddon_dominant"
               and meta.fp_meta[0] == "bundled")
    # pair packing speaks the rowwin format only: bundled plans, or
    # per-ray plans at group > 8 (grp 8/2 use different pack layouts)
    if trace_pairs and meta.projector == "siddon_dominant" and (
            bundled or meta.fp_meta[2] > 8):
        from ..ops.siddon_fast import (pack_labels_rowwin_multi,
                                       rowwin_lbits)

        if bundled:
            _, grp, _b, w = meta.fp_meta
        else:
            _ny, _nx, grp = meta.fp_meta
            w = None
        lb = rowwin_lbits(meta.n_materials)
        labs = [jnp.asarray(
            dataclasses.replace(phantom, z_index=int(z))
            .slice_labels().astype(np.int32)) for z in zs]
        if len(labs) % 2:  # odd stack: duplicate the last slice; its
            labs.append(labs[-1])  # paths are discarded after the trace
        py, px = [], []
        for p0 in range(0, len(labs), 2):
            pair = labs[p0:p0 + 2]
            py.append(pack_labels_rowwin_multi(
                pair, int(grp), lbits=lb, words=w))
            px.append(pack_labels_rowwin_multi(
                [la.T for la in pair], int(grp), lbits=lb, words=w))
        arrays["dom_pack_pair_y"] = jnp.stack(py)
        arrays["dom_pack_pair_x"] = jnp.stack(px)
        in_axes["dom_pack_pair_y"] = "pair"
        in_axes["dom_pack_pair_x"] = "pair"
        # the per-slice packs are dead weight once paths precompute
        for k in ("dom_pack_y", "dom_pack_x"):
            arrays.pop(k, None)
            in_axes.pop(k, None)
    return arrays, meta, in_axes


def _inject_pair_paths(arrays, meta, in_axes, nz):
    """Run the slice-paired trace (lax.map over pairs, two slices per
    gather) and hand the per-slice ``paths`` to the vmapped step.

    Returns ``(arrays, in_axes)`` with the pair packs consumed; no-op
    when the pack has no pair tables.
    """
    if "dom_pack_pair_y" not in arrays:
        return arrays, in_axes
    import functools

    from ..ops.siddon_fast import _trace_dominant_grp, rowwin_lbits

    a = dict(arrays)
    axes = {k: v for k, v in in_axes.items() if v != "pair"}
    pair_y = a.pop("dom_pack_pair_y")
    pair_x = a.pop("dom_pack_pair_x")
    src2 = a["src"].reshape(-1, 2)
    dirs2 = a["dirs"].reshape(-1, 2)
    lab_shape = tuple(int(s) for s in a["labels"].shape[-2:])
    lb = rowwin_lbits(meta.n_materials)
    if meta.fp_meta[0] == "bundled":
        _, grp, bund, w = meta.fp_meta
        kern = functools.partial(
            _trace_dominant_grp, group=int(grp), lbits=lb,
            words=int(w), n_materials=meta.n_materials, n_slices=2)

        def body(packs):
            py, px = packs
            return jnp.concatenate([
                kern(py, lab_shape, src2[a["dom_bun_y"]],
                     dirs2[a["dom_bun_y"]], meta.dx, meta.dy,
                     bundle=int(bund)),
                kern(py, lab_shape, src2[a["dom_rest_y"]],
                     dirs2[a["dom_rest_y"]], meta.dx, meta.dy),
                kern(px, lab_shape[::-1],
                     src2[a["dom_bun_x"]][:, ::-1],
                     dirs2[a["dom_bun_x"]][:, ::-1], meta.dy, meta.dx,
                     bundle=int(bund)),
                kern(px, lab_shape[::-1],
                     src2[a["dom_rest_x"]][:, ::-1],
                     dirs2[a["dom_rest_x"]][:, ::-1], meta.dy, meta.dx),
            ], axis=0)  # [R_total, 2, M]
    else:
        _ny, _nx, grp = meta.fp_meta
        kern = functools.partial(
            _trace_dominant_grp, group=int(grp), lbits=lb,
            n_materials=meta.n_materials, n_slices=2)

        def body(packs):
            py, px = packs
            out_y = kern(py, lab_shape, src2[a["dom_idx_y"]],
                         dirs2[a["dom_idx_y"]], meta.dx, meta.dy)
            out_x = kern(px, lab_shape[::-1],
                         src2[a["dom_idx_x"]][:, ::-1],
                         dirs2[a["dom_idx_x"]][:, ::-1],
                         meta.dy, meta.dx)
            return jnp.concatenate([out_y[:_ny], out_x[:_nx]], axis=0)

    pp = jax.lax.map(body, (pair_y, pair_x))  # [P, R, 2, M]
    a["paths"] = pp.transpose(0, 2, 1, 3).reshape(
        2 * pp.shape[0], pp.shape[1], pp.shape[3])[:nz]
    axes["paths"] = 0
    return a, axes


def _stack_nz(arrays, in_axes):
    stacked = [v for k, v in arrays.items() if in_axes[k] == 0]
    return int(stacked[0].shape[0]) if stacked else 1


def zstack_step(arrays, meta, in_axes):
    """vmap of the fused DE step over the slice axis.

    Output pytree gains a leading Nz axis on every leaf (sinograms,
    basis sinograms, reconstructions).  Pair-packed stacks
    (``pack_zstack(trace_pairs=True)``) trace two slices per gather
    BEFORE the vmap (:func:`_inject_pair_paths`).
    """
    arrays, in_axes = _inject_pair_paths(arrays, meta, in_axes,
                                         _stack_nz(arrays, in_axes))
    return jax.vmap(lambda a: dect_step(a, meta), in_axes=(in_axes,))(arrays)


def make_jitted_zstack_step(meta, in_axes, z_chunk=None):
    """Jitted z-stack step closed over the static meta/axes.

    ``z_chunk`` bounds the vmap width: slices run in ``lax.map`` groups
    of that size, capping the batched gather working set (a fully
    vmapped 8-deep 512² stack materializes ~27 GB of rebin gather rows —
    beyond one chip's HBM; chunked, memory is flat in Nz at ~z_chunk x
    the single-slice footprint).
    """
    axes_in = dict(in_axes)
    if z_chunk is None:
        return jax.jit(lambda a: zstack_step(a, meta, axes_in))

    def run(arrays):
        a, axes = _inject_pair_paths(arrays, meta, axes_in,
                                     _stack_nz(arrays, axes_in))
        stacked = {k: v for k, v in a.items() if axes[k] == 0}
        shared = {k: v for k, v in a.items() if axes[k] is None}
        nz = next(iter(stacked.values())).shape[0]
        if nz % z_chunk:
            raise ValueError(f"Nz={nz} not divisible by z_chunk={z_chunk}")
        chunked = {
            k: v.reshape((nz // z_chunk, z_chunk) + v.shape[1:])
            for k, v in stacked.items()
        }
        body_axes = {k: (0 if k in stacked else None) for k in a}

        def body(ch):
            ab = {**shared, **ch}
            return jax.vmap(lambda x: dect_step(x, meta),
                            in_axes=(body_axes,))(ab)

        out = jax.lax.map(body, chunked)
        return jax.tree.map(
            lambda x: x.reshape((nz,) + x.shape[2:]), out)

    return jax.jit(run)


def stack_phantom(phantom_2d_fn, Nz, *args, scales=None, name=None, **kw):
    """Build an Nz-deep voxel phantom from a 2-D generator by varying an
    anatomical scale per slice (a stand-in for through-plane anatomy; the
    reference's XCAT volumes are absent from the snapshot, SURVEY.md
    §0.2).

    phantom_2d_fn(*args, **kw) must return a single-slice VoxelPhantom;
    each slice is the base anatomy zoomed by ``scales[z]`` (default: a
    smooth 0.8..1.0 body profile) on the fixed voxel grid, zoomed-out
    regions filling with label 0 (air).
    """
    from ..system.phantom import VoxelPhantom

    if scales is None:
        scales = 0.8 + 0.2 * np.cos(
            np.linspace(-0.6 * np.pi, 0.6 * np.pi, Nz))
    base = phantom_2d_fn(*args, **kw)
    lab0 = np.asarray(base.slice_labels())
    ny, nx = lab0.shape
    slices = []
    for s in np.asarray(scales, np.float64):
        # nearest-neighbor zoom about the grid center; out of range -> air
        iy = np.rint((np.arange(ny) - (ny - 1) / 2.0) / s
                     + (ny - 1) / 2.0).astype(np.int64)
        ix = np.rint((np.arange(nx) - (nx - 1) / 2.0) / s
                     + (nx - 1) / 2.0).astype(np.int64)
        oky = (iy >= 0) & (iy < ny)
        okx = (ix >= 0) & (ix < nx)
        sl = np.zeros_like(lab0)
        sub = lab0[np.clip(iy, 0, ny - 1)[:, None],
                   np.clip(ix, 0, nx - 1)[None, :]]
        sl[np.ix_(oky, okx)] = sub[np.ix_(oky, okx)]
        slices.append(sl)
    labels = np.stack(slices)
    return VoxelPhantom(name or base.name + f"_z{Nz}", labels,
                        base.materials, base.dx, base.dy, base.dz)
