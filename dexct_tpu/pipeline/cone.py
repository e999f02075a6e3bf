"""Pack-once fused 3-D cone-beam dual-energy pipeline.

The cone analog of :mod:`dexct_tpu.pipeline.fused`: all host-side
planning (dominant-axis ray partition, per-z-layer label packs,
spectral/decomposition tables, FDK filter responses) happens ONCE in
:func:`pack_cone_dect`; :func:`make_jitted_cone_step` then compiles one
program running trace -> two acquisitions -> Gauss-Newton decomposition
-> multi-volume FDK with no host round-trips (the 2-D pipeline's
BASELINE.json north star, lifted to 3-D).  Circular AND helical orbits
are supported: a :class:`~dexct_tpu.system.geometry.HelicalConeBeamGeometry`
routes the recon stage through the multi-volume generalized-Feldkamp
backprojector (all four volumes in one pass) while every other stage is
orbit-agnostic.  The stateless
:func:`~dexct_tpu.ops.conebeam.simulate_cone_dect` remains the
convenience path; this one is for production loops (sweeps, repeated
scans) where the per-call re-plan/re-pack cost matters (measured 2.9 s
stateless vs ~0.5 s trace kernel).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import matdecomp as md_ops
from ..ops import spectral as sp_ops
from ..ops.conebeam import (
    _fdk_backproject_multi,
    _fdk_pair_ok,
    _helical_pair_ok,
    _trace_cone_dominant,
    build_cone_pack,
    plan_cone_dominant,
)
from ..ops.filters import filter_frequency_response

__all__ = ["ConeDectMeta", "pack_cone_dect", "cone_dect_step",
           "make_jitted_cone_step", "pack_cone_dect_sharded",
           "make_sharded_cone_step"]


class ConeDectMeta(NamedTuple):
    n_materials: int
    n_matrix: int
    nz_out: int
    fov: float
    dz_out: float
    n_iters: int
    dx: float
    dy: float
    dz: float
    labels_shape: tuple  # (nz, ny, nx)
    group: int
    lbits: int
    n_y: int
    n_x: int
    vrc: tuple  # (V, R, C)
    sid: float
    dgamma: float
    row_h: float
    dbeta: float
    fft_len: int
    air1: float
    air2: float
    mu_w1: float
    mu_w2: float
    mask_thresh: float
    noise: str
    fdk_orbit4: bool = False
    gn_warm_nodes: int = 32
    fdk_view_block: int = 8  # with sequenced z-pairs (tools/bench_r3d)
    # z-slab mesh factor: the FDK accumulation (the HBM-dominant state
    # at volumetric scale) splits its output z grid over a second mesh
    # axis; all sinogram-domain stages stay view-sharded/replicated
    n_zslab: int = 1
    # back_project false configs stop after the material sinograms —
    # the FDK stage (the pipeline's dominant cost) is never traced
    do_recon: bool = True
    # bundled-gather tracing (plan_cone_dominant_bundled): bundle size
    # and shared-window word count; 0 = per-ray plan
    bundle: int = 0
    bundle_words: int = 0
    # helical orbit (pitch != 0): the recon stage dispatches to the
    # multi-volume generalized-Feldkamp backprojector with the z grid
    # starting at z0 (the circular FDK grid is z0-free: centered)
    pitch: float = 0.0
    z0: float = 0.0
    helical_weighting: str = "full"


def pack_cone_dect(ct, phantom, spec1, spec2, n_matrix, fov, ramp, *,
                   n_iters=10, nz_out=None, dz_out=None, window="sinc",
                   noise="none", seed=0, group=16, mask_thresh=0.95,
                   do_recon=True, trace_bundle=8, weighting="full",
                   _ray_plan=True, _n_zslab=1):
    """Lower a cone-beam DE scan to ``(arrays, meta)`` for
    :func:`make_jitted_cone_step`.

    Helical geometries (``ct.pitch != 0``) are fully supported: the
    packed dominant-axis tracer takes the helical source positions
    directly, and the recon stage runs the four sinograms through ONE
    multi-volume generalized-Feldkamp backprojection
    (:func:`~dexct_tpu.ops.conebeam._helical_backproject` — all four
    volumes' bilinear taps in one 16-float gather row, the
    window/weight math paid once).  ``nz_out``/``dz_out`` then select a
    z grid CENTERED on the scan's mid-travel z = 0 (default: one slice
    per ``h_iso`` across the central 80% of the source travel, as in
    :func:`~dexct_tpu.ops.conebeam.helical_fdk_reconstruct`);
    ``weighting`` picks the per-voxel view window (see the wrapper's
    study notes).

    Raises ValueError when the packed dominant cone kernel's
    constraints fail (see
    :func:`~dexct_tpu.ops.conebeam.trace_cone_dominant`) — there is no
    silent DDA fallback here; use
    :func:`~dexct_tpu.ops.conebeam.simulate_cone_dect` for odd shapes.
    """
    from ..ops.conebeam import (_fdk_orbit4_ok, validate_cone_dominant,
                                validate_cone_hbm)
    from ..pipeline.api import effective_water_mu

    pitch = float(getattr(ct, "pitch", 0.0))
    helical = abs(pitch) > 1e-12
    if getattr(ct, "flat_panel", False):
        raise ValueError(
            "flat-panel geometries are not supported by the fused "
            "pipeline (its packed FDK assumes equiangular columns); "
            "use simulate_cone_dect, which routes them through "
            "ops.flatpanel.fdk_flat_reconstruct")
    if abs(float(getattr(ct, "tilt", 0.0))) > 1e-12:
        raise ValueError(
            "gantry-tilted geometries are not supported by the fused "
            "pipeline (its packed FDK assumes a z=0 orbit); use "
            "simulate_cone_dect, which routes them through "
            "ops.conebeam.fdk_tilted_reconstruct")
    if getattr(ct, "ffs", "none") != "none":
        raise ValueError(
            "flying-focal-spot geometries are not supported by the "
            "fused circular pipeline (the packed FDK assumes one shared "
            "detector-row grid); use ops.conebeam.simulate_cone_dect, "
            "whose fdk_reconstruct handles ffs='z' exactly"
        )
    labels3 = np.asarray(phantom.labels).astype(np.int32)
    nz, ny, nx = labels3.shape
    dxc, dyc, dzc = float(phantom.dx), float(phantom.dy), float(phantom.dz)
    src, dirs = ct.ray_geometry_3d()
    d = np.asarray(dirs).reshape(-1, 3)
    dom = np.maximum(np.abs(d[:, 0]), np.abs(d[:, 1]))
    max_slope = float(np.max(np.abs(d[:, 2]) / np.maximum(dom, 1e-12)))
    # the single shared capability check (incl. the 512 MiB table guard)
    lb, W = validate_cone_dominant((nz, ny, nx), phantom.n_materials,
                                   dxc, dyc, dzc, max_slope, group)
    z0 = 0.0
    if helical:
        fdk_orbit4 = False  # quarter-turn fold assumes a z=0 orbit
        if nz_out is None:
            # central 80% of the source travel (the ends lack a full
            # 2*pi window) at one slice per detector-row pitch — the
            # helical_fdk_reconstruct default grid, reproduced exactly
            travel = pitch * ct.rotation_total / (2.0 * np.pi)
            half = 0.4 * travel
            nz_eff = max(int(2.0 * half / ct.h_iso), 1)
            dz_eff = 2.0 * half / nz_eff
        else:
            nz_eff = int(nz_out)
            dz_eff = float(ct.h_iso if dz_out is None else dz_out)
        z0 = (0.5 - nz_eff / 2.0) * dz_eff
        nz_out, dz_out = nz_eff, dz_eff
    else:
        fdk_orbit4 = _fdk_orbit4_ok(ct.N_proj, int(n_matrix),
                                    ct.rotation_total)
    if do_recon:  # the guard bounds the FDK volume working set
        validate_cone_hbm(
            int(n_matrix), int(ct.N_rows if nz_out is None else nz_out),
            n_zslab=int(_n_zslab), orbit4=fdk_orbit4)

    labj = jnp.asarray(labels3)

    dtype = jnp.float32
    i0_1 = sp_ops.effective_fluence(spec1, ct)
    i0_2 = sp_ops.effective_fluence(spec2, ct)
    _, dec_i0, dec_mus = md_ops.prepare_decomposition(ct, spec1, spec2)

    V, R, C = ct.N_proj, ct.N_rows, ct.N_channels
    cosg = np.cos(ct.gammas)
    cosk = ct.SID / np.sqrt(ct.SID ** 2 + np.asarray(ct.z_iso) ** 2)
    H, m = filter_frequency_response(C, ct.dgamma, ramp, window, "fan")

    arrays = {
        "mu_t1": jnp.asarray(phantom.materials.mu_table(spec1.E), dtype),
        "mu_t2": jnp.asarray(phantom.materials.mu_table(spec2.E), dtype),
        "i0_1": jnp.asarray(i0_1, dtype),
        "i0_2": jnp.asarray(i0_2, dtype),
        "dec_i0": jnp.asarray(dec_i0, dtype),
        "dec_mus": jnp.asarray(dec_mus, dtype),
        "fdk_w": jnp.asarray(cosg[None, :] * cosk[:, None] * ct.SID,
                             dtype),
        "filt_H": jnp.asarray(H, dtype),
        "betas": jnp.asarray(ct.betas, dtype),
    }
    if helical:
        zv = z0 + dz_out * np.arange(int(nz_out))
        arrays["src_z"] = jnp.asarray(ct.source_z, dtype)
        arrays["row_off"] = jnp.zeros(V, dtype)  # no ffs in fused path
        arrays["beta_c"] = jnp.asarray(
            0.5 * ct.rotation_total + 2.0 * np.pi * zv / pitch, dtype)
    n_y = n_x = 0
    bund = bund_w = 0
    bplan = None
    if _ray_plan and trace_bundle and lb == 3 and min(ny, nx) >= 30:
        from ..ops.conebeam import plan_cone_dominant_bundled

        # the wider shared-window pack must stay under the 512 MiB
        # table guard (validate_cone_dominant checked the default W)
        if 4 * nz * ny * nx * 3 * 2 <= 512 << 20:
            bplan = plan_cone_dominant_bundled(
                np.asarray(src), np.asarray(dirs), (nz, ny, nx),
                dxc, dyc, dzc, lbits=lb, group=int(group),
                bundle=int(trace_bundle))
            if bplan["frac_bundled"] < 0.25:
                bplan = None  # W=3 rows without the count win lose
    if bplan is not None:
        bund, bund_w = int(bplan["bundle"]), int(bplan["words"])
        arrays["pack_y"] = build_cone_pack(labj, group, lb, words=bund_w)
        arrays["pack_x"] = build_cone_pack(labj.transpose(0, 2, 1),
                                           group, lb, words=bund_w)
        src2 = np.asarray(src, np.float32).reshape(-1, 3)
        swap = [1, 0, 2]
        for key, sw in (("y", None), ("x", swap)):
            for kind in ("bun", "rest"):
                sel = bplan[f"{kind}_{key}"]
                ss, dd2 = src2[sel], d[sel].astype(np.float32)
                if sw is not None:
                    ss, dd2 = ss[:, sw], dd2[:, sw]
                arrays[f"src_{kind}_{key}"] = jnp.asarray(ss)
                arrays[f"dirs_{kind}_{key}"] = jnp.asarray(dd2)
        arrays["inv"] = jnp.asarray(bplan["inv"])
    elif _ray_plan:  # per-ray plan (the sharded pack builds per-shard)
        arrays["pack_y"] = build_cone_pack(labj, group, lb)
        arrays["pack_x"] = build_cone_pack(labj.transpose(0, 2, 1),
                                           group, lb)
        idx_y, idx_x, inv, n_y, n_x = plan_cone_dominant(d)
        src2 = np.asarray(src, np.float32).reshape(-1, 3)
        swap = [1, 0, 2]
        arrays.update({
            "src_y": jnp.asarray(src2[idx_y]),
            "dirs_y": jnp.asarray(d[idx_y].astype(np.float32)),
            "src_x": jnp.asarray(src2[idx_x][:, swap]),
            "dirs_x": jnp.asarray(d[idx_x][:, swap].astype(np.float32)),
            "inv": jnp.asarray(inv),
        })
    else:
        arrays["pack_y"] = build_cone_pack(labj, group, lb)
        arrays["pack_x"] = build_cone_pack(labj.transpose(0, 2, 1),
                                           group, lb)
    if noise != "none":
        arrays["noise_key"] = jax.random.PRNGKey(seed)
    if noise == "compound":
        arrays["i2_1"] = jnp.asarray(
            sp_ops.second_moment_fluence(spec1, ct), dtype)
        arrays["i2_2"] = jnp.asarray(
            sp_ops.second_moment_fluence(spec2, ct), dtype)
    meta = ConeDectMeta(
        n_materials=int(phantom.n_materials),
        n_matrix=int(n_matrix),
        nz_out=int(R if nz_out is None else nz_out),
        fov=float(fov),
        dz_out=float(ct.h_iso if dz_out is None else dz_out),
        n_iters=int(n_iters),
        dx=dxc, dy=dyc, dz=dzc,
        labels_shape=(nz, ny, nx),
        group=int(group), lbits=int(lb),
        n_y=int(n_y), n_x=int(n_x),
        vrc=(int(V), int(R), int(C)),
        sid=float(ct.SID), dgamma=float(ct.dgamma),
        row_h=float(ct.h_iso),
        dbeta=float(ct.rotation_total / V),
        fft_len=int(m),
        air1=float(np.sum(i0_1)), air2=float(np.sum(i0_2)),
        mu_w1=float(effective_water_mu(spec1, ct)),
        mu_w2=float(effective_water_mu(spec2, ct)),
        mask_thresh=float(mask_thresh),
        noise=str(noise),
        # quarter-turn FDK orbit fold (round 3): a uniform full-2*pi
        # grid with V % 4 == 0; the sharded paired-quarter layout
        # preserves it per shard (local views = 4 blocks at 90 degrees)
        fdk_orbit4=fdk_orbit4,
        do_recon=bool(do_recon),
        bundle=bund, bundle_words=bund_w,
        pitch=pitch, z0=float(z0),
        helical_weighting=str(weighting),
    )
    return arrays, meta


def _cone_paths(a, meta: ConeDectMeta):
    """Shared packed dominant-axis cone trace of the fused pipelines
    (ray-plan order; unpermute results through ``a["inv"]``) — used by
    :func:`cone_dect_step` and the fused cone PCD step
    (pipeline/spectralct.py)."""
    nz, ny, nx = meta.labels_shape
    if meta.bundle:
        # bundled-gather trace: the four padded outputs concatenate in
        # planner order; the inverse permutation skips the pad rows
        kern = functools.partial(
            _trace_cone_dominant, n_materials=meta.n_materials,
            group=meta.group, lbits=meta.lbits, words=meta.bundle_words)
        return jnp.concatenate([
            kern(a["pack_y"], (nz, ny, nx), a["src_bun_y"],
                 a["dirs_bun_y"], meta.dx, meta.dy, meta.dz,
                 bundle=meta.bundle),
            kern(a["pack_y"], (nz, ny, nx), a["src_rest_y"],
                 a["dirs_rest_y"], meta.dx, meta.dy, meta.dz),
            kern(a["pack_x"], (nz, nx, ny), a["src_bun_x"],
                 a["dirs_bun_x"], meta.dy, meta.dx, meta.dz,
                 bundle=meta.bundle),
            kern(a["pack_x"], (nz, nx, ny), a["src_rest_x"],
                 a["dirs_rest_x"], meta.dy, meta.dx, meta.dz),
        ], axis=0)
    out_y = _trace_cone_dominant(
        a["pack_y"], (nz, ny, nx), a["src_y"], a["dirs_y"],
        meta.dx, meta.dy, meta.dz, n_materials=meta.n_materials,
        group=meta.group, lbits=meta.lbits)
    out_x = _trace_cone_dominant(
        a["pack_x"], (nz, nx, ny), a["src_x"], a["dirs_x"],
        meta.dy, meta.dx, meta.dz, n_materials=meta.n_materials,
        group=meta.group, lbits=meta.lbits)
    return jnp.concatenate([out_y[:meta.n_y], out_x[:meta.n_x]],
                           axis=0)


def cone_reconstruct_stack(sinos, a, meta: ConeDectMeta, axis_name=None,
                           zslab_axis=None):
    """Filter + backproject a ``[K, V, R, C]`` sinogram stack through
    the fused cone pipeline's recon stage (packed circular FDK or
    multi-volume helical gFDK, z-slab aware) -> ``[K, nz, N, N]`` —
    the block shared by :func:`cone_dect_step` and the fused cone PCD
    (pipeline/spectralct.py)."""
    V, R, C = meta.vrc
    qs = sinos * a["fdk_w"][None, None]
    spec = jnp.fft.rfft(qs, n=meta.fft_len, axis=-1)
    qs = jnp.fft.irfft(spec * a["filt_H"], n=meta.fft_len,
                       axis=-1)[..., :C] * meta.dgamma
    nz_local = meta.nz_out
    if abs(meta.pitch) > 1e-12:
        from ..ops.conebeam import _helical_backproject

        beta_c = a["beta_c"]
        z0 = meta.z0
        if zslab_axis is not None and meta.n_zslab > 1:
            nz_local = meta.nz_out // meta.n_zslab
            jz = jax.lax.axis_index(zslab_axis)
            beta_c = jax.lax.dynamic_slice(
                beta_c, (jz * nz_local,), (nz_local,))
            z0 = (meta.z0
                  + jz.astype(jnp.float32) * nz_local * meta.dz_out)
        # the view-shard psum happens INSIDE (num/den before the
        # coverage normalization), so no volume psum follows
        vols = _helical_backproject(
            qs, a["betas"], a["src_z"], a["row_off"], beta_c,
            meta.sid, meta.dgamma, meta.row_h, R, meta.pitch,
            meta.n_matrix, nz_local, meta.fov, meta.dz_out, z0,
            view_block=meta.fdk_view_block,
            weighting=meta.helical_weighting, axis_name=axis_name,
            pair_mode=_helical_pair_ok(meta.sid, meta.fov,
                                       meta.row_h, meta.dz_out,
                                       nz_local, R),
            dbeta=meta.dbeta)
    else:
        z_center = 0.0
        if zslab_axis is not None and meta.n_zslab > 1:
            nz_local = meta.nz_out // meta.n_zslab
            j = jax.lax.axis_index(zslab_axis).astype(jnp.float32)
            z_center = (nz_local * meta.dz_out
                        * (j - 0.5 * (meta.n_zslab - 1)))
        vols = _fdk_backproject_multi(
            qs, a["betas"], meta.sid, meta.dgamma, meta.row_h, R,
            meta.n_matrix, nz_local, meta.fov, meta.dz_out, meta.dbeta,
            z_center, view_block=meta.fdk_view_block,
            pair_mode=_fdk_pair_ok(meta.sid, meta.fov, meta.row_h,
                                   meta.dz_out, nz_local, R),
            orbit4=meta.fdk_orbit4)
        if axis_name is not None:  # accumulate the view wedges' volumes
            vols = jax.lax.psum(vols, axis_name)
    return vols


def cone_dect_step(arrays, meta: ConeDectMeta, axis_name=None,
                   zslab_axis=None):
    """One fused cone-DE step (pure; jit via
    :func:`make_jitted_cone_step`).

    Under ``shard_map`` (``axis_name`` set), ``meta.vrc`` carries the
    SHARD-LOCAL view count: every stage is view-local except the air
    mask (pmax) and the final volume accumulation (psum) — cone FDK
    needs no halo exchange at all.

    With ``zslab_axis`` set (a second mesh axis of size
    ``meta.n_zslab``), each shard backprojects only its contiguous
    slab of the output z grid (``z_center`` offset into the shared
    kernel) — the volume accumulator, the psum payload, and the
    resident output volumes all shrink by the slab factor, which is
    what lets 512^2 x 64+ x 4-volume scans fit chip HBM (VERDICT
    round-2 item 8).  Sinogram-domain stages are replicated across the
    slab axis (compute duplication, no extra memory)."""
    a = arrays
    V, R, C = meta.vrc
    paths = _cone_paths(a, meta)

    cols = [sp_ops.counts_from_paths(paths, a["mu_t1"], a["i0_1"]),
            sp_ops.counts_from_paths(paths, a["mu_t2"], a["i0_2"])]
    if meta.noise == "compound":  # second-moment tables for EID noise
        cols.append(sp_ops.counts_from_paths(paths, a["mu_t1"],
                                             a["i2_1"]))
        cols.append(sp_ops.counts_from_paths(paths, a["mu_t2"],
                                             a["i2_2"]))
    packed = jnp.stack(cols, axis=-1)[a["inv"]]  # one row-K unpermute
    counts1 = packed[..., 0].reshape(V, R, C)
    counts2 = packed[..., 1].reshape(V, R, C)
    if meta.noise != "none":
        key = a["noise_key"]
        if axis_name is not None:  # distinct noise per view shard
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        k1, k2 = jax.random.split(key)
        v1 = (packed[..., 2].reshape(V, R, C)
              if meta.noise == "compound" else None)
        v2 = (packed[..., 3].reshape(V, R, C)
              if meta.noise == "compound" else None)
        counts1 = sp_ops.sample_noise(k1, counts1, meta.noise, var=v1)
        counts2 = sp_ops.sample_noise(k2, counts2, meta.noise, var=v2)
    log1 = sp_ops.log_sinogram(counts1, meta.air1)
    log2 = sp_ops.log_sinogram(counts2, meta.air2)

    flat = jnp.stack([counts1.reshape(-1), counts2.reshape(-1)])
    ab = md_ops.gauss_newton_solve(
        flat, a["dec_i0"], a["dec_mus"], n_iters=meta.n_iters,
        warm_nodes=meta.gn_warm_nodes)
    cmax = jnp.max(counts1)
    if axis_name is not None:
        cmax = jax.lax.pmax(cmax, axis_name)
    mask = counts1 >= meta.mask_thresh * cmax
    mat1 = jnp.where(mask, 0.0, ab[:, 0].reshape(counts1.shape))
    mat2 = jnp.where(mask, 0.0, ab[:, 1].reshape(counts1.shape))

    if not meta.do_recon:  # forward-projection-only config
        return {
            "sino_raw": (counts1, counts2),
            "sino_log": (log1, log2),
            "mat_sinos": (mat1, mat2),
            "recon_raw": (None, None),
            "recon_HU": (None, None),
            "mat_recons": (None, None),
        }
    vols = cone_reconstruct_stack(
        jnp.stack([log1, log2, mat1, mat2]), a, meta,
        axis_name=axis_name, zslab_axis=zslab_axis)
    hu1 = 1000.0 * (vols[0] - meta.mu_w1) / meta.mu_w1
    hu2 = 1000.0 * (vols[1] - meta.mu_w2) / meta.mu_w2
    return {
        "sino_raw": (counts1, counts2),
        "sino_log": (log1, log2),
        "mat_sinos": (mat1, mat2),
        "recon_raw": (vols[0], vols[1]),
        "recon_HU": (hu1, hu2),
        "mat_recons": (vols[2], vols[3]),
    }


def make_jitted_cone_step(meta: ConeDectMeta):
    """jit of :func:`cone_dect_step` with the meta closed over."""
    return jax.jit(functools.partial(cone_dect_step, meta=meta))


def pack_cone_dect_sharded(ct, phantom, spec1, spec2, n_matrix, fov,
                           ramp, *, n_devices, n_zslab=1, **pack_kw):
    """Shard the fused cone pipeline over the ``views`` mesh axis.

    Cone FDK needs NO halo exchange: every stage is view-local, so the
    only collectives are a pmax (air mask) and one psum of the four
    partial volumes.  View balance uses the paired-quarter layout
    (each shard owns four 90°-rotated view blocks, so its y/x-dominant
    ray split is even — ``parallel/halo.py``); requires
    ``N_proj % (4*n_devices) == 0`` and a full 2π orbit.

    Returns ``(arrays, meta, view_perm)``: run via
    :func:`make_sharded_cone_step`; sinogram-shaped outputs come back
    in permuted view order — reorder with ``np.argsort(view_perm)``.
    """
    from ..parallel.halo import _dominant_plans_sharded

    D = int(n_devices)
    base_arrays, meta = pack_cone_dect(ct, phantom, spec1, spec2,
                                       n_matrix, fov, ramp,
                                       _ray_plan=False,
                                       _n_zslab=int(n_zslab), **pack_kw)
    if int(n_zslab) > 1:
        if meta.nz_out % int(n_zslab):
            raise ValueError(
                f"nz_out={meta.nz_out} not divisible by "
                f"n_zslab={n_zslab}")
        meta = meta._replace(n_zslab=int(n_zslab))
    V, R, C = meta.vrc
    if V % (4 * D):
        raise ValueError(
            f"sharded cone pipeline needs N_proj % (4*D) == 0 "
            f"(got {V} % {4 * D})")
    if abs(ct.rotation_total - 2.0 * np.pi) > 1e-3:
        raise ValueError("paired-quarter sharding needs a 2*pi orbit")

    vq = V // (4 * D)
    i_ix, b_ix, k_ix = np.meshgrid(np.arange(D), np.arange(4),
                                   np.arange(vq), indexing="ij")
    view_perm = (b_ix * (V // 4) + i_ix * vq + k_ix).reshape(-1)

    src, dirs = ct.ray_geometry_3d()
    srcp = np.asarray(src, np.float32)[view_perm].reshape(-1, 3)
    dirp = np.asarray(dirs, np.float32)[view_perm].reshape(-1, 3)
    idx_y, idx_x, inv, py, px, pad_factor = _dominant_plans_sharded(
        dirp[:, :2], D)
    rs = dirp.shape[0] // D
    # shard-local ray ids -> global rows of the permuted ray list
    shard_of_y = np.repeat(np.arange(D), py)
    shard_of_x = np.repeat(np.arange(D), px)
    gy = shard_of_y * rs + idx_y
    gx = shard_of_x * rs + idx_x
    swap = [1, 0, 2]

    arrays = dict(base_arrays)
    arrays.update({
        "src_y": jnp.asarray(srcp[gy]),
        "dirs_y": jnp.asarray(dirp[gy]),
        "src_x": jnp.asarray(srcp[gx][:, swap]),
        "dirs_x": jnp.asarray(dirp[gx][:, swap]),
        "inv": jnp.asarray(inv),
        "betas": jnp.asarray(np.asarray(ct.betas)[view_perm], jnp.float32),
    })
    if abs(meta.pitch) > 1e-12:  # per-view helical arrays follow the
        #                           paired-quarter view permutation
        arrays["src_z"] = jnp.asarray(
            np.asarray(ct.source_z)[view_perm], jnp.float32)
        arrays["row_off"] = jnp.zeros(V, jnp.float32)
        # the slice-windowed gFDK scan requires every view block to be
        # CONTIGUOUS in beta; a shard's views are four contiguous
        # quarter-runs of length vq, so the block size must divide vq
        vb = int(meta.fdk_view_block)
        while vq % vb:
            vb -= 1
        meta = meta._replace(fdk_view_block=max(1, vb))
    meta = meta._replace(vrc=(V // D, R, C), n_y=int(py), n_x=int(px))
    return arrays, meta, view_perm


_CONE_VIEW_SHARDED = ("src_y", "dirs_y", "src_x", "dirs_x", "inv",
                      "betas", "src_z", "row_off")


def make_sharded_cone_step(mesh, meta: ConeDectMeta, arrays_keys,
                           axis="views", zslab_axis=None):
    """jitted shard_map of :func:`cone_dect_step` over ``axis`` (and,
    when ``meta.n_zslab > 1``, the ``zslab_axis`` of the composite
    views x zslab mesh: volumes come back z-sharded over it)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    in_specs = {k: (P(axis) if k in _CONE_VIEW_SHARDED else P())
                for k in arrays_keys}
    zs = zslab_axis if (zslab_axis is not None and meta.n_zslab > 1) \
        else None
    vol_spec = P(zs) if zs else P()
    out_specs = {
        "sino_raw": (P(axis), P(axis)),
        "sino_log": (P(axis), P(axis)),
        "mat_sinos": (P(axis), P(axis)),
        "recon_raw": (vol_spec, vol_spec),
        "recon_HU": (vol_spec, vol_spec),
        "mat_recons": (vol_spec, vol_spec),
    }
    body = functools.partial(cone_dect_step, meta=meta, axis_name=axis,
                             zslab_axis=zs)
    mapped = shard_map(body, mesh=mesh, in_specs=(in_specs,),
                       out_specs=out_specs, check_vma=False)
    return jax.jit(mapped)
