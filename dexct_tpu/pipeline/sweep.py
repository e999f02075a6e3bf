"""Batched parameter sweeps: dose / ramp / slice grids in one jit.

BASELINE.json config 5: noise/CNR studies run many simulations over a
parameter grid.  The TPU-native structure exploits what the reference's
outer script loops (SURVEY.md §2.7 "parameter sweeps" axis) cannot:

* the ray trace is dose-independent — ONE projection feeds every dose
  (counts scale linearly with dose, then noise sampling differs);
* the decomposition/reconstruction batch over the sweep axis inside a
  single compiled program (``lax.map`` bounds memory);
* under a ``sweep`` mesh axis each device owns a slice of the grid
  (embarrassingly parallel — the DCN-friendly axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import matdecomp as md_ops
from ..ops import spectral as sp_ops
from .fused import DectMeta, _filter_views

__all__ = ["dose_sweep", "ramp_sweep", "sweep_mesh", "sharded_dose_sweep"]


def _base_counts(arrays, meta):

    a = arrays
    if meta.projector == "fourier":
        from ..ops.fourier import fourier_paths_from_arrays

        paths = fourier_paths_from_arrays(a, a["labels"], meta.fp_meta)
    else:
        from ..ops.siddon import trace_paths

        paths = trace_paths(a["labels"], a["src"], a["dirs"], meta.dx,
                            meta.dy, n_materials=meta.n_materials)
    c1 = sp_ops.counts_from_paths(paths, a["mu_t1"], a["i0_1"])
    c2 = sp_ops.counts_from_paths(paths, a["mu_t2"], a["i0_2"])
    v1 = sp_ops.counts_from_paths(paths, a["mu_t1"], a["i2_1"])
    v2 = sp_ops.counts_from_paths(paths, a["mu_t2"], a["i2_2"])
    return c1, c2, v1, v2


def _recon4(arrays, meta, log1, log2, mat1, mat2, axis_name=None):
    from ..ops.fbp_fast import (
        fan_backproject_multi,
        pack_filtered,
        parallel_backproject_multi,
        rebin_to_parallel,
    )

    a = arrays
    sinos = jnp.stack([log1, log2, mat1, mat2])
    if meta.recon == "parallel":
        n_th, nt, par_t0, par_dt, par_m = meta.par_meta
        if axis_name is not None:
            sinos = jax.lax.all_gather(sinos, axis_name, axis=1,
                                       tiled=True)
        par = rebin_to_parallel(sinos, a["rb_idx"], a["rb_w"], nt)
        qs = _filter_views(par, 1.0, a["par_H"], par_m, par_dt)
        imgs = parallel_backproject_multi(
            pack_filtered(qs), 4, a["par_thetas"], par_t0, par_dt, nt,
            meta.n_matrix, meta.fov, jnp.pi / n_th,
        )
    else:
        qs = _filter_views(sinos, a["cos_w"], a["filt_H"], meta.fft_len,
                           meta.dgamma)
        imgs = fan_backproject_multi(
            pack_filtered(qs), 4, a["betas"], meta.sid, meta.dgamma,
            sinos.shape[-1], meta.n_matrix, meta.fov, meta.dbeta,
        )
    if axis_name is not None:
        imgs = jax.lax.psum(imgs, axis_name)
    return imgs


@functools.partial(jax.jit, static_argnames=("meta", "noise"))
def dose_sweep(arrays, meta: DectMeta, dose_scales, key, *,
               noise="poisson"):
    """Full DE pipeline over a dose grid.

    dose_scales: [K] multipliers applied to BOTH spectra's fluence
    (relative to the doses baked into the packed arrays).
    Returns dict with per-dose stacks: recon_HU [K, 2, N, N],
    mat_recons [K, 2, N, N], mat_sinos [K, 2, V, C].
    """
    keys = jax.random.split(key, dose_scales.shape[0])
    return _sweep_body(arrays, meta, dose_scales, keys, noise)


@functools.partial(jax.jit, static_argnames=("meta", "window"))
def ramp_sweep(arrays, meta: DectMeta, ramps_H, *, window="sinc"):
    """Reconstruction-filter sweep sharing one acquisition+decomposition.

    ramps_H: [K, H] stack of precomputed filter responses (same fft grid).
    Returns recon_HU [K, 2, N, N] for spectrum-1/2 images.
    """
    from ..ops.fbp import hu_image
    from ..ops.fbp_fast import fan_backproject_multi, pack_filtered

    c1, c2, _, _ = _base_counts(arrays, meta)
    log1 = sp_ops.log_sinogram(c1, meta.air1)
    log2 = sp_ops.log_sinogram(c2, meta.air2)
    sinos = jnp.stack([log1, log2])

    def one(H):
        qs = _filter_views(sinos, arrays["cos_w"], H, meta.fft_len,
                           meta.dgamma)
        imgs = fan_backproject_multi(
            pack_filtered(qs), 2, arrays["betas"], meta.sid, meta.dgamma,
            sinos.shape[-1], meta.n_matrix, meta.fov, meta.dbeta,
        )
        return jnp.stack([hu_image(imgs[0], meta.mu_w1),
                          hu_image(imgs[1], meta.mu_w2)])

    return jax.lax.map(one, ramps_H)


@functools.partial(jax.jit, static_argnames=("meta",))
def slice_sweep(arrays, meta: DectMeta, labels_zyx):
    """Full DE pipeline over the slices of a multi-slice phantom.

    labels_zyx: [Z, N, N] label volume (e.g. ``phantom.labels``).  Every
    slice shares the geometry/spectra tables; returns the
    :func:`~dexct_tpu.pipeline.fused.dect_step` output pytree with a
    leading Z axis.
    """
    from .fused import dect_step

    def one(lab):
        return dect_step(dict(arrays, labels=lab), meta)

    return jax.lax.map(one, labels_zyx)


def sweep_mesh(n=None):
    """A 1-D ``sweep`` mesh (the embarrassingly parallel / DCN axis)."""
    from ..parallel.mesh import make_mesh

    devices = jax.devices() if n is None else jax.devices()[:n]
    return make_mesh((len(devices),), ("sweep",), devices)


def sharded_dose_sweep(mesh, arrays, meta: DectMeta, dose_scales, key, *,
                       noise="poisson"):
    """Shard a dose sweep across a ``sweep`` mesh axis.

    Each device runs its slice of the grid end to end (no collectives —
    this axis scales over DCN).  len(dose_scales) must divide by the mesh
    size.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_sweep = axis_sizes["sweep"]
    k = dose_scales.shape[0]
    if k % n_sweep:
        raise ValueError(
            f"{k} sweep points do not divide the {n_sweep}-way sweep axis"
        )
    keys = jax.random.split(key, k)

    two_d = "views" in mesh.axis_names
    view_axis = "views" if two_d else None
    from ..parallel.sharded import _in_specs

    in_arr_specs = (_in_specs(arrays, "views") if two_d
                    else {name: P() for name in arrays})
    out_view = (None if not two_d else "views")
    mapped = shard_map(
        lambda a, s, kk: _sweep_body(a, meta, s, kk, noise,
                                     view_axis=view_axis),
        mesh=mesh,
        in_specs=(in_arr_specs, P("sweep"), P("sweep")),
        out_specs={
            "recon_HU": P("sweep"),
            "mat_recons": P("sweep"),
            # basis sinograms stay view-sharded on 2-D meshes
            "mat_sinos": P("sweep", None, out_view),
        },
        check_vma=False,
    )
    scales = jax.device_put(dose_scales, NamedSharding(mesh, P("sweep")))
    keys = jax.device_put(keys, NamedSharding(mesh, P("sweep")))
    if two_d:
        from ..parallel.sharded import shard_arrays

        arrays = shard_arrays(arrays, mesh, "views")
    return jax.jit(mapped)(arrays, scales, keys)


def _sweep_body(arrays, meta, scales, keys, noise, view_axis=None):
    """Per-shard dose sweep over pre-split keys.

    view_axis: optional mesh-axis name when the sinogram view dimension is
    ALSO sharded (2-D sweep x views meshes) — noise keys fold in the view
    shard, the air-mask maximum pmaxes, and reconstructions psum.
    """
    c1_base, c2_base, v1_base, v2_base = _base_counts(arrays, meta)

    def one(args):
        s, k = args
        if view_axis is not None:
            k = jax.random.fold_in(k, jax.lax.axis_index(view_axis))
        k1, k2 = jax.random.split(k)
        c1 = sp_ops.sample_noise(k1, c1_base * s, noise, var=v1_base * s)
        c2 = sp_ops.sample_noise(k2, c2_base * s, noise, var=v2_base * s)
        log1 = sp_ops.log_sinogram(c1, meta.air1 * s)
        log2 = sp_ops.log_sinogram(c2, meta.air2 * s)
        flat = jnp.stack([c1.reshape(-1), c2.reshape(-1)])
        ab = md_ops.gauss_newton_solve(
            flat, arrays["dec_i0"] * s, arrays["dec_mus"],
            n_iters=meta.n_iters, pixel_block=meta.pixel_block,
        )
        cmax = jnp.max(c1)
        if view_axis is not None:
            cmax = jax.lax.pmax(cmax, view_axis)
        mask = c1 >= meta.mask_thresh * cmax
        mat1 = jnp.where(mask, 0.0, ab[:, 0].reshape(c1.shape))
        mat2 = jnp.where(mask, 0.0, ab[:, 1].reshape(c1.shape))
        imgs = _recon4(arrays, meta, log1, log2, mat1, mat2,
                       axis_name=view_axis)
        from ..ops.fbp import hu_image

        return {
            "recon_HU": jnp.stack([hu_image(imgs[0], meta.mu_w1),
                                   hu_image(imgs[1], meta.mu_w2)]),
            "mat_recons": imgs[2:4],
            "mat_sinos": jnp.stack([mat1, mat2]),
        }

    return jax.lax.map(one, (scales, keys))
