"""View-sharded iterative reconstruction (SURVEY §2.7, VERDICT r3 item 4).

The FBP family has sharded the view axis since round 2
(:mod:`dexct_tpu.parallel.sharded`); this module extends the SAME
obligation — all-reduce of partial backprojection accumulations, no host
round-trips between views — to the statistical-reconstruction family:

* :func:`sharded_pwls_recon` / :func:`sharded_cg_recon` — 2-D PWLS /
  CG-least-squares on the Fourier-slice operator.  Each device holds a
  wedge of views (its slice of the plan's ``fan_idx``/``fan_w`` fan
  resampling tables plus the matching sinogram/weight rows) and the
  replicated spectrum tables; every A^T-product inside the solver psums
  over the ``views`` axis (:mod:`dexct_tpu.ops.iterative` ``axis_name``).
  The image iterates, step sizes, and penalties are replicated, so the
  CG/FISTA scalars need no collectives — one psum per operator
  application is the ONLY communication, and its payload is one image.
* :func:`sharded_cone_pwls_recon` — the 3-D analog over the exact
  3-D Siddon operator: ``src``/``dirs``/``counts`` shard on views, the
  volume iterate replicates, one volume psum per gradient step.
* :func:`sharded_onestep_recon` — one-step spectral MBIR: multi-bin
  counts [M, V, C] shard on the VIEW axis; the Poisson-WLS data gradient
  psums, the Huber penalty on the replicated basis images is device-local
  (:mod:`dexct_tpu.ops.onestep` ``axis_name``).

Exactness: sharded == single-device to float tolerance (the psum'd
normal-equation products are the same sums in a different order) —
pinned by tests/test_parallel_recon.py and exercised in
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.iterative import _cg, _pwls_fista, pwls_weights

__all__ = ["sharded_pwls_recon", "sharded_cg_recon",
           "sharded_cone_pwls_recon", "sharded_onestep_recon"]


def _check_views(V, mesh, axis):
    D = int(mesh.shape[axis])
    if V % D:
        raise ValueError(f"N_proj={V} not divisible by mesh axis "
                         f"{axis!r}={D}")
    return D


def _fan_tables(plan, view_shape):
    """The plan's per-view fan tables as [V, C*4] (lane-flattened taps —
    a resident trailing dim of 4 pads to the 128-lane tile, CLAUDE.md)."""
    V, C = view_shape
    return (plan.fan_idx.reshape(V, C * 4), plan.fan_w.reshape(V, C * 4))


_PLAN_REPS = ("deapod", "slice_idx", "slice_w", "phase_cos", "phase_sin")


def _local_apply(plan, fi, fw, vloc, C):
    """LOCAL view-wedge projection operator from sharded fan tables +
    replicated spectrum tables (all traced inside shard_map)."""
    from ..ops.fourier import fourier_project_images

    lplan = dataclasses.replace(plan, fan_idx=fi.reshape(-1, 4),
                                fan_w=fw.reshape(-1, 4))

    def apply_fn(img):
        return fourier_project_images(lplan, img[None], (vloc, C))[..., 0]

    return apply_fn


def sharded_pwls_recon(mesh, plan, sino_log, counts, view_shape, *,
                       n_iters=60, beta=1e-3, delta=5e-3, nonneg=True,
                       x0=None, power_iters=12, sigma_e=0.0,
                       var_ratio=1.0, axis="views"):
    """View-sharded :func:`~dexct_tpu.ops.iterative.pwls_recon`.

    Same arguments after the leading ``mesh``; returns the replicated
    [N, N] image.  The PWLS weights are normalized on the FULL sinogram
    before sharding (the solver's scale-free ``beta`` depends on it).
    """
    V, C = view_shape
    D = _check_views(V, mesh, axis)
    y = jnp.asarray(sino_log, jnp.float32)
    w = pwls_weights(counts, sigma_e=sigma_e, var_ratio=var_ratio)
    if x0 is None:
        x0 = jnp.zeros((plan.n_img, plan.n_img), jnp.float32)
    fi, fw = _fan_tables(plan, view_shape)
    reps = tuple(getattr(plan, k) for k in _PLAN_REPS)

    def body(fi, fw, y_l, w_l, x0, *reps):
        lplan = dataclasses.replace(plan, **dict(zip(_PLAN_REPS, reps)))
        apply_fn = _local_apply(lplan, fi, fw, V // D, C)
        return _pwls_fista(apply_fn, y_l, w_l, x0, int(n_iters),
                           float(beta), float(delta), bool(nonneg),
                           int(power_iters), axis_name=axis)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(axis),) * 4 + (P(),) * (1 + len(reps)),
                  out_specs=P(), check_vma=False)
    return f(fi, fw, y, w, jnp.asarray(x0, jnp.float32), *reps)


def sharded_cg_recon(mesh, plan, sino, view_shape, *, n_iters=30,
                     lam=0.0, x0=None, axis="views"):
    """View-sharded :func:`~dexct_tpu.ops.iterative.cg_recon`.

    Returns (replicated [N, N] image, residual-norm history)."""
    V, C = view_shape
    D = _check_views(V, mesh, axis)
    if x0 is None:
        x0 = jnp.zeros((plan.n_img, plan.n_img), jnp.float32)
    fi, fw = _fan_tables(plan, view_shape)
    reps = tuple(getattr(plan, k) for k in _PLAN_REPS)

    def body(fi, fw, b_l, x0, *reps):
        lplan = dataclasses.replace(plan, **dict(zip(_PLAN_REPS, reps)))
        apply_fn = _local_apply(lplan, fi, fw, V // D, C)
        return _cg(apply_fn, b_l, x0, int(n_iters), float(lam),
                   axis_name=axis)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(axis),) * 3 + (P(),) * (1 + len(reps)),
                  out_specs=(P(), P()), check_vma=False)
    return f(fi, fw, jnp.asarray(sino, jnp.float32),
             jnp.asarray(x0, jnp.float32), *reps)


def sharded_cone_pwls_recon(mesh, sino_log, counts, geometry, vol_shape,
                            voxel, *, n_iters=60, beta=1e-2, delta=5e-3,
                            nonneg=True, x0=None, power_iters=12,
                            sigma_e=0.0, var_ratio=1.0, axis="views"):
    """View-sharded :func:`~dexct_tpu.ops.conebeam.cone_pwls_recon`.

    ``src``/``dirs``/``sino_log``/``counts`` shard on the view axis; the
    [Nz, Ny, Nx] volume iterate replicates, with one volume psum per
    A^T W (.) product.  Returns the replicated volume in cm^-1.
    """
    from ..ops.conebeam import project_volume_3d

    src, dirs = geometry.ray_geometry_3d()
    V = src.shape[0]
    _check_views(V, mesh, axis)
    dx, dy, dz = (float(v) for v in voxel)
    y = jnp.asarray(sino_log, jnp.float32)
    w = pwls_weights(counts, sigma_e=sigma_e, var_ratio=var_ratio)
    if x0 is None:
        x0 = jnp.zeros(tuple(vol_shape), jnp.float32)

    def body(src_l, dirs_l, y_l, w_l, x0):
        def apply_fn(vol):
            return project_volume_3d(vol, src_l, dirs_l, dx, dy, dz)

        return _pwls_fista(apply_fn, y_l, w_l, x0, int(n_iters),
                           float(beta), float(delta), bool(nonneg),
                           int(power_iters), axis_name=axis)

    f = shard_map(body, mesh=mesh, in_specs=(P(axis),) * 4 + (P(),),
                  out_specs=P(), check_vma=False)
    return f(jnp.asarray(src, jnp.float32), jnp.asarray(dirs, jnp.float32),
             y, w, jnp.asarray(x0, jnp.float32))


def sharded_onestep_recon(mesh, counts, ee, i0s, basis, plan, view_shape,
                          *, x0=None, n_iters=300, beta=3e-3, delta=1e-2,
                          lr=2e-3, nonneg=True, dtype=jnp.float32,
                          axis="views"):
    """View-sharded
    :func:`~dexct_tpu.ops.onestep.onestep_spectral_recon` (one-step
    spectral MBIR; translation-motion fits stay single-device — the
    per-view resampler's tables are not yet shard-sliced).

    ``counts`` [M, V, C] shards on the VIEW axis; returns the replicated
    basis-image stack [K, N, N] in g/cm^3.
    """
    from dexct_tpu.physics import xcom

    from ..ops.onestep import _fit, spectral_forward_images

    V, C = view_shape
    D = _check_views(V, mesh, axis)
    counts = jnp.asarray(counts, dtype)
    mus = jnp.asarray(
        np.stack([xcom.mixatten(b.matcomp, np.asarray(ee))
                  for b in basis]), dtype)
    if x0 is None:
        x0 = jnp.zeros((len(basis), plan.n_img, plan.n_img), dtype)
    fi, fw = _fan_tables(plan, view_shape)
    reps = tuple(getattr(plan, k) for k in _PLAN_REPS)

    def body(fi, fw, counts_l, x0, mus, i0s, *reps):
        lplan = dataclasses.replace(
            plan, **dict(zip(_PLAN_REPS, reps)),
            fan_idx=fi.reshape(-1, 4), fan_w=fw.reshape(-1, 4))

        def forward_fn(x, mu_t, i0_t):
            return spectral_forward_images(lplan, x, mu_t, i0_t,
                                           (V // D, C))

        return _fit(forward_fn, counts_l, mus, i0s, x0, int(n_iters),
                    float(beta), float(delta), float(lr), bool(nonneg),
                    axis_name=axis)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(axis), P(axis), P(None, axis))
                  + (P(),) * (3 + len(reps)),
                  out_specs=P(), check_vma=False)
    return f(fi, fw, counts, jnp.asarray(x0, dtype), mus,
             jnp.asarray(i0s, dtype), *reps)
