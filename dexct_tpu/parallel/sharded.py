"""shard_map'd pipeline: the view axis across a device mesh.

Multi-chip execution model (SURVEY.md §2.7 TPU-native equivalents): each
device traces, forward-models, decomposes, and filters its own wedge of
views; reconstruction backprojects the wedge into a full-size partial image
and a single ``psum`` over the ``views`` axis produces the final image on
every device.  The phantom, LUTs, and filter response are replicated
(they are small); sinogram-shaped arrays are sharded on the view axis.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..pipeline.fused import DectMeta, dect_step

__all__ = ["sharded_dect_step", "shard_arrays"]

_VIEW_SHARDED = ("src", "dirs", "betas", "fp_fan_idx", "fp_fan_w",
                 # parallel-recon θ-line tables shard with the θ wedge
                 "rb_idx", "rb_w", "par_thetas",
                 # per-shard 8-fold orbit tables (parallel/halo.py
                 # plan_sym8_orbits)
                 "sym8_orb_idx", "sym8_orb_th", "sym8_orb_w",
                 # per-shard dominant-axis ray plans (parallel/halo.py),
                 # per-ray and bundled variants
                 "dom_idx_y", "dom_idx_x", "dom_inv",
                 "dom_bun_y", "dom_rest_y", "dom_bun_x", "dom_rest_x")


def _in_specs(arrays, axis="views"):
    """Sharding specs for a packed-arrays pytree: sinogram-view-shaped
    arrays shard on the view axis, everything else replicates."""
    return {
        k: (P(axis) if k in _VIEW_SHARDED else P()) for k in arrays
    }


def _out_specs(axis="views"):
    return {
        "sino_raw": (P(axis), P(axis)),
        "sino_log": (P(axis), P(axis)),
        "mat_sinos": (P(axis), P(axis)),
        "recon_raw": (P(), P()),
        "recon_HU": (P(), P()),
        "mat_recons": (P(), P()),
    }


def shard_arrays(arrays, mesh, axis="views"):
    """Place packed arrays onto the mesh with the pipeline's shardings."""
    from jax.sharding import NamedSharding

    specs = _in_specs(arrays, axis)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in arrays.items()
    }


def sharded_dect_step(mesh, meta: DectMeta, arrays_keys, axis="views"):
    """Build the jitted multi-chip DE step for ``mesh``.

    The returned function maps the packed ``arrays`` pytree (view axis
    sharded over ``axis``) to the :func:`dect_step` output pytree with
    images fully reduced (replicated) and sinograms view-sharded.

    ``arrays_keys``: the keys of the packed arrays dict (the sharding spec
    pytree must match its structure).  Requires
    ``N_proj % mesh.shape[axis] == 0``.

    At ``mesh.shape[axis] == 1`` the body runs WITHOUT an axis name: the
    single shard holds every view, so the collectives are no-ops and the
    full local kernels (8-fold symmetry BP, local rebin) apply — the
    shard_map wrapper then costs nothing (measured
    tools/bench_sharding_tax.py; with the axis name the view-local
    2-fold BP made the D=1 build ~2.9x the unsharded program).
    """
    d = int(mesh.shape[axis])
    body = functools.partial(dect_step, meta=meta,
                             axis_name=axis if d > 1 else None)
    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(_in_specs(dict.fromkeys(arrays_keys), axis),),
        out_specs=_out_specs(axis),
        check_vma=False,
    )
    return jax.jit(mapped)
