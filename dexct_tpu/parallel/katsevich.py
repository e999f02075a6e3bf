"""View-sharded Katsevich exact helical reconstruction (SURVEY §2.7).

The last compute family without a sharded path (round-4 VERDICT weak
#4).  The Katsevich chain (:mod:`dexct_tpu.ops.katsevich`) is per-view
local through filtering except the beta stencil's ±2-view support, and
its PI-window backprojection accumulates a full volume per view block —
exactly the all-reduce-of-partial-backprojections shape the FBP, FDK,
and iterative families already shard:

* each device holds a contiguous wedge of helical views (sinogram rows,
  ``betas``, ``src_z``);
* one 2-view halo ``ppermute`` per side feeds the 4th-order beta
  stencil (scan-end shards edge-replicate, matching the unsharded
  pad), so the filtered wedge is bit-compatible with the single-device
  chain;
* the kappa/Hilbert tables (``Wf``, ``Wb``, ``kern_im``, ``cosk``)
  replicate (they are small and view-independent);
* each shard backprojects its wedge over the PI window into the full
  ``[nz, N, N]`` volume and ONE ``psum`` reduces the partials — the
  only collective besides the fixed 4-row halo.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.katsevich import _filter_backproject_chain, _host_prep

__all__ = ["sharded_katsevich_reconstruct"]


def sharded_katsevich_reconstruct(mesh, sino_log, geometry, n_matrix,
                                  fov, *, axis="views", z_out=None,
                                  n_psi=128, view_block=8, taper=None,
                                  interp="linear", deriv="spectral",
                                  ramp=0.8, window="sinc"):
    """Katsevich exact helical FBP, view-sharded over ``mesh[axis]``.

    Same arguments and output as
    :func:`dexct_tpu.ops.katsevich.katsevich_reconstruct` (which see),
    plus the mesh; the result is replicated on every device and equals
    the single-device reconstruction to float tolerance (the psum'd
    volume partials are the same sums in a different order) — pinned in
    tests/test_parallel_recon.py.  Requires ``V % D == 0`` and at least
    2 views per shard (the beta-stencil halo travels one hop).
    """
    V = sino_log.shape[0]
    D = int(mesh.shape[axis])
    if V % D:
        raise ValueError(f"N_proj={V} not divisible by mesh axis "
                         f"{axis!r}={D}")
    if D > 1 and V // D < 2:
        raise ValueError("sharded Katsevich needs >= 2 views per shard")
    arrays, statics = _host_prep(
        sino_log.shape, geometry, n_matrix, fov, z_out=z_out,
        n_psi=n_psi, view_block=view_block, taper=taper, interp=interp,
        deriv=deriv, ramp=ramp, window=window,
        dtype=jnp.result_type(sino_log.dtype, jnp.float32))
    if D == 1:
        return _filter_backproject_chain(
            sino_log.astype(arrays["betas"].dtype), arrays["betas"],
            arrays["src_z"], arrays["Wf"], arrays["Wb"],
            arrays["kern_im"], arrays["cosk"], **statics)

    fwd = [(j, (j + 1) % D) for j in range(D)]
    bwd = [(j, (j - 1) % D) for j in range(D)]

    def body(g, betas_l, src_z_l, Wf, Wb, kern_im, cosk):
        # ±2-view halo for the 4th-order beta stencil; scan-end shards
        # edge-replicate exactly like the unsharded pad2
        prev_tail = jax.lax.ppermute(g[-2:], axis, fwd)
        next_head = jax.lax.ppermute(g[:2], axis, bwd)
        edge = jnp.concatenate([g[:1], g[:1]], 0)
        idx = jax.lax.axis_index(axis)
        lo = jnp.where(idx == 0, edge, prev_tail)
        hi = jnp.where(idx == D - 1,
                       jnp.concatenate([g[-1:], g[-1:]], 0), next_head)
        g_ext = jnp.concatenate([lo, g, hi], 0)
        return _filter_backproject_chain(
            g_ext, betas_l, src_z_l, Wf, Wb, kern_im, cosk, halo=2,
            axis_name=axis, **statics)

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False)
    return jax.jit(mapped)(
        sino_log.astype(arrays["betas"].dtype), arrays["betas"],
        arrays["src_z"], arrays["Wf"], arrays["Wb"], arrays["kern_im"],
        arrays["cosk"])
