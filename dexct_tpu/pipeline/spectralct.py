"""One-call spectral photon-counting CT pipeline.

The reference is a two-scan dual-energy simulator (main.py:106-170);
its spectral generalization — ONE scan, one spectrum, M counting bins,
K<=3 basis materials — is assembled here from the framework's existing
pieces: threshold bin fluences (`ops.matdecomp.pcd_bin_fluences`), the
exact projectors, per-bin Beer-Lambert counts on the MXU, optional
pulse pileup (`physics.pileup`) and Poisson counting noise, the
multi-measurement Gauss-Newton decomposition, and per-basis FBP.

Physics ordering: pileup distorts the arriving photon stream, so it is
applied to the EXPECTED per-bin counts; Poisson noise then samples the
recorded events (recorded events of a dead-time process are not
exactly Poisson — the variance is mildly sub-Poissonian at high rho —
but the mean chain is exact and the difference is second-order in
rho).  The correction chain mirrors acquisition in reverse: pileup
inversion on counts, then decomposition.

Typical use::

    res = simulate_pcd_spectral(
        ct, phantom, spec, thresholds=[20, 34, 50, 70],
        basis=(WATER, BONE), n_matrix=256, fov=20.0,
        pileup_tau=2e-5, noise="poisson", key=key)
    res.basis_recons   # [K, N, N] densities [g/cm^3]
    res.vmi(70.0)      # virtual monoenergetic image [1/cm]
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fbp as fbp_ops
from ..ops import spectral as sp_ops
from ..ops.matdecomp import decompose_multibin_grid, pcd_bin_fluences
from ..ops.siddon import material_path_sinogram
from ..physics import xcom
from ..physics.pileup import (apply_pileup_bins, bin_mean_energies,
                              bin_sum_redistribution, correct_pileup_bins)

__all__ = ["SpectralResult", "simulate_pcd_spectral",
           "simulate_pcd_spectral_cone"]


@dataclasses.dataclass
class SpectralResult:
    """Outputs of one spectral PCD acquisition + reconstruction."""

    counts: jnp.ndarray          # [M, V, C] recorded bin counts
    counts_corrected: jnp.ndarray  # [M, V, C] after pileup inversion
    basis_sinos: jnp.ndarray     # [K, V, C] basis line integrals [g/cm^2]
    basis_recons: jnp.ndarray    # [K, N, N] basis densities [g/cm^3]
    air_mask: jnp.ndarray        # [V, C]
    thresholds: np.ndarray       # [M] lower bin edges [keV]
    bin_energies: np.ndarray     # [M] mean detected energy per bin
    basis: tuple                 # K Materials

    def vmi(self, energy_keV):
        """Virtual monoenergetic image [1/cm] at ``energy_keV`` —
        sum_k (mu/rho)_k(E0) * rho_k(x); works for K = 2 or 3."""
        img = jnp.zeros_like(self.basis_recons[0])
        for k, mat in enumerate(self.basis):
            u = float(xcom.mixatten(mat.matcomp,
                                    np.array([float(energy_keV)]))[0])
            img = img + u * self.basis_recons[k]
        return img


def simulate_pcd_spectral(geometry, phantom, spec, thresholds, basis,
                          n_matrix, fov, ramp=0.8, *, window="sinc",
                          n_iters=30, mask_thresh=0.95, noise="none",
                          key=None, pileup_tau=0.0,
                          pileup_model="paralyzable", correct_pileup=True,
                          response=None, paths=None, dtype=jnp.float32,
                          a_bounds=(-20.0, 500.0)):
    """Simulate and reconstruct one multi-bin PCD spectral scan.

    geometry must be photon-counting (``eid=False``) — bin fluences
    weight by eta(E) only.  ``thresholds`` are ascending lower bin
    edges [keV] (last bin open-ended); ``pileup_tau`` is the
    dimensionless resolving-time fraction tau/T_view (0 disables);
    ``noise`` as in :func:`~dexct_tpu.ops.spectral.sample_noise`.
    ``response`` folds a detector spectral-response matrix
    (:func:`~dexct_tpu.physics.pcd_response.pcd_response_matrix`) into
    the bin fluences — used consistently for simulation AND
    decomposition, so it degrades conditioning, not accuracy.
    ``paths`` lets callers reuse a traced material-path sinogram.
    """
    if geometry.eid:
        raise ValueError("spectral PCD pipeline requires eid=False "
                         "(photon-counting response)")
    if len(thresholds) < len(basis):
        raise ValueError(f"{len(basis)} basis materials need >= that "
                         f"many bins (got {len(thresholds)})")
    if response is not None:
        from ..physics.pcd_response import pcd_bin_fluences_realistic

        i0s = pcd_bin_fluences_realistic(geometry, spec, thresholds,
                                         response=response)
    else:
        i0s = pcd_bin_fluences(geometry, spec, thresholds)  # [M, E] f64
    if paths is None:
        paths = material_path_sinogram(phantom, geometry, dtype=dtype)
    mu_table = jnp.asarray(phantom.materials.mu_table(spec.E), dtype)
    # one fused [V*C, E] x [E, M] MXU contraction for all bins
    counts = sp_ops.counts_from_paths(
        paths, mu_table, jnp.asarray(i0s.T, dtype))  # [V, C, M]
    counts = jnp.transpose(counts, (2, 0, 1))  # [M, V, C]

    mean_e = bin_mean_energies(i0s, spec.E)
    if pileup_tau > 0.0:
        s_route = bin_sum_redistribution(thresholds, mean_e)
        counts = apply_pileup_bins(counts, pileup_tau, s_route,
                                   pileup_model)
    if noise != "none":
        if key is None:
            raise ValueError("noise requires a PRNG key")
        counts = sp_ops.sample_noise(key, counts, noise)

    corrected = counts
    if pileup_tau > 0.0 and correct_pileup:
        corrected = correct_pileup_bins(counts, pileup_tau, s_route,
                                        pileup_model)

    mats, mask = decompose_multibin_grid(
        corrected, spec.E, i0s, basis, n_iters=n_iters,
        mask_thresh=mask_thresh, dtype=dtype, a_bounds=a_bounds)
    recons = jnp.stack([
        fbp_ops.fbp_recon(mats[k], geometry, int(n_matrix), float(fov),
                          float(ramp), window, dtype=dtype)[0]
        for k in range(len(basis))
    ])
    return SpectralResult(counts, corrected, mats, recons, mask,
                          np.asarray(thresholds, np.float64), mean_e,
                          tuple(basis))


def simulate_pcd_spectral_cone(geometry, phantom, spec, thresholds, basis,
                               n_matrix, fov, ramp=0.8, *, nz_out=None,
                               dz_out=None, window="sinc", n_iters=30,
                               mask_thresh=0.95, noise="none", key=None,
                               pileup_tau=0.0, pileup_model="paralyzable",
                               correct_pileup=True, response=None,
                               paths=None, dtype=jnp.float32,
                               a_bounds=(-20.0, 500.0), view_block=8):
    """3-D spectral photon-counting cone-beam scan -> basis VOLUMES.

    The cone-beam composition of :func:`simulate_pcd_spectral`: exact
    3-D tracing (`ops.conebeam.cone_material_paths`), per-bin counts on
    the MXU, optional pileup/response/noise exactly as in 2-D (the bin
    axis is the leading batch dim, so every spectral op applies
    unchanged to [M, V, R, C]), multi-bin Gauss-Newton decomposition on
    the flattened ray grid, and one FDK per basis material.

    Returns a :class:`SpectralResult` whose ``basis_sinos`` are
    [K, V, R, C], ``basis_recons`` are volumes [K, nz, N, N], and whose
    ``vmi`` therefore synthesizes monoenergetic VOLUMES.
    """
    from ..ops.conebeam import cone_material_paths, fdk_reconstruct

    if geometry.eid:
        raise ValueError("spectral PCD pipeline requires eid=False")
    if len(thresholds) < len(basis):
        raise ValueError(f"{len(basis)} basis materials need >= that "
                         f"many bins (got {len(thresholds)})")
    if response is not None:
        from ..physics.pcd_response import pcd_bin_fluences_realistic

        i0s = pcd_bin_fluences_realistic(geometry, spec, thresholds,
                                         response=response)
    else:
        i0s = pcd_bin_fluences(geometry, spec, thresholds)
    if paths is None:
        paths = cone_material_paths(phantom, geometry, dtype=dtype)
    mu_table = jnp.asarray(phantom.materials.mu_table(spec.E), dtype)
    counts = sp_ops.counts_from_paths(
        paths, mu_table, jnp.asarray(i0s.T, dtype))  # [V, R, C, M]
    counts = jnp.transpose(counts, (3, 0, 1, 2))  # [M, V, R, C]

    mean_e = bin_mean_energies(i0s, spec.E)
    if pileup_tau > 0.0:
        s_route = bin_sum_redistribution(thresholds, mean_e)
        counts = apply_pileup_bins(counts, pileup_tau, s_route,
                                   pileup_model)
    if noise != "none":
        if key is None:
            raise ValueError("noise requires a PRNG key")
        counts = sp_ops.sample_noise(key, counts, noise)
    corrected = counts
    if pileup_tau > 0.0 and correct_pileup:
        corrected = correct_pileup_bins(counts, pileup_tau, s_route,
                                        pileup_model)

    m, v, r, c = corrected.shape
    mats_flat, mask = decompose_multibin_grid(
        corrected.reshape(m, v, r * c), spec.E, i0s, basis,
        n_iters=n_iters, mask_thresh=mask_thresh, dtype=dtype,
        a_bounds=a_bounds)
    mats = mats_flat.reshape(len(basis), v, r, c)
    recons = jnp.stack([
        fdk_reconstruct(mats[k], geometry, int(n_matrix), float(fov),
                        float(ramp), nz_out=nz_out, dz_out=dz_out,
                        window=window, view_block=view_block)
        for k in range(len(basis))
    ])
    return SpectralResult(counts, corrected, mats, recons,
                          mask.reshape(v, r, c),
                          np.asarray(thresholds, np.float64), mean_e,
                          tuple(basis))


# ---------------------------------------------------------------------------
# Pack-once fused PCD pipeline (round 3): the spectral analog of
# pipeline/fused — one jitted program, the production projector /
# recon kernels, no per-call re-planning.  The stateless
# simulate_pcd_spectral above stays the convenience path (measured
# 15 s/call at protocol scale vs sub-second fused steady-state).
# ---------------------------------------------------------------------------

from typing import NamedTuple  # noqa: E402


class PcdMeta(NamedTuple):
    """Static parameters of a fused PCD step (wraps the DE statics)."""

    base: tuple  # DectMeta (projector/recon/mask statics)
    n_bins: int
    n_basis: int
    n_iters: int
    pileup_tau: float
    pileup_model: str
    correct_pileup: bool
    a_lo: float
    a_hi: float
    noise: str


def pack_pcd_spectral(ct, phantom, spec, thresholds, basis, n_matrix,
                      fov, ramp=0.8, *, n_iters=10,
                      projector="siddon_dominant", recon="parallel",
                      noise="none", seed=0, pileup_tau=0.0,
                      pileup_model="paralyzable", correct_pileup=True,
                      response=None, mask_thresh=0.95,
                      a_bounds=(-20.0, 500.0), **pack_kw):
    """Lower a multi-bin PCD scan to ``(arrays, meta)`` for
    :func:`make_jitted_pcd_step`.

    Reuses :func:`~dexct_tpu.pipeline.fused.pack_dect`'s projector and
    reconstruction planning (exact dominant-axis tracing, rebinned
    symmetry-packed parallel BP), swapping the two DE spectra for M
    threshold-bin fluences and the 2-measurement decomposition tables
    for the multi-bin ones.  ``response``/``pileup_tau`` as in
    :func:`simulate_pcd_spectral`.
    """
    from .fused import pack_dect

    if ct.eid:
        raise ValueError("spectral PCD pipeline requires eid=False "
                         "(photon-counting response)")
    if len(thresholds) < len(basis):
        raise ValueError(f"{len(basis)} basis materials need >= that "
                         f"many bins (got {len(thresholds)})")
    arrays, dmeta = pack_dect(
        ct, phantom, spec, spec, n_matrix, fov, ramp,
        n_iters=n_iters, projector=projector, recon=recon,
        noise="none", mask_thresh=mask_thresh, **pack_kw)
    for k in ("mu_t2", "i0_2", "i2_1", "i2_2", "dec_i0", "dec_mus",
              "noise_key"):
        arrays.pop(k, None)
    if response is not None:
        from ..physics.pcd_response import pcd_bin_fluences_realistic

        i0s = pcd_bin_fluences_realistic(ct, spec, thresholds,
                                         response=response)
    else:
        i0s = pcd_bin_fluences(ct, spec, thresholds)  # [M, E] float64
    mus = np.stack([xcom.mixatten(b.matcomp, np.asarray(spec.E))
                    for b in basis])
    arrays["i0_bins_T"] = jnp.asarray(np.asarray(i0s).T, jnp.float32)
    arrays["dec_i0"] = jnp.asarray(i0s, jnp.float32)
    arrays["dec_mus"] = jnp.asarray(mus, jnp.float32)
    mean_e = bin_mean_energies(i0s, spec.E)
    if pileup_tau > 0.0:
        arrays["pileup_route"] = jnp.asarray(
            bin_sum_redistribution(thresholds, mean_e), jnp.float32)
    if noise != "none":
        if noise == "compound":
            raise ValueError("compound noise is the EID second-moment "
                             "model; PCD bins are Poisson")
        arrays["noise_key"] = jax.random.PRNGKey(seed)
    meta = PcdMeta(
        base=dmeta, n_bins=len(np.asarray(i0s)), n_basis=len(basis),
        n_iters=int(n_iters), pileup_tau=float(pileup_tau),
        pileup_model=str(pileup_model),
        correct_pileup=bool(correct_pileup),
        a_lo=float(a_bounds[0]), a_hi=float(a_bounds[1]),
        noise=str(noise))
    return arrays, meta


def pcd_step(arrays, meta: PcdMeta, axis_name=None):
    """One fused PCD step: trace -> M-bin counts -> (pileup, noise,
    inversion) -> multi-bin GN decomposition -> K basis FBPs, one jit.

    Returns the :class:`SpectralResult` field dict (arrays only —
    thresholds/bin energies/basis live on the pack side)."""
    from .fused import _project_paths, reconstruct_stack

    a = arrays
    bm = meta.base
    M = meta.n_bins
    paths, unperm_all = _project_paths(a, bm, axis_name)
    cb = sp_ops.counts_from_paths(paths, a["mu_t1"], a["i0_bins_T"])
    counts = jnp.stack(unperm_all(*[cb[..., m] for m in range(M)]))
    if meta.pileup_tau > 0.0:
        counts = apply_pileup_bins(counts, meta.pileup_tau,
                                   a["pileup_route"], meta.pileup_model)
    if meta.noise != "none":
        key = a["noise_key"]
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        counts = sp_ops.sample_noise(key, counts, meta.noise)
    corrected = counts
    if meta.pileup_tau > 0.0 and meta.correct_pileup:
        corrected = correct_pileup_bins(counts, meta.pileup_tau,
                                        a["pileup_route"],
                                        meta.pileup_model)

    from ..ops import matdecomp as md_ops

    ab = md_ops.gauss_newton_solve(
        corrected.reshape(M, -1), a["dec_i0"], a["dec_mus"],
        n_iters=meta.n_iters, pixel_block=bm.pixel_block,
        a_bounds=(meta.a_lo, meta.a_hi),
        warm_nodes=bm.gn_warm_nodes)
    cmax = jnp.max(counts[0])
    if axis_name is not None:
        cmax = jax.lax.pmax(cmax, axis_name)
    mask = counts[0] >= bm.mask_thresh * cmax
    mats = jnp.where(mask[None], 0.0,
                     ab.T.reshape(meta.n_basis, *counts.shape[1:]))
    recons = reconstruct_stack(mats, a, bm, axis_name)
    return {
        "counts": counts,
        "counts_corrected": corrected,
        "basis_sinos": mats,
        "basis_recons": recons,
        "air_mask": mask,
    }


def make_jitted_pcd_step(meta: PcdMeta):
    """jit of :func:`pcd_step` with the static meta closed over."""
    import functools

    return jax.jit(functools.partial(pcd_step, meta=meta))


def pack_pcd_spectral_cone(ct, phantom, spec, thresholds, basis,
                           n_matrix, fov, ramp=0.8, *, n_iters=10,
                           noise="none", seed=0, pileup_tau=0.0,
                           pileup_model="paralyzable",
                           correct_pileup=True, response=None,
                           mask_thresh=0.95, a_bounds=(-20.0, 500.0),
                           **pack_kw):
    """Fused cone-beam PCD: lower to ``(arrays, meta)`` for
    :func:`make_jitted_pcd_cone_step`.

    The 3-D analog of :func:`pack_pcd_spectral`, on
    :func:`~dexct_tpu.pipeline.cone.pack_cone_dect`'s packed cone
    tracer and multi-volume FDK/gFDK recon stage (circular AND helical
    orbits).  Returns K basis VOLUMES.
    """
    from .cone import pack_cone_dect

    if ct.eid:
        raise ValueError("spectral PCD pipeline requires eid=False "
                         "(photon-counting response)")
    if len(thresholds) < len(basis):
        raise ValueError(f"{len(basis)} basis materials need >= that "
                         f"many bins (got {len(thresholds)})")
    arrays, cmeta = pack_cone_dect(
        ct, phantom, spec, spec, n_matrix, fov, ramp, n_iters=n_iters,
        noise="none", mask_thresh=mask_thresh, **pack_kw)
    for k in ("mu_t2", "i0_2", "i2_1", "i2_2", "dec_i0", "dec_mus",
              "noise_key"):
        arrays.pop(k, None)
    if response is not None:
        from ..physics.pcd_response import pcd_bin_fluences_realistic

        i0s = pcd_bin_fluences_realistic(ct, spec, thresholds,
                                         response=response)
    else:
        i0s = pcd_bin_fluences(ct, spec, thresholds)
    mus = np.stack([xcom.mixatten(b.matcomp, np.asarray(spec.E))
                    for b in basis])
    arrays["i0_bins_T"] = jnp.asarray(np.asarray(i0s).T, jnp.float32)
    arrays["dec_i0"] = jnp.asarray(i0s, jnp.float32)
    arrays["dec_mus"] = jnp.asarray(mus, jnp.float32)
    if pileup_tau > 0.0:
        arrays["pileup_route"] = jnp.asarray(
            bin_sum_redistribution(
                thresholds, bin_mean_energies(i0s, spec.E)),
            jnp.float32)
    if noise != "none":
        if noise == "compound":
            raise ValueError("compound noise is the EID second-moment "
                             "model; PCD bins are Poisson")
        arrays["noise_key"] = jax.random.PRNGKey(seed)
    meta = PcdMeta(
        base=cmeta, n_bins=len(np.asarray(i0s)), n_basis=len(basis),
        n_iters=int(n_iters), pileup_tau=float(pileup_tau),
        pileup_model=str(pileup_model),
        correct_pileup=bool(correct_pileup),
        a_lo=float(a_bounds[0]), a_hi=float(a_bounds[1]),
        noise=str(noise))
    return arrays, meta


def pcd_cone_step(arrays, meta: PcdMeta, axis_name=None,
                  zslab_axis=None):
    """One fused cone PCD step: packed trace -> M-bin counts ->
    (pileup, noise, inversion) -> multi-bin GN -> K basis volumes."""
    from ..ops import matdecomp as md_ops
    from .cone import _cone_paths, cone_reconstruct_stack

    a = arrays
    cm = meta.base
    V, R, C = cm.vrc
    M = meta.n_bins
    paths = _cone_paths(a, cm)
    cols = sp_ops.counts_from_paths(paths, a["mu_t1"], a["i0_bins_T"])
    packed = cols[a["inv"]]  # one row-M unpermute (the cone DE pattern)
    counts = jnp.moveaxis(packed, -1, 0).reshape(M, V, R, C)
    if meta.pileup_tau > 0.0:
        counts = apply_pileup_bins(counts, meta.pileup_tau,
                                   a["pileup_route"], meta.pileup_model)
    if meta.noise != "none":
        key = a["noise_key"]
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        counts = sp_ops.sample_noise(key, counts, meta.noise)
    corrected = counts
    if meta.pileup_tau > 0.0 and meta.correct_pileup:
        corrected = correct_pileup_bins(counts, meta.pileup_tau,
                                        a["pileup_route"],
                                        meta.pileup_model)
    ab = md_ops.gauss_newton_solve(
        corrected.reshape(M, -1), a["dec_i0"], a["dec_mus"],
        n_iters=meta.n_iters, a_bounds=(meta.a_lo, meta.a_hi),
        warm_nodes=cm.gn_warm_nodes)
    cmax = jnp.max(counts[0])
    if axis_name is not None:
        cmax = jax.lax.pmax(cmax, axis_name)
    mask = counts[0] >= cm.mask_thresh * cmax
    mats = jnp.where(mask[None], 0.0,
                     ab.T.reshape(meta.n_basis, V, R, C))
    recons = cone_reconstruct_stack(mats, a, cm, axis_name=axis_name,
                                    zslab_axis=zslab_axis)
    return {
        "counts": counts,
        "counts_corrected": corrected,
        "basis_sinos": mats,
        "basis_recons": recons,
        "air_mask": mask,
    }


def make_jitted_pcd_cone_step(meta: PcdMeta):
    """jit of :func:`pcd_cone_step` with the static meta closed over."""
    import functools

    return jax.jit(functools.partial(pcd_cone_step, meta=meta))


def pack_pcd_spectral_cone_sharded(ct, phantom, spec, thresholds, basis,
                                   n_matrix, fov, ramp=0.8, *,
                                   n_devices, n_zslab=1, n_iters=10,
                                   noise="none", seed=0,
                                   pileup_tau=0.0,
                                   pileup_model="paralyzable",
                                   correct_pileup=True, response=None,
                                   mask_thresh=0.95,
                                   a_bounds=(-20.0, 500.0), **pack_kw):
    """Shard the fused cone PCD over the ``views`` (× optional
    ``zslab``) mesh axes.

    Same collectives as the sharded cone DE (a pmax for the air mask
    plus the recon stage's volume reduction — no halo); run via
    :func:`make_sharded_pcd_cone_step`.  Returns
    ``(arrays, meta, view_perm)`` — sinogram-shaped outputs come back
    in the paired-quarter view order.
    """
    from .cone import pack_cone_dect_sharded

    if ct.eid:
        raise ValueError("spectral PCD pipeline requires eid=False")
    arrays, cmeta, view_perm = pack_cone_dect_sharded(
        ct, phantom, spec, spec, n_matrix, fov, ramp,
        n_devices=n_devices, n_zslab=n_zslab, n_iters=n_iters,
        noise="none", mask_thresh=mask_thresh, **pack_kw)
    for k in ("mu_t2", "i0_2", "i2_1", "i2_2", "dec_i0", "dec_mus",
              "noise_key"):
        arrays.pop(k, None)
    if response is not None:
        from ..physics.pcd_response import pcd_bin_fluences_realistic

        i0s = pcd_bin_fluences_realistic(ct, spec, thresholds,
                                         response=response)
    else:
        i0s = pcd_bin_fluences(ct, spec, thresholds)
    mus = np.stack([xcom.mixatten(b.matcomp, np.asarray(spec.E))
                    for b in basis])
    arrays["i0_bins_T"] = jnp.asarray(np.asarray(i0s).T, jnp.float32)
    arrays["dec_i0"] = jnp.asarray(i0s, jnp.float32)
    arrays["dec_mus"] = jnp.asarray(mus, jnp.float32)
    if pileup_tau > 0.0:
        arrays["pileup_route"] = jnp.asarray(
            bin_sum_redistribution(
                thresholds, bin_mean_energies(i0s, spec.E)),
            jnp.float32)
    if noise != "none":
        if noise == "compound":
            raise ValueError("PCD bins are Poisson; compound is EID")
        arrays["noise_key"] = jax.random.PRNGKey(seed)
    meta = PcdMeta(
        base=cmeta, n_bins=len(np.asarray(i0s)), n_basis=len(basis),
        n_iters=int(n_iters), pileup_tau=float(pileup_tau),
        pileup_model=str(pileup_model),
        correct_pileup=bool(correct_pileup),
        a_lo=float(a_bounds[0]), a_hi=float(a_bounds[1]),
        noise=str(noise))
    return arrays, meta, view_perm


def make_sharded_pcd_cone_step(mesh, meta: PcdMeta, arrays_keys,
                               axis="views", zslab_axis=None):
    """jitted shard_map of :func:`pcd_cone_step` over ``axis`` (and the
    ``zslab`` axis of a composite mesh when ``meta.base.n_zslab > 1``)."""
    import functools

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .cone import _CONE_VIEW_SHARDED

    cm = meta.base
    in_specs = {k: (P(axis) if k in _CONE_VIEW_SHARDED else P())
                for k in arrays_keys}
    zs = zslab_axis if (zslab_axis is not None and cm.n_zslab > 1) \
        else None
    # basis_recons is the STACK [K, nz, N, N]: the z-slab shard sits on
    # axis 1 (the DE pipeline's per-volume tuples shard their axis 0)
    vol_spec = P(None, zs) if zs else P()
    out_specs = {
        "counts": P(None, axis),
        "counts_corrected": P(None, axis),
        "basis_sinos": P(None, axis),
        "basis_recons": vol_spec,
        "air_mask": P(axis),
    }
    body = functools.partial(pcd_cone_step, meta=meta, axis_name=axis,
                             zslab_axis=zs)
    mapped = shard_map(body, mesh=mesh, in_specs=(in_specs,),
                       out_specs=out_specs, check_vma=False)
    return jax.jit(mapped)


def pack_pcd_spectral_sharded(ct, phantom, spec, thresholds, basis,
                              n_matrix, fov, ramp=0.8, *, n_devices,
                              n_iters=10, projector="siddon_dominant",
                              noise="none", seed=0, pileup_tau=0.0,
                              pileup_model="paralyzable",
                              correct_pileup=True, response=None,
                              mask_thresh=0.95,
                              a_bounds=(-20.0, 500.0), **pack_kw):
    """Shard the 2-D fused PCD over the ``views`` mesh axis.

    Reuses the DE pipeline's sharded pack
    (:func:`~dexct_tpu.parallel.halo.pack_dect_sharded`: paired-quarter
    view layout, ring-halo rebin tables, per-shard dominant-axis ray
    plans) with the PCD spectral tables swapped in.  Returns
    ``(arrays, meta, plan)`` — run via :func:`make_sharded_pcd_step`;
    sinogram outputs come back in the permuted view order
    (``plan.to_natural``).
    """
    from ..parallel.halo import pack_dect_sharded

    if ct.eid:
        raise ValueError("spectral PCD pipeline requires eid=False")
    arrays, dmeta, plan = pack_dect_sharded(
        ct, phantom, spec, spec, n_matrix, fov, ramp,
        n_devices=n_devices, projector=projector, n_iters=n_iters,
        noise="none", mask_thresh=mask_thresh, **pack_kw)
    for k in ("mu_t2", "i0_2", "i2_1", "i2_2", "dec_i0", "dec_mus",
              "noise_key"):
        arrays.pop(k, None)
    if response is not None:
        from ..physics.pcd_response import pcd_bin_fluences_realistic

        i0s = pcd_bin_fluences_realistic(ct, spec, thresholds,
                                         response=response)
    else:
        i0s = pcd_bin_fluences(ct, spec, thresholds)
    mus = np.stack([xcom.mixatten(b.matcomp, np.asarray(spec.E))
                    for b in basis])
    arrays["i0_bins_T"] = jnp.asarray(np.asarray(i0s).T, jnp.float32)
    arrays["dec_i0"] = jnp.asarray(i0s, jnp.float32)
    arrays["dec_mus"] = jnp.asarray(mus, jnp.float32)
    if pileup_tau > 0.0:
        arrays["pileup_route"] = jnp.asarray(
            bin_sum_redistribution(
                thresholds, bin_mean_energies(i0s, spec.E)),
            jnp.float32)
    if noise != "none":
        if noise == "compound":
            raise ValueError("PCD bins are Poisson; compound is EID")
        arrays["noise_key"] = jax.random.PRNGKey(seed)
    meta = PcdMeta(
        base=dmeta, n_bins=len(np.asarray(i0s)), n_basis=len(basis),
        n_iters=int(n_iters), pileup_tau=float(pileup_tau),
        pileup_model=str(pileup_model),
        correct_pileup=bool(correct_pileup),
        a_lo=float(a_bounds[0]), a_hi=float(a_bounds[1]),
        noise=str(noise))
    return arrays, meta, plan


def make_sharded_pcd_step(mesh, meta: PcdMeta, arrays_keys,
                          axis="views"):
    """jitted shard_map of :func:`pcd_step` over the ``views`` axis
    (basis recons come back fully reduced, sinograms view-sharded)."""
    import functools

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.sharded import _in_specs

    out_specs = {
        "counts": P(None, axis),
        "counts_corrected": P(None, axis),
        "basis_sinos": P(None, axis),
        "basis_recons": P(),
        "air_mask": P(axis),
    }
    body = functools.partial(pcd_step, meta=meta, axis_name=axis)
    mapped = shard_map(body, mesh=mesh,
                       in_specs=(_in_specs(
                           dict.fromkeys(arrays_keys), axis),),
                       out_specs=out_specs, check_vma=False)
    return jax.jit(mapped)
