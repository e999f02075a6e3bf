"""Patient dose maps: per-voxel deposited energy from the scan beam.

The reference exists to run *dose studies* — every acquisition is
labeled by its air dose at isocenter (``A_iso`` scaling, main.py:68;
dose-sweep figures plots.py:541-717) — but it never computes where that
dose actually lands.  This module closes the loop: a TPU-native
per-voxel absorbed-dose map for the fan-beam acquisition, plus
CTDI-style summary metrics.

Physics model (documented approximation)
----------------------------------------
Two scoring modes bracket the truth (``scoring=`` on both maps):

**'removed'** (default): the energy a ray loses in a voxel,
``phi(E) * mu(E, x) * E``, is scored *in that voxel*.  Exact
bookkeeping of the energy removed from the primary beam (pairs with
the forward model's Beer-Lambert attenuation, so total deposited ==
total beam energy removed — pinned by a conservation test) and the
right TOTAL for large bodies (most scattered energy reabsorbs), but
locally too peaked: the scattered-photon energy actually re-deposits
spread out.

**'kerma'**: deposition contracts against ``mu_en`` instead
(:meth:`~dexct_tpu.physics.materials.MaterialTable.mu_en_table` —
NIST-water-anchored collision kerma; attenuation keeps ``mu``).  The
textbook primary-beam dose surrogate: exact local dose if every
scattered photon escaped; ``deposited_J`` then reads the kerma
fraction of the removed energy (~0.2-0.4 at CT energies in water).
True dose lies between the modes; a Monte Carlo transport stage is
out of scope.

TPU-native design
-----------------
The naive formulation needs the attenuated fluence at every voxel from
every view — a source->voxel partial line integral, which a Siddon-style
tracer can only produce with scatter writes (10x slower than gathers on
this chip, ROADMAP "rejected levers").  Instead:

1. **Polar resample + cumsum** (per view): sample the K per-material
   occupancy images on a (gamma, r) grid centered on the source
   (bilinear label gathers, VPU one-hot), then a single ``cumsum`` along
   r turns occupancy into *partial material path lengths*
   ``T[gamma, r, K]`` — every source->point integral at once, no
   scatter.
2. **Voxel gather**: each voxel reads its ``(gamma_v, r_v)`` entry of
   ``T`` bilinearly.
3. **MXU spectral stage**: ``exp(-T_vox @ MU) -> [vox, E]`` fluence,
   contracted back against ``MU^T`` for the per-material deposition —
   two matmuls, identical in shape to the forward model's
   (ops/spectral.py), blocked over voxels to bound the [vox, E]
   intermediate.

Only the material axis (K ~ 4-8) is cumsummed, never the energy axis
(E ~ 150-240): the spectral dimension rides the MXU.

Measured on the v5e (512^2 pelvis, 512 views): the kernel is bound by
the polar LABEL gathers, not the spectral matmuls — compressing the
energy axis 4x (``n_energy=32``) moved the wall-clock ~1%, while
bit-packing each bilinear 2x2 label quad into one int32
(:func:`_pack_label_quads`; one gather per sample instead of four, plus
pair-packed partial-path tap rows) took the map from 26.0 s to 8.7 s
with bit-identical output; replacing the per-voxel own-material
``take_along_axis`` with an on-the-fly one-hot contraction (134M scalar
gathers saved, profiled ~1.4 s) plus 4x larger spectral pixel blocks
(fewer lax.map launches and padded block copies) took it to **7.7 s**.
The quarter-turn ORBIT fold (gather all 4 rot90-leg occupancies and
taps in one row, the FDK trick) was built and REJECTED on measurement:
its tap table grows 4x (201 MB, the slow big-table gather regime) and
the fold never beat the plain scan (9.9/8.1 s across packings vs
8.7/7.7 — trailing-leg-axis tables additionally pad 4 -> 128 lanes).  The 3-D scan additionally chunks its views
host-side (``view_chunk``) — dose is additive over views and a single
over-long device program crashes the experimental tunnel's worker
(CLAUDE.md).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["dose_map", "sharded_dose_map", "dose_map_3d", "DoseResult", "beam_energy_removed",
           "beam_energy_removed_3d", "ctdi_metrics", "organ_dose_report",
           "dose_efficiency", "ctdi_vol", "dlp", "dose_z_profile"]

KEV_TO_J = 1.602176634e-16
KEV_PER_G_TO_MGY = KEV_TO_J / 1e-3 * 1e3  # keV/g -> mGy


class DoseResult:
    """Dose map + energy bookkeeping.

    dose_mGy:     [Ny, Nx] absorbed dose in the slice plane [mGy]
    deposited_J:  total energy scored over the 3-D beam [J]
                  (the in-plane map integrated over the r-dependent beam
                  height — the quantity conserved against
                  :func:`beam_energy_removed`)
    """

    def __init__(self, dose_mGy, deposited_J):
        self.dose_mGy = dose_mGy
        self.deposited_J = float(deposited_J)


def _sample_grids(ct, phantom, n_gamma, n_r, oversample):
    """Host-side (gamma, r) sampling grid covering the image disk."""
    nx, ny = phantom.Nx, phantom.Ny
    r_img = 0.5 * float(np.hypot(nx * phantom.dx, ny * phantom.dy))
    r_img = min(r_img, ct.SID * 0.95)  # never reach back to the source
    g_half = min(float(np.arcsin(min(r_img / ct.SID, 1.0))) * 1.02,
                 0.5 * ct.gamma_fan)
    if n_gamma is None:
        n_gamma = int(oversample * max(nx, ny))
    if n_r is None:
        n_r = int(oversample * max(nx, ny))
    gammas = np.linspace(-g_half, g_half, n_gamma)
    r0 = max(ct.SID - r_img, 1e-3)
    r1 = ct.SID + r_img
    rs = np.linspace(r0, r1, n_r)
    return gammas, rs


def _pack_label_quads(labels2d):
    """[ny, nx] uint8-ish labels -> int32 quad pack: word (y, x) holds
    labels (y, x), (y, x+1), (y+1, x), (y+1, x+1) in bits [0:8, 8:16,
    16:24, 24:32] (edge-replicated past the top edges).  One gather per
    bilinear sample instead of four — the dose kernels' polar label
    gathers are their measured bottleneck (the spectral matmul stage is
    NOT: compressing it bought ~1%).  Requires labels < 128 so the top
    byte stays within signed int32."""
    lab = np.asarray(labels2d, np.int64)
    if lab.max() >= 128:
        raise ValueError("quad packing needs labels < 128")
    lx = np.concatenate([lab[:, 1:], lab[:, -1:]], 1)
    ly = np.concatenate([lab[1:], lab[-1:]], 0)
    lyx = np.concatenate([ly[:, 1:], ly[:, -1:]], 1)
    return (lab | (lx << 8) | (ly << 16) | (lyx << 24)).astype(np.int32)


def _pack_label_nines(labels2d):
    """[ny, nx] labels < 8 -> int32 NINE pack: word (y, x) holds the
    3x3 block [y:y+3, x:x+3] at 3 bits per label, bit (r*3 + c)*3
    (edge-replicated past the top edges).

    One word covers the bilinear corners of TWO consecutive polar-r
    samples whenever the r step is < 1 pixel (the default oversample=2
    grid steps ~0.7 px), halving the kernel's dominant gather count —
    measured 7.44 -> 3.88 s on the 512^2/512-view map, bit-identical
    (tools/bench_dose_probe.py; the same stub probe put the polar
    gather at 74% of the kernel)."""
    lab = np.asarray(labels2d, np.int64)
    if lab.max() >= 8:
        raise ValueError("nine packing needs labels < 8")
    ny, nx = lab.shape
    padded = np.pad(lab, ((0, 2), (0, 2)), mode="edge")
    out = np.zeros((ny, nx), np.int64)
    for r in range(3):
        for c in range(3):
            out |= padded[r:r + ny, c:c + nx] << ((r * 3 + c) * 3)
    return out.astype(np.int32)


def _pack_label_nines_zminor(labels3):
    """[nz, ny, nx] labels < 8 -> flat [ny*nx*nz] int32 NINE pack,
    z-MINOR: word ((y*nx + x)*nz + z) holds layer z's 3x3 block
    [y:y+3, x:x+3].  Three consecutive words are the three z layers at
    one (y, x) — so ONE row-3 gather serves all 16 trilinear corner
    decodes of a consecutive-r sample pair in the 3-D dose kernel
    (the 2-D pair trick, :func:`_pack_label_nines`, extended to z)."""
    nz = labels3.shape[0]
    per_layer = np.stack(
        [_pack_label_nines(labels3[k]) for k in range(nz)])  # [nz, ny, nx]
    return np.ascontiguousarray(per_layer.transpose(1, 2, 0)).ravel()



@functools.partial(
    jax.jit,
    static_argnames=("n_mats", "nx", "ny", "pixel_block", "pair_mode",
                     "vox_tap_fold"))
def _dose_accumulate(labq, mu_kE, mu_dep_kE, i0w_E, betas, view_w,
                     gammas, rs, vox_xy, rho_vox, lab_vox, scalars, *,
                     n_mats, nx, ny, pixel_block, pair_mode=False,
                     vox_tap_fold=False):
    """Scan over views; returns (dose [vox] in keV/g, deposited keV).

    labq:    [ny, nx] int32 quad-packed labels
             (:func:`_pack_label_quads`), or NINE-packed
             (:func:`_pack_label_nines`) when ``pair_mode``
    mu_kE:   [K, E] linear attenuation [1/cm]
    i0w_E:   [E] photons-per-channel-per-view * E_keV
    vox_xy:  [vox, 2] world (x, y) of voxel centers
    rho_vox, lab_vox: [L, vox] per-leg voxel density / label
    scalars: (sid, dx, dy, geom_const, gamma_half_fan, h_over_sid, dxdy)
    pair_mode: serve each consecutive-r sample PAIR with one 3x3-block
             gather (requires even n_r, labels < 8, and r step < 1 px —
             the caller checks; bit-identical to the quad path)
    """
    f32 = jnp.float32
    sid, dx_w, dy_w, geom_const, g_half_fan, h_over_sid, dxdy = scalars
    n_g, n_r = gammas.shape[0], rs.shape[0]
    dr = rs[1] - rs[0]
    dg = gammas[1] - gammas[0]
    n_vox = vox_xy.shape[0]
    hi = jax.lax.Precision.HIGHEST
    mat_ids = jnp.arange(n_mats, dtype=jnp.int32)

    def one_view(carry, bw):
        beta, w_view = bw
        dose_acc, edep_acc = carry
        src = sid * jnp.stack([jnp.cos(beta), jnp.sin(beta)])
        # ray directions: -(cos(beta+gamma), sin(beta+gamma)) (CLAUDE.md)
        ang = beta + gammas  # [n_g]
        # sample points [n_g, n_r]
        px = src[0] - jnp.cos(ang)[:, None] * rs[None, :]
        py = src[1] - jnp.sin(ang)[:, None] * rs[None, :]
        # continuous pixel indices (pixel-center convention)
        fx = px / dx_w + (nx / 2 - 0.5)
        fy = py / dy_w + (ny / 2 - 0.5)
        ix0 = jnp.floor(fx).astype(jnp.int32)
        iy0 = jnp.floor(fy).astype(jnp.int32)
        if pair_mode:
            # ONE 3x3-block gather per consecutive-r sample PAIR: the
            # r step is < 1 px, so both samples' bilinear corners span
            # at most 3 cells per axis from the pair's min corner.
            # Flat 1-D indexing throughout — the 2-D advanced-indexing
            # form lowered to a gather running at half the chip's
            # scalar rate (measured, tools/bench_dose_probe.py)
            nh = n_r // 2
            fx2 = fx.reshape(n_g, nh, 2)
            fy2 = fy.reshape(n_g, nh, 2)
            ix0p = ix0.reshape(n_g, nh, 2)
            iy0p = iy0.reshape(n_g, nh, 2)
            ax = jnp.clip(jnp.minimum(ix0p[..., 0], ix0p[..., 1]),
                          0, nx - 3)
            ay = jnp.clip(jnp.minimum(iy0p[..., 0], iy0p[..., 1]),
                          0, ny - 3)
            w9 = labq.reshape(-1)[ay * nx + ax]  # [n_g, nh]
            wx2 = fx2 - ix0p
            wy2 = fy2 - iy0p
            occ = jnp.zeros((n_g, nh, 2, n_mats), f32)
            for ty in (0, 1):
                for tx in (0, 1):
                    iy = iy0p + ty
                    ix = ix0p + tx
                    ok = ((iy >= 0) & (iy < ny) & (ix >= 0) & (ix < nx))
                    sy = jnp.clip(iy - ay[..., None], 0, 2)
                    sx = jnp.clip(ix - ax[..., None], 0, 2)
                    lab = (w9[..., None] >> ((sy * 3 + sx) * 3)) & 7
                    w = ((wy2 if ty else (1.0 - wy2))
                         * (wx2 if tx else (1.0 - wx2))) * ok
                    occ = occ + w[..., None] * (
                        lab[..., None] == mat_ids)
            occ = occ.reshape(n_g, n_r, n_mats)
        else:
            wx = fx - ix0
            wy = fy - iy0
            # ONE quad gather per sample (all legs in the row);
            # per-corner subwords by shift.  Out-of-range bases clamp
            # to a valid quad cell — the in-bounds corners still decode
            # correctly via the offset (off in {-1, 0, +1} at the
            # edges), and truly out-of-bounds corners carry ok=0
            cy = jnp.clip(iy0, 0, ny - 2)
            cx = jnp.clip(ix0, 0, nx - 2)
            offy, offx = iy0 - cy, ix0 - cx
            q = labq.reshape(-1)[cy * nx + cx]  # [n_g, n_r] int32
            occ = jnp.zeros((n_g, n_r, n_mats), f32)
            for ty in (0, 1):
                for tx in (0, 1):
                    iy = iy0 + ty
                    ix = ix0 + tx
                    ok = ((iy >= 0) & (iy < ny) & (ix >= 0) & (ix < nx))
                    sy = jnp.clip(ty + offy, 0, 1)
                    sx = jnp.clip(tx + offx, 0, 1)
                    lab = (q >> ((sy * 2 + sx) * 8)) & 0xFF  # [n_g, n_r]
                    w = ((wy if ty else (1.0 - wy))
                         * (wx if tx else (1.0 - wx))) * ok
                    occ = occ + w[..., None] * (
                        lab[..., None] == mat_ids[None, None, :])
        # partial material paths source -> sample center [cm]
        T = (jnp.cumsum(occ, axis=1) - 0.5 * occ) * dr  # [n_g, n_r, K]
        Tf = T.reshape(n_g * n_r, n_mats)

        # voxel coordinates in the (gamma, r) frame of this view
        rel = vox_xy - src[None, :]  # [vox, 2]
        r_v = jnp.sqrt(rel[:, 0] ** 2 + rel[:, 1] ** 2)
        d0 = -src / sid  # central ray direction
        dotp = (rel[:, 0] * d0[0] + rel[:, 1] * d0[1]) / r_v
        crossp = (d0[0] * rel[:, 1] - d0[1] * rel[:, 0]) / r_v
        g_v = jnp.arctan2(crossp, dotp)
        gi = jnp.clip((g_v - gammas[0]) / dg, 0.0, n_g - 1.001)
        ri = jnp.clip((r_v - rs[0]) / dr, 0.0, n_r - 1.001)
        gi0 = jnp.floor(gi).astype(jnp.int32)
        ri0 = jnp.floor(ri).astype(jnp.int32)
        wg = (gi - gi0)[:, None]
        wr = (ri - ri0)[:, None]
        base = gi0 * n_r + ri0
        # r-adjacent tap rows are contiguous in Tf: pack (row, row+1)
        # side by side so each gamma tap is ONE row-2K gather
        Tp = jnp.concatenate([Tf, jnp.roll(Tf, -1, axis=0)], axis=-1)
        if vox_tap_fold:
            # fold BOTH gamma rows in too: one row-4K gather per voxel
            # (the gather rate is count-bound at these widths)
            Tq = jnp.concatenate([Tp, jnp.roll(Tp, -n_r, axis=0)], -1)
            rows4 = Tq[base]
            lo = rows4[:, :2 * n_mats]
            hi_t = rows4[:, 2 * n_mats:]
        else:
            lo = Tp[base]          # rows (gi0, ri0) | (gi0, ri0+1)
            hi_t = Tp[base + n_r]  # rows (gi0+1, ri0) | (gi0+1, ri0+1)
        t_lo = lo[:, :n_mats] * (1 - wr) + lo[:, n_mats:] * wr
        t_hi = hi_t[:, :n_mats] * (1 - wr) + hi_t[:, n_mats:] * wr
        t_vox = t_lo * (1 - wg) + t_hi * wg  # [vox, K]

        # in-fan gate + inverse-square fluence per unit I0
        in_fan = (jnp.abs(g_v) <= g_half_fan).astype(f32)
        phi0 = geom_const / (r_v * r_v) * in_fan  # photons/cm^2

        def block(args):
            t_b, phi_b, lab_b = args
            att = jnp.exp(-jnp.matmul(t_b, mu_kE, precision=hi))
            w = att * i0w_E[None, :]  # [b, E] photon*keV weight
            c = jnp.matmul(w, mu_dep_kE.T, precision=hi)  # [b, K]
            # own-material pick as an on-the-fly one-hot contraction:
            # a take_along_axis here costs 134M scalar gathers over the
            # scan (profiled ~1.4 s of the 512^2 map); the K compares
            # fuse into the matmul epilogue
            oh = (lab_b[:, None] == mat_ids).astype(t_b.dtype)
            c_own = jnp.sum(c * oh, -1)
            return phi_b * c_own  # keV deposited per cm^3

        nb = -(-n_vox // pixel_block)
        pad = nb * pixel_block - n_vox
        e_vol = jax.lax.map(block, (
            jnp.pad(t_vox, ((0, pad), (0, 0))).reshape(
                nb, pixel_block, n_mats),
            jnp.pad(phi0, (0, pad)).reshape(nb, pixel_block),
            jnp.pad(lab_vox, (0, pad)).reshape(nb, pixel_block),
        )).reshape(-1)[:n_vox]
        dose_acc = dose_acc + w_view * (e_vol / rho_vox)  # keV/g
        # beam-height-weighted 3-D energy integral
        edep_acc = edep_acc + w_view * jnp.sum(
            e_vol * dxdy * (h_over_sid * r_v))
        return (dose_acc, edep_acc), 0.0

    init = (jnp.zeros(n_vox, f32), jnp.zeros((), f32))
    (dose, edep), _ = jax.lax.scan(one_view, init, (betas, view_w))
    return dose, edep


def _dose_energy_grid(phantom, spec, n_energy, scoring="removed"):
    """(mu_kE [K, G], mu_dep_kE [K, G], i0w [G]): the spectral tables of
    the dose matmul stage, optionally compressed to ``n_energy``
    energy-fluence-weighted groups.

    ``mu_kE`` attenuates the fluence; ``mu_dep_kE`` weights the local
    deposition.  ``scoring='removed'`` (the historical model) scores ALL
    removed energy locally (mu_dep = mu — conserves the beam-energy
    integral exactly, but overestimates local dose where scattered
    photons escape); ``scoring='kerma'`` scores collision kerma
    (mu_dep = mu_en via
    :meth:`~dexct_tpu.physics.materials.MaterialTable.mu_en_table` —
    the textbook primary-beam dose surrogate; deposited_J then excludes
    the scattered-photon energy, so it is <= beam_energy_removed by
    the scatter fraction).

    The voxel integrand is ``sum_E i0*dE*E * exp(-T.mu(E)) * w_own(E)``
    — smooth in E away from edges — so grouping bins and evaluating the
    tables at each group's energy-fluence centroid preserves the
    0th/1st moments exactly (the GN warm-compression idea,
    ops/matdecomp.py).  ``n_energy=None`` keeps the native grid."""
    if scoring not in ("removed", "kerma"):
        raise ValueError(f"unknown scoring={scoring!r}")
    i0w_full = np.asarray(spec.I0, np.float64) * spec.bin_widths() \
        * np.asarray(spec.E, np.float64)  # photons * keV
    if not n_energy or n_energy >= len(spec.E):
        e_c, i0w = spec.E, i0w_full
    else:
        e = np.asarray(spec.E, np.float64)
        live = i0w_full > 0
        e_l, w_l = e[live], i0w_full[live]
        edges = np.linspace(e_l.min(), e_l.max(), int(n_energy) + 1)
        idx = np.clip(np.digitize(e_l, edges) - 1, 0, int(n_energy) - 1)
        w_g = np.bincount(idx, weights=w_l, minlength=int(n_energy))
        e_g = np.bincount(idx, weights=w_l * e_l, minlength=int(n_energy))
        keep = w_g > 0
        e_c, i0w = e_g[keep] / w_g[keep], w_g[keep]
    mu = phantom.materials.mu_table(e_c)
    mu_dep = (mu if scoring == "removed"
              else phantom.materials.mu_en_table(e_c))
    return mu, mu_dep, i0w


def dose_map(phantom, ct, spec, *, n_gamma=None, n_r=None, oversample=2,
             views=None, pixel_block=65536, z_index=None, n_energy=None,
             view_weights=None, scoring="removed", vox_tap_fold=True):
    """Absorbed-dose map of a fan-beam acquisition.

    phantom/ct/spec: the standard triplet (the same objects
        ``get_sino`` takes); the spectrum's counts are per channel per
        view, exactly the forward model's convention, so a spectrum
        rescaled for an N-view scan yields the dose of that whole scan.
    oversample: polar sampling density relative to the pixel grid
        (grid is ``oversample * max(Nx, Ny)`` in each polar axis unless
        n_gamma / n_r override it).
    views: optional array of view angles [rad] (default: ``ct.betas``).
    view_weights: optional per-view relative fluence [V] (tube-current
        modulation, pipeline/tcm.py) — each view's deposition scales by its
        weight, so AEC dose savings are measured with the same kernel.
    n_energy: optional energy-fluence-weighted compression of the
        spectral axis (the exp/matmul stage dominates the kernel at
        ~n_vox*E exp per view); 32 groups reproduce the full-grid map
        to <0.5% on the conservation phantoms while cutting the 120 kVp
        grid ~4x.  Default None = exact native grid.

    Returns a :class:`DoseResult`.
    """
    args, statics, shape = _dose_prep(
        phantom, ct, spec, n_gamma=n_gamma, n_r=n_r,
        oversample=oversample, views=views, pixel_block=pixel_block,
        z_index=z_index, n_energy=n_energy, view_weights=view_weights,
        scoring=scoring, vox_tap_fold=vox_tap_fold)
    dose, edep = _dose_accumulate(*args, **statics)
    dose_mGy = np.asarray(dose, np.float64).reshape(shape) \
        * KEV_PER_G_TO_MGY
    return DoseResult(dose_mGy, float(edep) * KEV_TO_J)


def _dose_prep(phantom, ct, spec, *, n_gamma, n_r, oversample, views,
               pixel_block, z_index, n_energy, view_weights, scoring,
               vox_tap_fold):
    """Host prep shared by :func:`dose_map` and :func:`sharded_dose_map`:
    returns (positional device args, static kwargs, image shape) for
    :func:`_dose_accumulate`."""
    labels2d = phantom.slice_labels(z_index).astype(np.int32)
    ny, nx = labels2d.shape
    n_mats = phantom.n_materials
    mu_kE, mu_dep, i0w = _dose_energy_grid(phantom, spec, n_energy,
                                           scoring)
    betas = np.asarray(ct.betas if views is None else views, np.float64)
    gammas, rs = _sample_grids(ct, phantom, n_gamma, n_r, oversample)

    # voxel centers in world coords (CLAUDE.md convention)
    xs = (np.arange(nx) + 0.5 - nx / 2) * phantom.dx
    ys = (np.arange(ny) + 0.5 - ny / 2) * phantom.dy
    vx, vy = np.meshgrid(xs, ys, indexing="xy")
    vox_xy = np.stack([vx.ravel(), vy.ravel()], -1)
    rho = phantom.materials.densities[labels2d].ravel()

    geom_const = ct.SID / (ct.dgamma * ct.h_iso)
    scalars = jnp.asarray(
        [ct.SID, phantom.dx, phantom.dy, geom_const, 0.5 * ct.gamma_fan,
         ct.h_iso / ct.SID, phantom.dx * phantom.dy], jnp.float32)
    # pair mode: one 3x3-block gather serves two consecutive-r samples
    # — eligible whenever the r step stays under a pixel (so a pair's
    # corners fit the block) and the labels fit 3 bits.  (A 5x5 pack
    # serving FOUR samples per row-3 gather was built and REJECTED:
    # 6.52 s vs 4.10 s on the 512^2/512-view map — the per-corner
    # word-select chain costs more than the halved gather count saves;
    # ROADMAP rejected levers.)
    dr_ = float(rs[1] - rs[0])
    pair_mode = (labels2d.max() < 8 and len(rs) % 2 == 0
                 and dr_ <= min(phantom.dx, phantom.dy))
    pack = _pack_label_nines if pair_mode else _pack_label_quads
    args = (
        jnp.asarray(pack(labels2d)),
        jnp.asarray(mu_kE, jnp.float32),
        jnp.asarray(mu_dep, jnp.float32),
        jnp.asarray(i0w, jnp.float32), jnp.asarray(betas, jnp.float32),
        jnp.asarray(np.ones_like(betas) if view_weights is None
                    else np.asarray(view_weights, np.float64),
                    jnp.float32),
        jnp.asarray(gammas, jnp.float32), jnp.asarray(rs, jnp.float32),
        jnp.asarray(vox_xy, jnp.float32),
        jnp.asarray(np.maximum(rho, 1e-12), jnp.float32),
        jnp.asarray(labels2d.ravel()), scalars)
    statics = dict(n_mats=n_mats, nx=nx, ny=ny,
                   pixel_block=int(pixel_block), pair_mode=pair_mode,
                   vox_tap_fold=bool(vox_tap_fold))
    return args, statics, (ny, nx)


def sharded_dose_map(mesh, phantom, ct, spec, *, axis="views",
                     **dose_kw):
    """View-sharded :func:`dose_map`: each device scans its wedge of
    views (dose is additive over views) and ONE psum reduces the
    [vox] map + deposited-energy scalar — the SURVEY §2.7 pattern
    applied to the dose subsystem.  Same arguments/result as
    :func:`dose_map`; requires ``V % mesh.shape[axis] == 0``.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    kw = dict(n_gamma=None, n_r=None, oversample=2, views=None,
              pixel_block=65536, z_index=None, n_energy=None,
              view_weights=None, scoring="removed", vox_tap_fold=True)
    kw.update(dose_kw)
    args, statics, shape = _dose_prep(phantom, ct, spec, **kw)
    D = int(mesh.shape[axis])
    V = args[4].shape[0]
    if V % D:
        raise ValueError(f"views {V} not divisible by mesh {axis}={D}")
    if D == 1:
        dose, edep = _dose_accumulate(*args, **statics)
    else:
        inner = _dose_accumulate.__wrapped__

        def body(*a):
            d, e = inner(*a, **statics)
            return (jax.lax.psum(d, axis), jax.lax.psum(e, axis))

        specs = [P()] * len(args)
        specs[4] = specs[5] = P(axis)  # betas, view weights
        mapped = shard_map(body, mesh=mesh, in_specs=tuple(specs),
                           out_specs=(P(), P()), check_vma=False)
        dose, edep = jax.jit(mapped)(*args)
    dose_mGy = np.asarray(dose, np.float64).reshape(shape) \
        * KEV_PER_G_TO_MGY
    return DoseResult(dose_mGy, float(edep) * KEV_TO_J)


def beam_energy_removed(phantom, ct, spec, *, paths=None):
    """Total beam energy removed by the object over the scan [J].

    Exact forward-model bookkeeping: ``sum_rays sum_E I0 dE E
    (1 - exp(-L))`` using the same exact-Siddon material paths the
    simulation uses — the conservation partner of
    :func:`dose_map`'s ``deposited_J``.
    """
    from .siddon import material_path_sinogram

    if paths is None:
        paths = material_path_sinogram(phantom, ct)
    paths = np.asarray(paths, np.float64)  # [V, C, K]
    mu = phantom.materials.mu_table(spec.E)  # [K, E]
    L = paths @ mu  # [V, C, E]
    i0w = spec.I0 * spec.bin_widths() * spec.E
    removed_keV = float(np.sum((1.0 - np.exp(-L)) @ i0w))
    return removed_keV * KEV_TO_J


def ctdi_metrics(dose_mGy, dx, *, phantom_radius_cm=8.0, roi_radius_cm=0.5,
                 margin_cm=1.0, dy=None):
    """CTDI-style summary of a dose map of a cylindrical phantom.

    Standard weighted CT dose index sampling: a central ROI and four
    peripheral ROIs ``margin_cm`` below the surface, combined as
    ``CTDI_w = (1/3) center + (2/3) mean(periphery)`` (IEC 60601-2-44
    weighting).  Returns ``{"center", "periphery", "ctdi_w"}`` in the
    dose map's units.
    """
    d = np.asarray(dose_mGy, np.float64)
    ny, nx = d.shape[-2], d.shape[-1]
    dy = dx if dy is None else dy
    ys = (np.arange(ny) + 0.5 - ny / 2) * dy
    xs = (np.arange(nx) + 0.5 - nx / 2) * dx
    yy, xx = np.meshgrid(ys, xs, indexing="ij")

    def roi_mean(cy, cx):
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= roi_radius_cm ** 2
        if not np.any(m):
            raise ValueError("ROI contains no pixels; increase roi_radius")
        return float(d[m].mean())

    rp = phantom_radius_cm - margin_cm
    center = roi_mean(0.0, 0.0)
    periph = [roi_mean(rp, 0.0), roi_mean(-rp, 0.0),
              roi_mean(0.0, rp), roi_mean(0.0, -rp)]
    p = float(np.mean(periph))
    return {"center": center, "periphery": p,
            "ctdi_w": center / 3.0 + 2.0 * p / 3.0}


def organ_dose_report(dose_mGy, phantom, *, z_index=None):
    """Per-material dose summary of a labeled phantom.

    Returns ``{material_name: {"mean", "max", "mass_g", "energy_J"}}``
    (mean/max in the map's units; mass and imparted energy assume the
    in-plane map applies over one ``phantom.dz`` of z).  Integral dose
    (energy imparted per organ) is the quantity organ-dose risk models
    start from.
    """
    d = np.asarray(dose_mGy, np.float64)
    labels = phantom.slice_labels(z_index)
    if d.shape != labels.shape:
        raise ValueError(f"dose map {d.shape} vs labels {labels.shape}")
    dv = phantom.dx * phantom.dy * phantom.dz  # cm^3
    rho = phantom.materials.densities
    out = {}
    for k, mat in enumerate(phantom.materials):
        m = labels == k
        if not np.any(m):
            continue
        mass = float(m.sum()) * dv * float(rho[k])  # g
        mean = float(d[m].mean())
        # mean [mGy] = 1e-3 J/kg = 1e-6 J/g
        out[mat.name] = {"mean": mean, "max": float(d[m].max()),
                         "mass_g": mass,
                         "energy_J": mean * 1e-6 * mass}
    return out


def dose_efficiency(d_prime, dose_mGy_ref):
    """Task-based dose efficiency: d'^2 per unit dose.

    The canonical IQ-per-dose figure of merit (detectability d' from
    ``analysis.nps.dprime_*`` scales as sqrt(dose) for quantum-limited
    systems, so d'^2/dose is dose-independent for an ideal system and
    drops when electronic noise, artifacts, or suboptimal weighting
    waste dose).  ``dose_mGy_ref`` is any scalar dose metric held
    consistent across the systems being compared (e.g. ``ctdi_w``).
    """
    if dose_mGy_ref <= 0:
        raise ValueError("reference dose must be positive")
    return float(d_prime) ** 2 / float(dose_mGy_ref)


# ---------------------------------------------------------------------------
# 3-D cone-beam / helical dose
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("n_mats", "nx", "ny", "nz", "pixel_block",
                     "z_window", "pair_mode", "vox_tap_fold"))
def _dose_accumulate_3d(labq3, mu_kE, mu_dep_kE, i0w_E, betas, src_zs,
                        view_w, gammas, ts, rs, vox_xyz, rho_vox,
                        lab_vox, scalars, *, n_mats, nx, ny, nz,
                        pixel_block, z_window=None, pair_mode=False,
                        vox_tap_fold=True):
    """Scan over views; returns (dose [vox] keV/g, deposited keV).

    Rays are parametrized by (gamma, t, r): gamma the in-plane fan
    angle, t = tan(cone angle) = dz per unit in-plane distance, r the
    IN-PLANE distance from the source.  Arc length ds = dr sqrt(1+t^2)
    and perpendicular fluence phi = I0 SID/(dgamma h_iso r^2 cos k)
    make the 3-D energy integral exactly conserve the forward model's
    Beer-Lambert removal (see module docstring).

    scalars: (sid, dx, dy, dz, geom_const, g_half_fan, t_half_beam,
              voxel_volume)

    ``z_window`` (static, slices): a view's collimated beam reaches at
    most |z - z_s| <= max|t| * r_max, a hard zero of ``in_beam`` — so
    with the voxel grid z-major, each view dynamic-slice-updates only
    a ``z_window``-slice slab of the dose vector instead of all nz
    (the gFDK slice-window trick applied to dosimetry; for long
    helical scans the per-view voxel stage becomes O(collimation/dz),
    not O(scan length)).  ``None`` = full scan; results identical.
    """
    f32 = jnp.float32
    (sid, dx_w, dy_w, dz_w, geom_const, g_half_fan, t_half,
     dvol) = scalars
    n_g, n_t, n_r = gammas.shape[0], ts.shape[0], rs.shape[0]
    dr = rs[1] - rs[0]
    dg = gammas[1] - gammas[0]
    dt = ts[1] - ts[0]
    n_vox = vox_xyz.shape[0]
    hi = jax.lax.Precision.HIGHEST
    mat_ids = jnp.arange(n_mats, dtype=jnp.int32)
    sec = jnp.sqrt(1.0 + ts * ts)  # [n_t] 1/cos(cone angle)

    def one_view(carry, bz):
        beta, z_s, w_view = bz
        dose_acc, edep_acc = carry
        src = sid * jnp.stack([jnp.cos(beta), jnp.sin(beta)])
        ang = beta + gammas  # [n_g]
        # sample points [n_g, n_t, n_r]
        px = src[0] - jnp.cos(ang)[:, None, None] * rs[None, None, :]
        py = src[1] - jnp.sin(ang)[:, None, None] * rs[None, None, :]
        pz = z_s + ts[None, :, None] * rs[None, None, :]
        fx = px / dx_w + (nx / 2 - 0.5)
        fy = py / dy_w + (ny / 2 - 0.5)
        fz = pz / dz_w + (nz / 2 - 0.5)
        ix0 = jnp.floor(fx).astype(jnp.int32)
        iy0 = jnp.floor(fy).astype(jnp.int32)
        iz0 = jnp.floor(fz).astype(jnp.int32)
        wx = fx - ix0
        wy = fy - iy0
        wz = fz - iz0
        if pair_mode:
            # ONE row-3 gather per consecutive-r sample PAIR: labq3 is
            # the z-MINOR nine pack (_pack_label_nines_zminor), so the
            # 3 consecutive words at ((ay*nx+ax)*nz+az) are the three
            # bracketing z layers' 3x3 (y, x) blocks — they cover all
            # 16 trilinear corners of the pair (the caller guarantees
            # the r step keeps pair corners within a 3-cell span on
            # every axis).  4x fewer gather issues than the quad path;
            # row-3 gathers cost ~a scalar one (CLAUDE.md rates).
            # fx/fy are [n_g, 1, n_r] and fz is [1, n_t, n_r] (broadcast
            # forms) — reshape only the r axis into pairs and let
            # broadcasting build the full [n_g, n_t, nh, 2] lazily
            nh = n_r // 2
            pair = lambda a: a.reshape(a.shape[:-1] + (nh, 2))  # noqa: E731
            ix0p, iy0p, iz0p = pair(ix0), pair(iy0), pair(iz0)
            wx2, wy2, wz2 = pair(wx), pair(wy), pair(wz)
            ax = jnp.clip(jnp.minimum(ix0p[..., 0], ix0p[..., 1]),
                          0, nx - 3)
            ay = jnp.clip(jnp.minimum(iy0p[..., 0], iy0p[..., 1]),
                          0, ny - 3)
            az = jnp.clip(jnp.minimum(iz0p[..., 0], iz0p[..., 1]),
                          0, nz - 3)
            base = (ay * nx + ax) * nz + az  # [n_g, n_t, nh]
            w3 = jnp.take(labq3, base[..., None]
                          + jnp.arange(3, dtype=jnp.int32),
                          axis=0)  # [n_g, n_t, nh, 3]
            w3_0 = w3[..., 0][..., None]
            w3_1 = w3[..., 1][..., None]
            w3_2 = w3[..., 2][..., None]
            occ = jnp.zeros((n_g, n_t, nh, 2, n_mats), f32)
            for tz in (0, 1):
                iz = iz0p + tz
                ok_z = (iz >= 0) & (iz < nz)
                w_z = (wz2 if tz else (1.0 - wz2)) * ok_z
                sz = jnp.clip(iz - az[..., None], 0, 2)
                word = jnp.where(sz == 0, w3_0,
                                 jnp.where(sz == 1, w3_1, w3_2))
                for ty in (0, 1):
                    for tx in (0, 1):
                        iy = iy0p + ty
                        ix = ix0p + tx
                        ok = ((iy >= 0) & (iy < ny)
                              & (ix >= 0) & (ix < nx))
                        sy = jnp.clip(iy - ay[..., None], 0, 2)
                        sx = jnp.clip(ix - ax[..., None], 0, 2)
                        lab = (word >> ((sy * 3 + sx) * 3)) & 7
                        w = (w_z * (wy2 if ty else (1.0 - wy2))
                             * (wx2 if tx else (1.0 - wx2))) * ok
                        occ = occ + w[..., None] * (
                            lab[..., None] == mat_ids)
            occ = occ.reshape(n_g, n_t, n_r, n_mats)
        else:
            # two quad gathers per sample (one per bracketing z layer)
            # instead of eight scalar ones — see _pack_label_quads
            cy = jnp.clip(iy0, 0, ny - 2)
            cx = jnp.clip(ix0, 0, nx - 2)
            offy, offx = iy0 - cy, ix0 - cx
            occ = jnp.zeros((n_g, n_t, n_r, n_mats), f32)
            for tz in (0, 1):
                iz = iz0 + tz
                q = labq3[jnp.clip(iz, 0, nz - 1), cy, cx]
                ok_z = (iz >= 0) & (iz < nz)
                w_z = (wz if tz else (1.0 - wz)) * ok_z
                for ty in (0, 1):
                    for tx in (0, 1):
                        iy = iy0 + ty
                        ix = ix0 + tx
                        ok = ((iy >= 0) & (iy < ny)
                              & (ix >= 0) & (ix < nx))
                        sy = jnp.clip(ty + offy, 0, 1)
                        sx = jnp.clip(tx + offx, 0, 1)
                        lab = (q >> ((sy * 2 + sx) * 8)) & 0xFF
                        w = (w_z * (wy if ty else (1.0 - wy))
                             * (wx if tx else (1.0 - wx))) * ok
                        occ = occ + w[..., None] * (
                            lab[..., None] == mat_ids[None, None, None, :])
        # partial material paths along ARC length [cm]
        T = ((jnp.cumsum(occ, axis=2) - 0.5 * occ) * dr
             * sec[None, :, None, None])  # [n_g, n_t, n_r, K]
        Tf = T.reshape(n_g * n_t * n_r, n_mats)

        # r-adjacent tap rows are contiguous: pack (row, row+1) so the
        # 8 trilinear taps cost 4 row-2K gathers (see the 2-D kernel)
        Tp = jnp.concatenate([Tf, jnp.roll(Tf, -1, axis=0)], axis=-1)
        sg = n_t * n_r
        if vox_tap_fold:
            # fold all four (gamma, t) tap rows in too: ONE row-8K
            # gather per voxel (32 floats at K=4 — count-bound width;
            # the same lever as the 2-D kernel's row-4K fold)
            Tq = jnp.concatenate(
                [Tp, jnp.roll(Tp, -n_r, axis=0),
                 jnp.roll(Tp, -sg, axis=0),
                 jnp.roll(Tp, -sg - n_r, axis=0)], axis=-1)

        def vox_stage(vox_a, rho_a, lab_a):
            """Per-view energy deposition for a (slab of the) voxel
            grid -> (dose contribution [n_a], deposited keV)."""
            n_a = vox_a.shape[0]
            relx = vox_a[:, 0] - src[0]
            rely = vox_a[:, 1] - src[1]
            r_v = jnp.sqrt(relx * relx + rely * rely)
            d0 = -src / sid
            dotp = (relx * d0[0] + rely * d0[1]) / r_v
            crossp = (d0[0] * rely - d0[1] * relx) / r_v
            g_v = jnp.arctan2(crossp, dotp)
            t_v = (vox_a[:, 2] - z_s) / r_v
            gi = jnp.clip((g_v - gammas[0]) / dg, 0.0, n_g - 1.001)
            ti = jnp.clip((t_v - ts[0]) / dt, 0.0, n_t - 1.001)
            ri = jnp.clip((r_v - rs[0]) / dr, 0.0, n_r - 1.001)
            gi0 = jnp.floor(gi).astype(jnp.int32)
            ti0 = jnp.floor(ti).astype(jnp.int32)
            ri0 = jnp.floor(ri).astype(jnp.int32)
            wg = (gi - gi0)[:, None]
            wt = (ti - ti0)[:, None]
            wr = (ri - ri0)[:, None]
            base = (gi0 * n_t + ti0) * n_r + ri0

            def lerp_r(rows):
                return (rows[:, :n_mats] * (1 - wr)
                        + rows[:, n_mats:] * wr)

            if vox_tap_fold:
                rows8 = Tq[base]
                m2 = 2 * n_mats
                t_vox = (
                    (1 - wg) * ((1 - wt) * lerp_r(rows8[:, :m2])
                                + wt * lerp_r(rows8[:, m2:2 * m2]))
                    + wg * ((1 - wt) * lerp_r(rows8[:, 2 * m2:3 * m2])
                            + wt * lerp_r(rows8[:, 3 * m2:])))
            else:
                t_vox = (
                    (1 - wg) * ((1 - wt) * lerp_r(Tp[base])
                                + wt * lerp_r(Tp[base + n_r]))
                    + wg * ((1 - wt) * lerp_r(Tp[base + sg])
                            + wt * lerp_r(Tp[base + sg + n_r])))  # [n_a, K]

            sec_v = jnp.sqrt(1.0 + t_v * t_v)
            in_beam = ((jnp.abs(g_v) <= g_half_fan)
                       & (jnp.abs(t_v) <= t_half)).astype(f32)
            phi0 = geom_const * sec_v / (r_v * r_v) * in_beam

            def block(args):
                t_b, phi_b, lab_b = args
                att = jnp.exp(-jnp.matmul(t_b, mu_kE, precision=hi))
                w = att * i0w_E[None, :]
                c = jnp.matmul(w, mu_dep_kE.T, precision=hi)
                # one-hot contraction, not take_along_axis (see the 2-D
                # kernel: the scalar gathers profiled ~15% of the map)
                oh = (lab_b[:, None] == mat_ids).astype(t_b.dtype)
                c_own = jnp.sum(c * oh, -1)
                return phi_b * c_own

            pb = min(pixel_block, n_a)
            nb = -(-n_a // pb)
            pad = nb * pb - n_a
            e_vol = jax.lax.map(block, (
                jnp.pad(t_vox, ((0, pad), (0, 0))).reshape(
                    nb, pb, n_mats),
                jnp.pad(phi0, (0, pad)).reshape(nb, pb),
                jnp.pad(lab_a, (0, pad)).reshape(nb, pb),
            )).reshape(-1)[:n_a]
            return e_vol / rho_a, jnp.sum(e_vol) * dvol

        if z_window is not None:
            # the beam's hard z-reach from this view (in_beam zeroes
            # anything beyond |t| <= t_half <= max|t| at r <= r_max)
            span = jnp.abs(ts).max() * rs[-1]
            nynx = ny * nx
            k0 = jnp.clip(
                jnp.floor((z_s - span - vox_xyz[0, 2]) / dz_w) - 1.0,
                0.0, float(nz - z_window)).astype(jnp.int32)
            s0 = k0 * nynx
            n_w = z_window * nynx
            dv, de = vox_stage(
                jax.lax.dynamic_slice(vox_xyz, (s0, 0), (n_w, 3)),
                jax.lax.dynamic_slice(rho_vox, (s0,), (n_w,)),
                jax.lax.dynamic_slice(lab_vox, (s0,), (n_w,)))
            dose_acc = jax.lax.dynamic_update_slice(
                dose_acc,
                jax.lax.dynamic_slice(dose_acc, (s0,), (n_w,))
                + w_view * dv,
                (s0,))
        else:
            dv, de = vox_stage(vox_xyz, rho_vox, lab_vox)
            dose_acc = dose_acc + w_view * dv
        edep_acc = edep_acc + w_view * de
        return (dose_acc, edep_acc), 0.0

    init = (jnp.zeros(n_vox, f32), jnp.zeros((), f32))
    (dose, edep), _ = jax.lax.scan(one_view, init,
                                   (betas, src_zs, view_w))
    return dose, edep


def dose_map_3d(phantom, ct, spec, *, n_gamma=None, n_t=None, n_r=None,
                oversample=2, views=None, pixel_block=65536,
                n_energy=None, view_chunk=32, view_weights=None,
                scoring="removed", _z_window="auto", _pair="auto"):
    """Absorbed-dose volume of a circular or helical cone-beam scan.

    ``ct`` is a :class:`~dexct_tpu.system.geometry.ConeBeamGeometry`
    (or the helical subclass — the per-view source z is taken from
    ``ct.source_z``).  The same primary-beam local-deposition model as
    :func:`dose_map` (incl. the optional ``n_energy`` spectral
    compression, and ``view_weights`` — per-view relative tube output
    [V], e.g. a longitudinal TCM profile built from
    :func:`~dexct_tpu.pipeline.tcm.z_profile_from_volume`);
    ``DoseResult.dose_mGy`` has shape [Nz, Ny, Nx]
    and ``deposited_J`` is the plain 3-D integral (conservation partner:
    :func:`beam_energy_removed_3d`).
    """
    # the polar fluence model is EQUIANGULAR (per-channel counts over
    # uniform dgamma) with the orbit in a z-normal plane: flat-panel
    # (equidistant-column) and gantry-tilted geometries would get a
    # silently wrong fluence profile — fail loudly instead
    from ..system.geometry import (FlatPanelConeBeamGeometry,
                                   TiltedConeBeamGeometry)

    if isinstance(ct, FlatPanelConeBeamGeometry):
        raise ValueError(
            "dose_map_3d assumes equiangular channels; flat-panel "
            "fluence varies per column (cos^2) — not supported")
    if isinstance(ct, TiltedConeBeamGeometry) and float(ct.tilt) != 0.0:
        raise ValueError(
            "dose_map_3d assumes a z-normal orbit; for tilted scans "
            "compute dose in the gantry frame on the rotated phantom")
    labels3 = np.asarray(phantom.labels, np.int32)
    nz, ny, nx = labels3.shape
    n_mats = phantom.n_materials
    mu_kE, mu_dep, i0w = _dose_energy_grid(phantom, spec, n_energy,
                                           scoring)
    betas = np.asarray(ct.betas if views is None else views, np.float64)
    src_z = getattr(ct, "source_z", None)
    if src_z is None or np.ndim(src_z) == 0:
        src_z = np.zeros_like(betas)
    else:
        src_z = np.asarray(src_z, np.float64)
        if views is not None:
            raise ValueError("views override not supported for helical "
                             "geometries (source_z is per ct.betas)")
    gammas, rs = _sample_grids(ct, phantom, n_gamma, n_r, oversample)

    # cone-angle grid: covers the collimated beam, fine enough that the
    # z-resolution at the far edge of the object matches the voxel dz
    t_half = 0.5 * ct.N_rows * ct.h_iso / ct.SID
    if n_t is None:
        r_far = float(rs[-1])
        n_t = int(max(2 * ct.N_rows,
                      np.ceil(2.0 * t_half * r_far / phantom.dz
                              * oversample / 2.0))) + 1
    # one-step margin so beam-edge voxels interpolate inside the grid
    tpad = 2.0 * t_half / max(n_t - 1, 1)
    ts = np.linspace(-t_half - tpad, t_half + tpad, n_t + 2)

    xs = (np.arange(nx) + 0.5 - nx / 2) * phantom.dx
    ys = (np.arange(ny) + 0.5 - ny / 2) * phantom.dy
    zs = (np.arange(nz) + 0.5 - nz / 2) * phantom.dz
    vz, vy, vx = np.meshgrid(zs, ys, xs, indexing="ij")
    vox = np.stack([vx.ravel(), vy.ravel(), vz.ravel()], -1)
    rho = phantom.materials.densities[labels3].ravel()

    geom_const = ct.SID / (ct.dgamma * ct.h_iso)
    scalars = jnp.asarray(
        [ct.SID, phantom.dx, phantom.dy, phantom.dz, geom_const,
         0.5 * ct.gamma_fan, t_half,
         phantom.dx * phantom.dy * phantom.dz], jnp.float32)
    # pair mode: one row-3 nine-pack gather serves both trilinear
    # corner sets of a consecutive-r sample pair — eligible when the
    # per-sample step fits a 3-cell span on every axis (in-plane step
    # dr <= min(dx, dy); z step max|t|*dr <= dz) and labels fit 3 bits
    dr_ = float(rs[1] - rs[0])
    pair_mode = (labels3.max() < 8 and len(rs) % 2 == 0
                 and min(nx, ny, nz) >= 3
                 and dr_ <= min(phantom.dx, phantom.dy)
                 and float(np.abs(ts).max()) * dr_ <= phantom.dz)
    if _pair != "auto":  # test hook: force the quad (or pair) path
        pair_mode = bool(_pair)
    if pair_mode:
        labq3 = _pack_label_nines_zminor(labels3)
    else:
        labq3 = np.stack(
            [_pack_label_quads(labels3[k]) for k in range(nz)])
    # view_chunk: dose is additive over views, so the scan splits into
    # bounded-length device programs (the tunnel-watchdog rule — one
    # over-long 256^2x32 program crashed the worker; CLAUDE.md)
    vc = len(betas) if view_chunk is None else max(int(view_chunk), 1)
    # z-slab window (static): the collimated beam reaches at most
    # max|t| * r_max from the source z, so each view only touches
    # Lz = O(collimation/dz) slices — a big win for long helical scans
    Lz = int(np.ceil(2.0 * float(np.abs(ts).max()) * float(rs[-1])
                     / phantom.dz)) + 4
    z_window = Lz if Lz <= nz - 2 else None
    if _z_window != "auto":  # test hook: force the full scan
        z_window = _z_window
    vw = (np.ones_like(betas) if view_weights is None
          else np.asarray(view_weights, np.float64))
    dose = np.zeros(nz * ny * nx, np.float64)
    edep = 0.0
    for i0b in range(0, len(betas), vc):
        d_c, e_c = _dose_accumulate_3d(
            jnp.asarray(labq3), jnp.asarray(mu_kE, jnp.float32),
            jnp.asarray(mu_dep, jnp.float32),
            jnp.asarray(i0w, jnp.float32),
            jnp.asarray(betas[i0b:i0b + vc], jnp.float32),
            jnp.asarray(src_z[i0b:i0b + vc], jnp.float32),
            jnp.asarray(vw[i0b:i0b + vc], jnp.float32),
            jnp.asarray(gammas, jnp.float32),
            jnp.asarray(ts, jnp.float32), jnp.asarray(rs, jnp.float32),
            jnp.asarray(vox, jnp.float32),
            jnp.asarray(np.maximum(rho, 1e-12), jnp.float32),
            jnp.asarray(labels3.ravel()), scalars,
            n_mats=n_mats, nx=nx, ny=ny, nz=nz,
            pixel_block=int(pixel_block), z_window=z_window,
            pair_mode=pair_mode)
        dose += np.asarray(d_c, np.float64)
        edep += float(e_c)
    dose_mGy = dose.reshape(nz, ny, nx) * KEV_PER_G_TO_MGY
    return DoseResult(dose_mGy, edep * KEV_TO_J)


def beam_energy_removed_3d(phantom, ct, spec, *, paths=None):
    """Total beam energy removed over a cone/helical scan [J] — the
    conservation partner of :func:`dose_map_3d` (exact-DDA paths via
    :func:`~dexct_tpu.ops.conebeam.cone_material_paths`)."""
    from .conebeam import cone_material_paths

    if paths is None:
        paths = cone_material_paths(phantom, ct)
    paths = np.asarray(paths, np.float64)  # [V, R, C, K]
    mu = phantom.materials.mu_table(spec.E)
    L = paths @ mu
    i0w = spec.I0 * spec.bin_widths() * spec.E
    return float(np.sum((1.0 - np.exp(-L)) @ i0w)) * KEV_TO_J


def ctdi_vol(ctdi_w, ct):
    """CTDI_vol: CTDI_w divided by the helical pitch factor
    ``pitch / (N_rows * h_iso)`` (== CTDI_w for circular scans)."""
    pitch = float(getattr(ct, "pitch", 0.0))
    if pitch <= 0.0:
        return float(ctdi_w)
    return float(ctdi_w) / (pitch / (ct.N_rows * ct.h_iso))


def dlp(ctdi_vol_mGy, scan_length_cm):
    """Dose-length product [mGy*cm] — the quantity scanner consoles
    report and effective-dose coefficients multiply."""
    return float(ctdi_vol_mGy) * float(scan_length_cm)


def dose_z_profile(dose_3d, dx, *, roi_radius_cm=1.0, center=(0.0, 0.0),
                   dy=None):
    """Central-ROI mean dose per z slice: the classic dose profile used
    for helical overlap / over-ranging studies.  Returns [Nz]."""
    d = np.asarray(dose_3d, np.float64)
    ny, nx = d.shape[-2:]
    dy = dx if dy is None else dy
    ys = (np.arange(ny) + 0.5 - ny / 2) * dy
    xs = (np.arange(nx) + 0.5 - nx / 2) * dx
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    m = (yy - center[0]) ** 2 + (xx - center[1]) ** 2 <= roi_radius_cm ** 2
    if not np.any(m):
        raise ValueError("ROI contains no pixels")
    return d[:, m].mean(-1)
