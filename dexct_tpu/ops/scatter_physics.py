"""First-principles single-scatter estimation: Klein-Nishina transport.

`ops/scatter.py` ships the standard *empirical* projection-domain
scatter model (kernel superposition with a tuned SPR).  This module
computes the single-Compton-scatter sinogram *deterministically from
the physics*: for every scatter vertex x, incident energy E and
detector element d,

    S(d) = sum_x n_e(x) dV * phi(x, E)
           * dSigma/dOmega_KN(E, theta_xd) * dOmega_d(x)
           * exp(-L_exit(x->d, E')) * resp(E')

with E' the Compton-shifted energy, phi the attenuated primary fluence
at the vertex, and resp the detector weighting (eta(E') * E' for EID).
Free-electron Klein-Nishina (binding/Doppler corrections neglected —
a few percent below 30 keV; coherent scatter excluded) and exactly one
scatter (object SPR at fan-beam collimation is dominated by first
scatter).  Vertices are taken in the z=0 plane (fan collimation is
thin: beam height h_iso*r/SID << object size), but solid angles and
the Compton geometry are fully 3-D.

Validation strategy (`tests/test_scatter_physics.py`): a host float64
Monte Carlo with *random* vertices, exact per-vertex geometry, the full
spectrum, and fine ray marching — no shared discretization with the
device estimator (which uses a coarse vertex grid, compressed energy
bins, and fixed-step marching) — plus an analog angular-sampling MC
for the total detected scatter (the only quantity it resolves).

TPU mapping: everything is gathers + MXU contractions.  Incident
partial paths by fixed-step bilinear marching source->vertex (the
vertex grid is coarse — scatter is low-frequency); exit paths by
marching vertex->element; the (vertex, element, energy) contraction is
elementwise-exp over a [X, C, E] block, then one sum over X.  Energy
enters twice at different resolutions: the incident spectrum compressed
to ``n_energy`` bins (photon-conserving rebin), the Compton-shifted
exit attenuation via linear interpolation into a fine [K, F] mu table.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..physics import xcom

__all__ = [
    "electron_density_image",
    "klein_nishina_differential",
    "compton_energy",
    "single_scatter_sinogram",
    "mc_single_scatter_reference",
    "scatter_to_primary_ratio",
]


def compton_energy(energy_keV, cos_theta):
    """Compton-scattered photon energy E' [keV]."""
    e = np.asarray(energy_keV, np.float64)
    k = e / xcom.ELECTRON_REST_KEV
    return e / (1.0 + k * (1.0 - np.asarray(cos_theta, np.float64)))


def klein_nishina_differential(energy_keV, cos_theta):
    """KN differential cross-section dSigma/dOmega [cm^2/sr/electron]."""
    e = np.asarray(energy_keV, np.float64)
    c = np.asarray(cos_theta, np.float64)
    k = e / xcom.ELECTRON_REST_KEV
    ratio = 1.0 / (1.0 + k * (1.0 - c))  # E'/E
    r2 = xcom.ELECTRON_RADIUS_CM ** 2
    return 0.5 * r2 * ratio ** 2 * (ratio + 1.0 / ratio - (1.0 - c * c))


def electron_density_image(phantom, z_index=None):
    """Electron density image [electrons/cm^3]: rho N_A sum_i w_i Z_i/A_i."""
    dens = phantom.materials.densities
    ne_per_g = np.zeros(len(dens))
    for i, mat in enumerate(phantom.materials):
        za = sum(w * xcom.ELEMENT_Z[s] / xcom.ATOMIC_WEIGHT[s]
                 for s, w in xcom.parse_matcomp(mat.matcomp))
        ne_per_g[i] = xcom.AVOGADRO * za
    ne = dens * ne_per_g
    return ne[phantom.slice_labels(z_index)]


def _rebin_spectrum(spec, n_energy):
    """Photon-conserving rebin to n_energy groups: (E_c [G], n0 [G])."""
    n0 = np.asarray(spec.I0, np.float64) * spec.bin_widths()
    e = np.asarray(spec.E, np.float64)
    live = n0 > 0
    e_live, n_live = e[live], n0[live]
    edges = np.linspace(e_live.min(), e_live.max(), n_energy + 1)
    idx = np.clip(np.digitize(e_live, edges) - 1, 0, n_energy - 1)
    n_g = np.bincount(idx, weights=n_live, minlength=n_energy)
    e_g = np.bincount(idx, weights=n_live * e_live, minlength=n_energy)
    keep = n_g > 0
    return e_g[keep] / n_g[keep], n_g[keep]


@functools.partial(jax.jit, static_argnames=("n_mats", "nx", "ny", "s_in",
                                             "s_out"))
def _scatter_one_view(labels, ne_cells, cell_xy, det_xy, mu_gE, mu_fine,
                      resp_fine, n0_g, src, scalars, *, n_mats, nx,
                      ny, s_in, s_out):
    """Single-scatter detected signal for one view: returns [C].

    labels:   [ny, nx] int32
    ne_cells: [X] electrons per unit exit-plane area (n_e * cell area *
              local beam height)
    cell_xy:  [X, 2] vertex positions; det_xy: [C, 2] element positions
    mu_gE:    [K, G] attenuation at the compressed incident bins
    mu_fine:  [K, F] attenuation on the fine exit grid
    resp_fine:[F] detector weight on the fine grid
    n0_g:     [G] photons per channel per view at the compressed bins
    scalars:  (sid, dx, dy, geom_const, e_fine0, de_fine, a_det, e_g...)
    """
    f32 = jnp.float32
    (sid, dx_w, dy_w, geom_const, ef0, def_, a_det) = scalars[:7]
    e_g = scalars[7:]  # [G] compressed bin centers
    X = cell_xy.shape[0]
    C = det_xy.shape[0]
    F = mu_fine.shape[1]
    hi = jax.lax.Precision.HIGHEST
    mat_ids = jnp.arange(n_mats, dtype=jnp.int32)

    def march(p0, p1, n_steps):
        """Material path lengths along segments p0->p1: [..., K]."""
        seg = p1 - p0
        length = jnp.sqrt(jnp.sum(seg * seg, -1))  # [...]
        frac = (jnp.arange(n_steps, dtype=f32) + 0.5) / n_steps
        # sample points [..., S, 2]
        pts = p0[..., None, :] + seg[..., None, :] * frac[:, None]
        fx = pts[..., 0] / dx_w + (nx / 2 - 0.5)
        fy = pts[..., 1] / dy_w + (ny / 2 - 0.5)
        ix0 = jnp.floor(fx).astype(jnp.int32)
        iy0 = jnp.floor(fy).astype(jnp.int32)
        wx = fx - ix0
        wy = fy - iy0
        occ = 0.0
        for ty in (0, 1):
            for tx in (0, 1):
                iy = iy0 + ty
                ix = ix0 + tx
                ok = ((iy >= 0) & (iy < ny) & (ix >= 0) & (ix < nx))
                lab = labels[jnp.clip(iy, 0, ny - 1),
                             jnp.clip(ix, 0, nx - 1)]
                w = ((wy if ty else (1.0 - wy))
                     * (wx if tx else (1.0 - wx))) * ok
                occ = occ + w[..., None] * (
                    lab[..., None] == mat_ids)
        # mean occupancy over steps * length = path [cm] per material
        return occ.sum(-2) * (length / n_steps)[..., None]

    # incident: source -> vertex
    src_b = jnp.broadcast_to(src, (X, 2))
    t_in = march(src_b, cell_xy, s_in)  # [X, K]
    rel = cell_xy - src[None, :]
    r_v = jnp.sqrt(jnp.sum(rel * rel, -1))  # [X]
    phi = (geom_const / (r_v * r_v))[:, None] * n0_g[None, :] * jnp.exp(
        -jnp.matmul(t_in, mu_gE, precision=hi))  # [X, G] photons/cm^2

    # exit: vertex -> detector element
    t_ex = march(jnp.repeat(cell_xy[:, None, :], C, 1),
                 jnp.repeat(det_xy[None, :, :], X, 0), s_out)  # [X, C, K]

    # geometry: scattering angle + solid angle
    u_in = rel / r_v[:, None]  # [X, 2] unit incident dir
    dvec = det_xy[None, :, :] - cell_xy[:, None, :]  # [X, C, 2]
    r_d = jnp.sqrt(jnp.sum(dvec * dvec, -1))  # [X, C]
    u_out = dvec / r_d[..., None]
    cos_t = (u_in[:, None, 0] * u_out[..., 0]
             + u_in[:, None, 1] * u_out[..., 1])  # [X, C]
    # detector normal: element -> source axis (cylindrical detector)
    nrm = src[None, :] - det_xy  # [C, 2]
    nrm = nrm / jnp.sqrt(jnp.sum(nrm * nrm, -1))[:, None]
    cos_inc = jnp.abs(u_out[..., 0] * nrm[None, :, 0]
                      + u_out[..., 1] * nrm[None, :, 1])  # [X, C]
    d_omega = a_det * cos_inc / (r_d * r_d)  # [X, C] sr

    # spectral: for each (X, C, G)
    k = e_g / 510.99895  # [G]
    ratio = 1.0 / (1.0 + k[None, None, :] * (1.0 - cos_t[..., None]))
    e_p = e_g[None, None, :] * ratio  # [X, C, G] scattered energy
    r2 = 7.940787e-26  # (classical electron radius)^2 [cm^2]
    kn = 0.5 * r2 * ratio * ratio * (
        ratio + 1.0 / ratio - (1.0 - cos_t[..., None] ** 2))  # [X, C, G]
    # exit attenuation at E': pre-contract materials onto the fine
    # energy grid (one MXU matmul), then linear-interp along F — avoids
    # materializing a [K, X, C, G] gathered-mu tensor
    l_fine = jnp.einsum("xck,kf->xcf", t_ex, mu_fine,
                        precision=hi)  # [X, C, F]
    fi = jnp.clip((e_p - ef0) / def_, 0.0, F - 1.001)
    fi0 = jnp.floor(fi).astype(jnp.int32)
    wf = fi - fi0
    l0 = jnp.take_along_axis(l_fine, fi0, -1)
    l1 = jnp.take_along_axis(l_fine, fi0 + 1, -1)
    l_ex = l0 + (l1 - l0) * wf  # [X, C, G]
    resp = resp_fine[fi0] + (resp_fine[fi0 + 1]
                             - resp_fine[fi0]) * wf  # [X, C, G]
    contrib = (phi[:, None, :] * kn * jnp.exp(-jnp.clip(l_ex, 0.0, 60.0))
               * resp) * d_omega[..., None]
    return jnp.sum(contrib * ne_cells[:, None, None], axis=(0, 2))


def single_scatter_sinogram(phantom, ct, spec, *, coarse=4, n_energy=12,
                            n_fine=96, s_in=None, s_out=None, views=None,
                            z_index=None):
    """Deterministic single-scatter sinogram [V, C] in detected units.

    coarse: vertex-grid downsampling factor relative to the phantom
        grid (scatter is low-frequency; 4-8 is plenty).
    n_energy: compressed incident energy bins.
    n_fine: fine grid for Compton-shifted exit attenuation/response.
    s_in/s_out: marching steps for incident/exit paths (default:
        phantom N and N/2).

    The result adds directly onto the primary counts from
    ``forward_counts`` (same detected-signal units) and feeds the
    kernel-correction machinery in :mod:`dexct_tpu.ops.scatter`.
    """
    labels2d = np.asarray(phantom.slice_labels(z_index), np.int32)
    ny, nx = labels2d.shape
    n_mats = phantom.n_materials
    if s_in is None:
        s_in = max(nx, ny)
    if s_out is None:
        s_out = max(nx, ny) // 2
    betas = np.asarray(ct.betas if views is None else views, np.float64)

    # coarse vertex grid: n_e * cell volume (z-extent = one beam height
    # at the isocenter is implicit in the fluence normalization: the
    # fan's photons all pass |z| < h(r)/2, and we score their scatter
    # from the z=0 plane with per-unit-length density n_e * h... the h
    # cancels: phi [photons/cm^2] * n_e [1/cm^3] * dV [cm^3] with dV a
    # full 3-D cell volume dx*dy*h would double-count h; using the
    # in-plane cell area times the LOCAL beam height converts the
    # 2-D vertex integral to the 3-D one exactly.  We fold the beam
    # height h(r) = h_iso r / SID into the per-vertex weight below.
    ne_img = electron_density_image(phantom, z_index)
    cf = int(coarse)
    nyc, nxc = ny // cf, nx // cf
    ne_cells = ne_img[:nyc * cf, :nxc * cf].reshape(
        nyc, cf, nxc, cf).mean((1, 3))
    xs = ((np.arange(nxc) + 0.5) * cf - nx / 2) * phantom.dx
    ys = ((np.arange(nyc) + 0.5) * cf - ny / 2) * phantom.dy
    cx, cy = np.meshgrid(xs, ys, indexing="xy")
    cell_xy = np.stack([cx.ravel(), cy.ravel()], -1)
    keep = ne_cells.ravel() > 0
    cell_xy = cell_xy[keep]
    cell_area = (cf * phantom.dx) * (cf * phantom.dy)
    ne_w = ne_cells.ravel()[keep] * cell_area  # electrons per unit z

    # spectra and attenuation tables
    e_g, n0_g = _rebin_spectrum(spec, n_energy)
    mu_gE = phantom.materials.mu_table(e_g)  # [K, G]
    e_min_p = float(compton_energy(e_g.min(), -1.0)) * 0.95
    e_fine = np.linspace(e_min_p, float(e_g.max()) * 1.001, n_fine)
    mu_fine = phantom.materials.mu_table(e_fine)  # [K, F]
    eta = ct.detector_response(e_fine)  # includes E weight when eid
    resp_fine = np.asarray(eta, np.float64)

    # detector element positions (z=0 plane) and area
    h_det = ct.h_iso * ct.SDD / ct.SID
    a_det = (ct.SDD * ct.dgamma) * h_det  # element area [cm^2]
    geom_const = ct.SID / (ct.dgamma * ct.h_iso)

    out = np.zeros((len(betas), ct.N_channels))
    scalars_base = [ct.SID, phantom.dx, phantom.dy, geom_const,
                    float(e_fine[0]), float(e_fine[1] - e_fine[0]), a_det]
    labels_j = jnp.asarray(labels2d)
    mu_gE_j = jnp.asarray(mu_gE, jnp.float32)
    mu_fine_j = jnp.asarray(mu_fine, jnp.float32)
    resp_j = jnp.asarray(resp_fine, jnp.float32)
    n0_j = jnp.asarray(n0_g, jnp.float32)
    scal_j = jnp.asarray(np.concatenate([scalars_base, e_g]), jnp.float32)
    cells_j = jnp.asarray(cell_xy, jnp.float32)

    # beam-height factor at the vertex: h(r_v) = h_iso * r_v / SID —
    # the z-extent of the illuminated (scattering) column
    for i, beta in enumerate(betas):
        src = ct.SID * np.array([np.cos(beta), np.sin(beta)])
        ang = beta + ct.gammas
        det = (src[None, :]
               - ct.SDD * np.stack([np.cos(ang), np.sin(ang)], -1))
        r_v = np.linalg.norm(cell_xy - src[None, :], axis=-1)
        h_v = ct.h_iso * r_v / ct.SID
        ne_view = jnp.asarray(ne_w * h_v, jnp.float32)
        s = _scatter_one_view(
            labels_j, ne_view, cells_j, jnp.asarray(det, jnp.float32),
            mu_gE_j, mu_fine_j, resp_j, n0_j,
            jnp.asarray(src, jnp.float32), scal_j,
            n_mats=n_mats, nx=nx, ny=ny, s_in=int(s_in), s_out=int(s_out))
        out[i] = np.asarray(s, np.float64)
    return out


def scatter_to_primary_ratio(scatter_sino, primary_sino):
    """Mean in-object SPR diagnostic (primary > 1% of its max)."""
    p = np.asarray(primary_sino, np.float64)
    s = np.asarray(scatter_sino, np.float64)
    m = p > 0.01 * p.max()
    return float((s[m] / p[m]).mean())


def mc_single_scatter_reference(phantom, ct, spec, beta, n_samples, *,
                                seed=0, march_step=None, z_index=None):
    """Host float64 Monte Carlo single-scatter oracle for ONE view.

    Next-event estimation with RANDOM vertices and exact geometry —
    no coarse grids, no energy compression, adaptive marching — an
    independent cross-check of :func:`single_scatter_sinogram`'s
    discretizations.  Returns (scatter [C], stderr [C]).
    """
    rng = np.random.default_rng(seed)
    labels2d = np.asarray(phantom.slice_labels(z_index), np.int32)
    ny, nx = labels2d.shape
    if march_step is None:
        march_step = 0.5 * min(phantom.dx, phantom.dy)

    e = np.asarray(spec.E, np.float64)
    n0 = np.asarray(spec.I0, np.float64) * spec.bin_widths()
    live = n0 > 0
    e, n0 = e[live], n0[live]
    p_e = n0 / n0.sum()
    mu_table = phantom.materials.mu_table(e)  # [K, Elive]
    ne_img = electron_density_image(phantom, z_index)

    src = ct.SID * np.array([np.cos(beta), np.sin(beta)])
    ang = beta + ct.gammas
    det = src[None, :] - ct.SDD * np.stack([np.cos(ang), np.sin(ang)], -1)
    h_det = ct.h_iso * ct.SDD / ct.SID
    a_det = (ct.SDD * ct.dgamma) * h_det

    r_img = 0.5 * float(np.hypot(nx * phantom.dx, ny * phantom.dy))
    r0, r1 = ct.SID - r_img, ct.SID + r_img
    seg_len = r1 - r0

    def march_paths(p0, p1):
        """Material paths along p0->p1 (vectorized, [n, K])."""
        segv = p1 - p0
        lens = np.linalg.norm(segv, axis=-1)
        n_steps = max(int(np.ceil(lens.max() / march_step)), 2)
        fr = (np.arange(n_steps) + 0.5) / n_steps
        pts = p0[:, None, :] + segv[:, None, :] * fr[None, :, None]
        fx = pts[..., 0] / phantom.dx + (nx / 2 - 0.5)
        fy = pts[..., 1] / phantom.dy + (ny / 2 - 0.5)
        ix = np.clip(np.round(fx).astype(int), 0, nx - 1)
        iy = np.clip(np.round(fy).astype(int), 0, ny - 1)
        inside = ((fx > -0.5) & (fx < nx - 0.5)
                  & (fy > -0.5) & (fy < ny - 0.5))
        lab = np.where(inside, labels2d[iy, ix], -1)
        K = phantom.n_materials
        occ = np.zeros((len(p0), K))
        for kmat in range(K):
            occ[:, kmat] = (lab == kmat).sum(1)
        return occ * (lens / n_steps)[:, None]

    # sample (fan angle, energy, s): gamma CONTINUOUS over the fan —
    # the beam is a continuous fluence field (discrete-channel vertex
    # rays under-resolve small objects); with fan = C * dgamma the
    # importance weight below is unchanged
    g_half = 0.5 * ct.gamma_fan
    gam = rng.uniform(-g_half, g_half, n_samples)
    ei = rng.choice(len(e), n_samples, p=p_e)
    s = r0 + seg_len * rng.random(n_samples)
    angv = beta + gam
    u_in = -np.stack([np.cos(angv), np.sin(angv)], -1)  # [n, 2]
    vtx = src[None, :] + u_in * s[:, None]
    fxv = vtx[:, 0] / phantom.dx + (nx / 2 - 0.5)
    fyv = vtx[:, 1] / phantom.dy + (ny / 2 - 0.5)
    inside = ((fxv > 0) & (fxv < nx - 1) & (fyv > 0) & (fyv < ny - 1))
    ne_v = np.where(
        inside,
        ne_img[np.clip(np.round(fyv).astype(int), 0, ny - 1),
               np.clip(np.round(fxv).astype(int), 0, nx - 1)], 0.0)
    sel = ne_v > 0
    if not np.any(sel):
        return np.zeros(ct.N_channels), np.zeros(ct.N_channels)
    idx = np.where(sel)[0]
    t_in = march_paths(np.broadcast_to(src, (len(idx), 2)), vtx[idx])
    l_in = np.einsum("nk,kn->n", t_in, mu_table[:, ei[idx]])
    h_v = ct.h_iso * s[idx] / ct.SID  # illuminated z column
    # vertex weight: (photons n0[ei]/p? handled via p_e sampling) —
    # estimate = mean over samples of f/pdf with
    # f = N_tot_photons_density * ... ; pdf = p_e/(C * seg_len)
    # importance weight f/pdf: vertices sampled via (channel, s) with
    # pdf_area = 1/(C seg_len s dgamma); fluence = n0 SID/(dgamma h r^2)
    # -> the dgamma and one power of s cancel
    n_tot = n0.sum()
    w_vtx = (ct.N_channels * seg_len / n_samples) * n_tot \
        * np.exp(-l_in) * ne_v[idx] * h_v * ct.SID \
        / (ct.h_iso * s[idx])

    # NEE to every detector element
    tally = np.zeros(ct.N_channels)
    tally2 = np.zeros(ct.N_channels)
    e_i = e[ei[idx]]
    for c in range(ct.N_channels):
        dvec = det[c][None, :] - vtx[idx]
        r_d = np.linalg.norm(dvec, axis=-1)
        u_out = dvec / r_d[:, None]
        cos_t = np.einsum("nd,nd->n", u_in[idx], u_out)
        e_p = compton_energy(e_i, cos_t)
        kn = klein_nishina_differential(e_i, cos_t)
        nrm = (src - det[c]) / ct.SDD
        cos_inc = np.abs(u_out @ nrm)
        d_omega = a_det * cos_inc / r_d**2
        t_ex = march_paths(vtx[idx], np.broadcast_to(det[c],
                                                     (len(idx), 2)))
        mu_ep = phantom.materials.mu_table(e_p)  # [K, n]
        l_ex = np.einsum("nk,kn->n", t_ex, mu_ep)
        resp = ct.detector_response(e_p)
        w = w_vtx * kn * d_omega * np.exp(-l_ex) * resp
        tally[c] = w.sum()
        tally2[c] = (w * w).sum() * n_samples
    stderr = np.sqrt(np.maximum(tally2 - tally**2, 0.0) / n_samples)
    return tally, stderr
