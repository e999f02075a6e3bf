"""Rigid patient motion: artifact simulation, motion-compensated
reconstruction, and sinogram-domain motion estimation.

The reference's acquisition model (main.py:106-124) assumes a static
object for the whole rotation.  Real patients move — respiratory drift,
cardiac motion, involuntary jerks — and a rigid in-plane pose change
during the scan produces the classic double-edge / streak motion
artifact.  This module adds the three scanner-side pieces as framework
ops, all beyond the reference's scope:

* **Simulation** — exact: a rigid object pose at view v (rotation
  ``phi_v`` about isocenter + translation ``d_v``) is equivalent to
  tracing the view's rays through the STATIC phantom after mapping them
  into the object frame, ``x_obj = R(-phi_v) (x_world - d_v)``.  No
  phantom resampling, no interpolation — the static exact Siddon
  tracers (ops/siddon.py, ops/siddon_fast.py) run on the transformed
  rays unchanged.
* **Motion-compensated FBP** — the standard rigid MC backprojection:
  each view backprojects along its own motion-transformed rays, i.e.
  pixel x accumulates view v at the world position it occupied then,
  ``x_v = R(phi_v) x + d_v``.  Same fused per-view-block scan as
  :func:`~dexct_tpu.ops.fbp.fan_backproject` — two extra rotate/shift
  FMAs per pixel per view, nothing else changes.

  Measured limits (64-px contrast phantom, 128 views, SID 60; the
  static-recon rms floor from resampled view angles is ~0.0023):
  translation and zero-net rotation compensate to that floor (7-8x
  artifact-rms reduction); a NET rotation drift leaves an uncovered
  object-frame wedge (2.4 % of the scan for 0.15 rad) and lands at
  ~1.6x.  Redundancy reweighting does NOT improve it: per-view
  spacing factors, 2/multiplicity wedge weights, and Parker-style
  pairwise-conserving weights (pre- and post-filter, several
  feathers) were all measured WORSE in rms than the plain uniform
  sum — the unweighted full-scan sum's wedge under-count globally
  cancels against its spacing over-count, while any reweighting
  trades the small shading for conjugate-interpolation streaks.
* **Estimation** — a data-domain translation estimator: the
  line-integral-weighted centroid of the fan angle tracks the object
  center of mass, whose apparent fan angle at view v is
  ``atan2(w·t̂_v, SID - w·û_v)`` with ``w = c0 + d_v``.  Expanding
  ``d_v`` on a smooth temporal basis and solving the small nonlinear
  least-squares problem (Gauss-Newton, host-side float64) recovers the
  translation track without any image-domain iteration.  The centroid
  is exact for a point mass; for extended objects the fan-beam 1/L ray
  density and the object's angular structure bias it (measured: rms
  track error ~0.3x the motion's rms amplitude on a 20 cm contrast
  phantom at SID=60 — an image-consistency bias-subtract iteration was
  tried and does NOT reduce it).  That accuracy is still enough for
  MC-FBP with the estimated track to cut the artifact rms by >=40 %
  (tests/test_motion.py::TestEstimator).  Autofocus refinement
  (autodiff through the MC-FBP, minimizing recon TV or intensity
  entropy over the track coefficients, Adam, init at the centroid
  fit) was prototyped and REJECTED: both metrics are lower for
  blurring tracks than for the true one (measured TV 49.7 at a
  wrong 1.8x-error track vs 55.2 at the truth) — sharpness metrics
  prefer smearing the ghosts over removing them.  The obvious
  data-consistency alternation (x = MC-FBP(y; c), then register c by
  reprojecting x through the differentiable Radon resampler) was ALSO
  prototyped and REJECTED: it is a fixed-point iteration whose fixed
  points include wrong tracks, because MC-FBP at any c produces an
  image whose c-reprojection already matches y (FBP and FP are
  near-inverse for every c) — measured err/amp 0.31 -> 0.30 -> drifts
  back up.  Higher-order Helgason-Ludwig moment conditions do NOT
  help for rigid translation either: a shift changes only the
  t-coordinate, so EVERY t-moment constrains the same per-view scalar
  c·n̂(θ) the order-1 centroid already measures (the central moments
  absorb into the rigid object's own degree-n trig polynomials).

  The estimator that DOES work is :func:`estimate_motion_joint`:
  joint regularized inversion over (image, track) through the
  differentiable motion-forward model (Fourier-slice Radon + per-view
  t-shift resampling).  The joint fit is not circular — one shared
  TV-regularized image cannot absorb per-view pose errors — and it
  converges from the centroid init's err/amp 0.31 to **0.06**
  (5x tighter; MC-FBP with the joint track reaches 6.7x artifact-rms
  reduction, essentially the true-track floor).

The same three pieces extend to 3-D circular cone-beam scans
(:class:`MotionProfile3D`, :func:`cone_material_paths_motion`,
:func:`fdk_reconstruct_motion`) — axial (respiratory) drift is the
clinical cone-beam case; the MC-FDK normalizes by accumulated row
coverage so z-motion that pushes voxels off the detector for part of
the orbit renormalizes instead of shading (and as a side effect the
outermost slices of even a STATIC volume are better than plain FDK,
which dims them — measured 0.222 vs 0.148 against a 0.22 truth).
Helical scans get :func:`helical_fdk_reconstruct_motion` — the
generalized-Feldkamp backprojection with posed voxels AND per-view
re-centering of each voxel's 2*pi window on the source's passage of
its instantaneous z.  Its MC residual is gFDK's own row-interpolation
phase error, not a motion term (measured: a constant HALF-row shift
costs 0.010 rms on a sharp sphere, a FULL-row shift only 0.0026; a
1.6 cm breathing drift corrects 0.055 -> 0.024 = that same floor).

TPU mapping: simulation and MC-FBP/FDK are pure elementwise transforms
feeding the existing gather kernels; the estimator is a [V x (2+2K)]
host solve.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MotionProfile", "rays_in_object_frame",
           "material_path_sinogram_motion", "fan_backproject_motion",
           "fbp_recon_motion", "estimate_translation",
           "estimate_motion_joint", "cosine_motion_basis",
           "MotionProfile3D", "cone_material_paths_motion",
           "fdk_reconstruct_motion", "helical_fdk_reconstruct_motion"]


# --------------------------------------------------------------------------
# motion profiles
# --------------------------------------------------------------------------

@dataclasses.dataclass
class MotionProfile:
    """Rigid in-plane object pose per view.

    ``phi``: [V] rotation about isocenter [rad]; ``disp``: [V, 2]
    translation (dx, dy) [cm].  Pose maps object-frame points to world:
    ``x_world(v) = R(phi_v) x_obj + disp_v``.
    """

    phi: np.ndarray
    disp: np.ndarray

    def __post_init__(self):
        self.phi = np.asarray(self.phi, dtype=np.float64)
        self.disp = np.asarray(self.disp, dtype=np.float64)
        if self.phi.ndim != 1 or self.disp.shape != (len(self.phi), 2):
            raise ValueError("phi must be [V], disp [V, 2]")

    @property
    def n_views(self):
        return len(self.phi)

    @classmethod
    def static(cls, n_views):
        return cls(np.zeros(n_views), np.zeros((n_views, 2)))

    @classmethod
    def breathing(cls, n_views, amplitude_cm=0.5, cycles=1.5,
                  direction=(0.0, 1.0), phase=0.0):
        """Smooth quasi-periodic drift: raised-cosine displacement along
        ``direction`` with ``cycles`` periods over the scan (respiratory
        drift is ~0.2-0.3 Hz vs a 0.25-1 s rotation)."""
        s = np.arange(n_views) / max(n_views - 1, 1)
        a = 0.5 * amplitude_cm * (1.0 - np.cos(2 * np.pi * cycles * s
                                                + phase))
        d = np.asarray(direction, dtype=np.float64)
        d = d / np.linalg.norm(d)
        return cls(np.zeros(n_views), a[:, None] * d[None, :])

    @classmethod
    def jerk(cls, n_views, at_frac=0.5, disp_cm=(0.3, 0.0), width_frac=0.02):
        """Step displacement at ``at_frac`` of the scan, smoothed over
        ``width_frac`` of the views (an involuntary patient shift)."""
        s = np.arange(n_views) / max(n_views - 1, 1)
        w = max(width_frac, 1e-6)
        ramp = np.clip((s - at_frac) / w + 0.5, 0.0, 1.0)
        return cls(np.zeros(n_views),
                   ramp[:, None] * np.asarray(disp_cm, np.float64)[None, :])

    @classmethod
    def rotation_drift(cls, n_views, total_rad=0.02):
        """Linear rotation drift over the scan (gantry-synchronized
        rolling motion)."""
        s = np.arange(n_views) / max(n_views - 1, 1)
        return cls(total_rad * s, np.zeros((n_views, 2)))


# --------------------------------------------------------------------------
# simulation: rays into the object frame
# --------------------------------------------------------------------------

def rays_in_object_frame(src, dirs, phi, disp):
    """Map world-frame rays into the moving object's frame (host,
    float64 — the ray planners consume NumPy geometry).

    src, dirs: [V, ..., D] with D = 2 (fan) or 3 (cone; rotation about
    z); phi: [V]; disp: [V, D].  Returns (src', dirs') with
    ``x_obj = R_z(-phi_v) (x_world - d_v)`` applied per view — the
    object is static in its own frame, so the static exact tracers see
    the motion-blurred acquisition exactly.  The single shared
    implementation behind both :func:`material_path_sinogram_motion`
    and :func:`cone_material_paths_motion`.
    """
    src = np.asarray(src, np.float64)
    dirs = np.asarray(dirs, np.float64)
    extra = src.ndim - 2  # batch dims beyond the view axis
    shape = (-1,) + (1,) * extra
    c = np.cos(np.asarray(phi, np.float64)).reshape(shape)
    s = np.sin(np.asarray(phi, np.float64)).reshape(shape)
    d = np.asarray(disp, np.float64).reshape(
        (len(phi),) + (1,) * extra + (src.shape[-1],))

    def rot_neg(p):  # R_z(-phi) p, per view; z (if any) untouched
        out = [c * p[..., 0] + s * p[..., 1],
               -s * p[..., 0] + c * p[..., 1]]
        if p.shape[-1] == 3:
            out.append(p[..., 2])
        return np.stack(out, axis=-1)

    return rot_neg(src - d), rot_neg(dirs)


def material_path_sinogram_motion(phantom, geometry, motion, *,
                                  dtype=jnp.float32, method="auto"):
    """Material-path sinogram [V, C, M] of a rigidly moving phantom.

    Exact Siddon on per-view object-frame rays; ``method`` as in
    :func:`~dexct_tpu.ops.siddon.material_path_sinogram`'s voxel paths
    ('dominant' packed fast path when the grid allows, else the DDA
    walk).  Voxel phantoms only — the closed-form analytic tracer has
    no motion dispatch.
    """
    if motion.n_views != geometry.N_proj:
        raise ValueError(
            f"motion has {motion.n_views} views, geometry {geometry.N_proj}")
    if not hasattr(phantom, "slice_labels"):
        raise ValueError(
            "material_path_sinogram_motion supports voxel phantoms only "
            f"(got {type(phantom).__name__}); rasterize analytic "
            "phantoms first")
    src, dirs = geometry.ray_geometry()
    src_o, dirs_o = rays_in_object_frame(src, dirs, motion.phi,
                                         motion.disp)
    labels = jnp.asarray(phantom.slice_labels())
    if method == "auto":
        ok = (phantom.Ny % 2 == 0 and phantom.Nx % 2 == 0
              and phantom.n_materials < 32 and phantom.dx == phantom.dy)
        method = "dominant" if ok else "dda"
    if method == "dominant":
        from .siddon_fast import trace_paths_dominant

        return trace_paths_dominant(
            labels, jnp.asarray(src_o, dtype), jnp.asarray(dirs_o, dtype),
            float(phantom.dx), float(phantom.dy),
            n_materials=phantom.n_materials)
    from .siddon import trace_paths

    return trace_paths(labels, jnp.asarray(src_o, dtype),
                       jnp.asarray(dirs_o, dtype), float(phantom.dx),
                       float(phantom.dy), n_materials=phantom.n_materials)


# --------------------------------------------------------------------------
# motion-compensated reconstruction
# --------------------------------------------------------------------------

def fan_backproject_motion(q, betas, sid, dgamma, n_matrix, fov, phi, disp,
                           *, view_block=64, dbeta=None):
    """Motion-compensated distance-weighted equiangular backprojection.

    Identical to :func:`~dexct_tpu.ops.fbp.fan_backproject` except each
    view evaluates the pixel at its world position under the view's
    pose, ``x_v = R(phi_v) x + d_v`` — the rigid MC-FBP of clinical
    motion correction.  ``phi=disp=0`` reproduces the static
    backprojector bit-for-bit (same op sequence).
    """
    dtype = q.dtype
    n_proj, n_ch = q.shape
    px_size = fov / n_matrix
    half = n_matrix / 2.0
    coord = (jnp.arange(n_matrix, dtype=dtype) + 0.5 - half) * px_size
    X = jnp.broadcast_to(coord[None, :], (n_matrix, n_matrix))
    Y = jnp.broadcast_to(coord[:, None], (n_matrix, n_matrix))

    n_blocks = -(-n_proj // view_block)
    pad = n_blocks * view_block - n_proj
    qp = jnp.pad(q, ((0, pad), (0, 0)))
    bp = jnp.pad(betas.astype(dtype), (0, pad))
    php = jnp.pad(jnp.asarray(phi, dtype), (0, pad))
    dp = jnp.pad(jnp.asarray(disp, dtype), ((0, pad), (0, 0)))
    valid = jnp.pad(jnp.ones((n_proj,), dtype), (0, pad))
    qb = qp.reshape(n_blocks, view_block, n_ch)
    bb = bp.reshape(n_blocks, view_block)
    phb = php.reshape(n_blocks, view_block)
    db = dp.reshape(n_blocks, view_block, 2)
    vb = valid.reshape(n_blocks, view_block)

    def view_contrib(qv, beta, ph, d, v):
        cp, sp = jnp.cos(ph), jnp.sin(ph)
        Xv = cp * X - sp * Y + d[0]
        Yv = sp * X + cp * Y + d[1]
        cb, sb = jnp.cos(beta), jnp.sin(beta)
        vr = Xv * cb + Yv * sb - sid
        vt = -Xv * sb + Yv * cb
        gamma = jnp.arctan2(-vt, -vr)
        L2 = vr * vr + vt * vt
        c = gamma / dgamma - 0.5 + n_ch / 2.0
        c0 = jnp.clip(jnp.floor(c), 0, n_ch - 2).astype(jnp.int32)
        fc = jnp.clip(c - c0, 0.0, 1.0)
        inside = (c >= 0.0) & (c <= n_ch - 1.0)
        qi = qv[c0] * (1.0 - fc) + qv[c0 + 1] * fc
        return jnp.where(inside, qi / L2, 0.0) * v

    def block(acc, args):
        qv, bv, phv, dv, vv = args
        contrib = jax.vmap(view_contrib)(qv, bv, phv, dv, vv)
        return acc + contrib.sum(0), None

    init = jnp.zeros((n_matrix, n_matrix), dtype)
    img, _ = jax.lax.scan(block, init, (qb, bb, phb, db, vb))
    if dbeta is None:
        dbeta = 2.0 * jnp.pi / n_proj if n_proj else 0.0
    return img * dbeta


def fbp_recon_motion(sino_log, geometry, n_matrix, fov, motion, ramp=0.8,
                     window="sinc", mu_water_eff=None, dtype=jnp.float32):
    """Motion-compensated fan-beam FBP: (recon_raw, recon_HU or None).

    Filter + Parker weighting exactly as the static
    :func:`~dexct_tpu.ops.fbp.fbp_recon`; backprojection along the
    motion-transformed rays.  With the TRUE motion profile this removes
    the rigid-motion artifact up to fan-angle redundancy weighting
    (exact for full-scan data of in-FOV motion).
    """
    from .fbp import filter_sinogram, hu_image, parker_weights

    sino_log = jnp.asarray(sino_log, dtype)
    if geometry.rotation_total < 2.0 * np.pi - 1e-6:
        sino_log = sino_log * jnp.asarray(parker_weights(geometry), dtype)
    q = filter_sinogram(sino_log, geometry, ramp, window, dtype)
    img = fan_backproject_motion(
        q, jnp.asarray(geometry.betas, dtype), float(geometry.SID),
        float(geometry.dgamma), int(n_matrix), float(fov),
        jnp.asarray(motion.phi, dtype), jnp.asarray(motion.disp, dtype),
        dbeta=float(geometry.rotation_total) / geometry.N_proj)
    if mu_water_eff is None:
        return img, None
    return img, hu_image(img, mu_water_eff)


# --------------------------------------------------------------------------
# estimation
# --------------------------------------------------------------------------

def cosine_motion_basis(n_views, n_modes=6):
    """Smooth temporal basis B [V, K]: DC-free raised cosines
    cos(pi k s), k=1..K, s in [0,1] — zero at s=0 so the fitted track
    is anchored to the scan start (the DC component is degenerate with
    the unknown static center of mass)."""
    s = np.arange(n_views) / max(n_views - 1, 1)
    k = np.arange(1, n_modes + 1)
    return 1.0 - np.cos(np.pi * k[None, :] * s[:, None])


def estimate_translation(sino_log, geometry, *, n_modes=6, n_iters=25,
                         basis=None, reg=0.01):
    """Estimate a rigid translation track from the sinogram alone.

    Fits ``d_v = B_v @ coeffs`` (B a smooth ``cosine_motion_basis``) and
    the static center of mass ``c0`` to the measured fan-angle centroid
    track by Gauss-Newton on the exact point-projection model
    ``g_v = atan2(-w_v·t̂_v, SID - w_v·û_v)``, ``w_v = c0 + d_v``
    (the channel convention of ops/fbp.py's backprojector).
    Host-side float64 (CLAUDE.md convention); the [V x (2+2K)] normal
    equations are microscopic next to any recon.

    Returns a :class:`MotionProfile` (phi=0) and the fitted ``c0``.
    One fan-angle measurement per view cannot separate the radial
    displacement component at that view — identifiability comes from
    the basis smoothness across a rotating t̂.  The instantaneous-radial
    directions are soft eigendirections of the normal matrix, and the
    extended-object centroid bias would be amplified along them, so the
    coefficient block carries a relative Tikhonov ridge ``reg``
    (fraction of the block's mean diagonal) that pins unobservable
    directions at zero while leaving observable ones untouched
    (tests/test_motion.py pins the recovered-amplitude bound).
    """
    p = np.asarray(sino_log, dtype=np.float64)
    V, C = p.shape
    gam = (np.arange(C) + 0.5 - C / 2.0) * geometry.dgamma
    mass = np.maximum(p.sum(axis=1), 1e-12)
    g_meas = (p * gam[None, :]).sum(axis=1) / mass  # [V]

    betas = np.asarray(geometry.betas, dtype=np.float64)
    u = np.stack([np.cos(betas), np.sin(betas)], -1)   # [V,2] radial
    t = np.stack([-np.sin(betas), np.cos(betas)], -1)  # [V,2] tangential
    B = (np.asarray(basis, np.float64) if basis is not None
         else cosine_motion_basis(V, n_modes))
    K = B.shape[1]
    sid = float(geometry.SID)

    theta = np.zeros(2 + 2 * K)  # [c0x, c0y, ax(1..K), ay(1..K)]

    def track(th):
        c0 = th[:2]
        d = np.stack([B @ th[2:2 + K], B @ th[2 + K:]], axis=-1)
        w = c0[None, :] + d  # [V,2]
        wt = (w * t).sum(1)
        wu = (w * u).sum(1)
        return np.arctan2(-wt, sid - wu), w, wt, wu

    for _ in range(n_iters):
        g, w, wt, wu = track(theta)
        r = g - g_meas
        # d g / d w = -((sid - wu) t + wt u) / L2
        L2 = wt * wt + (sid - wu) ** 2
        dg_dw = -((sid - wu)[:, None] * t + wt[:, None] * u) / L2[:, None]
        # d w / d theta: c0 -> I; ax_k -> B[:,k] e_x; ay_k -> B[:,k] e_y
        J = np.empty((V, 2 + 2 * K))
        J[:, 0:2] = dg_dw
        J[:, 2:2 + K] = B * dg_dw[:, :1]
        J[:, 2 + K:] = B * dg_dw[:, 1:2]
        JtJ = J.T @ J
        damp = np.zeros(2 + 2 * K)
        damp[2:] = reg * np.mean(np.diag(JtJ)[2:])
        JtJ += np.diag(damp) + 1e-14 * np.eye(2 + 2 * K)
        step = np.linalg.solve(JtJ, J.T @ r + damp * theta)
        theta = theta - step
        if np.max(np.abs(step)) < 1e-12:
            break

    c0 = theta[:2]
    d = np.stack([B @ theta[2:2 + K], B @ theta[2 + K:]], axis=-1)
    return MotionProfile(np.zeros(V), d), c0


# --------------------------------------------------------------------------
# 3-D (cone-beam) rigid motion
# --------------------------------------------------------------------------

@dataclasses.dataclass
class MotionProfile3D:
    """Rigid 3-D object pose per view: rotation ``phi_v`` about the z
    axis through isocenter plus translation ``disp_v = (dx, dy, dz)``
    [cm].  Pose maps object-frame points to world:
    ``x_world(v) = R_z(phi_v) x_obj + disp_v``.  The z component is the
    clinical case for cone/helical scans (respiratory drift)."""

    phi: np.ndarray
    disp: np.ndarray

    def __post_init__(self):
        self.phi = np.asarray(self.phi, dtype=np.float64)
        self.disp = np.asarray(self.disp, dtype=np.float64)
        if self.phi.ndim != 1 or self.disp.shape != (len(self.phi), 3):
            raise ValueError("phi must be [V], disp [V, 3]")

    @property
    def n_views(self):
        return len(self.phi)

    @classmethod
    def static(cls, n_views):
        return cls(np.zeros(n_views), np.zeros((n_views, 3)))

    @classmethod
    def breathing_z(cls, n_views, amplitude_cm=0.5, cycles=1.5, phase=0.0):
        """Raised-cosine axial drift — respiration along the scanner
        axis during a cone-beam rotation."""
        s = np.arange(n_views) / max(n_views - 1, 1)
        a = 0.5 * amplitude_cm * (1.0 - np.cos(2 * np.pi * cycles * s
                                                + phase))
        d = np.zeros((n_views, 3))
        d[:, 2] = a
        return cls(np.zeros(n_views), d)

    @classmethod
    def from_2d(cls, motion2d):
        """Lift a :class:`MotionProfile` into the z=0 plane."""
        d = np.zeros((motion2d.n_views, 3))
        d[:, :2] = motion2d.disp
        return cls(motion2d.phi.copy(), d)


def cone_material_paths_motion(phantom, geometry, motion, *,
                               dtype=jnp.float32, method="auto"):
    """Exact cone-beam material paths of a rigidly moving phantom:
    [N_proj, N_rows, N_channels, n_materials].

    Same ray-transform trick as the 2-D path (rays mapped into the
    object frame, ``x_obj = R_z(-phi_v)(x_world - d_v)``), so both the
    packed dominant-axis cone kernel and the 3-D DDA stay exact;
    ``method`` mirrors :func:`~dexct_tpu.ops.conebeam.cone_material_paths`.
    """
    from .conebeam import (ConeDominantUnsupported, trace_cone_dominant,
                           trace_paths_3d)

    if motion.n_views != geometry.N_proj:
        raise ValueError(
            f"motion has {motion.n_views} views, geometry {geometry.N_proj}")
    src, dirs = geometry.ray_geometry_3d()  # [V, R, C, 3] float64
    src_o, dirs_o = rays_in_object_frame(src, dirs, motion.phi,
                                         motion.disp)
    labels_np = np.asarray(phantom.labels).astype(np.int32)
    if method in ("auto", "dominant"):
        try:
            return trace_cone_dominant(
                labels_np, np.asarray(src_o, np.float32),
                np.asarray(dirs_o, np.float32), phantom.dx, phantom.dy,
                phantom.dz, n_materials=phantom.n_materials)
        except ConeDominantUnsupported:
            if method == "dominant":
                raise
    return trace_paths_3d(
        jnp.asarray(labels_np), jnp.asarray(src_o, dtype),
        jnp.asarray(dirs_o, dtype), phantom.dx, phantom.dy, phantom.dz,
        n_materials=phantom.n_materials)


@functools.partial(
    jax.jit,
    static_argnames=("n_matrix", "nz_out", "fov", "view_block"),
)
def _fdk_backproject_motion(q, betas, phi, disp, sid, dgamma, row_h,
                            n_rows, n_matrix, nz_out, fov, dz_out, z0,
                            *, view_block=8):
    """Motion-compensated circular-FDK backprojection: each view
    evaluates every voxel at its world position under the view's pose
    (the 3-D analog of :func:`fan_backproject_motion`), with the
    accumulated-weight normalization of the generalized-Feldkamp
    backprojector (ops/conebeam.py:325) so z-coverage lost to axial
    motion normalizes instead of shading."""
    V, R, C = q.shape
    dtype = q.dtype
    N = n_matrix
    px_size = fov / N
    c_np = (np.arange(N) + 0.5 - N / 2.0) * px_size
    XX, YY = np.meshgrid(c_np, c_np)
    in_circle = np.hypot(XX, YY) <= fov / 2.0
    sel = np.nonzero(in_circle.reshape(-1))[0]
    P = len(sel)
    X = jnp.asarray(XX.reshape(-1)[sel], dtype)
    Y = jnp.asarray(YY.reshape(-1)[sel], dtype)
    zc = jnp.asarray(z0 + np.arange(nz_out) * dz_out, dtype)

    vb = max(1, min(view_block, V))
    while V % vb:
        vb -= 1
    bb = betas.reshape(V // vb, vb)
    phb = phi.reshape(V // vb, vb)
    db = disp.reshape(V // vb, vb, 3)
    voff = jnp.arange(V, dtype=jnp.int32).reshape(V // vb, vb)

    def block(carry, args):
        num, den = carry
        beta, ph, d, vo = args
        cp, sp = jnp.cos(ph), jnp.sin(ph)
        Xv = cp[:, None] * X[None, :] - sp[:, None] * Y[None, :] \
            + d[:, 0:1]
        Yv = sp[:, None] * X[None, :] + cp[:, None] * Y[None, :] \
            + d[:, 1:2]
        cb, sb = jnp.cos(beta)[:, None], jnp.sin(beta)[:, None]
        ell = sid - (Xv * cb + Yv * sb)
        vt = -Xv * sb + Yv * cb
        gam = jnp.arctan2(-vt, ell)
        h2 = ell * ell + vt * vt
        inv_h = jax.lax.rsqrt(h2)
        cidx = gam / dgamma - 0.5 + C / 2.0
        c0 = jnp.clip(jnp.floor(cidx), 0, C - 2)
        fc = jnp.clip(cidx - c0, 0.0, 1.0)
        w_in = jnp.where((cidx >= 0.0) & (cidx <= C - 1.0), 1.0, 0.0)
        w_amp = w_in / h2

        qb = q[vo]
        qb_c1 = jnp.concatenate([qb[..., 1:], qb[..., -1:]], -1)
        qb_r1 = jnp.concatenate([qb[:, 1:], qb[:, -1:]], 1)
        qb_r1c1 = jnp.concatenate([qb_r1[..., 1:], qb_r1[..., -1:]], -1)
        packed_flat = jnp.stack(
            [qb, qb_c1, qb_r1, qb_r1c1], -1).reshape(vb * R * C, 4)
        voff_b = jnp.arange(vb, dtype=jnp.int32)

        def one_slice(z):
            zt = (z + d[:, 2:3]) * sid * inv_h  # [vb, P]
            ridx = zt / row_h - 0.5 + R / 2.0
            r0 = jnp.clip(jnp.floor(ridx), 0, max(R - 2, 0))
            fr = jnp.clip(ridx - r0, 0.0, 1.0)
            w_z = jnp.where((ridx >= -0.5) & (ridx <= R - 0.5), 1.0, 0.0)
            idx = (r0.astype(jnp.int32) * C + c0.astype(jnp.int32)
                   + voff_b[:, None] * (R * C))
            rows = packed_flat[idx.reshape(-1)].reshape(idx.shape + (4,))
            top = rows[..., 0] * (1 - fc) + rows[..., 1] * fc
            bot = rows[..., 2] * (1 - fc) + rows[..., 3] * fc
            val = top * (1 - fr) + bot * fr
            return (jnp.sum(val * w_amp * w_z, axis=0),
                    jnp.sum(w_z, axis=0))

        dn, dd = jax.vmap(one_slice)(zc)
        return (num + dn, den + dd), None

    acc0 = (jnp.zeros((nz_out, P), dtype), jnp.zeros((nz_out, P), dtype))
    (num, den), _ = jax.lax.scan(block, acc0, (bb, phb, db, voff))
    out = jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)
    out = out * (2.0 * np.pi)
    vol = jnp.zeros((nz_out, N * N), dtype)
    vol = vol.at[:, jnp.asarray(sel)].set(out)
    return vol.reshape(nz_out, N, N)


def fdk_reconstruct_motion(sino_log, geometry, n_matrix, fov, ramp,
                           motion, *, nz_out=None, dz_out=None,
                           window="sinc", view_block=8):
    """Motion-compensated circular FDK -> volume [nz_out, N, N] cm^-1.

    Filtering (FDK cone pre-weight + windowed ramp) is identical to the
    static :func:`~dexct_tpu.ops.conebeam.fdk_reconstruct`; the
    backprojection evaluates each voxel at its posed world position per
    view and normalizes by the accumulated row-coverage weight.
    Circular orbits without flying focal spot only (helical MC would
    additionally re-center each voxel's view window per pose).
    """
    from .filters import filter_frequency_response

    ct = geometry
    if abs(getattr(ct, "pitch", 0.0)) > 1e-12:
        raise ValueError("motion-compensated FDK supports circular "
                         "orbits (pitch=0) only")
    if getattr(ct, "ffs", "none") != "none":
        raise ValueError("motion-compensated FDK does not support "
                         "flying-focal-spot geometries")
    if abs(float(ct.rotation_total) - 2.0 * np.pi) > 1e-6:
        # the backprojector's accumulated-weight normalization scales by
        # the full-turn 2*pi; a short scan would come out silently
        # rescaled and without Parker redundancy weighting
        raise ValueError(
            "motion-compensated FDK requires a full 2*pi rotation "
            f"(got rotation_total={float(ct.rotation_total):.4f})")
    if motion.n_views != ct.N_proj:
        raise ValueError(
            f"motion has {motion.n_views} views, geometry {ct.N_proj}")
    V, R, C = sino_log.shape
    if R != ct.N_rows:
        raise ValueError(f"sinogram has {R} rows, geometry {ct.N_rows}")
    nz = R if nz_out is None else int(nz_out)
    dz = float(ct.h_iso if dz_out is None else dz_out)
    dtype = jnp.result_type(sino_log.dtype, jnp.float32)

    cosg = np.cos(ct.gammas)
    cosk = ct.SID / np.sqrt(ct.SID ** 2 + np.asarray(ct.z_iso) ** 2)
    w = jnp.asarray(cosg[None, :] * cosk[:, None] * ct.SID, dtype)
    H, m = filter_frequency_response(C, ct.dgamma, ramp, window, "fan")
    pw = sino_log.astype(dtype) * w[None]
    spec = jnp.fft.rfft(pw, n=m, axis=-1)
    q = jnp.fft.irfft(spec * jnp.asarray(H, dtype), n=m,
                      axis=-1)[..., :C] * ct.dgamma

    z0 = (0.5 - nz / 2.0) * dz
    return _fdk_backproject_motion(
        q, jnp.asarray(ct.betas, dtype), jnp.asarray(motion.phi, dtype),
        jnp.asarray(motion.disp, dtype), float(ct.SID), float(ct.dgamma),
        float(ct.h_iso), int(R), int(n_matrix), int(nz), float(fov), dz,
        float(z0), view_block=int(view_block))


# --------------------------------------------------------------------------
# joint (image, track) motion estimation
# --------------------------------------------------------------------------

def fan_line_coords(geometry):
    """Static (theta_w, t_w) parallel-line coordinates of every fan ray
    [V, C] (host->device float32), INCLUDING the geometry's detector
    offset (``det_offset_ch`` shifts every gamma) — the shared meta of
    the motion resampler (here and in ops/onestep.py)."""
    betas = np.asarray(geometry.betas, np.float64)
    gam = np.asarray(geometry.gammas, np.float64)
    th_w = jnp.asarray(betas[:, None] + gam[None, :] - np.pi / 2.0,
                       jnp.float32)
    t_w = jnp.asarray(geometry.SID * np.sin(gam)[None, :]
                      * np.ones((len(betas), 1)), jnp.float32)
    return th_w, t_w


def _radon_resample_fan(radon, th_w, t_w, disp, n_theta, nt, t0, dt,
                        phi=None):
    """Differentiable fan sampling of a parallel Radon image under a
    per-view rigid object pose.

    The fan ray (v, c) is the line (theta_w, t_w); in the object frame
    (``x_o = R(-phi_v)(x_w - d_v)``) the same line is
    ``(theta_w - phi_v, t_w - d_v . n_hat(theta_w))`` — translation
    shifts t (dotted with the WORLD normal), rotation shifts theta.
    Bilinear sampling of ``radon`` [n_theta, nt] with the theta mod-pi
    wrap flipping t (the static table construction of
    ops/fourier.py:190-224, here kept traced so ``jax.grad`` flows into
    ``disp`` and ``phi``).
    """
    nx, ny = jnp.cos(th_w), jnp.sin(th_w)
    t = t_w - (disp[:, 0:1] * nx + disp[:, 1:2] * ny)
    th = th_w if phi is None else th_w - phi[:, None]
    k = jnp.floor(th / jnp.pi)
    thm = th - k * jnp.pi
    sgn = jnp.where(jnp.mod(k, 2.0) != 0, -1.0, 1.0)
    t = t * sgn
    ft = thm / (jnp.pi / n_theta)
    i0 = jnp.clip(jnp.floor(ft), 0, n_theta - 1).astype(jnp.int32)
    fth = ft - i0
    i1 = i0 + 1
    wrap = i1 >= n_theta
    i1 = jnp.where(wrap, 0, i1)
    tb = jnp.where(wrap, -t, t)

    def taps(tq):
        f = (tq - t0) / dt
        j0 = jnp.clip(jnp.floor(f), 0, nt - 2).astype(jnp.int32)
        return j0, jnp.clip(f - j0, 0.0, 1.0)

    ja, fa = taps(t)
    jb, fb = taps(tb)
    flat = radon.reshape(-1)
    v00 = flat[i0 * nt + ja]
    v01 = flat[i0 * nt + ja + 1]
    v10 = flat[i1 * nt + jb]
    v11 = flat[i1 * nt + jb + 1]
    return ((1 - fth) * ((1 - fa) * v00 + fa * v01)
            + fth * ((1 - fb) * v10 + fb * v11))


def estimate_motion_joint(sino_log, geometry, n_matrix, fov, *,
                          n_modes=6, n_iters=800, beta_tv=3e-3,
                          lr_image=2e-3, lr_track=8e-3, n_theta=512,
                          init=None, basis=None, fit_rotation=False):
    """Joint (image, translation-track) inversion — the tight motion
    estimator.

    Fits a regularized image x AND the rigid translation track
    ``d_v = B_v @ coeffs`` to the measured log sinogram through the
    differentiable motion-forward model ``fan_sample(Radon(x); d)``
    (Fourier-slice Radon + per-view t-shift resampling), minimizing

        || F_d(x) - y ||^2 / ||y||^2  +  beta_tv * TV(x) / N^2

    with Adam on both blocks inside one ``lax.scan``.  Unlike the
    REJECTED alternation (module docstring), the joint fit is not
    circular: one shared TV-regularized image cannot absorb per-view
    pose errors, so the data term genuinely ranks tracks.

    Measured (contrast phantom, 0.6 cm breathing, 192 views, init =
    the centroid estimator at err/amp 0.31): err/amp 0.11 at 400
    iters, 0.065 at 800, 0.060 plateau at 1200; MC-FBP with the
    800-iter track reduces the artifact rms 6.7x — the true-track
    floor is ~7-8x.  Poisson noise does not degrade it: err/amp
    0.063 / 0.070 / 0.040 at air counts 1e6 / 1e5 / 1e4 (the track
    is 12-18 numbers fit to V*C rays — massively overdetermined).
    Cost per iteration is one Radon FFT + one fan resample +
    gradients (all fused under jit).

    ``fit_rotation=True`` adds a rotation track ``phi_v`` on the same
    basis (rotation is a theta-shift in the resampler) — full rigid
    in-plane estimation.  Returns ``(MotionProfile, image)`` — the
    fitted track and the jointly reconstructed image.
    """
    from ..physics.materials import AIR, MaterialTable
    from ..system.phantom import VoxelPhantom
    from .fourier import fourier_radon, plan_fourier_projector

    V, C = sino_log.shape
    if V != geometry.N_proj:
        raise ValueError(f"sinogram has {V} views, geometry "
                         f"{geometry.N_proj}")
    y = jnp.asarray(sino_log, jnp.float32)
    B = jnp.asarray(basis if basis is not None
                    else cosine_motion_basis(V, n_modes), jnp.float32)
    K = B.shape[1]

    dx = float(fov) / int(n_matrix)
    dummy = VoxelPhantom("moco_grid",
                         np.zeros((int(n_matrix), int(n_matrix)),
                                  np.uint8),
                         MaterialTable([AIR]), dx, dx, dx)
    plan = plan_fourier_projector(dummy, geometry, n_theta=int(n_theta))

    th_w, t_w = fan_line_coords(geometry)

    if init is None:
        init, _ = estimate_translation(np.asarray(y), geometry,
                                       n_modes=K, basis=np.asarray(B))
    cd0 = np.linalg.lstsq(np.asarray(B), init.disp, rcond=None)[0]
    if fit_rotation:
        cp0 = np.linalg.lstsq(np.asarray(B), init.phi, rcond=None)[0]
        c0 = jnp.asarray(np.concatenate([cd0.ravel(), cp0]),
                         jnp.float32)
    else:
        c0 = jnp.asarray(cd0.ravel(), jnp.float32)
    x0, _ = fbp_recon_motion(y, geometry, int(n_matrix), float(fov),
                             init)
    x0 = jnp.asarray(x0, jnp.float32)
    norm = jnp.sum(y * y)

    def track(c):
        disp = B @ c[:2 * K].reshape(K, 2)
        phi = B @ c[2 * K:] if fit_rotation else None
        return disp, phi

    def loss(x, c):
        radon = fourier_radon(plan, x[None])[0]
        disp, phi = track(c)
        pred = _radon_resample_fan(radon, th_w, t_w, disp,
                                   plan.n_theta, plan.nt, plan.t0,
                                   plan.dt, phi=phi)
        data = jnp.sum((pred - y) ** 2) / norm
        dgx = x[:, 1:] - x[:, :-1]
        dgy = x[1:] - x[:-1]
        tv = jnp.sum(jnp.sqrt(dgx[:-1] ** 2 + dgy[:, :-1] ** 2 + 1e-6))
        return data + beta_tv * tv / x.size

    grad = jax.grad(loss, argnums=(0, 1))

    from ..utils.optim import adam_step

    def body(carry, i):
        x, c, mx, vx, mc, vc = carry
        gx, gc = grad(x, c)
        x, mx, vx = adam_step(x, gx, mx, vx, i, lr_image)
        c, mc, vc = adam_step(c, gc, mc, vc, i, lr_track)
        return (x, c, mx, vx, mc, vc), None

    z = jnp.zeros_like
    (x, c, *_), _ = jax.lax.scan(
        jax.jit(body), (x0, c0, z(x0), z(x0), z(c0), z(c0)),
        jnp.arange(int(n_iters), dtype=jnp.float32))
    disp_f, phi_f = track(c)
    disp = np.asarray(disp_f, np.float64)
    phi = (np.asarray(phi_f, np.float64) if fit_rotation
           else np.zeros(V))
    return MotionProfile(phi, disp), x


@functools.partial(
    jax.jit,
    static_argnames=("n_matrix", "nz_out", "fov", "view_block"),
)
def _helical_backproject_motion(q, betas, src_z, beta_mid, phi, disp,
                                sid, dgamma, row_h, n_rows, pitch,
                                n_matrix, nz_out, fov, dz_out, z0, *,
                                view_block=8):
    """Motion-compensated generalized-Feldkamp helical backprojection
    ('full' 2*pi-window weighting of ops/conebeam.py:325, with every
    voxel evaluated at its posed world position per view).  The window
    centers on the source's passage of the voxel's INSTANTANEOUS world
    z (z + dz_v) — an axially drifting voxel is reconstructed from the
    views that actually saw it."""
    V, R, C = q.shape
    dtype = q.dtype
    N = n_matrix
    px_size = fov / N
    c_np = (np.arange(N) + 0.5 - N / 2.0) * px_size
    XX, YY = np.meshgrid(c_np, c_np)
    in_circle = np.hypot(XX, YY) <= fov / 2.0
    sel = np.nonzero(in_circle.reshape(-1))[0]
    P = len(sel)
    X = jnp.asarray(XX.reshape(-1)[sel], dtype)
    Y = jnp.asarray(YY.reshape(-1)[sel], dtype)
    zc = jnp.asarray(z0 + np.arange(nz_out) * dz_out, dtype)

    vb = max(1, min(view_block, V))
    while V % vb:
        vb -= 1
    bb = betas.reshape(V // vb, vb)
    zb = src_z.reshape(V // vb, vb)
    phb = phi.reshape(V // vb, vb)
    db = disp.reshape(V // vb, vb, 3)
    voff = jnp.arange(V, dtype=jnp.int32).reshape(V // vb, vb)

    def block(carry, args):
        num, den = carry
        beta, sz, ph, d, vo = args
        cp, sp = jnp.cos(ph)[:, None], jnp.sin(ph)[:, None]
        Xv = cp * X[None, :] - sp * Y[None, :] + d[:, 0:1]
        Yv = sp * X[None, :] + cp * Y[None, :] + d[:, 1:2]
        cb, sb = jnp.cos(beta)[:, None], jnp.sin(beta)[:, None]
        ell = sid - (Xv * cb + Yv * sb)
        vt = -Xv * sb + Yv * cb
        gam = jnp.arctan2(-vt, ell)
        h2 = ell * ell + vt * vt
        inv_h = jax.lax.rsqrt(h2)
        cidx = gam / dgamma - 0.5 + C / 2.0
        c0 = jnp.clip(jnp.floor(cidx), 0, C - 2)
        fc = jnp.clip(cidx - c0, 0.0, 1.0)
        w_in = jnp.where((cidx >= 0.0) & (cidx <= C - 1.0), 1.0, 0.0)
        w_amp = w_in / h2

        qb = q[vo]
        qb_c1 = jnp.concatenate([qb[..., 1:], qb[..., -1:]], -1)
        qb_r1 = jnp.concatenate([qb[:, 1:], qb[:, -1:]], 1)
        qb_r1c1 = jnp.concatenate([qb_r1[..., 1:], qb_r1[..., -1:]], -1)
        packed_flat = jnp.stack(
            [qb, qb_c1, qb_r1, qb_r1c1], -1).reshape(vb * R * C, 4)
        voff_b = jnp.arange(vb, dtype=jnp.int32)

        def one_slice(z):
            zv = z + d[:, 2:3]  # posed world z [vb, 1]
            zt = (zv - sz[:, None]) * sid * inv_h
            ridx = zt / row_h - 0.5 + R / 2.0
            r0 = jnp.clip(jnp.floor(ridx), 0, max(R - 2, 0))
            fr = jnp.clip(ridx - r0, 0.0, 1.0)
            w_z = jnp.where((ridx >= -0.5) & (ridx <= R - 0.5), 1.0,
                            0.0)
            # 2*pi window centered on the source's passage of the
            # voxel's instantaneous z
            bc = beta_mid + 2.0 * jnp.pi * zv / pitch
            w_win = jnp.where(jnp.abs(beta[:, None] - bc) <= jnp.pi,
                              1.0, 0.0)
            w = w_z * w_win
            idx = (r0.astype(jnp.int32) * C + c0.astype(jnp.int32)
                   + voff_b[:, None] * (R * C))
            rows = packed_flat[idx.reshape(-1)].reshape(idx.shape + (4,))
            top = rows[..., 0] * (1 - fc) + rows[..., 1] * fc
            bot = rows[..., 2] * (1 - fc) + rows[..., 3] * fc
            val = top * (1 - fr) + bot * fr
            return (jnp.sum(val * w_amp * w, axis=0),
                    jnp.sum(w, axis=0))

        dn, dd = jax.vmap(one_slice)(zc)
        return (num + dn, den + dd), None

    acc0 = (jnp.zeros((nz_out, P), dtype), jnp.zeros((nz_out, P), dtype))
    (num, den), _ = jax.lax.scan(block, acc0, (bb, zb, phb, db, voff))
    out = jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)
    out = out * (2.0 * np.pi)
    vol = jnp.zeros((nz_out, N * N), dtype)
    vol = vol.at[:, jnp.asarray(sel)].set(out)
    return vol.reshape(nz_out, N, N)


def helical_fdk_reconstruct_motion(sino_log, geometry, n_matrix, fov,
                                   ramp, motion, *, z_out=None,
                                   window="sinc", view_block=8):
    """Motion-compensated helical generalized-Feldkamp reconstruction
    -> [nz, N, N] cm^-1 (the clinical case: respiratory drift during a
    helical scan).

    Filtering matches the static
    :func:`~dexct_tpu.ops.conebeam.helical_fdk_reconstruct` ('full'
    weighting); the backprojection poses every voxel per view AND
    re-centers its 2*pi window on the source's passage of the posed z.
    Zero motion reproduces the static helical path; static spot only.
    """
    from .filters import filter_frequency_response

    ct = geometry
    if abs(getattr(ct, "pitch", 0.0)) < 1e-12:
        raise ValueError("geometry has no pitch; use "
                         "fdk_reconstruct_motion for circular orbits")
    if getattr(ct, "ffs", "none") != "none":
        raise ValueError("motion-compensated helical reconstruction "
                         "supports static focal spots only")
    if motion.n_views != ct.N_proj:
        raise ValueError(
            f"motion has {motion.n_views} views, geometry {ct.N_proj}")
    V, R, C = sino_log.shape
    if R != ct.N_rows:
        raise ValueError(f"sinogram has {R} rows, geometry {ct.N_rows}")
    dtype = jnp.result_type(sino_log.dtype, jnp.float32)

    if z_out is None:
        travel = ct.pitch * ct.rotation_total / (2.0 * np.pi)
        half = 0.4 * travel
        nz = max(int(2.0 * half / ct.h_iso), 1)
        z_out = (np.arange(nz) + 0.5) * (2.0 * half / nz) - half
    z_out = np.asarray(z_out, np.float64)
    if len(z_out) > 1:
        dzs = np.diff(z_out)
        if not np.allclose(dzs, dzs[0]):
            raise ValueError("z_out must be uniformly spaced")
        dz = float(dzs[0])
    else:
        dz = float(ct.h_iso)

    cosg = np.cos(ct.gammas)
    cosk = ct.SID / np.sqrt(ct.SID ** 2 + np.asarray(ct.z_iso) ** 2)
    w = jnp.asarray(cosg[None, :] * cosk[:, None] * ct.SID, dtype)
    H, m = filter_frequency_response(C, ct.dgamma, ramp, window, "fan")
    pw = sino_log.astype(dtype) * w[None]
    spec = jnp.fft.rfft(pw, n=m, axis=-1)
    q = jnp.fft.irfft(spec * jnp.asarray(H, dtype), n=m,
                      axis=-1)[..., :C] * ct.dgamma

    return _helical_backproject_motion(
        q, jnp.asarray(ct.betas, dtype),
        jnp.asarray(ct.source_z, dtype),
        float(0.5 * ct.rotation_total), jnp.asarray(motion.phi, dtype),
        jnp.asarray(motion.disp, dtype), float(ct.SID),
        float(ct.dgamma), float(ct.h_iso), int(R), float(ct.pitch),
        int(n_matrix), int(len(z_out)), float(fov), dz,
        float(z_out[0]), view_block=int(view_block))
