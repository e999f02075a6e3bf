"""Gauss-Newton basis material decomposition, fused for TPU.

Rebuild of the reference's decomposition stack (fully readable at
/root/reference/matdecomp.py; math traced in SURVEY.md §3.2; Rigie &
La Riviere 2015).  Per sinogram pixel p with measured counts y_m (m = two
spectra) the solver maximizes the Poisson likelihood of

    nu_m(a) = sum_E i0_m(E) exp(-(a_1 mu_1(E) + a_2 mu_2(E)))

over basis-material area densities a [g/cm^2] via Newton iterations
with the exact gradient/Hessian.  Generalizes the reference's two-spectra
/ two-material case to M >= 2 measurements (multi-bin photon counting)
and K in {2, 3, 4} basis materials.

TPU-native design vs the reference's per-view Python loop
(matdecomp.py:109-125):

* ALL pixels iterate simultaneously — one ``lax.fori_loop`` over Newton
  iterations wrapping matmuls of shape [P, E] x [E, k]:
  attenuation, nu, gradient, and Hessian contractions all hit the MXU.
* The KxK Newton system is solved in closed form (no ``linalg.inv``).
* Energy tables are normalized by a common scale so float32 stays in
  range — the update is exactly invariant to a joint rescale of (y, i0),
  which preserves the Poisson inter-measurement weighting.
* The exp-range clip is ±80 in float32 (exp overflows at ~88), ±700 in
  float64 (the reference's clip, matdecomp.py:116); L >= 0 physically so
  the positive branch only guards transient negative-a iterates.
* Pixels are processed in blocks (``lax.map``) to bound the [P, E]
  working set in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import xcom
from ..physics.materials import BONE, TISSUE

__all__ = [
    "gauss_newton_solve",
    "pcd_bin_fluences",
    "decompose_multibin_grid",
    "prepare_decomposition",
    "decompose_sinograms",
    "air_mask",
    "DEFAULT_BASIS",
    "image_domain_decomposition",
]

DEFAULT_BASIS = (TISSUE, BONE)  # matdecomp.py:12-17


def _tri_pairs(k):
    """Upper-triangle index pairs in row order, e.g. k=2 -> 00,01,11."""
    return [(i, j) for i in range(k) for j in range(i, k)]


def _solve_spd(H_tri, dF, n_mats):
    """Closed-form solve of the symmetric n_mats x n_mats system.

    H_tri: [B, T] upper-triangle entries (row order); dF: [B, K].

    The system is normalized per pixel by max|H| before the adjugate
    solve: H entries scale as (counts * mu^2)^2 in the determinant and
    overflow float32 for transiently huge iterates, turning the solve
    into inf/inf = NaN.  The normalized solve is algebraically identical.

    Pixels whose H underflowed entirely (photon-starved ray driven deep
    into the exp clip: atten, g, H all 0) get a ZERO step, not
    dF / floor -> inf (measured NaN source: inf * 0 in the caller's
    trust-region scaling): with no curvature information the only safe
    Newton step is none, and the residual clamps elsewhere keep such
    pixels recoverable on later iterations.
    """
    m_raw = jnp.max(jnp.abs(H_tri), axis=-1, keepdims=True)
    dead = m_raw < 1e-30
    m = jnp.where(dead, 1.0, m_raw)
    H_tri = H_tri / m
    dF = jnp.where(dead, 0.0, dF / m)
    if n_mats == 2:
        H00, H01, H11 = H_tri[:, 0], H_tri[:, 1], H_tri[:, 2]
        det = H00 * H11 - H01 * H01
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        d0 = (H11 * dF[:, 0] - H01 * dF[:, 1]) / det
        d1 = (H00 * dF[:, 1] - H01 * dF[:, 0]) / det
        return jnp.stack([d0, d1], -1)
    if n_mats == 3:
        a, b, c, d, e, f = (H_tri[:, i] for i in range(6))
        # H = [[a, b, c], [b, d, e], [c, e, f]] — adjugate solve
        A00 = d * f - e * e
        A01 = c * e - b * f
        A02 = b * e - c * d
        A11 = a * f - c * c
        A12 = b * c - a * e
        A22 = a * d - b * b
        det = a * A00 + b * A01 + c * A02
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        x0 = (A00 * dF[:, 0] + A01 * dF[:, 1] + A02 * dF[:, 2]) / det
        x1 = (A01 * dF[:, 0] + A11 * dF[:, 1] + A12 * dF[:, 2]) / det
        x2 = (A02 * dF[:, 0] + A12 * dF[:, 1] + A22 * dF[:, 2]) / det
        return jnp.stack([x0, x1, x2], -1)
    if n_mats == 4:
        # H = [[a, b, c, d], [b, e, f, g], [c, f, h, i], [d, g, i, j]]
        # — symmetric adjugate solve (10 unique cofactors, each a 3x3
        # minor); branch-free like the 2x2/3x3 cases so the indefinite
        # full-Newton path keeps working.  Enables 4-material spectral
        # decompositions (e.g. tissue/bone + two K-edge agents from
        # >= 4 PCD bins).
        a, b, c, d, e, f, g, h, i, j = (H_tri[:, k] for k in range(10))
        A00 = e * (h * j - i * i) - f * (f * j - g * i) \
            + g * (f * i - g * h)
        A01 = -(b * (h * j - i * i) - f * (c * j - i * d)
                + g * (c * i - h * d))
        A02 = b * (f * j - i * g) - e * (c * j - i * d) \
            + g * (c * g - f * d)
        A03 = -(b * (f * i - h * g) - e * (c * i - h * d)
                + f * (c * g - f * d))
        A11 = a * (h * j - i * i) - c * (c * j - i * d) \
            + d * (c * i - h * d)
        A12 = -(a * (f * j - i * g) - b * (c * j - i * d)
                + d * (c * g - f * d))
        A13 = a * (f * i - h * g) - b * (c * i - h * d) \
            + c * (c * g - f * d)
        A22 = a * (e * j - g * g) - b * (b * j - g * d) \
            + d * (b * g - e * d)
        A23 = -(a * (e * i - f * g) - b * (b * i - f * d)
                + c * (b * g - e * d))
        A33 = a * (e * h - f * f) - b * (b * h - f * c) \
            + c * (b * f - e * c)
        det = a * A00 + b * A01 + c * A02 + d * A03
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        x0 = (A00 * dF[:, 0] + A01 * dF[:, 1] + A02 * dF[:, 2]
              + A03 * dF[:, 3]) / det
        x1 = (A01 * dF[:, 0] + A11 * dF[:, 1] + A12 * dF[:, 2]
              + A13 * dF[:, 3]) / det
        x2 = (A02 * dF[:, 0] + A12 * dF[:, 1] + A22 * dF[:, 2]
              + A23 * dF[:, 3]) / det
        x3 = (A03 * dF[:, 0] + A13 * dF[:, 1] + A23 * dF[:, 2]
              + A33 * dF[:, 3]) / det
        return jnp.stack([x0, x1, x2, x3], -1)
    raise NotImplementedError("closed-form solve supports 2-4 materials")


def _solve_block(y, i0T, musT, grad_w, hess_w, n_iters, eps_init, clip,
                 step_max, a_lo, a_hi, use_full_newton, lm_damping=0.0,
                 polish_iters=4, warm="log", warm_tables=None):
    """Newton iterations for one pixel block (general M measurements,
    K in {2, 3, 4} basis materials).

    y: [B, M]; i0T: [E, M]; musT: [E, K];
    grad_w: [E, M*K]; hess_w: [E, M*T] with T = K(K+1)/2.
    Returns a: [B, K].

    Two-phase schedule:

    * **warm phase** (``n_iters - polish_iters`` iterations, bfloat16
      energy chain): by default Newton on the *log-count* residuals
      ``ln(y_m) - ln(nu_m)``.  The log transform makes the forward model
      near-linear in ``a`` (Beer-Lambert is multiplicative), so the first
      step already solves the effective-energy linearization and the rest
      mop up beam hardening — global convergence even for the strongly
      attenuated rays where raw-count Newton diverges (the reference
      papers over those with a post-hoc mask, matdecomp.py:185-196).
      The Jacobian J_mi = g_mi / nu_m needs no Hessian-weight contraction,
      cutting the warm phase's MXU/HBM work by the hess_w columns.
    * **polish phase** (float32, HIGHEST precision): the Poisson-MLE
      Gauss-Newton iteration, which owns the fixed point (for M == K both
      phases solve nu == y exactly, so they share it; for M > K the MLE
      weighting is authoritative).
    """
    B = y.shape[0]
    dtype = y.dtype
    n_meas = y.shape[1]
    n_mats = musT.shape[1]
    tri = _tri_pairs(n_mats)
    a0 = jnp.full((B, n_mats), eps_init, dtype)

    # one fused weight matrix [E, M + M*K + M*T]: nu, gradient, and
    # Hessian contractions share a single pass over the [B, E]
    # attenuation array (they are bandwidth-bound — output widths of
    # 2/4/6 all pad to one 128-lane MXU tile anyway).  The log-warm
    # phase only needs the first M + M*K columns.
    w_all = jnp.concatenate([i0T, grad_w, hess_w], axis=-1)
    n_g = n_meas * n_mats
    if warm_tables is not None:
        # moment-compressed energy tables (VERDICT round-2 item 5): the
        # warm phase runs its [B, E] exp/matmul chain on ~E/4 quadrature
        # nodes; the full-table float32 polish owns the fixed point, so
        # the compression error (which only shifts where the warm phase
        # lands inside Newton's basin) is annihilated quadratically.
        i0T_c, musT_c, grad_w_c = warm_tables
        musT_bf = musT_c.astype(jnp.bfloat16)
        w_ng_bf = jnp.concatenate([i0T_c, grad_w_c],
                                  axis=-1).astype(jnp.bfloat16)
    else:
        musT_bf = musT.astype(jnp.bfloat16)
        w_ng_bf = w_all[:, :n_meas + n_g].astype(jnp.bfloat16)
    w_all_bf = w_all.astype(jnp.bfloat16)
    # the y floor matches the nu floor below so fully photon-starved
    # pixels (y = 0 AND nu underflowed) get a neutral r = 0 residual
    log_y = jnp.log(jnp.maximum(y, 1e-35))

    def _gn_body(_, a, hi, fast_exp, log_step):
        # lower clip guards underflow only; the upper clip is tight (+20)
        # because L >= 0 physically — transiently negative a iterates must
        # not overflow exp * mu^2 weights (the reference's symmetric ±700
        # clip, matdecomp.py:116, is exactly the float64 overflow the CuPy
        # float32 path died on, matdecomp.py:89-92)
        if fast_exp:
            # the iteration is HBM-bound on the [B, E] intermediates, so
            # the warm phase keeps the whole energy-axis chain in bfloat16
            # (half the traffic, ~5x faster exp).  The coarse L rounding
            # (~2^-9 relative) only perturbs the descent direction — the
            # HIGHEST-precision float32 polish phase sets the fixed point.
            L = jnp.matmul(a.astype(jnp.bfloat16), musT_bf.T)  # [B, E]
            atten = jnp.exp(jnp.clip(-L, -clip, jnp.bfloat16(20.0)))
            ngh = jax.lax.dot_general(
                atten, w_ng_bf if log_step else w_all_bf,
                (((1,), (0,)), ((), ())),
                preferred_element_type=dtype)  # [B, M(+MK+MT)] f32
        else:
            L = jnp.matmul(a, musT.T, precision=hi)
            atten = jnp.exp(jnp.clip(-L, -clip, 20.0))
            ngh = jnp.matmul(
                atten, w_all[:, :n_meas + n_g] if log_step else w_all,
                precision=hi)
        nu = ngh[:, :n_meas]  # [B, M]
        g = ngh[:, n_meas:n_meas + n_g].reshape(B, n_meas, n_mats)
        if log_step:
            # Newton on r_m = ln y_m - ln nu_m with Jacobian
            # d(-ln nu_m)/d a_i = g_mi / nu_m (g = +atten@(i0 mu) =
            # -d nu/d a).  Solved via JtJ normal equations so the same
            # closed-form SPD solve serves M >= K.
            nu_safe = jnp.maximum(nu, 1e-35)
            J = g / nu_safe[..., None]  # [B, M, K]
            # photon-starved pixels (y ~ 0) would send the residual to
            # -inf; bounding it keeps the step finite and leaves the MLE
            # polish (which handles y = 0 exactly) to finish the job.
            # r = ln y - ln nu, matching the MLE branch's r = y/nu - 1
            # linearization and its `a - H^-1 dF` update convention.
            r = jnp.clip(log_y - jnp.log(nu_safe), -30.0, 30.0)  # [B, M]
            dF = jnp.einsum("bm,bmi->bi", r, J)
            H_tri = jnp.stack(
                [jnp.sum(J[:, :, i] * J[:, :, j], axis=1) for i, j in tri],
                -1)
        else:
            h = ngh[:, n_meas + n_g:].reshape(B, n_meas, len(tri))
            # floor at the float32 overflow boundary of y/nu^2: y is
            # normalized by max(i0) but SUMS the energy axis, so it can
            # reach ~1e2-1e4; nu >= 1e-17 keeps yv2 <= 1e38 finite up to
            # y ~ 3e4.  A starved measurement entering the polish from a
            # railed warm iterate (atten fully underflowed) then pulls
            # back with a finite trust-region-clamped step instead of
            # inf * 0 = NaN, while genuinely tiny-but-valid rows
            # (nu ~ 1e-14, kV behind metal) keep their exact MLE weight
            nu = jnp.maximum(nu, 1e-17)
            r = y / nu - 1.0  # [B, M]
            yv2 = y / (nu * nu)  # [B, M]
            # dF_i = sum_m r_m g_mi   (g already carries the minus sign
            # twice: dF = -sum r * (-g) = +sum r g)
            dF = jnp.einsum("bm,bmi->bi", r, g)
            gg = jnp.stack([g[:, :, i] * g[:, :, j] for i, j in tri], -1)
            if use_full_newton:
                # full Newton: H_ij = -sum_m [ r_m h_mij - yv2_m g_mi g_mj ]
                # (the reference's iteration, matdecomp.py:122-123;
                # indefinite far from the optimum, prone to divergence)
                H_tri = -jnp.sum(r[..., None] * h - yv2[..., None] * gg,
                                 axis=1)
            else:
                # Gauss-Newton / Fisher-scoring: drop the second-derivative
                # residual term -> H = sum_m yv2 g g, always PSD; identical
                # fixed point and identical local rate at zero residual
                # (Rigie & La Riviere 2015 prescribe exactly this)
                H_tri = jnp.sum(yv2[..., None] * gg, axis=1)
        if lm_damping:
            # Levenberg-Marquardt diagonal scaling: essential for the
            # ill-conditioned 3-material spectral problem
            diag_ix = np.cumsum([0] + [n_mats - i for i in range(n_mats)])[
                :n_mats]
            H_tri = H_tri.at[:, diag_ix].multiply(1.0 + lm_damping)
        # trust-region clamp: plain Newton diverges for strongly attenuated
        # rays (the reference's post-hoc outlier mask, matdecomp.py:185-196,
        # papers over exactly this); bounding the step restores global
        # convergence while preserving the quadratic local rate.  The log
        # phase's natural step scale is the full solution norm, so it gets
        # a much looser clamp.
        step = _solve_spd(H_tri, dF, n_mats)
        norm = jnp.sqrt(jnp.sum(step * step, -1, keepdims=True))
        smax = 10.0 * step_max if log_step else step_max
        step = step * jnp.minimum(1.0, smax / jnp.maximum(norm, 1e-30))
        # the warm phase clamps negative excursions hard: transiently
        # negative iterates are pure overshoot (L >= 0 physically), and a
        # deep-negative a drives -L into the exp clip where the fused
        # gradient no longer matches nu.  The MLE polish keeps the loose
        # a_lo so genuinely negative noise-driven solutions survive.
        lo = jnp.maximum(a_lo, -1.0) if log_step else a_lo
        return jnp.clip(a - step, lo, a_hi)

    def make_body(hi, fast_exp=False, log_step=False):
        return functools.partial(_gn_body, hi=hi, fast_exp=fast_exp,
                                 log_step=log_step)

    n_pol = min(polish_iters, n_iters)
    use_log = warm == "log" and not use_full_newton
    # For M == K the system nu(a) == y is exactly determined, so the log
    # parametrization and the Poisson MLE share the root — and the log
    # residual is scale-free, so a photon-starved channel (kV behind thick
    # metal: nu ~ 1e-14 of the MV channel) still contributes a
    # well-conditioned row instead of vanishing below float32 rounding of
    # the MLE's count-weighted normal equations (which otherwise random-
    # walks the solution along the starved direction).  For M > K the MLE
    # weighting is statistically meaningful and owns the polish.
    log_polish = use_log and n_meas == n_mats
    a = jax.lax.fori_loop(
        0, n_iters - n_pol,
        make_body(jax.lax.Precision.DEFAULT,
                  fast_exp=(n_pol > 0 and dtype == jnp.float32),
                  log_step=use_log), a0)
    return jax.lax.fori_loop(
        0, n_pol,
        make_body(jax.lax.Precision.HIGHEST, log_step=log_polish), a)


@functools.partial(
    jax.jit, static_argnames=("n_iters", "pixel_block", "method",
                              "lm_damping", "polish_iters", "warm",
                              "warm_nodes")
)
def gauss_newton_solve(counts, i0, mus, *, n_iters=30, eps_init=1e-6,
                       pixel_block=65536, step_max=5.0,
                       a_bounds=(-20.0, 500.0), method="gn",
                       lm_damping=0.0, polish_iters=4, warm="log",
                       warm_nodes=32):
    """Vectorized Poisson-MLE Newton solve over all sinogram pixels.

    counts: [M, P] detected counts (M = measurements: 2 for classic DE,
        more for multi-bin photon-counting acquisitions).
    i0:     [M, E] effective fluence per energy bin per measurement.
    mus:    [K, E] basis mass attenuation [cm^2/g], K in {2, 3, 4} and
        K <= M.
    Returns a: [P, K] area densities [g/cm^2] (matdecomp.py:42 contract).

    ``warm_nodes`` (VERDICT round-2 item 5): when the union grid has
    more than ``2 * warm_nodes`` bins, the bfloat16 log-Newton warm
    phase runs on a moment-compressed table of ~``warm_nodes``
    quadrature nodes (segments of equal bin count; per segment the
    per-spectrum fluence sums exactly and the node attenuation is the
    combined-fluence-weighted mean, so nu and its gradient match at
    a = 0 and drift only as the in-segment spread times the iterate).
    The float32 HIGHEST full-table polish phase (and the M == K log
    polish) still owns the fixed point — the compression moves only
    where the warm phase lands inside Newton's basin, and the polish
    contracts that error quadratically (parity pinned in
    tests/test_matdecomp.py).  Set ``warm_nodes=0`` to disable.
    """
    dtype = counts.dtype
    n_meas = counts.shape[0]
    n_mats = mus.shape[0]
    if n_mats > n_meas:
        raise ValueError(
            f"{n_mats} materials need at least that many measurements "
            f"(got {n_meas})"
        )
    clip = 700.0 if dtype == jnp.float64 else 80.0
    # common normalization keeps float32 in range; Newton step is invariant
    scale = jnp.maximum(jnp.max(i0), 1e-30)
    i0n = (i0 / scale).astype(dtype)
    yn = (counts / scale).astype(dtype)
    mus = mus.astype(dtype)

    # energy-side weight matrices (built once, fused into MXU contractions)
    i0T = i0n.T  # [E, M]
    musT = mus.T  # [E, K]
    # g_mi weights: -i0_m mu_i, so that (atten @ grad_w) = d nu_m / d a_i
    # ... sign convention: d nu/d a_i = -sum i0 mu_i atten; we fold the
    # minus into the weights and the dF formula uses +sum r g.
    grad_w = jnp.stack(
        [i0n[m] * mus[i] for m in range(n_meas) for i in range(n_mats)],
        -1,
    )  # [E, M*K] -> (m,i) row-major; POSITIVE weights
    hess_w = jnp.stack(
        [i0n[m] * mus[i] * mus[j]
         for m in range(n_meas) for (i, j) in _tri_pairs(n_mats)],
        -1,
    )  # [E, M*T]

    # compressed warm tables (only for the bf16 log-warm configuration,
    # where the full-table polish phase exists to own the fixed point)
    E = i0.shape[1]
    warm_tables = None
    if (warm_nodes and warm == "log" and method != "newton"
            and polish_iters > 0 and n_iters > polish_iters
            and dtype == jnp.float32 and E > 2 * warm_nodes):
        seg = -(-E // int(warm_nodes))
        kc = -(-E // seg)
        pad_e = kc * seg - E
        i0p = jnp.pad(i0n, ((0, 0), (0, pad_e)))
        musp = jnp.pad(mus, ((0, 0), (0, pad_e)), mode="edge")
        wgt = i0p.sum(0).reshape(kc, seg) + 1e-30  # combined fluence
        i0_c = i0p.reshape(n_meas, kc, seg).sum(-1)  # exact 0th moments
        mu_c = (musp.reshape(n_mats, kc, seg) * wgt[None]).sum(-1) \
            / wgt.sum(-1)[None]  # [K, kc]
        grad_w_c = jnp.stack(
            [i0_c[m] * mu_c[i]
             for m in range(n_meas) for i in range(n_mats)], -1)
        warm_tables = (i0_c.T, mu_c.T, grad_w_c)

    P = counts.shape[1]
    block = min(pixel_block, P)
    n_blocks = -(-P // block)
    pad = n_blocks * block - P
    yp = jnp.pad(yn.T, ((0, pad), (0, 0)), constant_values=1.0)
    yb = yp.reshape(n_blocks, block, n_meas)

    solve = functools.partial(
        _solve_block, i0T=i0T, musT=musT, grad_w=grad_w, hess_w=hess_w,
        n_iters=n_iters, eps_init=eps_init, clip=clip, step_max=step_max,
        a_lo=a_bounds[0], a_hi=a_bounds[1],
        use_full_newton=(method == "newton"),
        lm_damping=lm_damping,
        polish_iters=polish_iters,
        warm=warm,
        warm_tables=warm_tables,
    )
    if n_blocks == 1:
        out = solve(yb[0])[None]
    else:
        out = jax.lax.map(solve, yb)
    return out.reshape(-1, n_mats)[:P]


def prepare_decomposition(geometry, spec1, spec2, basis=DEFAULT_BASIS,
                          t_ref=1.0):
    """Union-energy-grid tables for the two-spectra solve (host, float64).

    Mirrors the construction at matdecomp.py:140-160: sorted union of the
    two spectra's energy grids; dE with first-bin = E[0]; detector response
    interpolated and EID-weighted; I0 interpolated per spectrum; basis
    curves as MASS attenuation (the density multiply is deliberately
    omitted so outputs are g/cm^2 area densities, matdecomp.py:157-158).

    ``t_ref`` [g/cm^2] is the :func:`detectable_bins` pruning reference
    thickness (t_ref=0 keeps every nonzero-fluence bin); the physics
    outputs sit on a plateau across t_ref in [0.1, 5] (sensitivity sweep
    in tests/test_matdecomp.py, VERDICT round-2 item 9).

    Returns (ee [E], i0 [2, E], mus [2, E]).
    """
    ee = np.array(sorted(set(np.append(spec1.E, spec2.E))))
    dE = np.append([ee[0]], np.diff(ee))
    detresponse = geometry.detector_response(ee)
    i0 = np.stack([
        np.interp(ee, spec1.E, spec1.I0) * detresponse * dE,
        np.interp(ee, spec2.E, spec2.I0) * detresponse * dE,
    ])
    mus = np.stack([xcom.mixatten(m.matcomp, ee) for m in basis])
    keep = detectable_bins(i0, mus, t_ref=t_ref)
    return ee[keep], i0[:, keep], mus[:, keep]


def detectable_bins(i0, mus, t_ref=1.0, rel_floor=1e-12):
    """Mask of energy bins that can influence a *measured* (non-air) ray.

    Unfiltered source spectra (e.g. the reference's shipped 80/140 kV
    binaries, which carry raw-tube fluence down to 2 keV where
    mu/rho ~ 5e2 cm^2/g) contain bins whose photons cannot traverse even
    ``t_ref`` g/cm^2 of the first basis material (one cm of tissue:
    transmission e^-42 at 5 keV).  Those bins only contribute to air rays
    — which the decomposition masks anyway (matdecomp.py:194-196) — but
    they poison the solver twice: they dominate the a=0 Jacobian (wild
    first Newton steps) and, once an iterate goes transiently negative,
    they pin the exp clip where the fused-matmul gradient is inconsistent
    with the clipped nu (a zero-progress fixed direction).

    Error bound (ADVICE round 2): dropping the pruned bins changes nu by
    < ``rel_floor`` relative only for rays that traverse at least ``t_ref``
    g/cm^2 of the first basis material.  Rays thinner than ``t_ref`` that
    still fall below the air-mask threshold (phantom periphery grazers
    under a *raw-tube* spectrum) see a forward-model bias of up to
    ~exp(-mu_lo * t) per pruned bin rather than the floor bound; with the
    reference protocol (0.95 air mask, >=10 cm water-equivalent objects)
    no such ray survives masking, and the t_ref sensitivity sweep in
    tests/test_matdecomp.py pins that the physics outputs sit on a plateau
    across t_ref in [0.1, 5] g/cm^2.
    """
    i0 = np.asarray(i0, np.float64)
    mus = np.asarray(mus, np.float64)
    w = i0.sum(0) * np.exp(-np.clip(mus[0] * t_ref, 0.0, 700.0))
    keep = w > rel_floor * np.max(w)
    if not np.any(keep):  # degenerate table; keep everything
        return np.ones(i0.shape[1], bool)
    return keep


def air_mask(sino_raw, mask_thresh=0.95):
    """Air-ray mask: counts above ``mask_thresh * max`` (matdecomp.py:194-196
    — unattenuated rays destabilize the decomposition and are zeroed)."""
    s = jnp.asarray(sino_raw)
    return s >= mask_thresh * jnp.max(s)


def decompose_sinograms(geometry, sino1, sino2, spec1, spec2, *, n_iters=30,
                        mask_thresh=0.95, basis=DEFAULT_BASIS,
                        dtype=jnp.float32, pixel_block=65536):
    """Counts sinogram pair -> basis material sinogram pair.

    Array-level equivalent of the reference's ``get_basismat_sinos``
    (matdecomp.py:167-207; the reference-named wrapper lives in
    :mod:`dexct_tpu.pipeline.api`).  Returns (mat1, mat2), each
    [N_proj, N_channels] in g/cm^2.
    """
    _, i0, mus = prepare_decomposition(geometry, spec1, spec2, basis)
    shape = sino1.shape
    counts = jnp.stack([
        jnp.asarray(sino1, dtype).reshape(-1),
        jnp.asarray(sino2, dtype).reshape(-1),
    ])
    a = gauss_newton_solve(
        counts,
        jnp.asarray(i0, dtype),
        jnp.asarray(mus, dtype),
        n_iters=n_iters,
        pixel_block=pixel_block,
    )
    mask = air_mask(sino1, mask_thresh)
    mat1 = jnp.where(mask, 0.0, a[:, 0].reshape(shape))
    mat2 = jnp.where(mask, 0.0, a[:, 1].reshape(shape))
    return mat1, mat2


def pcd_bin_fluences(geometry, spec, thresholds):
    """Split a spectrum into photon-counting energy bins (host, float64).

    thresholds: ascending bin edges [keV]; bin m spans
    [thresholds[m], thresholds[m+1]) with the last bin open-ended.
    Returns i0 [n_bins, E] effective fluences on the spectrum's grid —
    ready for the multi-measurement :func:`gauss_newton_solve`.
    """
    from .spectral import effective_fluence

    base = effective_fluence(spec, geometry)
    e = spec.E
    edges = list(thresholds) + [np.inf]
    out = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        out.append(np.where((e >= lo) & (e < hi), base, 0.0))
    return np.stack(out)


def decompose_multibin_grid(sinos, ee, i0s, basis, *, n_iters=30,
                            mask_thresh=0.95, dtype=jnp.float32,
                            pixel_block=65536, method="gn",
                            a_bounds=(-20.0, 500.0)):
    """Multi-measurement basis decomposition on an explicit energy grid.

    sinos: [M, V, C] counts; ee: [E] energies [keV]; i0s: [M, E]
    effective fluences; basis: K Materials (K <= M, K in {2, 3, 4}).
    Returns ([K, V, C] basis sinograms [g/cm^2], air mask [V, C]).

    ``a_bounds`` clamps the per-ray area densities; photon-starved rays
    (zero-count bins) rail at the upper bound, so passing a PHYSICAL
    limit (e.g. the phantom diameter times the densest material) bounds
    their FBP streaks at low dose.
    """
    sinos = jnp.asarray(sinos, dtype)
    m, v, c = sinos.shape
    mus = np.stack([xcom.mixatten(b.matcomp, np.asarray(ee))
                    for b in basis])
    a = gauss_newton_solve(
        sinos.reshape(m, -1),
        jnp.asarray(i0s, dtype),
        jnp.asarray(mus, dtype),
        n_iters=n_iters,
        pixel_block=pixel_block,
        method=method,
        a_bounds=a_bounds,
    )
    mask = air_mask(sinos[0], mask_thresh)
    mats = jnp.where(mask[None], 0.0, a.T.reshape(len(basis), v, c))
    return mats, mask


def image_domain_decomposition(recon1_raw, recon2_raw, spec1, spec2,
                               geometry, *, basis=DEFAULT_BASIS):
    """Image-domain DE decomposition: per-pixel 2x2 solve on the recons.

    The fast clinical alternative to the projection-domain solve: model
    each reconstruction as the fluence-weighted effective attenuation

        mu_i(x) = sum_m a_m(x) <mu/rho_m>_i,
        <mu/rho_m>_i = sum_E w_i(E) (mu/rho)_m(E)

    (w_i the detected-fluence weights of spectrum i) and invert the
    2x2 mixing matrix per pixel.  Exact only in the thin-object limit:
    beam hardening makes the effective energies object-dependent, which
    is precisely the bias the projection-domain Poisson-MLE solve
    (decompose_sinograms / get_basismat_sinos) does not have — pair
    this with water-BHC'd inputs, or use it as the cheap initializer /
    sanity cross-check it is in practice.

    Returns basis-density images (a_1 [g/cm^3], ..., a_K) matching the
    recon shapes.
    """
    from .spectral import effective_fluence

    if len(basis) != 2:
        raise ValueError("image-domain solve is the 2-measurement, "
                         "2-basis special case")
    a_mat = np.zeros((2, 2))
    for i, spec in enumerate((spec1, spec2)):
        w = effective_fluence(spec, geometry)
        w = w / w.sum()
        for m, mat in enumerate(basis):
            a_mat[i, m] = float(np.sum(w * mat.mass_atten(spec.E)))
    a_inv = jnp.asarray(np.linalg.inv(a_mat), jnp.float32)
    mu = jnp.stack([jnp.asarray(recon1_raw), jnp.asarray(recon2_raw)], -1)
    out = jnp.einsum("...i,mi->...m", mu, a_inv,
                     precision=jax.lax.Precision.HIGHEST)
    return out[..., 0], out[..., 1]
