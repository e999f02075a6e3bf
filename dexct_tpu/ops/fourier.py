"""Fourier-slice (projection-slice theorem) fast projector.

The exact Siddon projectors are gather-rate bound on TPU: ~1e9 ray-cell
crossings -> ~8e8 serialized gathers at ~1.4e8/s.  This module computes the
same material-path sinograms through the projection-slice theorem at
O(N^2 log N):

    1. one-hot material images are deapodized and 2x zero-padded, then
       2-D FFT'd (XLA-native, complex stays on device);
    2. the spectrum is sampled along nθ radial half-lines with a width-4
       Kaiser-Bessel kernel — tap indices/weights are host-precomputed per
       geometry, so the graph does ~5e5 packed window gathers instead of 8e8;
    3. an inverse FFT along the radial axis yields the parallel-beam Radon
       transform R_m(θ, t) on a (nθ x nt) grid, sinc-interpolated in t by
       spectral zero-padding;
    4. fan rays (β, γ) map to parallel coordinates (θ = β + γ - π/2,
       t = SID sin γ) and bilinearly sample R — another ~3e6 packed
       gathers.

Accuracy is set by the KB gridding parameters (oversampling σ=2, W=4:
~1e-3 relative — the standard NUFFT regime) and validated in tests against
analytic chords and the exact Siddon oracle.  Use the exact projectors for
bit-level parity work; use this for throughput.

The same (θ, t) coordinates drive the fast reconstruction path: see
ops/fbp_fast.parallel_rebin_plan / parallel_backproject_multi (fan data
rebinned to parallel geometry, half the views over [0, π), affine channel
indexing).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "FourierProjectorPlan",
    "plan_fourier_projector",
    "fourier_paths",
    "radon_grid",
]


# ---------------------------------------------------------------------------
# Kaiser-Bessel gridding kernel (host-side; only tables reach the device)
# ---------------------------------------------------------------------------

KB_WIDTH = 4
OVERSAMPLE = 2
# the packed 16-tap gather table is [G², 16*2M] (~805 MB at G=1024);
# above this grid size its rolled-copy build pads past HBM, so the
# sampler falls back to 16 per-tap gathers (indices derived on device)
_PACKED_TABLE_MAX_GRID = 1024


def _kb_beta(width=KB_WIDTH, sigma=OVERSAMPLE):
    # Beatty et al. optimal beta for oversampled gridding
    return np.pi * np.sqrt(
        (width / sigma) ** 2 * (sigma - 0.5) ** 2 - 0.8
    )


def _kb_kernel(u, width=KB_WIDTH, beta=None):
    """KB kernel value at offset u (grid units), support |u| <= width/2."""
    beta = _kb_beta(width) if beta is None else beta
    t = 1.0 - (2.0 * u / width) ** 2
    inside = t > 0
    val = np.where(inside, np.i0(beta * np.sqrt(np.clip(t, 0, None))), 0.0)
    return val / np.i0(beta)


def _kb_deapod_1d(n_img, grid, width=KB_WIDTH, beta=None):
    """Gridding correction at image pixel offsets (length n_img).

    Exactly the Fourier transform of the peak-normalized KB kernel:
    K(x) = W sinh(sqrt(beta^2 - (pi W x / G)^2)) / (sqrt(...) I0(beta)),
    continued with sin for imaginary arguments.  Validated against the
    Poisson-sum identity sum_p k(x0-p) e^{-2 pi i p n/G} ~ K(n/G) e^{...}
    (see tests) — no extra normalization is applied.
    """
    beta = _kb_beta(width) if beta is None else beta
    # integer centered FFT-array offsets; the half-pixel world offset is a
    # separate smooth phase on the sampled spectrum, NOT part of K
    x = np.arange(n_img) - n_img / 2.0
    arg2 = beta**2 - (np.pi * width * x / grid) ** 2
    pos = arg2 > 0
    sq = np.sqrt(np.abs(arg2))
    c = np.where(pos, np.sinh(sq) / np.maximum(sq, 1e-30),
                 np.sinc(sq / np.pi))
    return c * (width / np.i0(beta))


# ---------------------------------------------------------------------------
# Plans: host-precomputed tables for a (phantom grid, scan geometry) pair
# ---------------------------------------------------------------------------

def radon_grid(n_img, dx, n_theta=1024, nt_pad_factor=2):
    """The (θ, t) grid used by the fast paths.

    Returns (thetas [nθ] over [0, π), t0, dt, nt) with nt = pad_factor * G
    and dt = dx / pad_factor (sinc-refined by spectral zero-padding).
    """
    grid = OVERSAMPLE * n_img
    nt = nt_pad_factor * grid
    dt = (grid * dx) / nt
    thetas = np.arange(n_theta) * (np.pi / n_theta)
    t0 = -0.5 * nt * dt
    return thetas, t0, dt, nt


@dataclasses.dataclass
class FourierProjectorPlan:
    """Device tables + static meta for :func:`fourier_paths`."""

    n_img: int
    n_materials: int
    dx: float
    n_theta: int
    nt: int
    t0: float
    dt: float
    grid: int
    deapod: jnp.ndarray  # [n_img, n_img]
    slice_idx: jnp.ndarray  # [nθ * nl] int32 window-base into the flat
    #                         spectrum (all 16 taps packed per table row)
    slice_w: jnp.ndarray  # [nθ*nl*16] float32 (flat: a resident
    #                       trailing-16 dim pads to the 128-lane tile)
    phase_cos: jnp.ndarray  # [nθ, nl] half-pixel + t-centering phase
    phase_sin: jnp.ndarray  # [nθ, nl]
    fan_idx: jnp.ndarray  # [V*C, 4] int32 into flat [nθ * nt]
    fan_w: jnp.ndarray  # [V*C, 4] float32
    scale: float


def plan_fourier_projector(phantom, geometry, n_theta=1024):
    """Build the projector plan for a voxel phantom + fan geometry."""
    n_img = phantom.Nx
    if phantom.Ny != n_img:
        raise ValueError("fourier projector requires a square phantom grid")
    dx = float(phantom.dx)
    if abs(phantom.dy - dx) > 1e-12:
        raise ValueError("fourier projector requires square pixels")
    n_mat = phantom.n_materials
    grid = OVERSAMPLE * n_img
    thetas, t0, dt, nt = radon_grid(n_img, dx, n_theta)
    nl = grid // 2 + 1  # radial rfft bins

    # deapodization (separable)
    c1 = _kb_deapod_1d(n_img, grid)
    deapod = np.outer(c1, c1)

    # radial slice taps: sample the centered spectrum at (l cosθ, l sinθ)
    half = grid // 2
    ll = np.arange(nl)
    uu = np.outer(np.cos(thetas), ll)  # [nθ, nl]
    vv = np.outer(np.sin(thetas), ll)
    taps = np.arange(KB_WIDTH) - (KB_WIDTH // 2 - 1)  # [-1, 0, 1, 2]
    u0 = np.floor(uu)[..., None] + taps  # [nθ, nl, 4]
    v0 = np.floor(vv)[..., None] + taps
    wu = _kb_kernel(uu[..., None] - u0)
    wv = _kb_kernel(vv[..., None] - v0)
    # 2-D separable 16-tap footprint; spectrum indices wrap (DC at 0)
    w2 = wu[..., :, None] * wv[..., None, :]  # [nθ, nl, 4, 4]
    # ONE gather row per sample: the device table packs all 16 window
    # taps (k = i*4 + j <-> offsets u+i, v+j) of every re/im channel
    # into a 16*2M-float row, so slice_idx stores only the window's
    # base corner (floor - 1, wrapped).  Measured 2.3x faster than 16
    # separate row-2M gathers even counting the rolled-table build.
    ub = np.mod(u0[..., 0], grid).astype(np.int64)  # floor(u) - 1
    vb = np.mod(v0[..., 0], grid).astype(np.int64)
    slice_idx = (vb * grid + ub).astype(np.int32)  # [nθ, nl]
    slice_w = w2.reshape(n_theta, nl, 16).astype(np.float32)

    # Sampled spectrum ~ centered DTFT; the world pixel-center half-pixel
    # offset contributes e^{-i π (a+b)/G}, and (-1)^l folds the t origin
    # into the middle of the nt grid:
    #   phi = -π (a+b)/G + π l
    ab = uu + vv
    phi = -np.pi * ab / grid + np.pi * ll[None, :]
    phase_cos = np.cos(phi).astype(np.float32)
    phase_sin = np.sin(phi).astype(np.float32)

    # fan ray -> (θ, t) bilinear taps
    betas = geometry.betas
    gammas = geometry.gammas
    th = (betas[:, None] + gammas[None, :] - np.pi / 2.0)
    tt = geometry.SID * np.sin(gammas)[None, :] * np.ones_like(th)
    k = np.floor(th / np.pi)
    th = th - k * np.pi  # into [0, π)
    sign = np.where((k.astype(np.int64) % 2) != 0, -1.0, 1.0)
    tt = tt * sign
    # θ interpolation (wraps at π with t -> -t; handled by weight folding)
    ft = th / (np.pi / n_theta)
    i_th0 = np.floor(ft).astype(np.int64)
    f_th = ft - i_th0
    i_th1 = i_th0 + 1
    wrap1 = i_th1 >= n_theta
    i_th0 = np.clip(i_th0, 0, n_theta - 1)
    i_th1 = np.where(wrap1, 0, i_th1)
    # t index (per θ-tap, sign flips on the wrapped tap)
    def t_taps(t_signed):
        ft_ = (t_signed - t0) / dt
        i0 = np.clip(np.floor(ft_).astype(np.int64), 0, nt - 2)
        f = np.clip(ft_ - i0, 0.0, 1.0)
        return i0, f

    i_t0a, f_ta = t_taps(tt)
    i_t0b, f_tb = t_taps(np.where(wrap1, -tt, tt))
    idx = np.stack([
        i_th0 * nt + i_t0a,
        i_th0 * nt + i_t0a + 1,
        i_th1 * nt + i_t0b,
        i_th1 * nt + i_t0b + 1,
    ], -1)
    w = np.stack([
        (1 - f_th) * (1 - f_ta),
        (1 - f_th) * f_ta,
        f_th * (1 - f_tb),
        f_th * f_tb,
    ], -1)
    fan_idx = idx.reshape(-1, 4).astype(np.int32)
    fan_w = w.reshape(-1, 4).astype(np.float32)

    # overall scale: p(t_i) = df * nt * irfft(...)[i] with S = dx^2 * DFT
    # -> dx^2 * nt / (G dx) = dx * nt / G   (irfft carries the 1/nt)
    scale = (dx * nt) / grid

    return FourierProjectorPlan(
        n_img=n_img,
        n_materials=n_mat,
        dx=dx,
        n_theta=n_theta,
        nt=nt,
        t0=t0,
        dt=dt,
        grid=grid,
        deapod=jnp.asarray(deapod, jnp.float32),
        slice_idx=jnp.asarray(slice_idx.reshape(-1)),
        slice_w=jnp.asarray(slice_w.reshape(-1)),
        phase_cos=jnp.asarray(phase_cos),
        phase_sin=jnp.asarray(phase_sin),
        fan_idx=jnp.asarray(fan_idx),
        fan_w=jnp.asarray(fan_w),
        scale=float(scale),
    )


# ---------------------------------------------------------------------------
# Device-side projection
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_theta", "nt", "grid",
                                             "n_img", "packed_table"))
def _radon_from_images(imgs, deapod, slice_idx, slice_w, phase_cos,
                       phase_sin, scale, *, n_theta, nt, grid, n_img,
                       packed_table=True):
    """Radon transforms of an image stack [K, N, N] -> [K, nθ, nt].

    packed_table=False forces the gather-based tap path even at small
    grids: the 16-rolled-copy packed table is faster standalone, but
    under ``lax.map`` (z-stack chunking) XLA materializes every rolled
    copy channel-minor (12 lanes pad to 128 — 16 x 512 MB at 512²,
    an instant OOM).
    """
    n_materials = imgs.shape[0]
    # deapodize, corner-center in the padded FFT array (gridding accuracy
    # requires the object at |centered index| <= G/4)
    img = imgs / deapod[None]
    pad = grid - n_img
    img = jnp.pad(img, ((0, 0), (0, pad), (0, pad)))
    img = jnp.roll(img, (-(n_img // 2), -(n_img // 2)), axis=(-2, -1))
    F = jnp.fft.fft2(img)  # [M, G, G]; DC at index 0

    nl = grid // 2 + 1
    Fr = jnp.concatenate([F.real, F.imag], axis=0)  # [2M, G, G]
    base = slice_idx.reshape(-1)
    if packed_table and grid <= _PACKED_TABLE_MAX_GRID:
        # pack ALL 16 Kaiser-Bessel window taps of every re/im channel
        # into one gather row: table row (v, u) holds F[(v+j)%G, (u+i)%G]
        # for k = i*4 + j — one row-16*2M gather per radial sample
        # instead of 16 row-2M gathers (the rolled-copy build is ~2 HBM
        # passes, measured cheaper than the extra gather issue time)
        parts = [jnp.roll(Fr, (-j, -i), axis=(-2, -1))
                 for i in range(KB_WIDTH) for j in range(KB_WIDTH)]
        table = jnp.concatenate(parts, axis=0).reshape(
            16 * 2 * n_materials, grid * grid).T  # [G², 16*2M]
        rows = table[base]  # [nθ*nl, 16*2M]
    else:
        # large grids: the 16 rolled copies pad catastrophically in HBM
        # (XLA lays them out channel-minor), so derive the classic
        # 16-tap indices from the window base and gather row-2M
        table = Fr.reshape(2 * n_materials, grid * grid).T  # [G², 2M]
        vb, ub = base // grid, base % grid
        offs = jnp.arange(KB_WIDTH, dtype=base.dtype)
        idx16 = (jnp.mod(vb[:, None, None] + offs[None, None, :], grid)
                 * grid
                 + jnp.mod(ub[:, None, None] + offs[None, :, None],
                           grid))  # [S, i, j]
        rows = table[idx16.reshape(-1)]
    rows = rows.reshape(n_theta, nl, 16, 2 * n_materials)
    # slice_w is stored FLAT ([nθ*nl*16]) — a resident [nθ, nl, 16]
    # array pads its trailing 16 to the 128-lane tile (8x HBM; measured
    # as a z-stack OOM driver when lax.map copies it per chunk)
    s = jnp.einsum("tlk,tlkc->tlc", slice_w.reshape(n_theta, nl, 16),
                   rows,
                   precision=jax.lax.Precision.HIGHEST)  # [nθ, nl, 2M]
    z_re = s[..., :n_materials]
    z_im = s[..., n_materials:]
    spec = jax.lax.complex(
        z_re * phase_cos[..., None] - z_im * phase_sin[..., None],
        z_re * phase_sin[..., None] + z_im * phase_cos[..., None],
    )

    # radial inverse FFT -> projections over centered t (nt bins)
    spec = jnp.moveaxis(spec, -1, 0)  # [M, nθ, nl]
    proj = jnp.fft.irfft(spec, n=nt, axis=-1)  # [M, nθ, nt]
    return proj * scale  # scale = dx^2 * df * nt (irfft carries 1/nt)


def _onehot_images(labels, n_materials):
    return jax.nn.one_hot(labels.astype(jnp.int32), n_materials,
                          dtype=jnp.float32, axis=0)


def fourier_radon(plan: FourierProjectorPlan, images):
    """Radon transforms [K, nθ, nt] of an image stack [K, N, N]."""
    return _radon_from_images(
        images, plan.deapod, plan.slice_idx, plan.slice_w,
        plan.phase_cos, plan.phase_sin, plan.scale,
        n_theta=plan.n_theta, nt=plan.nt, grid=plan.grid,
        n_img=plan.n_img,
    )


def fourier_project_images(plan: FourierProjectorPlan, images, view_shape):
    """Fan-beam line integrals [V, C, K] of arbitrary images [K, N, N]
    (used e.g. by the bone-BHC second pass, ops/bhc.py)."""
    radon = fourier_radon(plan, images)
    return _resample_to_fan(radon, plan.fan_idx, plan.fan_w,
                            view_shape + (images.shape[0],))


def fourier_paths(plan: FourierProjectorPlan, labels, view_shape):
    """Material-path sinogram [V, C, M] via the Fourier slice theorem."""
    return fourier_project_images(
        plan, _onehot_images(labels, plan.n_materials), view_shape
    )


def plan_arrays(plan: FourierProjectorPlan, view_shape):
    """The plan's device tables as a pytree dict (for fused pipelines).

    ``fan_idx``/``fan_w`` are reshaped to [V, C*4] so the view axis can
    be sharded under shard_map — with the taps FLATTENED into the lane
    dim: a trailing dim of 4 pads to the 128-lane tile on TPU (32x HBM
    expansion, measured as the z-stack OOM driver); [V, 3200] pads not
    at all.
    """
    v, c = view_shape
    return {
        "fp_deapod": plan.deapod,
        "fp_slice_idx": plan.slice_idx,
        "fp_slice_w": plan.slice_w,
        "fp_phase_cos": plan.phase_cos,
        "fp_phase_sin": plan.phase_sin,
        "fp_fan_idx": plan.fan_idx.reshape(v, c * 4),
        "fp_fan_w": plan.fan_w.reshape(v, c * 4),
    }


def fourier_paths_from_arrays(a, labels, meta_fp):
    """fourier_paths over the pytree layout of :func:`plan_arrays`.

    meta_fp: (n_materials, n_theta, nt, grid, n_img, scale) static
    tuple, optionally extended with a 7th ``packed_table`` bool (the
    z-stack path sets False — see :func:`_radon_from_images`).
    """
    n_mat, n_theta, nt, grid, n_img, scale = meta_fp[:6]
    packed_table = meta_fp[6] if len(meta_fp) > 6 else True
    radon = _radon_from_images(
        _onehot_images(labels, n_mat), a["fp_deapod"], a["fp_slice_idx"],
        a["fp_slice_w"], a["fp_phase_cos"], a["fp_phase_sin"], scale,
        n_theta=n_theta, nt=nt, grid=grid, n_img=n_img,
        packed_table=packed_table,
    )
    fan_idx = a["fp_fan_idx"]  # [V, C*4]
    out_shape = (fan_idx.shape[0], fan_idx.shape[1] // 4, n_mat)
    return _resample_to_fan(radon, fan_idx.reshape(-1, 4),
                            a["fp_fan_w"].reshape(-1, 4), out_shape)


@functools.partial(jax.jit, static_argnames=("out_shape",))
def _resample_to_fan(radon, fan_idx, fan_w, out_shape):
    m = radon.shape[0]
    table = radon.reshape(m, -1).T  # [nθ*nt, M]
    rows = table[fan_idx.reshape(-1)].reshape(-1, 4, m)
    vals = jnp.einsum("rk,rkm->rm", fan_w, rows,
                     precision=jax.lax.Precision.HIGHEST)
    return vals.reshape(out_shape)
