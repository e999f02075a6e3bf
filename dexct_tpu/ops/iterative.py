"""Iterative reconstruction: CG least-squares / SIRT on the fast projector.

Beyond the reference's FBP-only reconstruction (README.md:30-31), this
module solves the regularized normal equations

    (A^T A + lam L) x = A^T b

where A is the (linear) monoenergetic fan-beam projection of an image and
L a Laplacian smoothness penalty.  TPU-native construction: A is the
Fourier-slice projector applied to a single image
(:func:`~dexct_tpu.ops.fourier.fourier_project_images`), and A^T comes FREE
and exactly matched via ``jax.linear_transpose`` — no hand-written adjoint,
no adjoint-mismatch artifacts.  The whole CG loop is one ``lax.scan``
inside jit.

Useful for sparse-view / low-dose studies where FBP streaks dominate, and
as the adjointness proof of the projector stack (tests check
<Ax, y> == <x, A^T y>).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fourier import FourierProjectorPlan, fourier_project_images

__all__ = ["make_projection_operator", "cg_recon", "sirt_recon"]


def make_projection_operator(plan: FourierProjectorPlan, view_shape):
    """A(x): [N, N] image -> [V, C] line-integral sinogram (linear)."""

    def apply(img):
        return fourier_project_images(plan, img[None], view_shape)[..., 0]

    return apply


def _laplacian(x):
    return (4.0 * x
            - jnp.roll(x, 1, 0) - jnp.roll(x, -1, 0)
            - jnp.roll(x, 1, 1) - jnp.roll(x, -1, 1))


@functools.partial(jax.jit, static_argnames=("apply_fn", "n_iters", "lam"))
def _cg(apply_fn, b, x0, n_iters, lam):
    at = jax.linear_transpose(apply_fn, x0)

    def normal(x):
        ax = apply_fn(x)
        (atax,) = at(ax)
        out = atax
        if lam:
            out = out + lam * _laplacian(x)
        return out

    (atb,) = at(b)
    r0 = atb - normal(x0)
    p0 = r0

    def body(carry, _):
        x, r, p, rs = carry
        ap = normal(p)
        alpha = rs / jnp.maximum(jnp.vdot(p, ap).real, 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.vdot(r, r).real
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = r + beta * p
        return (x, r, p, rs_new), rs_new

    rs0 = jnp.vdot(r0, r0).real
    (x, _, _, _), hist = jax.lax.scan(
        body, (x0, r0, p0, rs0), None, length=n_iters
    )
    return x, hist


def cg_recon(plan: FourierProjectorPlan, sino, view_shape, *, n_iters=30,
             lam=0.0, x0=None):
    """Conjugate-gradient least-squares reconstruction.

    sino: [V, C] line-integral (log) sinogram; returns ([N, N] image in
    1/cm, residual-norm history [n_iters]).
    """
    apply_fn = make_projection_operator(plan, view_shape)
    if x0 is None:
        x0 = jnp.zeros((plan.n_img, plan.n_img), jnp.float32)
    return _cg(apply_fn, jnp.asarray(sino, jnp.float32), x0, n_iters,
               float(lam))


def sirt_recon(plan: FourierProjectorPlan, sino, view_shape, *, n_iters=50,
               relax=1.6, nonneg=True, x0=None, power_iters=12):
    """SIRT-style projected Landweber iteration.

    The classic SIRT row/column normalization assumes a nonnegative system
    matrix; the Fourier-slice operator has signed entries (gridding
    sidelobes), so the step size comes from a power-iteration estimate of
    ||A^T A|| instead: x <- max(0, x + (relax/lmax) A^T (b - A x)).
    """
    apply_fn = make_projection_operator(plan, view_shape)
    b = jnp.asarray(sino, jnp.float32)
    if x0 is None:
        x0 = jnp.zeros((plan.n_img, plan.n_img), jnp.float32)
    at = jax.linear_transpose(apply_fn, x0)

    def normal(x):
        (y,) = at(apply_fn(x))
        return y

    # spectral-norm estimate of A^T A
    v = jax.random.normal(jax.random.PRNGKey(0), x0.shape)

    def power(v, _):
        v = normal(v)
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-30), None

    v, _ = jax.lax.scan(power, v, None, length=power_iters)
    lmax = jnp.maximum(jnp.vdot(v, normal(v)).real, 1e-30)
    omega = relax / lmax

    def body(x, _):
        (back,) = at(b - apply_fn(x))
        x = x + omega * back
        if nonneg:
            x = jnp.maximum(x, 0.0)
        return x, None

    x, _ = jax.lax.scan(body, x0, None, length=n_iters)
    return x
