"""Training loop and inference wrapper for the learned denoiser.

One jitted Adam step over patch minibatches; the whole loop state
(params, optimizer moments) lives on device and only the scalar loss
returns per step.  With a ``mesh`` the minibatch is sharded over the
``data`` axis — parameters stay replicated and XLA inserts the gradient
all-reduce from the sharding constraint alone (the scaling-book recipe:
annotate, don't hand-write collectives).

Units: the network is dimensionless; :func:`apply_denoiser` and
:func:`train_denoiser` normalize HU images by ``scale`` (default 1000 —
soft tissue spans ~[-1000, +2000] HU, so inputs sit O(1))."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .cnn import DnCNN

__all__ = ["init_denoiser", "train_denoiser", "apply_denoiser",
           "HU_SCALE"]

HU_SCALE = 1000.0


def init_denoiser(key, features=32, depth=6, patch=32):
    """Initialize a DnCNN; returns (model, params)."""
    model = DnCNN(features=int(features), depth=int(depth))
    params = model.init(key, jnp.zeros((1, patch, patch, 1), jnp.float32))
    return model, params


def _loss_fn(model, params, xb, yb):
    pred = model.apply(params, xb)
    return jnp.mean((pred - yb) ** 2)


def train_denoiser(model, params, patches_x, patches_y, *, steps=500,
                   batch=64, lr=1e-3, weight_decay=1e-5, key=None,
                   mesh=None, scale=HU_SCALE):
    """Train ``model`` on aligned patch pairs (HU units, [P, p, p]).

    Returns ``(params, losses)`` with ``losses`` the per-step training
    MSE (normalized units).  Minibatches are drawn with replacement from
    a device-resident patch bank; with ``mesh`` (expects a ``data``
    axis) the batch dimension is sharded across devices.
    """
    key = jax.random.PRNGKey(0) if key is None else key
    x = jnp.asarray(patches_x, jnp.float32)[..., None] / scale
    y = jnp.asarray(patches_y, jnp.float32)[..., None] / scale
    n = x.shape[0]
    tx = optax.adamw(float(lr), weight_decay=float(weight_decay))
    # the step donates its params/opt_state buffers; copy at entry so the
    # caller's tree survives (init params are reusable across runs)
    params = jax.tree_util.tree_map(jnp.array, params)
    opt_state = tx.init(params)

    if mesh is not None:
        batch_sh = NamedSharding(mesh, P("data", None, None, None))
        repl = NamedSharding(mesh, P())
        x, y = jax.device_put(x, repl), jax.device_put(y, repl)
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)

    @functools.partial(jax.jit, static_argnums=(0, 1),
                       donate_argnums=(2, 3))
    def step(model, tx, params, opt_state, k):
        idx = jax.random.randint(k, (int(batch),), 0, n)
        xb, yb = x[idx], y[idx]
        if mesh is not None:
            xb = jax.lax.with_sharding_constraint(xb, batch_sh)
            yb = jax.lax.with_sharding_constraint(yb, batch_sh)
        loss, grads = jax.value_and_grad(
            lambda p: _loss_fn(model, p, xb, yb))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = np.empty(int(steps), np.float32)
    for i in range(int(steps)):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(model, tx, params, opt_state, k)
        losses[i] = float(loss)
    return params, losses


def apply_denoiser(model, params, img, scale=HU_SCALE):
    """Denoise HU image(s): [H, W] or [S, H, W] -> same shape/units."""
    x = jnp.asarray(img, jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    out = model.apply(params, x[..., None] / scale)[..., 0] * scale
    return out[0] if squeeze else out
