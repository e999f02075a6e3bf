"""Microbenchmarks: gather / interpolation strategies on the TPU (dev tool).

Determines the fast primitive for projector & backprojector inner loops.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def timeit(name, fn, *args, n=3):
    try:
        f = jax.jit(fn)
        out = f(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
        ts = []
        for _ in range(n):
            t0 = time.time()
            out = f(*args)
            _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
            ts.append(time.time() - t0)
        print(f"{name:36s} {min(ts)*1e3:9.1f} ms")
    except Exception as e:
        print(f"{name:36s} FAIL {type(e).__name__} {str(e)[:60]}")


def main():
    N = 1 << 24  # 16.7M lookups
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (800,))
    table2d = jax.random.normal(key, (64, 800))
    idx = jax.random.randint(key, (N,), 0, 800)
    idx2d = jax.random.randint(key, (64, N // 64), 0, 800)
    fidx = jax.random.uniform(key, (N,), minval=0.0, maxval=799.0)

    timeit("flat_take_16M", lambda t, i: t[i], table, idx)
    timeit("batched_vmap_take_16M",
           lambda t, i: jax.vmap(lambda tv, iv: tv[iv])(t, i),
           table2d, idx2d)
    timeit("take_along_axis_16M",
           lambda t, i: jnp.take_along_axis(
               t, i, axis=1), table2d, idx2d)
    timeit("lin_interp_2gather_16M",
           lambda t, c: (lambda i0, f: t[i0] * (1 - f) + t[i0 + 1] * f)(
               jnp.clip(jnp.floor(c), 0, 798).astype(jnp.int32),
               c - jnp.floor(c)), table, fidx)

    # big-table gather (projector pattern): 512^2 int8 labels
    labels = jax.random.randint(key, (512 * 512,), 0, 6, dtype=jnp.int32)
    bigidx = jax.random.randint(key, (N,), 0, 512 * 512)
    timeit("label_gather_512sq_16M", lambda t, i: t[i], labels, bigidx)

    # one-hot matmul alternative for 800-table interp (MXU)
    onehot_idx = jax.random.randint(key, (1 << 14, 64), 0, 800)

    def onehot_mm(t2d, ii):
        oh = jax.nn.one_hot(ii, 800, dtype=jnp.bfloat16)  # [16k, 64, 800]?
        return jnp.einsum("pbc,bc->pb", oh, t2d.astype(jnp.bfloat16))

    timeit("onehot_matmul_1M", onehot_mm, table2d, onehot_idx)

    # dense window-matvec (T-matrix) backprojection pattern:
    # per (view, rowblock): T [4096 pix, 320 win] on the fly + matvec
    s = 0.7
    q = jax.random.normal(key, (320,))

    def t_matvec(qv):
        xs = jax.lax.broadcasted_iota(jnp.float32, (4096, 320), 0)
        ks = jax.lax.broadcasted_iota(jnp.float32, (4096, 320), 1)
        c = xs * s * 0.1  # fake channel coords
        w = jnp.maximum(1.0 - jnp.abs(c - ks), 0.0)
        return w @ qv

    timeit("Tmatvec_4096x320 (x1)", t_matvec, q)

    def t_matvec_batch(qv):
        # 64 views at once, shared window shape
        xs = jax.lax.broadcasted_iota(jnp.float32, (64, 4096, 320), 1)
        ks = jax.lax.broadcasted_iota(jnp.float32, (64, 4096, 320), 2)
        vv = jax.lax.broadcasted_iota(jnp.float32, (64, 4096, 320), 0)
        w = jnp.maximum(1.0 - jnp.abs(xs * 0.07 + vv * 0.01 - ks), 0.0)
        return jnp.einsum("vpk,vk->vp", w, qv)

    q64 = jax.random.normal(key, (64, 320))
    timeit("Tmatvec_batch64_4096x320", t_matvec_batch, q64)

    # Pallas: vectorized in-kernel gather?
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def pk(tab_ref, idx_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:]]

    def pallas_gather(tab, ii):
        return pl.pallas_call(
            pk,
            out_shape=jax.ShapeDtypeStruct(ii.shape, tab.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, ii)

    timeit("pallas_gather_1M", pallas_gather, table,
           jax.random.randint(key, (1 << 20,), 0, 800))

    def pk2(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:])

    def pallas_take(tab, ii):
        return pl.pallas_call(
            pk2,
            out_shape=jax.ShapeDtypeStruct(ii.shape, tab.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, ii)

    timeit("pallas_take_1M", pallas_take, table,
           jax.random.randint(key, (1 << 20,), 0, 800))


if __name__ == "__main__":
    main()
