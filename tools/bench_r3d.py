"""Round-3 session 4: FDK materialization fix A/B (standalone kernel).

Variants of the orbit4 z-pair FDK at the cone bench shape:
vmap-vs-lax.map over z-pairs x view_block x bf16 rows.
"""
from __future__ import annotations

import functools
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import numpy as np

    from dexct_tpu.ops.conebeam import _fdk_backproject_multi

    log(f"devices: {jax.devices()}")
    results = {}
    rng = np.random.default_rng(0)
    qs = jax.device_put(jnp.asarray(
        rng.normal(size=(4, 360, 16, 256)).astype(np.float32)))
    betas = jax.device_put(jnp.asarray(
        np.arange(360) * (2 * np.pi / 360), jnp.float32))
    args = (qs, betas, 60.0, 0.8230337 / 256, 0.25, 16, 256, 16, 40.0,
            0.25, 2 * np.pi / 360)

    def bench(name, f, n=3):
        t0 = time.time()
        out = f(*args)
        _ = float(out[0, 0, 128, 128])
        log(f"  {name}: compile+first {time.time() - t0:.1f}s")
        ts = []
        for _i in range(n):
            t0 = time.time()
            out = f(*args)
            _ = float(out[0, 0, 128, 128])
            ts.append(time.time() - t0)
        log(f"  {name}: {[f'{t:.3f}' for t in ts]} -> {min(ts):.4f}s")
        results[name] = round(min(ts), 4)

    for name, kw in [
        ("seq_vb32", dict(view_block=32, pair_seq=True)),
        ("seq_vb8", dict(view_block=8, pair_seq=True)),
        ("vmap_vb2", dict(view_block=2)),
        ("seq_vb32_bf16", dict(view_block=32, pair_seq=True,
                               bf16_taps=True)),
        ("vmap_vb32_bf16", dict(view_block=32, bf16_taps=True)),
        ("seq_vb64", dict(view_block=64, pair_seq=True)),
    ]:
        f = functools.partial(_fdk_backproject_multi, pair_mode=True,
                              orbit4=True, **kw)
        bench(name, f)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
