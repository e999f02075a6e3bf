"""Katsevich slice-windowed PI backprojection benchmark (round 3).

Times katsevich_reconstruct at the recorded VALIDATION.md shape (256²,
720 views x 16 rows, 2 turns, pitch 3) and a 5-turn long-scan variant,
windowed vs full-scan backprojection (slice_window toggled via a
monkeypatched partial), on whatever device JAX picks (the TPU through
the tunnel when available).

    python tools/bench_katsevich_window.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import numpy as np

    from dexct_tpu.ops import katsevich as kv

    log(f"devices: {jax.devices()}")
    results = {}

    def run(name, turns, n_proj, window_on):
        ct_kw = dict(N_channels=256, N_rows=16, gamma_fan=0.8230337,
                     SID=60.0, SDD=100.0, h_iso=0.25, eid=True,
                     pitch=3.0)
        from dexct_tpu.system.geometry import HelicalConeBeamGeometry
        ct = HelicalConeBeamGeometry(
            N_proj=n_proj, rotation_total=2.0 * np.pi * turns, **ct_kw)
        rng = np.random.default_rng(0)
        sino = jnp.asarray(rng.standard_normal((n_proj, 16, 256))
                           .astype(np.float32) * 0.01)
        orig = kv._katsevich_backproject
        if not window_on:
            kv._katsevich_backproject = functools.partial(
                orig, slice_window=False)
        try:
            fn = jax.jit(functools.partial(
                kv.katsevich_reconstruct, geometry=ct, n_matrix=256,
                fov=40.0))
            t0 = time.time()
            out = fn(sino)
            float(out[0, 0, 0])
            log(f"  {name}: compile+first {time.time() - t0:.1f}s "
                f"nz={out.shape[0]}")
            ts = []
            for _ in range(3):
                t0 = time.time()
                out = fn(sino)
                float(out[0, 0, 0])
                ts.append(time.time() - t0)
            results[name] = round(min(ts), 4)
            log(f"  {name}: {[f'{t:.3f}' for t in ts]}")
        finally:
            kv._katsevich_backproject = orig

    run("katsevich_2turn_windowed", 2, 720, True)
    run("katsevich_2turn_full", 2, 720, False)
    run("katsevich_5turn_windowed", 5, 1800, True)
    run("katsevich_5turn_full", 5, 1800, False)
    results["speedup_2turn"] = round(
        results["katsevich_2turn_full"]
        / results["katsevich_2turn_windowed"], 2)
    results["speedup_5turn"] = round(
        results["katsevich_5turn_full"]
        / results["katsevich_5turn_windowed"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
