"""Re-measure the 8-slice z-stack (512^2, exact dominant projector)
with the bundled tracer (BASELINE round-2 record: 2.43 s = 303 ms/slice)."""
from __future__ import annotations

import dataclasses
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
    import numpy as np

    from dexct_tpu.physics import kramers_spectrum, linac_spectrum
    from dexct_tpu.pipeline.zstack import (make_jitted_zstack_step,
                                           pack_zstack)
    from dexct_tpu.system import FanBeamGeometry, pelvis_phantom

    log(f"devices: {jax.devices()}")
    ct = FanBeamGeometry(N_channels=800, N_proj=1000,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=True)
    ph = pelvis_phantom(N=512, dx=0.1)
    # 8 distinct slices: roll the single slice so packs differ per z
    labs = np.stack([np.roll(ph.labels[0], 7 * k, axis=1)
                     for k in range(8)])
    ph = dataclasses.replace(ph, labels=labs)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    results = {}
    ref_sino = None
    # round-5 A/B: slice-PAIRED trace (two slices per gather; bundled
    # and per-ray pair variants) vs the round-3 per-slice default
    configs = [
        ("pairs_perray", dict()),  # round-5 default
        ("pairs_bundled", dict(trace_bundle=8)),
        ("r3_perray", dict(trace_pairs=False)),
    ]
    if "--quick" in sys.argv:
        configs = configs[:1]
    for name, kw in configs:
        t0 = time.time()
        arrays, meta, in_axes = pack_zstack(
            ct, ph, s1, s2, 512, 50.0, 0.8, n_iters=10,
            projector="siddon_dominant", recon="parallel", **kw)
        log(f"[{name}] pack {time.time()-t0:.1f}s "
            f"(pair tables: {'dom_pack_pair_y' in arrays})")
        arrays = jax.device_put(arrays)
        step = make_jitted_zstack_step(meta, in_axes, z_chunk=2)
        t0 = time.time()
        out = step(arrays)
        _ = float(out["mat_recons"][0][0, 0, 0])
        log(f"[{name}] compile+first {time.time()-t0:.1f}s")
        ts = []
        for _i in range(3):
            t0 = time.time()
            out = step(arrays)
            _ = float(out["mat_recons"][0][0, 0, 0])
            ts.append(time.time() - t0)
        best = min(ts)
        log(f"[{name}] zstack8: {[f'{t:.3f}' for t in ts]} "
            f"-> {best / 8 * 1e3:.0f} ms/slice")
        results[name] = round(best / 8 * 1e3, 1)
        sino = np.asarray(out["sino_raw"][0])
        if ref_sino is None:
            ref_sino = sino
        else:
            log(f"[{name}] sino max|diff| vs first: "
                f"{float(np.abs(sino - ref_sino).max()):.3e}")
    print(json.dumps({"ms_per_slice": results}))


if __name__ == "__main__":
    main()
