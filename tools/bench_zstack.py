"""Re-measure the 8-slice z-stack (512^2, exact dominant projector)
with the bundled tracer (BASELINE round-2 record: 2.43 s = 303 ms/slice)."""
from __future__ import annotations

import dataclasses
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
    t0 = time.time()
    arrays, meta, in_axes = pack_zstack(
        ct, ph, s1, s2, 512, 50.0, 0.8, n_iters=10,
        projector="siddon_dominant", recon="parallel", trace_bundle=0)
    log(f"pack {time.time()-t0:.1f}s")
    arrays = jax.device_put(arrays)
    step = make_jitted_zstack_step(meta, in_axes, z_chunk=2)
    t0 = time.time()
    out = step(arrays)
    _ = float(out["mat_recons"][0][0, 0, 0])
    log(f"compile+first {time.time()-t0:.1f}s")
    ts = []
    for _i in range(3):
        t0 = time.time()
        out = step(arrays)
        _ = float(out["mat_recons"][0][0, 0, 0])
        ts.append(time.time() - t0)
    best = min(ts)
    log(f"zstack8: {[f'{t:.3f}' for t in ts]}")
    print(json.dumps({"zstack8_s": round(best, 4),
                      "ms_per_slice": round(best / 8 * 1e3, 1)}))


if __name__ == "__main__":
    main()
