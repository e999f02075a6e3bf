"""Round-3 session 5: final cone e2e + high-res profile + dose study.

1. Fused cone DE with the sequenced z-pair FDK (target <= 0.9 s).
2. High-res exact 1024^2 with a profile dump for stage attribution.
3. Protocol-scale dose study (tools/dose_study_full.py logic, invoked
   in-process to share the session).
"""
from __future__ import annotations

import dataclasses
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

    from dexct_tpu.physics import kramers_spectrum, linac_spectrum
    from dexct_tpu.pipeline.cone import make_jitted_cone_step, pack_cone_dect
    from dexct_tpu.pipeline.fused import dect_step, pack_dect
    from dexct_tpu.system import (ConeBeamGeometry, FanBeamGeometry,
                                  pelvis_phantom)

    log(f"devices: {jax.devices()}")
    results = {}

    def bench(name, step, arrays, fetch, n=3):
        t0 = time.time()
        out = step(arrays)
        _ = fetch(out)
        log(f"  {name}: compile+first {time.time() - t0:.1f}s")
        ts = []
        for _i in range(n):
            t0 = time.time()
            out = step(arrays)
            _ = fetch(out)
            ts.append(time.time() - t0)
        best = min(ts)
        log(f"  {name}: {[f'{t:.3f}' for t in ts]} -> {best:.4f}s")
        results[name] = round(best, 4)
        return best

    s1 = linac_spectrum()
    s2 = kramers_spectrum(80.0)

    # ---- cone e2e with sequenced FDK -------------------------------
    cct = ConeBeamGeometry(N_channels=256, N_proj=360, N_rows=16,
                           gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                           h_iso=0.25, eid=True)
    ph512 = pelvis_phantom(N=512, dx=0.1)
    s1.rescale_counts(cct.A_iso * 9.0 / cct.N_proj)
    s2.rescale_counts(cct.A_iso * 1.0 / cct.N_proj)
    cph = dataclasses.replace(
        ph512, labels=np.broadcast_to(ph512.labels[0][:256, :256],
                                      (32, 256, 256)).copy(), dz=0.1)
    carrays, cmeta = pack_cone_dect(cct, cph, s1, s2, 256, 40.0, 0.8,
                                    n_iters=10)
    carrays = jax.device_put(carrays)
    fetchc = lambda o: float(o["mat_recons"][0][0, 0, 0])  # noqa: E731
    bench("cone_seq_vb8", make_jitted_cone_step(cmeta), carrays, fetchc)

    # ---- high-res exact with profile -------------------------------
    log("== high-res exact + profile ==")
    hct = FanBeamGeometry(N_channels=1600, N_proj=1440,
                          gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                          eid=True)
    hph = pelvis_phantom(N=1024, dx=0.05)
    hs1 = linac_spectrum()
    hs1.rescale_counts(hct.A_iso * 9.0 / hct.N_proj)
    hs2 = kramers_spectrum(80.0)
    hs2.rescale_counts(hct.A_iso * 1.0 / hct.N_proj)
    ha, hm = pack_dect(hct, hph, hs1, hs2, 1024, 50.0, 0.8, n_iters=10,
                       projector="siddon_dominant", recon="parallel",
                       recon_n_theta=1440, recon_nt=2048)
    ha = jax.device_put(ha)
    step = jax.jit(functools.partial(dect_step, meta=hm))
    fetchh = lambda o: float(o["mat_recons"][0][0, 0])  # noqa: E731
    bench("highres_exact", step, ha, fetchh)
    with jax.profiler.trace("/tmp/r3e_trace"):
        out = step(ha)
        _ = fetchh(out)
    log("  high-res profile -> /tmp/r3e_trace")
    # GN share ablation
    step1 = jax.jit(functools.partial(dect_step, meta=hm._replace(
        n_iters=1)))
    bench("highres_gn1", step1, ha, fetchh)

    # ---- dose study ------------------------------------------------
    log("== protocol dose study ==")
    import tools.dose_study_full as ds
    t0 = time.time()
    ds.main()
    log(f"dose study total {time.time() - t0:.1f}s")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
