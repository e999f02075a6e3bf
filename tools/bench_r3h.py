"""Round-3 final numbers session: high-res (post precision fix), cone,
headline — the values recorded in BASELINE.md/README."""
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

    ph = pelvis_phantom(N=512, dx=0.1)

    # headline
    ct = FanBeamGeometry(N_channels=800, N_proj=1000,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=True)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    a2, m2 = pack_dect(ct, ph, s1, s2, 512, 50.0, 0.8, n_iters=10,
                       projector="siddon_dominant", recon="parallel")
    a2 = jax.device_put(a2)
    bench("headline_512", jax.jit(functools.partial(dect_step, meta=m2)),
          a2, lambda o: float(o["mat_recons"][0][0, 0]))

    # cone e2e
    cct = ConeBeamGeometry(N_channels=256, N_proj=360, N_rows=16,
                           gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                           h_iso=0.25, eid=True)
    cs1 = linac_spectrum()
    cs1.rescale_counts(cct.A_iso * 9.0 / cct.N_proj)
    cs2 = kramers_spectrum(80.0)
    cs2.rescale_counts(cct.A_iso * 1.0 / cct.N_proj)
    cph = dataclasses.replace(
        ph, labels=np.broadcast_to(ph.labels[0][:256, :256],
                                   (32, 256, 256)).copy(), dz=0.1)
    ca, cm = pack_cone_dect(cct, cph, cs1, cs2, 256, 40.0, 0.8,
                            n_iters=10)
    ca = jax.device_put(ca)
    bench("cone_e2e", make_jitted_cone_step(cm), ca,
          lambda o: float(o["mat_recons"][0][0, 0, 0]))

    # high-res (post HIGHEST-precision fix on the sym8_qs selection
    # matmuls)
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
    bench("highres_exact", jax.jit(functools.partial(dect_step, meta=hm)),
          ha, lambda o: float(o["mat_recons"][0][0, 0]))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
