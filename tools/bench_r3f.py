"""Round-3 session 6: high-res matmul-taps BP + headline + metal study."""
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
    import numpy as np

    from dexct_tpu.physics import kramers_spectrum, linac_spectrum
    from dexct_tpu.pipeline.fused import dect_step, pack_dect
    from dexct_tpu.system import FanBeamGeometry, pelvis_phantom

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

    # ---- high-res exact with matmul-taps BP ------------------------
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
    bench("highres_exact_mm", step, ha,
          lambda o: float(o["mat_recons"][0][0, 0]))

    # ---- headline refresh ------------------------------------------
    ct = FanBeamGeometry(N_channels=800, N_proj=1000,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=True)
    ph = pelvis_phantom(N=512, dx=0.1)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    a2, m2 = pack_dect(ct, ph, s1, s2, 512, 50.0, 0.8, n_iters=10,
                       projector="siddon_dominant", recon="parallel")
    a2 = jax.device_put(a2)
    step2 = jax.jit(functools.partial(dect_step, meta=m2))
    bench("headline_512", step2, a2,
          lambda o: float(o["mat_recons"][0][0, 0]))

    print(json.dumps(results))

    # ---- metal study at protocol scale -----------------------------
    log("== metal study --full ==")
    sys.argv = ["metal_study", "--full", "--figdir", "output/figs"]
    sys.path.insert(0, "examples")
    import metal_study
    t0 = time.time()
    metal_study.main()
    log(f"metal study total {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
