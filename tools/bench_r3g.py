"""Round-3 session 7: high-res with quad rebin; nt variant."""
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

    hct = FanBeamGeometry(N_channels=1600, N_proj=1440,
                          gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                          eid=True)
    hph = pelvis_phantom(N=1024, dx=0.05)
    hs1 = linac_spectrum()
    hs1.rescale_counts(hct.A_iso * 9.0 / hct.N_proj)
    hs2 = kramers_spectrum(80.0)
    hs2.rescale_counts(hct.A_iso * 1.0 / hct.N_proj)
    for name, nt in [("highres_quad_nt2048", 2048),
                     ("highres_quad_nt1600", 1600)]:
        ha, hm = pack_dect(hct, hph, hs1, hs2, 1024, 50.0, 0.8,
                           n_iters=10, projector="siddon_dominant",
                           recon="parallel", recon_n_theta=1440,
                           recon_nt=nt)
        ha = jax.device_put(ha)
        step = jax.jit(functools.partial(dect_step, meta=hm))
        bench(name, step, ha, lambda o: float(o["mat_recons"][0][0, 0]))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
