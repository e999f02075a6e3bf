"""A/B the bundled cone tracer inside the FUSED cone DE pipeline
(the bench_r3h cone_e2e config), trace_bundle in {0, 8}."""
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
    import jax.numpy as jnp
    import numpy as np

    from dexct_tpu.physics import kramers_spectrum, linac_spectrum
    from dexct_tpu.pipeline.cone import make_jitted_cone_step, pack_cone_dect
    from dexct_tpu.system import ConeBeamGeometry, pelvis_phantom

    log(f"devices: {jax.devices()}")
    results = {}

    cct = ConeBeamGeometry(N_channels=256, N_proj=360, N_rows=16,
                           gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                           h_iso=0.25, eid=True)
    ph = pelvis_phantom(N=512, dx=0.1)
    cph = dataclasses.replace(
        ph, labels=np.broadcast_to(ph.labels[0][:256, :256],
                                   (32, 256, 256)).copy(), dz=0.1)
    cs1 = linac_spectrum()
    cs1.rescale_counts(cct.A_iso * 9.0 / cct.N_proj)
    cs2 = kramers_spectrum(80.0)
    cs2.rescale_counts(cct.A_iso * 1.0 / cct.N_proj)

    outs = {}
    for tb in (0, 8):
        ca, cm = pack_cone_dect(cct, cph, cs1, cs2, 256, 40.0, 0.8,
                                n_iters=10, trace_bundle=tb)
        log(f"tb={tb}: bundle={cm.bundle} words={cm.bundle_words}")
        ca = jax.device_put(ca)
        step = make_jitted_cone_step(cm)
        t0 = time.time()
        out = step(ca)
        _ = float(out["mat_recons"][0][0, 0, 0])
        log(f"  compile+first {time.time() - t0:.1f}s")
        ts = []
        for _i in range(3):
            t0 = time.time()
            out = step(ca)
            _ = float(out["mat_recons"][0][0, 0, 0])
            ts.append(time.time() - t0)
        log(f"  cone_e2e_tb{tb}: {[f'{t:.3f}' for t in ts]}")
        results[f"cone_e2e_tb{tb}"] = round(min(ts), 4)
        outs[tb] = out
    d = float(jnp.abs(outs[8]["mat_recons"][0]
                      - outs[0]["mat_recons"][0]).max())
    results["diff"] = d
    log(f"max |bundled-perray| volume diff {d:.3e}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
