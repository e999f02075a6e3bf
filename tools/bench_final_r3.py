"""Round-3 final numbers: headline, high-res, cone, z-stack (bundled
A/B for the z-stack to settle the vmap-bundling question).  One TPU
process; run AFTER the tunnel is healthy."""
from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(name, fn, fetch, results, n=3):
    t0 = time.time()
    out = fn()
    fetch(out)
    log(f"  {name}: compile+first {time.time() - t0:.1f}s")
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn()
        fetch(out)
        ts.append(time.time() - t0)
    results[name] = round(min(ts), 4)
    log(f"  {name}: {[f'{t:.3f}' for t in ts]}")
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import numpy as np

    from dexct_tpu.physics import kramers_spectrum, linac_spectrum
    from dexct_tpu.pipeline.cone import (make_jitted_cone_step,
                                         pack_cone_dect)
    from dexct_tpu.pipeline.fused import dect_step, pack_dect
    from dexct_tpu.pipeline.zstack import (make_jitted_zstack_step,
                                           pack_zstack)
    from dexct_tpu.system import (ConeBeamGeometry, FanBeamGeometry,
                                  pelvis_phantom)

    log(f"devices: {jax.devices()}")
    results = {}

    ph = pelvis_phantom(N=512, dx=0.1)
    ct = FanBeamGeometry(N_channels=800, N_proj=1000,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=True)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)

    # headline
    a, m = pack_dect(ct, ph, s1, s2, 512, 50.0, 0.8, n_iters=10,
                     projector="siddon_dominant", recon="parallel")
    a = jax.device_put(a)
    step = jax.jit(functools.partial(dect_step, meta=m))
    bench("headline_512", lambda: step(a),
          lambda o: float(o["mat_recons"][0][0, 0]), results)

    # high-res
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
    hstep = jax.jit(functools.partial(dect_step, meta=hm))
    bench("highres_exact", lambda: hstep(ha),
          lambda o: float(o["mat_recons"][0][0, 0]), results)
    del ha

    # cone e2e (bundled default)
    cct = ConeBeamGeometry(N_channels=256, N_proj=360, N_rows=16,
                           gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                           h_iso=0.25, eid=True)
    cph = dataclasses.replace(
        ph, labels=np.broadcast_to(ph.labels[0][:256, :256],
                                   (32, 256, 256)).copy(), dz=0.1)
    cs1 = linac_spectrum()
    cs1.rescale_counts(cct.A_iso * 9.0 / cct.N_proj)
    cs2 = kramers_spectrum(80.0)
    cs2.rescale_counts(cct.A_iso * 1.0 / cct.N_proj)
    ca, cm = pack_cone_dect(cct, cph, cs1, cs2, 256, 40.0, 0.8,
                            n_iters=10)
    ca = jax.device_put(ca)
    cstep = make_jitted_cone_step(cm)
    bench("cone_e2e", lambda: cstep(ca),
          lambda o: float(o["mat_recons"][0][0, 0, 0]), results)
    del ca

    # z-stack: bundled vs per-ray (8 distinct slices)
    labs = np.stack([np.roll(ph.labels[0], 7 * k, axis=1)
                     for k in range(8)])
    zph = dataclasses.replace(ph, labels=labs)
    for tb in (8, 0):
        za, zm, zax = pack_zstack(
            ct, zph, s1, s2, 512, 50.0, 0.8, n_iters=10,
            projector="siddon_dominant", recon="parallel",
            trace_bundle=tb)
        za = jax.device_put(za)
        zstep = make_jitted_zstack_step(zm, zax, z_chunk=2)
        bench(f"zstack8_tb{tb}", lambda: zstep(za),
              lambda o: float(o["mat_recons"][0][0, 0, 0]), results)
        del za

    print(json.dumps(results))


if __name__ == "__main__":
    main()
