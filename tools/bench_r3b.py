"""Round-3 hardware session 2: cone ablation + 1024^2 high-res exact.

1. Fused cone DE ablation: where does the 1.11 s live?
   (n_iters=1 isolates GN; nz_out=4 scales the FDK share.)
2. Standalone orbit4 FDK view_block sweep.
3. High-res EXACT config (1024^2 phantom, 1440 x 1600 exact rays,
   4 x 1024^2 recons) with the round-3 blocked sym8 BP — the VERDICT
   item-4 target (<= 1.5 s, no fallback).
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

    # ---- cone ablation ---------------------------------------------
    log("== cone ablation ==")
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
    for name, m in [
        ("cone_full", cmeta),
        ("cone_gn1", cmeta._replace(n_iters=1)),
        ("cone_nz4", cmeta._replace(nz_out=4)),
        ("cone_nz4_gn1", cmeta._replace(nz_out=4, n_iters=1)),
    ]:
        bench(name, make_jitted_cone_step(m), carrays, fetchc)

    # ---- standalone FDK view_block sweep ---------------------------
    log("== orbit4 FDK view_block sweep ==")
    from dexct_tpu.ops.conebeam import _fdk_backproject_multi

    rng = np.random.default_rng(0)
    qs = jax.device_put(jnp.asarray(
        rng.normal(size=(4, 360, 16, 256)).astype(np.float32)))
    betas = jax.device_put(jnp.asarray(
        np.arange(360) * (2 * np.pi / 360), jnp.float32))
    args = (qs, betas, 60.0, 0.8230337 / 256, 0.25, 16, 256, 16, 40.0,
            0.25, 2 * np.pi / 360)
    for vb in (4, 8, 16, 32):
        f = functools.partial(_fdk_backproject_multi, pair_mode=True,
                              orbit4=True, view_block=vb)
        bench(f"fdk_o4_vb{vb}", lambda a, f=f: f(*a), args,
              lambda o: float(o[0, 0, 128, 128]))

    # ---- high-res exact config -------------------------------------
    log("== high-res exact (1024^2 ph, 1440v x 1600c, 4x1024^2) ==")
    hct = FanBeamGeometry(N_channels=1600, N_proj=1440,
                          gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                          eid=True)
    hph = pelvis_phantom(N=1024, dx=0.05)
    hs1 = linac_spectrum()
    hs1.rescale_counts(hct.A_iso * 9.0 / hct.N_proj)
    hs2 = kramers_spectrum(80.0)
    hs2.rescale_counts(hct.A_iso * 1.0 / hct.N_proj)
    t0 = time.time()
    ha, hm = pack_dect(hct, hph, hs1, hs2, 1024, 50.0, 0.8, n_iters=10,
                       projector="siddon_dominant", recon="parallel",
                       recon_n_theta=1440, recon_nt=2048)
    ha = jax.device_put(ha)
    log(f"  highres pack: {time.time() - t0:.1f}s (sym8 blocked path: "
        f"n_matrix={hm.n_matrix} >= 1024)")
    step = jax.jit(functools.partial(dect_step, meta=hm))
    bench("highres_exact_sym8blk", step, ha,
          lambda o: float(o["mat_recons"][0][0, 0]))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
