"""Round-3 hardware A/B session: one process, every lever measured.

Measures on the real TPU (single process; tunnel rules in CLAUDE.md):

1. 2-D fused headline (exact Siddon), GN warm compression ON vs OFF
   (VERDICT round-2 item 5).
2. 2-D fused with spectral='pallas' vs 'xla' (item 7 A/B).
3. Fused cone DE e2e, FDK orbit4 ON vs OFF (item 2).
4. Standalone 4-volume FDK orbit4 vs plain.

Prints one labeled line per measurement to stderr and a JSON summary to
stdout.  Run: python tools/bench_r3.py
"""

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
    from dexct_tpu.pipeline.fused import dect_step, pack_dect
    from dexct_tpu.system import (ConeBeamGeometry, FanBeamGeometry,
                                  pelvis_phantom)

    log(f"devices: {jax.devices()}")
    results = {}

    ct = FanBeamGeometry(N_channels=800, N_proj=1000,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0, eid=True)
    ph = pelvis_phantom(N=512, dx=0.1)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)

    import functools

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

    # ---- 2-D headline variants -------------------------------------
    log("== 2-D fused (exact siddon_dominant, parallel recon) ==")
    arrays, meta = pack_dect(ct, ph, s1, s2, 512, 50.0, 0.8, n_iters=10,
                             projector="siddon_dominant", recon="parallel")
    arrays = jax.device_put(arrays)
    fetch2d = lambda o: float(o["mat_recons"][0][0, 0])  # noqa: E731

    for name, m in [
        ("2d_comp32", meta),                              # round-3 default
        ("2d_comp0", meta._replace(gn_warm_nodes=0)),     # round-2 behavior
    ]:
        step = jax.jit(functools.partial(dect_step, meta=m))
        bench(name, step, arrays, fetch2d)

    # (spectral='pallas' variant measured 2026-08-17: 0.2855s vs
    # 0.2821s XLA -> the Pallas kernel lost the A/B and was deleted;
    # see ROADMAP.md rejected levers)

    # ---- fused cone DE e2e -----------------------------------------
    log("== fused cone DE (360v x 16r x 256c -> 4 x 256^2 x 16) ==")
    cct = ConeBeamGeometry(N_channels=256, N_proj=360, N_rows=16,
                           gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                           h_iso=0.25, eid=True)
    cph = dataclasses.replace(
        ph, labels=np.broadcast_to(ph.labels[0][:256, :256],
                                   (32, 256, 256)).copy(), dz=ph.dx)
    carrays, cmeta = pack_cone_dect(cct, cph, s1, s2, 256, 40.0, 0.8,
                                    n_iters=10)
    carrays = jax.device_put(carrays)
    fetchc = lambda o: float(o["mat_recons"][0][0, 0, 0])  # noqa: E731
    log(f"  meta: orbit4={cmeta.fdk_orbit4}")
    for name, m in [
        ("cone_orbit4", cmeta),
        ("cone_plain", cmeta._replace(fdk_orbit4=False)),
        ("cone_plain_comp0", cmeta._replace(fdk_orbit4=False,
                                            gn_warm_nodes=0)),
    ]:
        step = make_jitted_cone_step(m)
        bench(name, step, carrays, fetchc)

    # ---- standalone FDK --------------------------------------------
    log("== standalone 4-volume FDK ==")
    from dexct_tpu.ops.conebeam import _fdk_backproject_multi

    rng = np.random.default_rng(0)
    qs = jax.device_put(jnp.asarray(
        rng.normal(size=(4, 360, 16, 256)).astype(np.float32)))
    betas = jax.device_put(jnp.asarray(
        np.arange(360) * (2 * np.pi / 360), jnp.float32))
    args = (qs, betas, 60.0, 0.8230337 / 256, 0.25, 16, 256, 16, 40.0,
            0.25, 2 * np.pi / 360)
    for name, kw in [
        ("fdk_plain_pair", dict(pair_mode=True)),
        ("fdk_orbit4_pair", dict(pair_mode=True, orbit4=True)),
        ("fdk_orbit4_single", dict(pair_mode=False, orbit4=True)),
    ]:
        f = functools.partial(_fdk_backproject_multi, **kw)
        bench(name, lambda a, f=f: f(*a), args,
              lambda o: float(o[0, 0, 128, 128]))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
