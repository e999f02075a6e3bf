"""A/B the bundled dominant tracer in the REAL fused pipeline:
headline 512^2 and high-res 1024^2, trace_bundle in {0, 8}."""
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
        return out

    configs = [
        ("headline", 800, 1000, 512, 512, 512, 1024, 0.1),
        ("highres", 1600, 1440, 1024, 1024, 1440, 2048, 0.05),
    ]
    for cname, nch, nproj, nph, nmat, rnth, rnt, dx in configs:
        ct = FanBeamGeometry(N_channels=nch, N_proj=nproj,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=True)
        ph = pelvis_phantom(N=nph, dx=dx)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        outs = {}
        for tb in (0, 8):
            a, m = pack_dect(ct, ph, s1, s2, nmat, 50.0, 0.8, n_iters=10,
                             projector="siddon_dominant", recon="parallel",
                             recon_n_theta=rnth, recon_nt=rnt,
                             trace_bundle=tb)
            if tb:
                log(f"  {cname}: fp_meta {m.fp_meta}")
            a = jax.device_put(a)
            outs[tb] = bench(
                f"{cname}_tb{tb}",
                jax.jit(functools.partial(dect_step, meta=m)), a,
                lambda o: float(o["mat_recons"][0][0, 0]))
        import jax.numpy as jnp
        d = float(jnp.abs(outs[8]["mat_recons"][0]
                          - outs[0]["mat_recons"][0]).max())
        log(f"  {cname}: |bundled-perray| mat_recon diff {d:.3e}")
        results[f"{cname}_diff"] = d
        del outs

    print(json.dumps(results))


if __name__ == "__main__":
    main()
