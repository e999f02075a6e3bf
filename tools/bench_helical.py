"""Fused helical DE pipeline benchmark (round 3).

Production-shaped helical scan: 2 turns x 360 views/turn, 16 rows x
256 channels through a z-varying 256^2 x 48 anthropomorphic pelvis,
dual energy, GN decomposition, 4-volume packed generalized-Feldkamp
reconstruction — one jit.  Also times the multi-volume gFDK against
four separate single-volume calls (the pre-round-3 stateless shape) to
record the packed-tap win.

    python tools/bench_helical.py
"""

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
    import jax.numpy as jnp
    import numpy as np

    from dexct_tpu.ops.conebeam import helical_fdk_reconstruct
    from dexct_tpu.physics import kramers_spectrum, linac_spectrum
    from dexct_tpu.pipeline.cone import (make_jitted_cone_step,
                                         pack_cone_dect)
    from dexct_tpu.system.geometry import HelicalConeBeamGeometry
    from dexct_tpu.system.phantom import pelvis_phantom_3d

    log(f"devices: {jax.devices()}")
    results = {}

    # pitch = 0.75 * collimation (clinical-ish); 2 full turns
    ct = HelicalConeBeamGeometry(
        N_channels=256, N_proj=720, N_rows=16, gamma_fan=0.8230337,
        SID=60.0, SDD=100.0, h_iso=0.25, eid=True,
        rotation_total=4.0 * np.pi, pitch=3.0)
    ph = pelvis_phantom_3d(N=256, nz=48, dx=0.2, dz=0.2)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)

    t0 = time.time()
    a, m = pack_cone_dect(ct, ph, s1, s2, 256, 40.0, 0.8, n_iters=10)
    log(f"  pack: {time.time() - t0:.1f}s  nz_out={m.nz_out} "
        f"dz={m.dz_out:.3f} bundle={m.bundle} rays={720 * 16 * 256}")
    a = jax.device_put(a)
    step = make_jitted_cone_step(m)
    out = bench("helical_e2e", lambda: step(a),
                lambda o: float(o["mat_recons"][0][0, 0, 0]), results)

    # multi-volume gFDK vs 4 single-volume calls (recon stage only)
    logs = jnp.stack([out["sino_log"][0], out["sino_log"][1],
                      out["mat_sinos"][0], out["mat_sinos"][1]])
    zv = float(m.z0) + float(m.dz_out) * np.arange(m.nz_out)
    rec4 = jax.jit(functools.partial(
        helical_fdk_reconstruct, geometry=ct, n_matrix=256, fov=40.0,
        ramp=0.8, z_out=zv))
    bench("gfdk_4vol_packed", lambda: rec4(logs),
          lambda o: float(o[0][0, 0, 0]), results)

    def four_single():
        return [rec4(s) for s in logs]

    bench("gfdk_4vol_separate", four_single,
          lambda o: [float(v[0, 0, 0]) for v in o], results)

    results["gfdk_pack_speedup"] = round(
        results["gfdk_4vol_separate"] / results["gfdk_4vol_packed"], 2)

    # LONG-scan leg (5 turns): the slice-windowed gFDK scan makes the
    # backprojection cost per slice O(views-per-turn), not O(total
    # views) — each view block only touches the L = O(pitch/dz) slices
    # inside its 2*pi window.  The unwindowed scan (dbeta=None) is
    # timed against it at the same shape.
    ct5 = HelicalConeBeamGeometry(
        N_channels=256, N_proj=1800, N_rows=16, gamma_fan=0.8230337,
        SID=60.0, SDD=100.0, h_iso=0.25, eid=True,
        rotation_total=10.0 * np.pi, pitch=3.0)
    V5 = ct5.N_proj
    rng = np.random.default_rng(0)
    q5 = jnp.asarray(rng.standard_normal((4, V5, 16, 256))
                     .astype(np.float32))
    zv5 = (np.arange(44) + 0.5) * 0.25 - 5.5
    rec5 = jax.jit(functools.partial(
        helical_fdk_reconstruct, geometry=ct5, n_matrix=256, fov=40.0,
        ramp=0.8, z_out=zv5))
    bench("gfdk_5turn_windowed", lambda: rec5(q5),
          lambda o: float(o[0][0, 0, 0]), results)

    from dexct_tpu.ops.conebeam import (_helical_backproject,
                                        _helical_pair_ok)
    from dexct_tpu.ops.filters import filter_frequency_response

    cosg = np.cos(ct5.gammas)
    cosk = ct5.SID / np.sqrt(ct5.SID ** 2 + np.asarray(ct5.z_iso) ** 2)
    w5 = jnp.asarray(cosg[None, :] * cosk[:, None] * ct5.SID,
                     jnp.float32)
    H5, m5 = filter_frequency_response(256, ct5.dgamma, 0.8, "sinc",
                                       "fan")
    qf = jnp.fft.irfft(
        jnp.fft.rfft(q5 * w5[None, None], n=m5, axis=-1)
        * jnp.asarray(H5, jnp.float32), n=m5,
        axis=-1)[..., :256] * ct5.dgamma
    bc5 = 0.5 * ct5.rotation_total + 2.0 * np.pi * zv5 / ct5.pitch
    bp_full = jax.jit(functools.partial(
        _helical_backproject, sid=60.0, dgamma=float(ct5.dgamma),
        row_h=0.25, n_rows=16, pitch=3.0, n_matrix=256, nz_out=44,
        fov=40.0, dz_out=0.25, z0=float(zv5[0]),
        pair_mode=_helical_pair_ok(60.0, 40.0, 0.25, 0.25, 44, 16),
        dbeta=None))
    args5 = (qf, jnp.asarray(ct5.betas, jnp.float32),
             jnp.asarray(ct5.source_z, jnp.float32),
             jnp.zeros(V5, jnp.float32), jnp.asarray(bc5, jnp.float32))
    bench("gfdk_5turn_unwindowed", lambda: bp_full(*args5),
          lambda o: float(o[0][0, 0, 0]), results)
    results["gfdk_window_speedup"] = round(
        results["gfdk_5turn_unwindowed"]
        / results["gfdk_5turn_windowed"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
