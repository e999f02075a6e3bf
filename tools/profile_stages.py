"""Per-stage TPU timing of the reference workload (dev tool).

Usage: python tools/profile_stages.py [N_PROJ N_CHANNELS N_PHANTOM N_MATRIX]

CAVEAT (CLAUDE.md): standalone kernel reruns measure ~5x their
in-program times (gather residency) and include per-call host
plan/pack overhead — compare stages RELATIVELY here, and take absolute
stage budgets from the fused-program XLA trace (vm.xplane.pb) instead.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, ".")

from dexct_tpu.ops import matdecomp as md
from dexct_tpu.ops import spectral as sp
from dexct_tpu.ops.fbp import fan_backproject
from dexct_tpu.ops.siddon import trace_paths
from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.pipeline.fused import _filter_views, pack_dect
from dexct_tpu.system import FanBeamGeometry, pelvis_phantom


def timeit(name, fn, n=3):
    out = fn()
    _ = np.asarray(jax.tree.leaves(out)[0])  # fence incl. compile
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn()
        _ = np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0]
        ts.append(time.time() - t0)
    print(f"{name:24s} {min(ts)*1e3:9.1f} ms")
    return out


def main():
    args = [int(a) for a in sys.argv[1:]] or [1000, 800, 512, 512]
    V, C, NP, NM = args
    ct = FanBeamGeometry(N_channels=C, N_proj=V, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, eid=True)
    ph = pelvis_phantom(N=NP, dx=51.2 / NP)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    arrays, meta = pack_dect(ct, ph, s1, s2, NM, 50.0, 0.8, n_iters=50)
    a = jax.device_put(arrays)

    paths = timeit("trace (exact DDA)", lambda: trace_paths(
        a["labels"], a["src"], a["dirs"], meta.dx, meta.dy,
        n_materials=meta.n_materials))

    # the PRODUCTION exact trace (what the 0.28 s headline runs):
    # dominant-axis 16-row groups, 3-bit labels, row-32 gathers
    from dexct_tpu.ops.siddon_fast import trace_paths_dominant

    timeit("trace (dominant grp16)", lambda: trace_paths_dominant(
        a["labels"], a["src"], a["dirs"], meta.dx, meta.dy,
        n_materials=meta.n_materials, group=16))

    # bundled-gather variant (the round-3 production default): 8
    # adjacent same-view channels share one row-window gather per group
    from dexct_tpu.ops.siddon_fast import (plan_dominant_split_bundled,
                                           trace_paths_dominant_bundled)

    bplan = plan_dominant_split_bundled(
        np.asarray(arrays["src"]), np.asarray(arrays["dirs"]),
        a["labels"].shape, meta.dx, meta.dy)
    print(f"{'':24s} (bundled frac "
          f"{bplan['frac_bundled']:.3f})")
    timeit("trace (bundled grp16)", lambda: trace_paths_dominant_bundled(
        a["labels"], np.asarray(arrays["src"]), np.asarray(arrays["dirs"]),
        meta.dx, meta.dy, n_materials=meta.n_materials, plan=bplan))

    # the production fast-path stages (what bench.py actually runs)
    from dexct_tpu.ops.fourier import fourier_paths, plan_fourier_projector

    plan = plan_fourier_projector(ph, ct)
    timeit("trace (fourier-slice)", lambda: fourier_paths(
        plan, a["labels"], (V, C)))

    c1 = timeit("counts x2", lambda: (
        sp.counts_from_paths(paths, a["mu_t1"], a["i0_1"]),
        sp.counts_from_paths(paths, a["mu_t2"], a["i0_2"])))[0]
    l1 = timeit("log", lambda: sp.log_sinogram(c1, meta.air1))
    timeit("gn50 (reference iters)", lambda: md.gauss_newton_solve(
        jnp.stack([c1.reshape(-1)] * 2), a["dec_i0"], a["dec_mus"],
        n_iters=50, pixel_block=meta.pixel_block))
    timeit("gn10 (production)", lambda: md.gauss_newton_solve(
        jnp.stack([c1.reshape(-1)] * 2), a["dec_i0"], a["dec_mus"],
        n_iters=10, pixel_block=meta.pixel_block))
    q = timeit("filter", lambda: _filter_views(
        l1, a["cos_w"], a["filt_H"], meta.fft_len, meta.dgamma))
    timeit("backproject (direct fan)", lambda: fan_backproject(
        q, a["betas"], meta.sid, meta.dgamma, NM, 50.0, dbeta=meta.dbeta))

    from dexct_tpu.ops.fbp_fast import (
        pack_filtered,
        pack_filtered_sym,
        pack_filtered_sym8,
        parallel_backproject_sym,
        parallel_backproject_sym8,
        parallel_rebin_plan,
        rebin_to_parallel,
    )

    nth, nt = 512, 1024
    rb_idx, rb_w, pt0, pdt = parallel_rebin_plan(ct, nth, nt)
    # device-put once — the tables are ~270 MB and re-uploading them per
    # timed call would measure the host tunnel, not the kernel
    rb_idx = jax.device_put(jnp.asarray(rb_idx))
    rb_w = jax.device_put(jnp.asarray(rb_w))
    sinos4 = jnp.stack([l1] * 4)
    par = timeit("rebin x4", lambda: rebin_to_parallel(
        sinos4, rb_idx, rb_w, nt))
    thetas = jnp.asarray(np.arange(nth) * (np.pi / nth), jnp.float32)
    bsel = np.array([0, nth // 4, nth // 2, 3 * nth // 4])

    def bp8():
        return parallel_backproject_sym8(
            pack_filtered_sym8(par), 4, thetas[1: nth // 4], pt0, pdt,
            nt, NM, 50.0, np.pi / nth,
        ) + parallel_backproject_sym(
            pack_filtered_sym(par[:, bsel]), 4, thetas[bsel[:2]], pt0,
            pdt, nt, NM, 50.0, np.pi / nth,
        )

    timeit("backproject x4 (8-fold sym)", bp8)

    # 3-D extension stages (round-2 cone subsystem, small config)
    import dataclasses

    from dexct_tpu.ops.conebeam import cone_material_paths, fdk_reconstruct
    from dexct_tpu.system import ConeBeamGeometry

    cct = ConeBeamGeometry(N_channels=min(C, 256), N_proj=min(V, 360),
                           N_rows=16, gamma_fan=0.8230337, SID=60.0,
                           SDD=100.0, h_iso=0.25)
    cph = dataclasses.replace(
        ph, labels=np.broadcast_to(
            ph.labels[0][:256, :256] if NP >= 256 else ph.labels[0],
            (32,) + ((256, 256) if NP >= 256 else ph.labels[0].shape)
        ).copy(), dz=ph.dx)
    mu60 = ph.materials.mu_table(np.array([60.0]))[:, 0]
    cpaths = timeit("cone trace (dominant)", lambda: cone_material_paths(
        cph, cct))
    csino = jnp.einsum("vrcm,m->vrc", cpaths,
                       jnp.asarray(mu60, jnp.float32))
    timeit("cone FDK x1 (z-pair)", lambda: fdk_reconstruct(
        csino, cct, cph.Nx, 40.0, 0.8))


if __name__ == "__main__":
    main()
