"""Measure the sharding tax on the real chip (VERDICT r3 item 5).

The one ICI-relevant number a single-chip environment can produce: the
overhead of the SHARDED program structure itself — shard_map partitioning,
the halo-exchange rebin path, per-shard dominant ray plans, psum'd
backprojection — executed on a D=1 ``views`` mesh on the TPU, against the
unsharded fused program on the same workload.  This bounds what multi-chip
deployment costs per chip before any actual ICI transfer happens (on a
virtual CPU mesh the collectives are memcpys, so only the real chip's
compiled program exposes the partitioning overhead).

Also reports the halo pack's host-side pack-time delta (plan + permute +
per-shard ray plans vs the plain pack).

Run on an idle tunnel:  python tools/bench_sharding_tax.py [--cone]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.system import FanBeamGeometry, pelvis_phantom
from dexct_tpu.utils.profiling import fence


def _system(n_channels=800, n_proj=1024):
    # V=1024 (not the bench's 1000): the halo plan needs V % 4D == 0 and
    # identical shapes for both programs keep the comparison clean
    ct = FanBeamGeometry(N_channels=n_channels, N_proj=n_proj,
                        gamma_fan=0.8230337, SID=60.0, SDD=100.0, eid=True)
    ph = pelvis_phantom(N=512, dx=0.1)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    return ct, ph, s1, s2


def _time(step, args, n=3):
    def once():
        t0 = time.time()
        out = step(args)
        fence(out["mat_recons"][0])
        return time.time() - t0

    once()  # compile
    return min(once() for _ in range(n))


def main():
    print("devices:", jax.devices())
    ct, ph, s1, s2 = _system()

    from dexct_tpu.parallel import shard_arrays, sharded_dect_step, view_mesh
    from dexct_tpu.parallel.halo import pack_dect_sharded
    from dexct_tpu.pipeline.fused import make_jitted_step, pack_dect

    # 2-D flagship fast path (Fourier projector + rebinned-parallel
    # recon).  The halo-exchange exact path is D>=2 BY CONSTRUCTION
    # (plan_halo: the halo always needs >= 1 ring hop, so nh >= D fails
    # at D=1) — its D=1-measurable pieces are the per-shard dominant
    # plans + psum structure, which the --cone section covers.
    t0 = time.time()
    arrays, meta = pack_dect(ct, ph, s1, s2, 512, 50.0, 0.8, n_iters=10,
                             projector="fourier", recon="parallel")
    arrays = jax.device_put(arrays)
    t_pack_plain = time.time() - t0
    step = make_jitted_step(meta)
    t_plain = _time(step, arrays)
    print(f"unsharded fourier DE: {t_plain:.4f} s  "
          f"(pack {t_pack_plain:.2f} s)")

    t0 = time.time()
    mesh = view_mesh(1)
    sstep = sharded_dect_step(mesh, meta, arrays.keys())
    sargs = shard_arrays(arrays, mesh)
    t_shard = _time(sstep, sargs)
    print(f"sharded fourier DE (D=1 views mesh, all_gather rebin): "
          f"{t_shard:.4f} s")
    print(f"sharding tax: {(t_shard / t_plain - 1.0) * 100:+.1f}% device")

    # halo pack-time delta (host side; the D=2 plan on the same system)
    t0 = time.time()
    pack_dect(ct, ph, s1, s2, 512, 50.0, 0.8, n_iters=10,
              projector="siddon_dominant", recon="parallel")
    t_pp = time.time() - t0
    t0 = time.time()
    pack_dect_sharded(ct, ph, s1, s2, 512, 50.0, 0.8, n_devices=2,
                      n_iters=10, projector="siddon_dominant")
    t_ph = time.time() - t0
    print(f"halo+per-shard-plan pack delta (host, D=2 plan): "
          f"{t_ph - t_pp:+.2f} s ({t_pp:.2f} -> {t_ph:.2f})")

    if "--cone" in sys.argv:
        import dataclasses

        from dexct_tpu.pipeline.cone import (make_jitted_cone_step,
                                             make_sharded_cone_step,
                                             pack_cone_dect,
                                             pack_cone_dect_sharded)
        from dexct_tpu.system import ConeBeamGeometry

        cct = ConeBeamGeometry(N_channels=256, N_proj=360, N_rows=16,
                               gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                               h_iso=0.25, eid=True)
        ph2 = pelvis_phantom(N=256, dx=0.2)
        ph3 = dataclasses.replace(
            ph2, labels=np.broadcast_to(ph2.labels[0],
                                        (32, 256, 256)).copy(), dz=0.2)
        # apples-to-apples: the sharded pack uses per-shard PER-RAY
        # plans, so the tax baseline is the unsharded per-ray program
        # (trace_bundle=0); the bundled number is printed for context
        ca, cm = pack_cone_dect(cct, ph3, s1, s2, 256, 50.0, 0.8,
                                n_iters=10, nz_out=16, trace_bundle=0)
        ca = jax.device_put(ca)
        cstep = make_jitted_cone_step(cm)

        def _ctime(st, ar):
            def once():
                t0 = time.time()
                out = st(ar)
                fence(out["mat_recons"][0])
                return time.time() - t0

            once()
            return min(once() for _ in range(3))

        t_cplain = _ctime(cstep, ca)
        print(f"unsharded cone DE (per-ray): {t_cplain:.4f} s")
        cab, cmb = pack_cone_dect(cct, ph3, s1, s2, 256, 50.0, 0.8,
                                  n_iters=10, nz_out=16)
        t_cbund = _ctime(make_jitted_cone_step(cmb), jax.device_put(cab))
        print(f"unsharded cone DE (bundled, for context): {t_cbund:.4f} s")
        sca, scm, _ = pack_cone_dect_sharded(cct, ph3, s1, s2, 256, 50.0,
                                             0.8, n_devices=1, n_iters=10,
                                             nz_out=16)
        scstep = make_sharded_cone_step(view_mesh(1), scm, tuple(sca))
        sca = jax.device_put(sca)
        t_cshard = _ctime(scstep, sca)
        print(f"sharded cone DE (D=1): {t_cshard:.4f} s  "
              f"tax {(t_cshard / t_cplain - 1.0) * 100:+.1f}%")


if __name__ == "__main__":
    main()
