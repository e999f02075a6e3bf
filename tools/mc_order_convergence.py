"""Order-convergence study of the multiple-scatter tail (round-5 item 3).

The round-4 protocol study measured MC 2nd/1st ~ 12 at 4-cm collimation
on the 45-cm pelvis habitus — a multiple-dominated regime where a factor
fitted at order 2 has no demonstrated validity.  This study runs the
deep-order Compton walk (:func:`dexct_tpu.ops.scatter_physics.
mc_multi_order_reference`) at both protocol scales and reports the
per-order detected series, the converged ``multiple_factor``, and the
extrapolated-remainder bound:

* **fan** — 1-row collimation (the 2-D DE pipeline's regime);
* **cone** — 64-row / 4-cm collimation (the wide-cone protocol).

Geometry/spectrum match tools/protocol3d_study.py (pelvis mid-slice at
256 x 256 x 2 mm, 120 kV shipped binary, 200-channel NEE proxy — the
factor is a ratio of channel-integrated totals).

Run:  python tools/mc_order_convergence.py [--quick]
(--quick: 64-grid, 4000 samples, 8 orders — CPU shakeout only).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from dexct_tpu.ops.scatter_physics import (  # noqa: E402
    mc_multi_order_reference, multiple_to_single_factor)
from dexct_tpu.physics.spectrum import Spectrum  # noqa: E402
from dexct_tpu.system.geometry import FanBeamGeometry  # noqa: E402
from dexct_tpu.system.phantom import (  # noqa: E402
    VoxelPhantom, pelvis_phantom_3d)

QUICK = "--quick" in sys.argv
N, NZ, DX = (64, 4, 0.8) if QUICK else (256, 8, 0.2)
H_ISO = 0.0625
N_SAMPLES = 4000 if QUICK else 20000
ORDERS = 8 if QUICK else 16


def main():
    ph3 = pelvis_phantom_3d(N=N, nz=NZ, dx=DX, dz=DX)
    ph = VoxelPhantom("mid", ph3.labels[NZ // 2], ph3.materials, DX, DX,
                      DX)
    spec = Spectrum.from_file(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "input", "spectrum", "120kV_1mGy_float32.bin"), "120kV")
    ct = FanBeamGeometry(N_channels=200, N_proj=1000,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         h_iso=H_ISO, eid=True)

    for name, n_rows in (("fan (1 row)", 1), ("cone (64 rows / 4 cm)",
                                              64)):
        t0 = time.perf_counter()
        tot, err = mc_multi_order_reference(
            ph, ct, spec, 0.0, N_SAMPLES, orders=ORDERS, seed=5,
            n_rows=n_rows)
        dt = time.perf_counter() - t0
        print(f"== {name}: {N_SAMPLES} photons, {ORDERS} orders, "
              f"{dt:.0f} s ==")
        print("  k    S_k/S_1    +-      S_k/S_(k-1)")
        for k in range(ORDERS):
            r = tot[k] / tot[k - 1] if k and tot[k - 1] > 0 else float(
                "nan")
            print(f"  {k + 1:>2}  {tot[k] / tot[0]:9.4f}  "
                  f"{err[k] / tot[0]:7.4f}  {r:8.3f}")
        multi = float(tot[1:].sum())
        r_last = float(tot[-1] / tot[-2]) if tot[-2] > 0 else 0.0
        tail = (tot[-1] * r_last / (1.0 - r_last)
                if 0 < r_last < 1 else float("nan"))
        m_conv = (multi + tail) / tot[0]
        m2 = tot[1] / tot[0]
        print(f"  order-2 factor (round-4 closure): {m2:.3f}")
        print(f"  converged factor (sum + geometric tail): {m_conv:.3f}")
        print(f"  tail fraction of the multiple sum: "
              f"{tail / (multi + tail):.3%}  (r_last = {r_last:.3f})")
        diag = {}
        m_api = multiple_to_single_factor(
            ph, ct, spec, n_samples=N_SAMPLES, seed=5, n_rows=n_rows,
            orders=ORDERS, tail_bound=diag)
        print(f"  multiple_to_single_factor(orders={ORDERS}) = "
              f"{m_api:.3f}  [api tail fraction "
              f"{diag['tail_fraction']:.3%}]")
        print()


if __name__ == "__main__":
    main()
