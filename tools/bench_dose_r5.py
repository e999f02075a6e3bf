"""Round-5 dose-kernel attack (VERDICT item 5): measure + profile the
512^2 fan dose map and A/B the voxel-tap fold.

Variants:
  base          — round-4 shipped configuration (pair-mode polar pack)
  tapfold       — one row-4K voxel gather instead of two row-2K
  tapfold_e32   — + energy-compressed spectral axis (n_energy=32)

Run on an idle tunnel:  python tools/bench_dose_r5.py [--profile]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402

from dexct_tpu.ops.dose import dose_map  # noqa: E402
from dexct_tpu.physics import kramers_spectrum  # noqa: E402
from dexct_tpu.system import FanBeamGeometry, pelvis_phantom  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    ct = FanBeamGeometry(N_channels=800, N_proj=512,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=True)
    ph = pelvis_phantom(N=512, dx=0.1)
    s = kramers_spectrum(120.0)
    s.rescale_counts(ct.A_iso * 20.0 / ct.N_proj)

    variants = [
        ("base", dict()),
        ("tapfold", dict(vox_tap_fold=True)),
        ("tapfold_e32", dict(vox_tap_fold=True, n_energy=32)),
    ]
    results = {}
    ref = None
    for name, kw in variants:
        t0 = time.time()
        out = dose_map(ph, ct, s, **kw)
        print(f"[{name}] compile+first {time.time() - t0:.1f}s",
              flush=True)
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = dose_map(ph, ct, s, **kw)
            ts.append(time.time() - t0)
        d = out.dose_mGy
        if ref is None:
            ref = d
            rel = 0.0
        else:
            rel = float(np.abs(d - ref).max() / ref.max())
        print(f"[{name}] {[f'{t:.2f}' for t in ts]} -> {min(ts):.2f} s "
              f"(max rel dev vs base {rel:.2e})", flush=True)
        results[name] = round(min(ts), 3)

    if "--profile" in sys.argv:
        best_kw = dict(vox_tap_fold=True)
        with jax.profiler.trace("/tmp/dose_prof"):
            out = dose_map(ph, ct, s, **best_kw)
            _ = float(out.deposited_J)
        print("trace written to /tmp/dose_prof", flush=True)
    print(json.dumps({"dose512_s": results}))


if __name__ == "__main__":
    main()
