"""TPU smoke of the round-3 session-3 device kernels.

Every kernel below was built and validated on CPU while the tunnel was
down; this script runs each once on the real chip at modest scale and
prints one timing line per kernel.  Run when the TPU returns (after
tools/bench_final_r3.py).

    python tools/smoke_r3s3.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import numpy as np
import jax.numpy as jnp


def fence(x):
    return float(np.asarray(x).ravel()[0])


def timed(name, fn):
    t0 = time.time()
    out = fn()  # includes compile
    fence(out if not isinstance(out, tuple) else out[0])
    t1 = time.time()
    out = fn()
    fence(out if not isinstance(out, tuple) else out[0])
    t2 = time.time()
    print(json.dumps({"kernel": name, "compile_s": round(t1 - t0, 2),
                      "steady_s": round(t2 - t1, 3)}), flush=True)
    return out


def main():
    from dexct_tpu.ops.dose import dose_map, dose_map_3d
    from dexct_tpu.ops.mar import mar_recon
    from dexct_tpu.ops.noisemap import fbp_variance_map
    from dexct_tpu.ops.scatter_physics import (single_scatter_conebeam,
                                               single_scatter_sinogram)
    from dexct_tpu.physics import kramers_spectrum
    from dexct_tpu.ops import spectral as sp_ops
    from dexct_tpu.pipeline.api import get_sino
    from dexct_tpu.system.geometry import (ConeBeamGeometry,
                                           FanBeamGeometry)
    from dexct_tpu.system.phantom import pelvis_phantom, pelvis_phantom_3d

    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    ct = FanBeamGeometry(N_channels=512, N_proj=512, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, h_iso=0.1, eid=True)
    ph = pelvis_phantom(N=512, dx=0.1)
    spec = kramers_spectrum(120.0)
    air0 = float(np.sum(sp_ops.effective_fluence(spec, ct)))
    spec.rescale_counts(1e5 / air0)

    timed("dose_map_512", lambda: dose_map(ph, ct, spec).dose_mGy)

    ct3 = ConeBeamGeometry(N_channels=256, N_proj=128, gamma_fan=0.8230337,
                           SID=60.0, SDD=100.0, h_iso=0.25, eid=True,
                           N_rows=16)
    ph3 = pelvis_phantom_3d(N=256, nz=32, dx=0.2, dz=0.2)
    spec3 = kramers_spectrum(120.0)
    spec3.rescale_counts(1e5 / air0)
    timed("dose_map_3d_256x32",
          lambda: dose_map_3d(ph3, ct3, spec3).dose_mGy)

    timed("scatter_2d_512_16views",
          lambda: single_scatter_sinogram(
              ph, ct, spec, coarse=8, n_energy=12, channel_sub=8,
              views=np.asarray(ct.betas[:16])))
    timed("scatter_cone_8views",
          lambda: single_scatter_conebeam(
              ph3, ct3, spec3, coarse=8, n_energy=8, channel_sub=8,
              row_sub=4, views=np.asarray(ct3.betas[:8])))

    raw, slog = get_sino(ct, ph, spec)
    timed("fbp_variance_512",
          lambda: fbp_variance_map(jnp.asarray(raw), ct, 512, 51.2, 0.8))

    ph_ti = pelvis_phantom(N=512, dx=0.1, implant="titanium")
    _, slog_ti = get_sino(ct, ph_ti, spec)
    timed("nmar_512",
          lambda: mar_recon(slog_ti, ct, spec, 512, 51.2, 0.8,
                            method="nmar")[0])
    print(json.dumps({"smoke": "ALL OK"}), flush=True)


if __name__ == "__main__":
    main()
