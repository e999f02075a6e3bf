"""TPU smoke of the round-3 session device kernels.

Every kernel below was built and validated on CPU while the tunnel was
down; this script runs each once on the real chip at modest scale and
prints one timing line per kernel.  Each kernel runs in its OWN child
process with a hard timeout: the experimental tunnel can kill the whole
TPU worker on a single over-long program (observed with the 256^2x32
dose_map_3d: "TPU worker process crashed"), and one casualty must not
take the remaining kernels with it.

    python tools/smoke_r3s3.py            # parent: run all kernels
    python tools/smoke_r3s3.py <kernel>   # child: run one
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KERNELS = (
    "dose_map_512",
    "dose_map_3d_128x16",
    "scatter_2d_512_16views",
    "scatter_cone_8views",
    "fbp_variance_512",
    "nmar_512",
)


def fence(x):
    import numpy as np

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


def run_kernel(name):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    import jax.numpy as jnp
    import numpy as np

    from dexct_tpu.ops import spectral as sp_ops
    from dexct_tpu.physics import kramers_spectrum
    from dexct_tpu.pipeline.api import get_sino
    from dexct_tpu.system.geometry import (ConeBeamGeometry,
                                           FanBeamGeometry)
    from dexct_tpu.system.phantom import pelvis_phantom, pelvis_phantom_3d

    ct = FanBeamGeometry(N_channels=512, N_proj=512, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, h_iso=0.1, eid=True)
    ph = pelvis_phantom(N=512, dx=0.1)
    spec = kramers_spectrum(120.0)
    air0 = float(np.sum(sp_ops.effective_fluence(spec, ct)))
    spec.rescale_counts(1e5 / air0)

    if name == "dose_map_512":
        from dexct_tpu.ops.dose import dose_map

        timed(name, lambda: dose_map(ph, ct, spec).dose_mGy)
        return

    if name == "dose_map_3d_128x16":
        # modest scale: the 256^2x32 / 128-view program is minutes of
        # device time in one program and crashes the tunnel worker
        from dexct_tpu.ops.dose import dose_map_3d

        ct3 = ConeBeamGeometry(
            N_channels=128, N_proj=64, gamma_fan=0.8230337, SID=60.0,
            SDD=100.0, h_iso=0.25, eid=True, N_rows=16)
        ph3 = pelvis_phantom_3d(N=128, nz=16, dx=0.4, dz=0.4)
        timed(name, lambda: dose_map_3d(ph3, ct3, spec).dose_mGy)
        return

    if name == "scatter_2d_512_16views":
        from dexct_tpu.ops.scatter_physics import single_scatter_sinogram

        timed(name, lambda: single_scatter_sinogram(
            ph, ct, spec, coarse=8, n_energy=12, channel_sub=8,
            views=np.asarray(ct.betas[:16])))
        return

    if name == "scatter_cone_8views":
        from dexct_tpu.ops.scatter_physics import single_scatter_conebeam

        ct3 = ConeBeamGeometry(
            N_channels=256, N_proj=128, gamma_fan=0.8230337, SID=60.0,
            SDD=100.0, h_iso=0.25, eid=True, N_rows=16)
        ph3 = pelvis_phantom_3d(N=256, nz=32, dx=0.2, dz=0.2)
        timed(name, lambda: single_scatter_conebeam(
            ph3, ct3, spec, coarse=8, n_energy=8, channel_sub=8,
            row_sub=4, views=np.asarray(ct3.betas[:8])))
        return

    if name == "fbp_variance_512":
        from dexct_tpu.ops.noisemap import fbp_variance_map

        raw, _ = get_sino(ct, ph, spec)
        timed(name, lambda: fbp_variance_map(jnp.asarray(raw), ct, 512,
                                             51.2, 0.8))
        return

    if name == "nmar_512":
        from dexct_tpu.ops.mar import mar_recon

        ph_ti = pelvis_phantom(N=512, dx=0.1, implant="titanium")
        _, slog_ti = get_sino(ct, ph_ti, spec)
        timed(name, lambda: mar_recon(slog_ti, ct, spec, 512, 51.2, 0.8,
                                      method="nmar")[0])
        return

    raise SystemExit(f"unknown kernel {name!r}")


def main():
    if len(sys.argv) > 1:
        run_kernel(sys.argv[1])
        return
    ok = True
    for name in KERNELS:
        try:
            subprocess.run([sys.executable, "-u",
                            os.path.abspath(__file__), name],
                           timeout=1500, check=True)
        except (subprocess.TimeoutExpired,
                subprocess.CalledProcessError) as e:
            ok = False
            print(json.dumps({"kernel": name, "error": type(e).__name__}),
                  flush=True)
    print(json.dumps({"smoke": "ALL OK" if ok else "FAILURES"}),
          flush=True)


if __name__ == "__main__":
    main()
