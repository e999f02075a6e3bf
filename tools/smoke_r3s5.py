"""TPU smoke for the round-3 session-5 additions: gantry-tilted FDK and
the anode heel effect at protocol-ish scale.

    python tools/smoke_r3s5.py            # both
    python tools/smoke_r3s5.py tilted     # one
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fence(x):
    import numpy as np

    return float(np.asarray(x).ravel()[0])


def timed(name, fn):
    t0 = time.time()
    out = fn()
    fence(out)
    t1 = time.time()
    out = fn()
    fence(out)
    t2 = time.time()
    print(json.dumps({"kernel": name, "compile_s": round(t1 - t0, 2),
                      "steady_s": round(t2 - t1, 3)}), flush=True)
    return out


def main(which):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import numpy as np

    import jax.numpy as jnp
    from dexct_tpu.physics import kramers_spectrum, linac_spectrum
    from dexct_tpu.system import TiltedConeBeamGeometry
    from dexct_tpu.system.phantom import head_phantom_3d

    log(f"devices: {jax.devices()}")

    if which in ("all", "tilted"):
        from dexct_tpu.ops.conebeam import (cone_sinogram,
                                            fdk_tilted_reconstruct)

        ct = TiltedConeBeamGeometry(
            N_channels=256, N_proj=360, N_rows=16, gamma_fan=0.8230337,
            SID=60.0, SDD=100.0, h_iso=0.25, eid=True,
            tilt=np.deg2rad(15.0))
        ph = head_phantom_3d(N=256, nz=32, dx=0.1, dz=0.1)
        sp = kramers_spectrum(120.0)
        sp.rescale_counts(ct.A_iso * 5.0 / ct.N_proj)
        _, sino = cone_sinogram(ph, ct, sp)
        sino = jnp.asarray(sino)
        timed("tilted_fdk_256_1.5Mray", lambda: fdk_tilted_reconstruct(
            sino, ct, 256, 24.0, 0.8, nz_out=16, dz_out=0.2))

    if which in ("all", "heel"):
        from dexct_tpu.ops.heel import (HeelEffect, cone_sinogram_heel,
                                        decompose_cone_sinograms_heel)
        from dexct_tpu.system import ConeBeamGeometry
        from dexct_tpu.system.phantom import pelvis_phantom_3d

        ct = ConeBeamGeometry(
            N_channels=256, N_proj=360, N_rows=16, gamma_fan=0.8230337,
            SID=60.0, SDD=100.0, h_iso=0.25, eid=True)
        ph = pelvis_phantom_3d(N=256, nz=32, dx=0.2, dz=0.2)
        heel = HeelEffect(d0_cm=10e-4)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        c1 = timed("heel_cone_sinogram_1.5Mray",
                   lambda: cone_sinogram_heel(ph, ct, s1, heel)[0])
        c2, _ = cone_sinogram_heel(ph, ct, s2, heel)
        timed("heel_row_vmapped_gn_1.5Mray",
              lambda: decompose_cone_sinograms_heel(
                  ct, c1, c2, s1, s2, heel, n_iters=10)[0])


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
