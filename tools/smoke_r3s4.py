"""TPU smoke, part 2: the flagship paths not yet timed on hardware.

Same supervised-child pattern as tools/smoke_r3s3.py (one kernel per
process; the tunnel worker dies on over-long single programs).

    python tools/smoke_r3s4.py            # parent: run all
    python tools/smoke_r3s4.py <kernel>   # child: run one
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KERNELS = (
    "katsevich_256",
    "pcd_spectral_3mat_512",
    "helical_fused_e2e",
)


def fence(x):
    import numpy as np

    return float(np.asarray(x).ravel()[0])


def timed(name, fn, fetch=fence):
    t0 = time.time()
    out = fn()
    fetch(out)
    t1 = time.time()
    out = fn()
    fetch(out)
    t2 = time.time()
    print(json.dumps({"kernel": name, "compile_s": round(t1 - t0, 2),
                      "steady_s": round(t2 - t1, 3)}), flush=True)
    return out


def run_kernel(name):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    import jax.numpy as jnp
    import numpy as np

    if name == "katsevich_256":
        # exact helical inversion at clinical-ish pitch, 2 turns
        from dexct_tpu.ops.conebeam import cone_material_paths
        from dexct_tpu.ops.katsevich import katsevich_reconstruct
        from dexct_tpu.system.geometry import HelicalConeBeamGeometry
        from dexct_tpu.system.phantom import pelvis_phantom_3d

        ct = HelicalConeBeamGeometry(
            N_channels=256, N_proj=720, N_rows=16,
            gamma_fan=0.8230337, SID=60.0, SDD=100.0, h_iso=0.25,
            eid=True, rotation_total=4.0 * np.pi, pitch=3.0)
        ph = pelvis_phantom_3d(N=256, nz=48, dx=0.2, dz=0.2)
        mu = ph.materials.mu_table(np.array([60.0]))[:, 0]
        sino = jnp.einsum(
            "vrcm,m->vrc", cone_material_paths(ph, ct),
            jnp.asarray(mu, jnp.float32))
        f = jax.jit(lambda s: katsevich_reconstruct(s, ct, 256, 40.0))
        timed(name, lambda: f(sino),
              lambda o: float(np.asarray(o).ravel()[0]))
        return

    if name == "pcd_spectral_3mat_512":
        # 3-material K-edge decomposition, 4 CdTe bins, full protocol
        from dexct_tpu.physics.materials import BONE, TISSUE
        from dexct_tpu.physics.spectrum import kramers_spectrum
        from dexct_tpu.pipeline.spectralct import simulate_pcd_spectral
        from dexct_tpu.system.geometry import FanBeamGeometry
        from dexct_tpu.system.phantom import contrast_rods_phantom

        ct = FanBeamGeometry(N_channels=800, N_proj=1000,
                             gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                             eid=False)
        ph = contrast_rods_phantom(N=512, dx=0.1)
        spec = kramers_spectrum(120.0)
        spec.rescale_counts(ct.A_iso * 10.0 / ct.N_proj)
        timed(name, lambda: simulate_pcd_spectral(
            ct, ph, spec, [20.0, 34.0, 50.0, 70.0],
            [TISSUE, BONE], 512, 50.0, 0.8, n_iters=10).basis_recons,
            lambda o: float(np.asarray(o).ravel()[0]))
        return

    if name == "helical_fused_e2e":
        # the fused helical DE pipeline (same shape as bench_helical)
        from dexct_tpu.physics import kramers_spectrum, linac_spectrum
        from dexct_tpu.pipeline.cone import (make_jitted_cone_step,
                                             pack_cone_dect)
        from dexct_tpu.system.geometry import HelicalConeBeamGeometry
        from dexct_tpu.system.phantom import pelvis_phantom_3d

        ct = HelicalConeBeamGeometry(
            N_channels=256, N_proj=720, N_rows=16,
            gamma_fan=0.8230337, SID=60.0, SDD=100.0, h_iso=0.25,
            eid=True, rotation_total=4.0 * np.pi, pitch=3.0)
        ph = pelvis_phantom_3d(N=256, nz=48, dx=0.2, dz=0.2)
        s1 = linac_spectrum()
        s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
        s2 = kramers_spectrum(80.0)
        s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
        a, m = pack_cone_dect(ct, ph, s1, s2, 256, 40.0, 0.8,
                              n_iters=10)
        a = jax.device_put(a)
        step = make_jitted_cone_step(m)
        timed(name, lambda: step(a),
              lambda o: float(o["mat_recons"][0][0, 0, 0]))
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
                           timeout=1800, check=True)
        except (subprocess.TimeoutExpired,
                subprocess.CalledProcessError) as e:
            ok = False
            print(json.dumps({"kernel": name, "error": type(e).__name__}),
                  flush=True)
    print(json.dumps({"smoke": "ALL OK" if ok else "FAILURES"}),
          flush=True)


if __name__ == "__main__":
    main()
