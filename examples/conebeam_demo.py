"""3-D cone-beam demo: circular FDK, helical Feldkamp, and iterative CG.

The reference is strictly 2-D slice-based (plots.py:124-126 scans one
z_index); this demo exercises the framework's 3-D extension end-to-end:

1. circular cone-beam scan of a multi-slice phantom + FDK volume,
2. the same object on a helical (spiral) orbit + generalized Feldkamp,
3. exact-adjoint CG least-squares on a small volume,

and prints center-slice accuracy against the 2-D fan reconstruction.

    python examples/conebeam_demo.py [--n 128] [--rows 16]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from dexct_tpu.ops.conebeam import (
    cone_cg_recon,
    cone_material_paths,
    fdk_reconstruct,
    helical_fdk_reconstruct,
    project_volume_3d,
)
from dexct_tpu.ops.fbp import fan_backproject, filter_sinogram
from dexct_tpu.ops.siddon import material_path_sinogram, mono_sinogram
from dexct_tpu.system import (
    ConeBeamGeometry,
    FanBeamGeometry,
    HelicalConeBeamGeometry,
    contrast_rods_phantom,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128, help="in-plane matrix")
    ap.add_argument("--rows", type=int, default=16, help="detector rows")
    args = ap.parse_args()
    N, R = args.n, args.rows
    dx = 25.6 / N
    fov = 0.8 * N * dx

    ph2 = contrast_rods_phantom(N=N, dx=dx)
    lab3 = np.broadcast_to(ph2.labels[0], (2 * R, N, N)).copy()
    ph3 = dataclasses.replace(ph2, labels=lab3, dz=dx)
    mu = ph2.materials.mu_table(np.array([60.0]))[:, 0]
    muj = jnp.asarray(mu, jnp.float32)

    # 2-D fan anchor
    fan = FanBeamGeometry(N_channels=2 * N, N_proj=2 * N,
                          gamma_fan=0.8230337, SID=60.0, SDD=100.0)
    img2 = np.asarray(fan_backproject(
        filter_sinogram(
            mono_sinogram(material_path_sinogram(ph2, fan), muj), fan, 0.8),
        jnp.asarray(fan.betas, jnp.float32), fan.SID, fan.dgamma, N, fov))
    interior = np.hypot(*np.meshgrid(
        *[np.arange(N) - (N - 1) / 2.0] * 2)) < 0.35 * N

    def report(tag, mid, dt):
        err = np.abs(mid - img2)[interior].max() / img2.max()
        print(f"{tag}: {dt:.2f}s, center-slice max err vs fan FBP "
              f"= {100 * err:.2f}%")

    # 1) circular cone + FDK
    ct = ConeBeamGeometry(N_channels=2 * N, N_proj=2 * N, N_rows=R,
                          gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                          h_iso=2.0 * dx)
    t0 = time.time()
    sino = jnp.einsum("vrcm,m->vrc", cone_material_paths(ph3, ct), muj)
    vol = np.asarray(fdk_reconstruct(sino, ct, N, fov, 0.8))
    report("circular FDK", 0.5 * (vol[R // 2 - 1] + vol[R // 2]),
           time.time() - t0)

    # 2) helical orbit, two turns
    hct = HelicalConeBeamGeometry(
        N_channels=2 * N, N_proj=4 * N, N_rows=R, gamma_fan=0.8230337,
        SID=60.0, SDD=100.0, h_iso=2.0 * dx, pitch=R * dx,
        rotation_total=4.0 * np.pi)
    t0 = time.time()
    hsino = jnp.einsum("vrcm,m->vrc", cone_material_paths(ph3, hct), muj)
    hvol = np.asarray(helical_fdk_reconstruct(hsino, hct, N, fov, 0.8))
    report("helical Feldkamp", hvol[hvol.shape[0] // 2], time.time() - t0)

    # 3) iterative CG on a compact volume (exact adjoint via
    #    jax.linear_transpose on the linear 3-D DDA)
    Ns = min(N, 64)
    ph2s = contrast_rods_phantom(N=Ns, dx=25.6 / Ns)
    lab3s = np.broadcast_to(ph2s.labels[0], (4, Ns, Ns)).copy()
    vol_true = jnp.asarray(mu, jnp.float32)[lab3s]
    cts = ConeBeamGeometry(N_channels=2 * Ns, N_proj=96, N_rows=4,
                           gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                           h_iso=25.6 / Ns)
    src, dirs = cts.ray_geometry_3d()
    b = project_volume_3d(vol_true, jnp.asarray(src, jnp.float32),
                          jnp.asarray(dirs, jnp.float32),
                          25.6 / Ns, 25.6 / Ns, 25.6 / Ns)
    t0 = time.time()
    xr, hist = cone_cg_recon(b, cts, vol_true.shape,
                             (25.6 / Ns,) * 3, n_iters=25)
    rel = float(jnp.linalg.norm(xr - vol_true)
                / jnp.linalg.norm(vol_true))
    print(f"CG-25 (exact adjoint): {time.time() - t0:.2f}s, "
          f"volume rel err {100 * rel:.2f}%, residual drop "
          f"{float(hist[0] / jnp.maximum(hist[-1], 1e-30)):.1e}x")


if __name__ == "__main__":
    main()
