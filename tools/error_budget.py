"""VMI error budget — decompose the end-to-end VMI RMSE into components.

VERDICT.md round-1 item 6: the single 24 HU "VMI(70) vs M_mono" number
(VALIDATION.md) mixes decomposition bias, FBP resolution, and ground-truth
registration.  This tool splits it with noiseless data and a *common
reconstruction transfer function* (RMSE methodology of
/root/reference/plots.py:296-306):

  gt     = M_mono(E0) on the recon grid          (analytic ground truth)
  mono   = FBP(exact mono log-sinogram at E0)    -> isolates recon/FBP
  vmi    = FBP(GN basis sinograms) -> VMI(E0)    -> the full pipeline

  recon  component = rmse(mono, gt)   [projector + filter + BP resolution
                                       (+ voxelization/registration for the
                                       voxel phantom)]
  decomp component = rmse(vmi, mono)  [basis-model span + GN bias; the FBP
                                       common mode cancels exactly because
                                       both stacks pass through
                                       pipeline.fused.reconstruct_stack]
  total            = rmse(vmi, gt)

The attenuation-table component cancels internally (M_mono and the VMI use
the same vendored tables); externally the vendored NIST anchors are <=2 %
of XCOM over 10 keV-6 MeV (tests/test_nist_data.py), i.e. <=~20 HU *scale*
uncertainty shared by every image, not a VMI-vs-truth error here.

Run on the TPU:  python tools/error_budget.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, ".")

from dexct_tpu.analysis import make_vmi, nonair_mask, rmse
from dexct_tpu.analysis.register import register_phantom_to_recon
from dexct_tpu.ops.siddon import material_path_sinogram, mono_sinogram
from dexct_tpu.physics import kramers_spectrum, linac_spectrum, xcom
from dexct_tpu.pipeline.fused import make_jitted_step, pack_dect, reconstruct_stack
from dexct_tpu.system import FanBeamGeometry, pelvis_phantom
from dexct_tpu.system.analytic import pelvis_analytic

N_MATRIX, FOV, E0 = 512, 50.0, 70.0


def hu(mu_img, mu_w):
    return 1000.0 * (np.asarray(mu_img) - mu_w) / mu_w


def budget(label, ph, ct, s1, s2, projector, gt_hu):
    arrays, meta = pack_dect(ct, ph, s1, s2, N_MATRIX, FOV, 0.8, n_iters=50,
                             projector=projector, recon="parallel")
    out = make_jitted_step(meta)(arrays)
    m1 = np.asarray(out["mat_recons"][0])
    m2 = np.asarray(out["mat_recons"][1])
    vmi = make_vmi(E0, m1, m2)

    # exact mono log-sinogram at E0 through the SAME recon path
    paths = material_path_sinogram(ph, ct)  # exact (analytic / dominant)
    mu_e0 = ph.materials.mu_table(np.array([E0]))[:, 0]
    L = mono_sinogram(paths, jnp.asarray(mu_e0, jnp.float32))
    stack = jnp.stack([L, L, L, L])  # recon path packs 4 images
    mono_mu = np.asarray(jax.jit(
        lambda s, a: reconstruct_stack(s, a, meta))(stack, arrays))[0]
    mu_w = float(xcom.mixatten("H(11.2)O(88.8)", np.array([E0]))[0])
    mono = hu(mono_mu, mu_w)

    r = np.hypot(*(np.mgrid[0:N_MATRIX, 0:N_MATRIX]
                   - (N_MATRIX - 1) / 2.0)) * FOV / N_MATRIX
    interior = nonair_mask(gt_hu) & (r < 20.0)

    # flat-region mask: drop pixels within 3 px of a material boundary so
    # the FBP edge response (pure resolution, not physics) is excluded
    gy, gx = np.gradient(gt_hu)
    edge = np.hypot(gy, gx) > 10.0
    for _ in range(3):
        e2 = edge.copy()
        e2[1:] |= edge[:-1]
        e2[:-1] |= edge[1:]
        e2[:, 1:] |= edge[:, :-1]
        e2[:, :-1] |= edge[:, 1:]
        edge = e2
    flat = interior & ~edge

    total = rmse(vmi, gt_hu, interior)
    recon = rmse(mono, gt_hu, interior)
    decomp = rmse(vmi, mono, interior)
    bias_d = float(np.mean((vmi - mono)[interior]))
    bias_r = float(np.mean((mono - gt_hu)[interior]))
    print(f"== {label} (noiseless, projector={projector}, E0={E0:.0f} keV, "
          f"interior r<20 cm) ==")
    print(f"  total  rmse(vmi,  gt)   : {total:6.1f} HU")
    print(f"  recon  rmse(mono, gt)   : {recon:6.1f} HU   "
          f"(mean bias {bias_r:+.1f} HU)")
    print(f"  decomp rmse(vmi,  mono) : {decomp:6.1f} HU   "
          f"(mean bias {bias_d:+.1f} HU)")
    print(f"  quadrature check sqrt(recon^2+decomp^2) = "
          f"{np.hypot(recon, decomp):6.1f} HU")
    print(f"  flat-region (edges excluded, {int(flat.sum())} px): "
          f"total {rmse(vmi, gt_hu, flat):.1f} / recon "
          f"{rmse(mono, gt_hu, flat):.1f} / decomp "
          f"{rmse(vmi, mono, flat):.1f} HU")
    return total, recon, decomp


def main():
    ct = FanBeamGeometry(N_channels=800, N_proj=1000, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, eid=True)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)

    # -- analytic-exact oracle: no voxelization, no registration ----------
    pha = pelvis_analytic()
    gt_a = hu(pha.mu_image(E0, N_MATRIX, FOV / N_MATRIX),
              float(xcom.mixatten("H(11.2)O(88.8)", np.array([E0]))[0]))
    budget("analytic pelvis oracle", pha, ct, s1, s2, "analytic", gt_a)

    # -- voxel pelvis (the VALIDATION.md headline configuration) ----------
    ph = pelvis_phantom(N=512, dx=0.1)
    gt_v = register_phantom_to_recon(ph, N_MATRIX, FOV, energy_keV=E0)
    budget("voxel pelvis (512^2)", ph, ct, s1, s2, "siddon_dominant", gt_v)

    print("table component: internal (VMI vs M_mono share the vendored "
          "tables) = 0; external <=2% vs NIST anchors "
          "(tests/test_nist_data.py)")


if __name__ == "__main__":
    main()
