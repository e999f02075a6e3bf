"""Full-scale (bench-workload) accuracy validation — numbers for
VALIDATION.md.  Run on the TPU: python tools/validate_full_scale.py"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, ".")

from dexct_tpu.analysis import make_vmi, nonair_mask, rmse
from dexct_tpu.analysis.register import register_phantom_to_recon
from dexct_tpu.ops.siddon import material_path_sinogram
from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.pipeline.fused import make_jitted_step, pack_dect
from dexct_tpu.system import FanBeamGeometry, pelvis_phantom, water_cylinder_phantom


def main():
    ct = FanBeamGeometry(N_channels=800, N_proj=1000, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, eid=True)
    ph = pelvis_phantom(N=512, dx=0.1)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)

    print("== projector cross-validation (512^2 pelvis, 800k rays) ==")
    p_exact = np.asarray(material_path_sinogram(ph, ct, method="dominant"))
    p_four = None
    arrays, meta = pack_dect(ct, ph, s1, s2, 512, 50.0, 0.8, n_iters=50,
                             projector="fourier", recon="parallel")
    from dexct_tpu.ops.fourier import fourier_paths_from_arrays

    p_four = np.asarray(fourier_paths_from_arrays(
        arrays, arrays["labels"], meta.fp_meta))
    mu = ph.materials.mu_table(np.array([70.0]))[:, 0]
    L_e, L_f = p_exact @ mu, p_four @ mu
    print(f"mono L rms diff: {np.sqrt(((L_e - L_f) ** 2).mean()):.4f}"
          f" (max L {L_e.max():.2f}) ->"
          f" {100 * np.sqrt(((L_e - L_f) ** 2).mean()) / L_e.max():.3f}%")

    print("== fused DE pipeline (fourier + parallel recon) ==")
    out = make_jitted_step(meta)(arrays)
    m1 = np.asarray(out["mat_recons"][0])
    m2 = np.asarray(out["mat_recons"][1])
    gt70 = register_phantom_to_recon(ph, 512, 50.0, energy_keV=70.0)
    mask = nonair_mask(register_phantom_to_recon(ph, 512, 50.0,
                                                 energy_keV=120.0))
    r = np.hypot(*(np.mgrid[0:512, 0:512] - 255.5)) * 50.0 / 512
    interior = mask & (r < 20.0)
    vmi70 = make_vmi(70.0, m1, m2)
    print(f"VMI(70) vs M_mono(70) interior RMSE: "
          f"{rmse(vmi70, gt70, interior):.1f} HU")
    for e0 in (50.0, 100.0, 150.0):
        gt = register_phantom_to_recon(ph, 512, 50.0, energy_keV=e0)
        v = make_vmi(e0, m1, m2)
        print(f"VMI({e0:.0f}) RMSE: {rmse(v, gt, interior):.1f} HU")

    print("== water cylinder absolute scale (512^2) ==")
    phw = water_cylinder_phantom(N=512, dx=0.1)  # 20.5 cm radius... 0.4*51.2
    aw, mw = pack_dect(ct, phw, s1, s2, 512, 50.0, 0.8, n_iters=30,
                       projector="fourier", recon="parallel")
    ow = make_jitted_step(mw)(aw)
    hu_mv = np.asarray(ow["recon_HU"][0])
    center = hu_mv[248:264, 248:264].mean()
    print(f"MV-beam water center HU: {center:.1f} (BH residual expected ~0"
          " for hard beams)")
    mat1c = np.asarray(ow["mat_recons"][0])[248:264, 248:264].mean()
    print(f"tissue-basis density at water center: {mat1c:.3f} g/cm^3")


if __name__ == "__main__":
    main()
