"""Protocol-scale noisy dose study on the TPU (VERDICT round-2 item 3).

The quantitative product of the reference's figure families
(plots.py:334-418 contrast/noise vs VMI energy; plots.py:541-717 dose
panels): at the full protocol (800 ch x 1000 views, 512^2 recon,
compound EID noise), for both DE pairs (detunedMV+80kV @ 9+1 mGy and
140kV+80kV @ 5+5 mGy) and both the clean and steel-implant pelvis:

* VMI contrast / noise / CNR versus VMI energy (bladder vs soft tissue
  ROIs),
* noise and CNR versus dose over a 16x dose range with the 1/sqrt(dose)
  fit exponent,

all from ONE exact-Siddon trace per case (the dose sweep shares it;
pipeline/sweep.py).  Writes output/dose_study_full.json; the numbers go
into VALIDATION.md's "Protocol-scale dose study" section.

Run: python tools/dose_study_full.py  (TPU; ~10 min incl. compiles)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import numpy as np

    from dexct_tpu.analysis import Roi, cnr, contrast, make_vmi, noise
    from dexct_tpu.physics import kramers_spectrum, linac_spectrum
    from dexct_tpu.pipeline.fused import pack_dect
    from dexct_tpu.pipeline.sweep import dose_sweep
    from dexct_tpu.system import FanBeamGeometry, pelvis_phantom

    n_ch, n_proj, n_ph, n_mat, fov = 800, 1000, 512, 512, 50.0
    dose_scales = np.array([0.25, 0.5, 1.0, 2.0, 4.0])
    ct = FanBeamGeometry(N_channels=n_ch, N_proj=n_proj,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=True)

    def spectra(pair):
        out = []
        for sid, dose in pair:
            s = (linac_spectrum() if sid == "detunedMV"
                 else kramers_spectrum(float(sid[:-2])))
            s.rescale_counts(ct.A_iso * dose / ct.N_proj)
            out.append(s)
        return out

    pairs = {
        "MV-80kV": (("detunedMV", 9.0), ("80kV", 1.0)),
        "140-80kV": (("140kV", 5.0), ("80kV", 5.0)),
    }
    # ROIs anchored in verified-uniform phantom regions (erosion-safe
    # points of the 512^2 pelvis labels): water 'bladder' at
    # (y=273, x=255) = signal, ICRU tissue at (y=336, x=255) =
    # background; 24^2 windows sit fully inside both
    sig = Roi(243, 261, 24, 24)
    bg = Roi(243, 324, 24, 24)

    results = {"protocol": f"{n_ch}ch x {n_proj}v x {n_ph}^2 -> "
                           f"{n_mat}^2, compound EID noise",
               "dose_scales": dose_scales.tolist(), "cases": {}}
    log(f"devices: {jax.devices()}")

    for implant in (None, "steel"):
        ph = pelvis_phantom(N=n_ph, dx=fov / n_ph, implant=implant)
        for label, pair in pairs.items():
            s1, s2 = spectra(pair)
            t0 = time.time()
            arrays, meta = pack_dect(ct, ph, s1, s2, n_mat, fov, 0.8,
                                     n_iters=12, recon="parallel",
                                     recon_n_theta=512, recon_nt=1600,
                                     noise="compound", seed=17)
            out = dose_sweep(arrays, meta, jnp.asarray(dose_scales),
                             jax.random.PRNGKey(17), noise="compound")
            mats = np.asarray(out["mat_recons"])  # [D, 2, N, N]
            # a second noise realization isolates pure stochastic noise
            # from anatomy (difference/sqrt(2))
            out_b = dose_sweep(arrays, meta, jnp.asarray(dose_scales),
                               jax.random.PRNGKey(18), noise="compound")
            mats_b = np.asarray(out_b["mat_recons"])
            log(f"{ph.name}/{label}: sweep x2 {time.time() - t0:.1f}s")

            evals = ([40, 50, 60, 70, 80, 100, 140, 200]
                     if label == "MV-80kV"
                     else [40, 50, 60, 70, 80, 100, 140])
            case = {"vmi": {}, "vs_dose": {}}
            # VMI-energy curves at nominal dose (scale=1.0 -> index 2)
            i_nom = int(np.argwhere(dose_scales == 1.0)[0, 0])
            for e0 in evals:
                vmi = np.asarray(make_vmi(float(e0), mats[i_nom, 0],
                                          mats[i_nom, 1]))
                vmi_b = np.asarray(make_vmi(float(e0), mats_b[i_nom, 0],
                                            mats_b[i_nom, 1]))
                d = (vmi - vmi_b) / np.sqrt(2.0)
                case["vmi"][str(e0)] = {
                    "contrast_hu": float(contrast(vmi, sig, bg)),
                    "noise_hu": float(noise(vmi, sig, bg)),
                    "stoch_noise_hu": float(np.std(bg.extract(d))),
                    "cnr": float(cnr(vmi, sig, bg)),
                }
            m70 = np.asarray(make_vmi(70.0, mats[i_nom, 0],
                                      mats[i_nom, 1]))
            case["roi_check_hu_70kev"] = {
                "signal_mean": float(np.mean(sig.extract(m70))),
                "background_mean": float(np.mean(bg.extract(m70))),
            }
            # dose dependence at 70 keV
            noises, cnrs = [], []
            for i in range(len(dose_scales)):
                vmi = np.asarray(make_vmi(70.0, mats[i, 0], mats[i, 1]))
                vmi_b = np.asarray(make_vmi(70.0, mats_b[i, 0],
                                            mats_b[i, 1]))
                d = (vmi - vmi_b) / np.sqrt(2.0)
                noises.append(float(np.std(bg.extract(d))))
                cnrs.append(float(cnr(vmi, sig, bg)))
            # sigma ~ dose^p fit
            p = np.polyfit(np.log(dose_scales), np.log(noises), 1)[0]
            case["vs_dose"] = {
                "vmi70_noise_hu": [round(x, 3) for x in noises],
                "vmi70_cnr": [round(x, 3) for x in cnrs],
                "noise_dose_exponent": round(float(p), 4),
            }
            results["cases"][f"{ph.name}/{label}"] = case
            log(f"  70keV noise vs dose: {noises}  exponent {p:.3f}")

    os.makedirs("output", exist_ok=True)
    with open("output/dose_study_full.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"cases": list(results["cases"]),
                      "file": "output/dose_study_full.json"}))


if __name__ == "__main__":
    main()
