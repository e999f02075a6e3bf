"""Dose-deposition demo: where the scan dose lands in the patient.

Computes the primary-beam absorbed-dose map of a DE pelvis acquisition
(`ops/dose.py`), prints the energy-conservation check, CTDI-style
summary, and per-organ dose table, and (with --figdir) renders a panel:
dose map over the anatomy, depth profile, and the helical z-profile of
a 3-D scan of the z-varying pelvis.

    python examples/dose_map_demo.py [--n 256] [--figdir results]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dexct_tpu.ops.dose import (
    beam_energy_removed,
    beam_energy_removed_3d,
    ctdi_metrics,
    ctdi_vol,
    dlp,
    dose_map,
    dose_map_3d,
    dose_z_profile,
    organ_dose_report,
)
from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.system.geometry import FanBeamGeometry, HelicalConeBeamGeometry
from dexct_tpu.system.phantom import pelvis_phantom, pelvis_phantom_3d


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--views", type=int, default=192)
    p.add_argument("--channels", type=int, default=384)
    p.add_argument("--dose-uGy", type=float, default=1000.0)
    p.add_argument("--figdir", default=None)
    args = p.parse_args()

    ct = FanBeamGeometry(N_channels=args.channels, N_proj=args.views,
                         gamma_fan=0.9, SID=60.0, SDD=100.0, h_iso=0.1,
                         eid=True)
    ph = pelvis_phantom(N=args.n, dx=50.0 / args.n)
    spec = kramers_spectrum(120.0)
    spec.rescale_counts(ct.A_iso * args.dose_uGy / ct.N_proj)

    res = dose_map(ph, ct, spec, oversample=2)
    removed = beam_energy_removed(ph, ct, spec)
    cons = abs(res.deposited_J - removed) / removed
    print("note: absolute mGy scale follows the spectrum's count "
          "calibration (synthetic Kramers here is arbitrary; the "
          "shipped reference spectra are dose-calibrated)")
    print(f"deposited {res.deposited_J:.4g} J vs beam removal "
          f"{removed:.4g} J  (conservation {100 * cons:.2f}%)")
    m = ctdi_metrics(res.dose_mGy, ph.dx, phantom_radius_cm=0.4 * 50.0,
                     roi_radius_cm=max(1.0, 2 * ph.dx))
    print(f"CTDI-style: center {m['center']:.3g}  periphery "
          f"{m['periphery']:.3g}  ctdi_w {m['ctdi_w']:.3g} mGy")
    print("\nper-organ dose [mGy]:")
    rep = organ_dose_report(res.dose_mGy, ph)
    for name, r in sorted(rep.items(), key=lambda kv: -kv[1]["mean"]):
        print(f"  {name:12s} mean {r['mean']:9.3g}  max {r['max']:9.3g}"
              f"  mass {r['mass_g']:8.3g} g  energy {r['energy_J']:.3g} J")

    # helical 3-D scan of the z-varying pelvis
    ph3 = pelvis_phantom_3d(N=args.n // 2, nz=24,
                            dx=50.0 / (args.n // 2), dz=0.4)
    hel = HelicalConeBeamGeometry(
        N_channels=args.channels // 2, N_proj=args.views,
        gamma_fan=0.9, SID=60.0, SDD=100.0, h_iso=0.25, eid=True,
        N_rows=8, pitch=1.6, rotation_total=4 * np.pi)
    spec3 = kramers_spectrum(120.0)
    spec3.rescale_counts(hel.A_iso * args.dose_uGy / hel.N_proj)
    res3 = dose_map_3d(ph3, hel, spec3, oversample=2)
    rem3 = beam_energy_removed_3d(ph3, hel, spec3)
    cons3 = abs(res3.deposited_J - rem3) / rem3
    prof = dose_z_profile(res3.dose_mGy, ph3.dx, roi_radius_cm=2.0)
    m3 = ctdi_metrics(res3.dose_mGy[ph3.Nz // 2], ph3.dx,
                      phantom_radius_cm=0.4 * 50.0,
                      roi_radius_cm=max(1.0, 2 * ph3.dx))
    cv = ctdi_vol(m3["ctdi_w"], hel)
    scan_len = hel.pitch * hel.rotation_total / (2 * np.pi)
    print(f"\nhelical: conservation {100 * cons3:.2f}%  "
          f"CTDI_vol {cv:.3g} mGy  DLP {dlp(cv, scan_len):.3g} mGy*cm")

    if args.figdir:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(14, 4.2))
        ext = 25.0
        body = ph.slice_labels() > 0
        d = np.where(body, res.dose_mGy, np.nan)  # patient dose only
        im = axes[0].imshow(d, extent=[-ext, ext, ext, -ext],
                            cmap="inferno",
                            vmax=np.nanpercentile(d, 99.5))
        axes[0].contour(body, extent=[-ext, ext, ext, -ext],
                        levels=[0.5], colors="w", linewidths=0.5)
        axes[0].set_title("patient dose [mGy], 120 kVp pelvis")
        fig.colorbar(im, ax=axes[0], fraction=0.046)
        mid = d.shape[0] // 2
        axes[1].plot((np.arange(d.shape[1]) + 0.5 - d.shape[1] / 2)
                     * ph.dx, d[mid])
        axes[1].set_xlabel("x [cm]")
        axes[1].set_ylabel("dose [mGy]")
        axes[1].set_title("central depth profile")
        zs = (np.arange(ph3.Nz) + 0.5 - ph3.Nz / 2) * ph3.dz
        axes[2].plot(zs, prof, marker="o", ms=3)
        axes[2].set_xlabel("z [cm]")
        axes[2].set_ylabel("central-ROI dose [mGy]")
        axes[2].set_title(f"helical z-profile (pitch {hel.pitch})")
        fig.tight_layout()
        out = os.path.join(args.figdir, "dose_maps.png")
        os.makedirs(args.figdir, exist_ok=True)
        fig.savefig(out, dpi=130)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
