"""Metal artifact reduction demo on the implanted pelvis.

Simulates the reference's implant scenario (Ti rod in the pelvis,
120 kVp), reconstructs uncorrected / LI-MAR / NMAR, and reports streak
rms against the metal-free ground truth.  LI-MAR *degrades* rich
anatomy (its bridges erase the bone projections crossing the shadow);
NMAR's prior normalization is the fix.

    python examples/mar_demo.py [--n 256] [--figdir results]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dexct_tpu.ops.mar import mar_recon
from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.pipeline.api import get_recon, get_sino
from dexct_tpu.system.geometry import FanBeamGeometry
from dexct_tpu.system.phantom import pelvis_phantom


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--views", type=int, default=256)
    p.add_argument("--channels", type=int, default=256)
    p.add_argument("--figdir", default=None)
    args = p.parse_args()

    n, fov = args.n, 32.0
    ct = FanBeamGeometry(N_channels=args.channels, N_proj=args.views,
                         gamma_fan=0.9, SID=60.0, SDD=100.0, h_iso=0.1,
                         eid=True)
    spec = kramers_spectrum(120.0)
    spec.rescale_counts(1e6)
    ph = pelvis_phantom(N=n, dx=fov / n, implant="titanium")
    ph0 = pelvis_phantom(N=n, dx=fov / n)
    _, slog = get_sino(ct, ph, spec)
    _, slog0 = get_sino(ct, ph0, spec)
    _, hu_gt = get_recon(slog0, ct, spec, n, fov, 0.8)
    _, hu0 = get_recon(slog, ct, spec, n, fov, 0.8)

    results = {"uncorrected": (np.asarray(hu0), None)}
    for meth in ("li", "nmar"):
        _, hu1, diag = mar_recon(slog, ct, spec, n, fov, 0.8, method=meth)
        results[meth] = (np.asarray(hu1), diag)

    mask = np.asarray(results["nmar"][1]["metal_mask"])
    cy, cx = np.where(mask)
    yy = np.arange(n)
    d2 = (yy[:, None] - cy.mean()) ** 2 + (yy[None, :] - cx.mean()) ** 2
    sel = ((np.asarray(hu_gt) > -500) & ~mask
           & (d2 > 9.0 * mask.sum() / np.pi))
    errs = {}
    for name, (img, _) in results.items():
        errs[name] = float(np.sqrt(np.mean(
            (img[sel] - np.asarray(hu_gt)[sel]) ** 2)))
        print(f"{name:12s} streak rms {errs[name]:6.1f} HU")

    if args.figdir:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        panels = [("ground truth (no implant)", np.asarray(hu_gt), None),
                  ("uncorrected", results["uncorrected"][0],
                   "uncorrected"),
                  ("LI-MAR", results["li"][0], "li"),
                  ("NMAR", results["nmar"][0], "nmar")]
        fig, axes = plt.subplots(1, 4, figsize=(16, 4.3))
        for ax, (title, img, key) in zip(axes, panels):
            ax.imshow(img, cmap="gray", vmin=-150, vmax=250)
            if key:
                title = f"{title}  (streak rms {errs[key]:.1f} HU)"
            ax.set_title(title, fontsize=10)
            ax.axis("off")
        fig.tight_layout()
        os.makedirs(args.figdir, exist_ok=True)
        out = os.path.join(args.figdir, "mar_panels.png")
        fig.savefig(out, dpi=130)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
