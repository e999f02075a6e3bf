"""Quantitative analysis of a demo run — the reference plots.py workflow.

Usage (after ``python -m dexct_tpu.run --params input/params.txt``):

    python examples/analyze_demo.py --output ./output --figdir ./output/figs

Produces the reference figure set from the written stage artifacts: the
SE/BMI/VMI gallery, VMI RMSE and CNR curves against the M_mono oracle, and
the implant-alloy LAC plot (SURVEY.md §3.5).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dexct_tpu.analysis import (
    Roi,
    load_basis_images,
    load_ct_image,
    make_vmi,
    nonair_mask,
    register_phantom_to_recon,
    rmse,
)
from dexct_tpu.analysis.figures import (
    contrast_noise_panels,
    dect_gallery_figure,
    metal_lac_figure,
    phantom_roi_figure,
    vmi_metric_figure,
)
from dexct_tpu.system.config import read_parameter_file


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--params", default="input/params.txt")
    p.add_argument("--output", default="./output")
    p.add_argument("--figdir", default="./output/figs")
    p.add_argument("--pair", default="detunedMV,80kV,9,1")
    args = p.parse_args()
    os.makedirs(args.figdir, exist_ok=True)

    cfg = read_parameter_file(args.params)[0]
    s1, s2, d1, d2 = args.pair.split(",")
    d1, d2 = float(d1), float(d2)
    n = cfg.N_matrix

    hu1 = load_ct_image(args.output, cfg.run_id, s1, d1, n)
    hu2 = load_ct_image(args.output, cfg.run_id, s2, d2, n)
    m1, m2 = load_basis_images(args.output, cfg.run_id, s1, s2, d1, d2, n)

    # ROI overview (signal near the center, background offset)
    sig = Roi(int(0.48 * n), int(0.48 * n), n // 20, n // 20)
    bg = Roi(int(0.56 * n), int(0.56 * n), n // 20, n // 20)
    phantom_roi_figure([hu1, hu2], [sig, bg],
                       [f"{s1} ({d1:g} mGy)", f"{s2} ({d2:g} mGy)"]) \
        .savefig(os.path.join(args.figdir, "phantom_rois.png"), dpi=150)

    # gallery
    dect_gallery_figure(hu1, hu2, m1, m2, titles=(s1, s2)) \
        .savefig(os.path.join(args.figdir, "dect_gallery.png"), dpi=150)

    # RMSE vs the monoenergetic oracle
    gt = lambda e0: register_phantom_to_recon(cfg.phantom, n, cfg.FOV,
                                              energy_keV=e0)
    mask = nonair_mask(gt(120.0))
    energies = np.arange(40, 141, 10)
    vmi_metric_figure({f"{s1}-{s2}": (m1, m2, gt)}, energies,
                      metric="rmse", mask=mask) \
        .savefig(os.path.join(args.figdir, "vmi_rmse.png"), dpi=150)

    # CNR curves
    vmi_metric_figure({f"{s1}-{s2}": (m1, m2)}, energies, metric="cnr",
                      roi_signal=sig, roi_background=bg) \
        .savefig(os.path.join(args.figdir, "vmi_cnr.png"), dpi=150)

    # implant alloy attenuation
    metal_lac_figure().savefig(os.path.join(args.figdir, "metal_lacs.png"),
                               dpi=150)

    # contrast / noise vs VMI energy panels with single-energy baselines
    # (the reference's revision figures, plots.py:541-603 / 631-717)
    panels = {cfg.phantom.name: {f"{s1}-{s2}": (m1, m2, energies)}}
    base = {cfg.phantom.name: {s1: hu1, s2: hu2}}
    for metric in ("contrast", "noise"):
        contrast_noise_panels(panels, sig, bg, metric=metric,
                              baselines=base) \
            .savefig(os.path.join(args.figdir, f"vmi_{metric}.png"), dpi=150)

    # summary numbers (the reference prints min-RMSE / max-SNR,
    # plots.py:306,397)
    rmses = [rmse(make_vmi(float(e), m1, m2), gt(float(e)), mask)
             for e in energies]
    best = int(np.argmin(rmses))
    print(json.dumps({
        "pair": args.pair,
        "min_rmse_HU": round(float(rmses[best]), 2),
        "min_rmse_keV": int(energies[best]),
        "figures": sorted(os.listdir(args.figdir)),
    }, indent=2))


if __name__ == "__main__":
    main()
