"""The MV-kV metal-implant revision study — the workflow behind the
reference's paper figures (/root/reference/plots.py "R2" cells,
plots.py:541-717): three phantoms (pelvis, pelvis with titanium, pelvis
with steel), dual-energy basis decompositions for both DE pairs, BHC'd
single-kV baselines, and the contrast / noise vs VMI-energy panel
figures with single-energy reference lines.

Runs end-to-end on CPU at the demo scale in a few minutes:

    python examples/metal_study.py --figdir ./output/figs

``--full`` uses the reference protocol scale (800 ch x 1000 views,
512^2) — run that on the TPU.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--figdir", default="./output/figs")
    p.add_argument("--full", action="store_true",
                   help="reference protocol scale (TPU)")
    p.add_argument("--noise", default="compound",
                   choices=["none", "poisson", "compound"])
    args = p.parse_args()
    os.makedirs(args.figdir, exist_ok=True)

    if not args.full:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    from dexct_tpu.analysis import Roi
    from dexct_tpu.analysis.figures import contrast_noise_panels
    from dexct_tpu.ops.bhc import bone_bhc_recon
    from dexct_tpu.physics import kramers_spectrum, linac_spectrum
    from dexct_tpu.pipeline.fused import make_jitted_step, pack_dect
    from dexct_tpu.system import FanBeamGeometry, pelvis_phantom

    if args.full:
        n_ch, n_proj, n_ph, n_mat = 800, 1000, 512, 512
    else:
        n_ch, n_proj, n_ph, n_mat = 192, 192, 128, 128
    fov = 50.0
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

    # the reference's DE pairs (main.py:101-102) and kV baselines
    pairs = {
        "MV-80kV": (("detunedMV", 9.0), ("80kV", 1.0)),
        "140-80kV": (("140kV", 5.0), ("80kV", 5.0)),
    }
    baseline_kv = [("80kV", 10.0), ("140kV", 10.0)]

    # signal ROI inside the bladder region, background in soft tissue
    # (the reference hand-places x0/y0 per phantom, plots.py:~560)
    sig = Roi(int(0.50 * n_mat), int(0.52 * n_mat), n_mat // 16,
              n_mat // 16)
    bg = Roi(int(0.38 * n_mat), int(0.40 * n_mat), n_mat // 16,
             n_mat // 16)

    panels, baselines, summary = {}, {}, {}
    for implant, evals in (
        (None, np.arange(40, 140, 10)),
        ("titanium", np.arange(40, 200, 24)),
        ("steel", np.arange(40, 200, 24)),
    ):
        ph = pelvis_phantom(N=n_ph, dx=fov / n_ph, implant=implant)
        title = ph.name
        cases = {}
        for label, pair in pairs.items():
            s1, s2 = spectra(pair)
            arrays, meta = pack_dect(ct, ph, s1, s2, n_mat, fov, 0.8,
                                     n_iters=12, recon="parallel",
                                     recon_n_theta=max(n_proj // 2, 64),
                                     recon_nt=2 * n_ch,
                                     noise=args.noise, seed=11)
            out = make_jitted_step(meta)(arrays)
            m1 = np.asarray(out["mat_recons"][0])
            m2 = np.asarray(out["mat_recons"][1])
            cases[label] = (m1, m2, evals)
        panels[title] = cases

        # bone-BHC'd single-kV baselines (the reference's Revision-2
        # comparison lines, plots.py:575-585)
        base = {}
        for sid, dose in baseline_kv:
            (s,) = spectra([(sid, dose)])
            arrays, meta = pack_dect(ct, ph, s, s, n_mat, fov, 0.8,
                                     n_iters=2, noise=args.noise, seed=3)
            out = make_jitted_step(meta)(arrays)
            _, hu = bone_bhc_recon(out["sino_log"][0], ct, s, n_mat, fov,
                                   0.8)
            base[sid] = np.asarray(hu)
        baselines[title] = base
        summary[title] = {
            lab: {"tissue_center": float(np.median(c[0])) }
            for lab, c in cases.items()
        }
        print(f"{title}: done")

    for metric in ("contrast", "noise"):
        fig = contrast_noise_panels(panels, sig, bg, metric=metric,
                                    baselines=baselines)
        fig.savefig(os.path.join(args.figdir, f"metal_{metric}.png"),
                    dpi=150)
    print(json.dumps({
        "phantoms": list(panels),
        "figures": [f"metal_{m}.png" for m in ("contrast", "noise")],
    }, indent=2))


if __name__ == "__main__":
    main()
