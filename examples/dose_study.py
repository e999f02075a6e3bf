"""Dose-sweep noise/CNR study — the reference's dose-parameterized
analysis (plots.py CNR/noise sections) as one batched TPU job.

Runs the full DE pipeline over a dose grid in a single jit (shared ray
trace, per-dose compound-Poisson noise + decomposition + reconstruction)
and reports VMI noise and CNR versus dose.

    python examples/dose_study.py [--n 256] [--doses 0.25,0.5,1,2,4]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dexct_tpu.analysis import Roi, cnr, make_vmi, noise
from dexct_tpu.physics import kramers_spectrum, linac_spectrum
from dexct_tpu.pipeline.fused import pack_dect
from dexct_tpu.pipeline.sweep import dose_sweep
from dexct_tpu.system import FanBeamGeometry, contrast_rods_phantom


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--views", type=int, default=512)
    p.add_argument("--channels", type=int, default=512)
    # note: below ~1e-3 of the reference dose the kV channel is photon-
    # starved (zero-count rays) and the metrics are meaningless
    p.add_argument("--doses", default="0.002,0.008,0.032,0.125,0.5")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--vmi-kev", type=float, default=70.0)
    p.add_argument("--figdir", default=None)
    args = p.parse_args()
    doses = np.array([float(x) for x in args.doses.split(",")])

    ct = FanBeamGeometry(N_channels=args.channels, N_proj=args.views,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=True)
    ph = contrast_rods_phantom(N=args.n, dx=51.2 / args.n / 2)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)
    arrays, meta = pack_dect(ct, ph, s1, s2, args.n, args.n * ph.dx, 0.8,
                             n_iters=30)

    out = dose_sweep(arrays, meta, jnp.asarray(doses, jnp.float32),
                     jax.random.PRNGKey(args.seed), noise="compound")

    n = args.n
    # ROIs: bone rod (ring at angle 90 deg) vs water background
    ring = int(0.25 * n)
    c = n // 2
    sig = Roi(c - n // 32, c + ring - n // 32, n // 16, n // 16)
    bg = Roi(c - n // 32, c - n // 32, n // 16, n // 16)

    rows = []
    for i, d in enumerate(doses):
        m1 = np.asarray(out["mat_recons"][i, 0])
        m2 = np.asarray(out["mat_recons"][i, 1])
        vmi = make_vmi(args.vmi_kev, m1, m2)
        rows.append({
            "dose_scale": float(d),
            "vmi_noise_HU": round(noise(vmi, sig, bg), 2),
            "vmi_cnr": round(cnr(vmi, sig, bg), 2),
        })
    print(json.dumps(rows, indent=2))

    if args.figdir:
        os.makedirs(args.figdir, exist_ok=True)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(1, 2, figsize=[7, 3])
        ax[0].loglog(doses, [r["vmi_noise_HU"] for r in rows], "o-")
        ax[0].loglog(doses, rows[0]["vmi_noise_HU"]
                     * np.sqrt(doses[0] / doses), "k--",
                     label=r"$1/\sqrt{D}$")
        ax[0].set_xlabel("dose scale")
        ax[0].set_ylabel(f"VMI({args.vmi_kev:.0f}) noise [HU]")
        ax[0].legend()
        ax[1].semilogx(doses, [r["vmi_cnr"] for r in rows], "s-")
        ax[1].set_xlabel("dose scale")
        ax[1].set_ylabel("CNR")
        fig.tight_layout()
        fig.savefig(os.path.join(args.figdir, "dose_study.png"), dpi=150)
        print("figure:", os.path.join(args.figdir, "dose_study.png"))


if __name__ == "__main__":
    main()
