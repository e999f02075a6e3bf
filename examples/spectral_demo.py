"""K-edge iodine imaging with the spectral photon-counting pipeline.

    python examples/spectral_demo.py --figdir ./output/spectral

One CdTe photon-counting scan (4 bins straddling the iodine K edge at
33.2 keV), realistic detector spectral response (electronic noise +
charge sharing + K-escape) and pulse pileup with its in-pipeline
correction, decomposed into THREE basis materials (water / bone /
iodine).  The phantom carries iodine rods at 2/5/10 mg/mL plus a bone
rod as the classic confuser — single-kV CT cannot tell dilute iodine
from bone, the K-edge decomposition can.  Prints the recovered
concentrations (linearity check) and writes a four-panel figure:
VMI(70), iodine map [mg/mL], water map, bone map.

Runs on CPU in ~a minute at demo scale.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from dexct_tpu.physics import kramers_spectrum  # noqa: E402
from dexct_tpu.physics.detector import DetectorResponse  # noqa: E402
from dexct_tpu.physics.materials import (AIR, BONE, WATER,  # noqa: E402
                                         Material, MaterialTable)
from dexct_tpu.physics.pcd_response import pcd_response_matrix  # noqa: E402
from dexct_tpu.physics import xcom  # noqa: E402
from dexct_tpu.pipeline.spectralct import simulate_pcd_spectral  # noqa: E402
from dexct_tpu.system import FanBeamGeometry  # noqa: E402
from dexct_tpu.system.phantom import VoxelPhantom, _ellipse_mask  # noqa: E402

N = 96
DX = 0.25
THRESH = [22.0, 33.2, 45.0, 60.0]  # bin 2 opens AT the iodine K edge
IODINE = Material("iodine", 4.93, "I(100.0)")


def iodine_solution(mg_per_ml):
    """Dilute iodine contrast: water + c mg/mL iodine (density rises by
    the iodine load; composition by weight)."""
    rho = 1.0 + mg_per_ml / 1000.0
    wt_i = 100.0 * (mg_per_ml / 1000.0) / rho
    return Material(f"I{mg_per_ml:g}mgml", rho,
                    f"H({0.112 * (100 - wt_i):.3f})"
                    f"O({0.888 * (100 - wt_i):.3f})I({wt_i:.3f})")


def build_phantom(concentrations=(2.0, 5.0, 10.0)):
    body_r = 0.42 * N * DX
    rod_r = 0.06 * N * DX
    ring_r = 0.26 * N * DX
    labels = _ellipse_mask(N, DX, 0.0, 0.0, body_r, body_r).astype(np.uint8)
    mats = [AIR, WATER] + [iodine_solution(c) for c in concentrations] \
        + [BONE]
    for i in range(len(concentrations) + 1):  # rods: 3 iodine + 1 bone
        ang = 2.0 * np.pi * i / (len(concentrations) + 1) + np.pi / 4
        cx, cy = ring_r * np.cos(ang), ring_r * np.sin(ang)
        labels[_ellipse_mask(N, DX, cx, cy, rod_r, rod_r)] = i + 2
    return VoxelPhantom("iodine_rods", labels, MaterialTable(mats),
                        DX, DX, DX), mats


def cdte_detector(e_max=150.0):
    """2 mm CdTe absorption efficiency."""
    e = np.arange(1.0, e_max + 1.0)
    mu = xcom.mixatten("Cd(47.1)Te(52.9)", e) * 5.85
    return DetectorResponse(e, 1.0 - np.exp(-mu * 0.2), "pcd_CdTe_2mm")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--figdir", default="./output/spectral")
    ap.add_argument("--noise", action="store_true",
                    help="add Poisson counting noise")
    args = ap.parse_args()
    os.makedirs(args.figdir, exist_ok=True)

    ph, mats = build_phantom()
    ct = FanBeamGeometry(N_channels=128, N_proj=192,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                         eid=False, detector=cdte_detector())
    s = kramers_spectrum(120.0)
    s.rescale_counts(ct.A_iso * 20.0 / ct.N_proj)

    resp = pcd_response_matrix(s.E, sigma_e_keV=2.5, share_frac=0.1,
                               sensor="CdTe")
    # pileup at rho ~ 0.15 on the air rays
    from dexct_tpu.ops.spectral import effective_fluence

    air = float(np.sum(effective_fluence(s, ct)))
    res = simulate_pcd_spectral(
        ct, ph, s, THRESH, (WATER, BONE, IODINE), N, N * DX,
        response=resp, pileup_tau=0.15 / air,
        noise="poisson" if args.noise else "none",
        key=jax.random.PRNGKey(0) if args.noise else None,
        n_iters=60)

    iod = np.asarray(res.basis_recons[2]) * 1000.0  # g/cm^3 -> mg/mL
    wat = np.asarray(res.basis_recons[0])
    bon = np.asarray(res.basis_recons[1])
    vmi = np.asarray(res.vmi(70.0))

    # recovered rod concentrations
    yy, xx = np.mgrid[0:N, 0:N]
    c = (N - 1) / 2.0
    ring_px = 0.26 * N
    print("iodine rod recovery (true -> measured mg/mL):")
    for i, true_c in enumerate((2.0, 5.0, 10.0)):
        ang = 2.0 * np.pi * i / 4 + np.pi / 4
        cx, cy = c + ring_px * np.cos(ang), c + ring_px * np.sin(ang)
        roi = (np.hypot(yy - cy, xx - cx) < 0.04 * N)
        print(f"  {true_c:5.1f} -> {iod[roi].mean():6.2f}  "
              f"(bone leak {bon[roi].mean():+.3f} g/cm^3)")
    ang = 2.0 * np.pi * 3 / 4 + np.pi / 4
    cx, cy = c + ring_px * np.cos(ang), c + ring_px * np.sin(ang)
    roi = (np.hypot(yy - cy, xx - cx) < 0.04 * N)
    print(f"  bone rod iodine leak: {iod[roi].mean():+.2f} mg/mL "
          f"(bone {bon[roi].mean():.2f} g/cm^3)")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 4, figsize=(14, 3.6))
    for ax, (im, title, kw) in zip(axes, [
        (vmi, "VMI 70 keV [1/cm]", dict(cmap="gray")),
        (iod, "iodine [mg/mL]", dict(cmap="inferno", vmin=0, vmax=12)),
        (wat, "water [g/cm³]", dict(cmap="gray", vmin=0, vmax=1.2)),
        (bon, "bone [g/cm³]", dict(cmap="bone", vmin=0, vmax=2.0)),
    ]):
        h = ax.imshow(im, **kw)
        ax.set_title(title, fontsize=10)
        ax.axis("off")
        fig.colorbar(h, ax=ax, fraction=0.046)
    fig.suptitle("K-edge spectral PCD: 4 CdTe bins, realistic response "
                 "+ pileup (corrected), 3-material decomposition",
                 fontsize=11)
    fig.tight_layout()
    out = os.path.join(args.figdir, "kedge_iodine.png")
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
