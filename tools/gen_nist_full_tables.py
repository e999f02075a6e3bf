"""Generate the full periodic-table attenuation tables (nist_data_full.py).

Round-5 VERDICT item 7: the reference's ``xcompy`` serves arbitrary
elements from real NIST XCOM tables (/root/reference/matdecomp.py:7,
plots.py:487-523).  dexct_tpu tabulates 30 anchors; the remaining 62
elements ran through the live edge-aligned bracket interpolation
(:mod:`dexct_tpu.physics.xcom`).  This tool FREEZES that validated
construction into static per-element tables for every remaining element
Z = 1..92, with a leave-one-out (LOO) cross-check quantifying the
construction error per periodic-table region:

* **Tables**: the standard Hubbell & Seltzer grid + a densified 5-100 keV
  set + edge-doubled rows at the element's true K edge (and L1/L2/L3
  where vendored edge energies exist), sampled from the live
  interpolation.  Edge positions are exact by construction; magnitudes
  carry the bracket-interpolation uncertainty below.
* **LOO protocol**: hold out each interior anchor, rebuild its mu/rho
  from the remaining anchors with the same edge-warped ln-Z residual
  interpolation, and record the max/rms relative error over the CT band
  (20-1250 keV, evaluated above the K edge).  A target element's
  uncertainty is the worst LOO error of its bracketing anchors — the
  directly-measured error of the construction in exactly that bracket.

Run:  python tools/gen_nist_full_tables.py > dexct_tpu/physics/nist_data_full.py
(the LOO report prints to stderr; review before vendoring).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dexct_tpu.physics import xcom  # noqa: E402
from dexct_tpu.physics.nist_data import (  # noqa: E402
    K_EDGE_KEV, L_EDGE_KEV)

STD_GRID = [
    1.0, 1.5, 2.0, 3.0, 4.0, 5.0, 6.0, 8.0, 10.0, 15.0, 20.0, 30.0, 40.0,
    50.0, 60.0, 80.0, 100.0, 150.0, 200.0, 300.0, 400.0, 500.0, 600.0,
    800.0, 1000.0, 1250.0, 1500.0, 2000.0, 3000.0, 4000.0, 5000.0, 6000.0,
    8000.0, 10000.0,
]
# densify 5-100 keV (warped-edge curvature) and 100-400 keV (the
# warp-crossfade band, where plain log-log between standard grid points
# misses the live construction by up to ~3%)
DENSE = [7.0, 9.0, 12.0, 17.0, 25.0, 35.0, 45.0, 70.0, 90.0,
         110.0, 120.0, 135.0, 170.0, 225.0, 250.0, 350.0]


def interp_mu_with_anchors(symbol, e, anchors):
    """xcom._interp_element_mu with an explicit anchor list (LOO)."""
    e = np.atleast_1d(np.asarray(e, np.float64))
    z = xcom.ELEMENT_Z[symbol]
    a = xcom.ATOMIC_WEIGHT[symbol]
    anchor_z = [xcom.ELEMENT_Z[s] for s in anchors]
    if z >= anchor_z[-1]:
        lo, hi = anchors[-2], anchors[-1]
    else:
        idx = next(i for i, az in enumerate(anchor_z) if az > z)
        lo, hi = anchors[max(idx - 1, 0)], anchors[idx]
    z1, z2 = xcom.ELEMENT_Z[lo], xcom.ELEMENT_Z[hi]
    w = float(np.clip((np.log(z) - np.log(z1))
                      / (np.log(z2) - np.log(z1)), -0.5, 2.2))

    def tau_at(warp):
        e_k_x = xcom._edge_for_warp(symbol) if warp else None
        parts = []
        for sym in (lo, hi):
            e_k_a = xcom._edge_for_warp(sym) if warp else None
            if e_k_x is not None and e_k_a is not None:
                e_eval = e * (e_k_a / e_k_x)
            else:
                e_eval = e
            parts.append(np.log(xcom._anchor_tau(sym, e_eval)))
        return np.exp((1.0 - w) * parts[0] + w * parts[1])

    s = np.clip((np.log(xcom._WARP_ZERO_KEV) - np.log(e))
                / (np.log(xcom._WARP_ZERO_KEV)
                   - np.log(xcom._WARP_FULL_KEV)), 0.0, 1.0)
    tau = np.exp(s * np.log(tau_at(True)) + (1.0 - s) * np.log(tau_at(False)))
    mu = xcom.AVOGADRO / a * (
        z * xcom.klein_nishina_cross_section(e) + tau)
    return mu, (lo, hi)


def loo_report():
    """Held-out reconstruction error per interior anchor (CT band)."""
    anchors = list(xcom._ANCHOR_SYMBOLS)
    band = np.array([20.0, 30.0, 40.0, 50.0, 60.0, 80.0, 100.0, 150.0,
                     200.0, 300.0, 500.0, 1000.0, 1250.0])
    out = {}
    for i, sym in enumerate(anchors):
        if i == 0 or i == len(anchors) - 1:
            continue  # H / Pb endpoints cannot be bracketed
        rest = anchors[:i] + anchors[i + 1:]
        ek = K_EDGE_KEV.get(sym, 0.0)
        es = band[band > max(ek * 1.1, 10.0)]
        got, bracket = interp_mu_with_anchors(sym, es, rest)
        ref = np.asarray(xcom._anchor_mu(sym, es))
        rel = np.abs(got / ref - 1.0)
        out[sym] = (float(rel.max()), float(np.sqrt((rel**2).mean())),
                    bracket)
    return out


def element_grid(sym):
    es = {(e, 0) for e in STD_GRID + DENSE}
    edges = []
    ek = K_EDGE_KEV.get(sym) or xcom._LIGHT_K_EDGE_KEV.get(sym)
    if ek and ek >= 1.0:
        edges.append(ek)
    for el in L_EDGE_KEV.get(sym, ()):
        if el >= 1.0:
            edges.append(el)
    for e in edges:
        es.add((e, -1))
        es.add((e, +1))
        es.discard((e, 0))
    return sorted(es)


def build_table(sym):
    rows = []
    for e, side in element_grid(sym):
        ee = e * (1.0 - 1e-7) if side < 0 else (
            e * (1.0 + 1e-7) if side > 0 else e)
        rows.append((e, float(xcom.element_mu(sym, ee))))
    return rows


def fmt(rows):
    out = []
    line = "    "
    for e, mu in rows:
        tok = f"({e:g}, {mu:.5g}), "
        if len(line) + len(tok) > 78:
            out.append(line.rstrip())
            line = "    "
        line += tok
    out.append(line.rstrip())
    return "\n".join(out)


def main():
    loo = loo_report()
    print("# LOO held-out anchor reconstruction (CT band, above K edge):",
          file=sys.stderr)
    for sym, (mx, rms, br) in loo.items():
        print(f"#  {sym:>2} from {br[0]}-{br[1]}: max {mx:6.2%} "
              f"rms {rms:6.2%}", file=sys.stderr)

    targets = [s for s in xcom.ELEMENT_Z
               if s not in set(xcom._ANCHOR_SYMBOLS)]
    anchors = list(xcom._ANCHOR_SYMBOLS)

    def bracket_err(sym):
        z = xcom.ELEMENT_Z[sym]
        anchor_z = [xcom.ELEMENT_Z[s] for s in anchors]
        if z >= anchor_z[-1]:
            lo, hi = anchors[-2], anchors[-1]
        else:
            i = next(j for j, az in enumerate(anchor_z) if az > z)
            lo, hi = anchors[max(i - 1, 0)], anchors[i]
        errs = [loo[s][0] for s in (lo, hi) if s in loo]
        return (lo, hi), (max(errs) if errs else float("nan"))

    print('"""Frozen full-periodic-table attenuation tables (Z = 1-92).')
    print()
    print("Generated by tools/gen_nist_full_tables.py — the validated")
    print("edge-aligned bracket construction of :mod:`dexct_tpu.physics.")
    print("xcom` frozen onto the standard grid + densified 5-100 keV set +")
    print("exact edge-doubled rows (K for all; L1/L2/L3 where vendored).")
    print("These 62 elements are CONSTRUCTED, not vendored NIST data")
    print("(offline build); ``UNCERTAINTY`` carries each element's")
    print("held-out-anchor error bound over the CT band (20-1250 keV,")
    print("above the K edge) — the leave-one-out protocol described in")
    print("the generator.  Below ~5 keV (and below unvendored L edges of")
    print("Z >= 57) entries are physics-shaped, not tabulated-accurate.")
    print('"""')
    print()
    print("import numpy as np")
    print()
    print('__all__ = ["FULL_TABLES", "UNCERTAINTY"]')
    print()
    print()
    print("def _tbl(*rows):")
    print("    a = np.asarray(rows, dtype=np.float64)")
    print("    return a[:, 0].copy(), a[:, 1].copy()")
    print()
    print()
    print("# element -> (LOO max relative error over the CT band of the")
    print("# bracketing anchors, bracket pair)")
    print("UNCERTAINTY = {")
    for sym in targets:
        (lo, hi), err = bracket_err(sym)
        print(f'    "{sym}": ({err:.4f}, ("{lo}", "{hi}")),')
    print("}")
    print()
    print("FULL_TABLES = {}")
    for sym in targets:
        rows = build_table(sym)
        print()
        print(f'FULL_TABLES["{sym}"] = _tbl(')
        print(fmt(rows))
        print(")")


if __name__ == "__main__":
    main()
