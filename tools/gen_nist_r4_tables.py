"""Generate the round-4 NIST element tables (nist_data_r4.py).

Round-4 VERDICT item 2: vendor tabulated mu/rho for the contrast/filter
elements the framework already advertises — Gd (the shipped 4-material
dual-contrast feature, tests/test_matdecomp.py::TestFourMaterialPipeline),
Ba and Ce (contrast agents / K-edge imaging), Sn (spectral-shaping beam
filters), Zr (implant ceramics) — closing the Cu-Mo / Mo-I / I-W brackets
that xcom.py names as its widest interpolation gaps.

Construction (same cross-validated recipe as round 3's
tools/gen_nist_ext_tables.py, which the compound-closure checks validated
to <=0.31 %):

* **Edge-correspondence warp**: between the two bracketing vendored
  anchors, the non-Klein-Nishina residual cross-section is interpolated
  geometrically in ln Z, with each anchor evaluated at the energy obtained
  by piecewise log-linear mapping of the TARGET's exact (L3, L2, L1, K)
  edge ladder onto the anchor's — so every absorption edge of the new
  table sits at its exact X-Ray-Data-Booklet energy with a physically
  interpolated jump (the plain K-ratio warp of xcom.py smears L edges by
  several percent in energy).  Anchors missing an in-grid edge (Cu's L
  shell) fall back to ratio extension from their nearest known landmark.
* **Fixed-energy ln-Z triangulation pins** above both bracket K edges
  (the regime where the residual varies smoothly in Z at fixed E;
  validated by reproducing the vendored Fe table from Ti+Cu to 0.5 % and
  below by the round-3 freeze) correct the warped curve through a smooth
  log-log factor; the correction is clamped below the lowest pin and
  faded to 1 above 2 MeV (the base is pair-calibrated there).
* **Recalled NIST grid spot values** are used as CHECKS (not
  corrections): the report flags any vendored value farther than 2.5 %
  from them.

Run:  python tools/gen_nist_r4_tables.py > /tmp/r4_tables.py
then review the consistency report on stderr before vendoring.
"""

from __future__ import annotations

import sys

import numpy as np

from dexct_tpu.physics import xcom
from dexct_tpu.physics.nist_data import K_EDGE_KEV, L_EDGE_KEV

STD_GRID = [
    1.0, 1.5, 2.0, 3.0, 4.0, 5.0, 6.0, 8.0, 10.0, 15.0, 20.0, 30.0, 40.0,
    50.0, 60.0, 80.0, 100.0, 150.0, 200.0, 300.0, 400.0, 500.0, 600.0,
    800.0, 1000.0, 1250.0, 1500.0, 2000.0, 3000.0, 4000.0, 5000.0, 6000.0,
    8000.0, 10000.0,
]

# (target, anchor tuple, pin energies above every anchor K edge).
# Two anchors -> linear ln-Z interpolation of the warped residual; three
# -> Lagrange quadratic, which captures the ln-tau curvature in ln Z
# (leave-one-out: rebuilding vendored I from Mo-W linear errs -4 % near
# the K edge, from (Mo, W, Pb) quadratic -0.5..-1.4 %; W from
# (Mo, I, Pb) +0.3..1.0 %).  Zr sits 2 ln-Z units from Mo, where the
# distance-scaled curvature term is ~1 %, and the mid-Z quadratic
# through far-off Cu is WORSE (LOO: Mo from (Cu, I, W) +5 %), so Zr
# stays linear Cu-Mo.
TARGETS = [
    ("Zr", ("Cu", "Mo"), [30, 40, 50, 60, 80, 100, 150, 200, 300, 500,
                          1000, 1250, 2000]),
    ("Sn", ("Mo", "I", "W"), [80, 100, 150, 200, 300, 500, 1000, 1250,
                              2000]),
    ("Ba", ("I", "W", "Pb"), [100, 150, 200, 300, 500, 1000, 1250, 2000]),
    ("Ce", ("I", "W", "Pb"), [100, 150, 200, 300, 500, 1000, 1250, 2000]),
    ("Gd", ("I", "W", "Pb"), [100, 150, 200, 300, 500, 1000, 1250, 2000]),
]

# L-edge energies for elements not yet in nist_data.L_EDGE_KEV
# (X-Ray Data Booklet).
L_EDGES_EXTRA = {
    "Zr": (2.5316, 2.3067, 2.2223),
    "Ce": (6.5488, 6.1642, 5.7234),
    # sub-grid L3 landmarks for light anchors (booklet; used only as
    # warp landmarks, never tabulated)
    "Cu": (1.0961, 0.9510, 0.9311),
}

# Recalled NIST XCOM grid values used as CHECKS only.
RECALL_CHECKS = {
    ("Gd", 100.0): 3.109,
    ("Ba", 100.0): 2.196,
    ("Sn", 100.0): 1.676,
}


def kn_g(sym, e):
    z, a = xcom.ELEMENT_Z[sym], xcom.ATOMIC_WEIGHT[sym]
    return z / a * xcom.AVOGADRO * xcom.klein_nishina_cross_section(
        np.asarray(e, np.float64))


def tau_atom(sym, e):
    """Non-Compton residual cross-section per atom [cm^2], floored."""
    a = xcom.ATOMIC_WEIGHT[sym]
    mu = np.asarray(xcom.element_mu(sym, e), np.float64)
    res = (mu - kn_g(sym, e)) * a / xcom.AVOGADRO
    z = xcom.ELEMENT_Z[sym]
    kn = z * xcom.klein_nishina_cross_section(np.asarray(e, np.float64))
    return np.clip(res, 1e-4 * kn, None)


def edge_ladder(sym):
    """Ascending warp landmarks (L3, L2, L1, K) [keV] for one element."""
    l = L_EDGE_KEV.get(sym) or L_EDGES_EXTRA.get(sym)
    k = K_EDGE_KEV[sym]
    if l is None:
        return np.array([k])
    l1, l2, l3 = l
    return np.array([l3, l2, l1, k])


def warp_map(e, edges_x, edges_a):
    """Piecewise log-linear map sending the target's edge ladder onto an
    anchor's; constant log-offset extension outside the ladder."""
    lx, la = np.log(edges_x), np.log(edges_a)
    le = np.log(np.asarray(e, np.float64))
    if len(lx) == 1:
        return np.exp(le + (la[0] - lx[0]))
    lm = np.interp(le, lx, la)
    lm = np.where(le < lx[0], le + (la[0] - lx[0]), lm)
    lm = np.where(le > lx[-1], le + (la[-1] - lx[-1]), lm)
    return np.exp(lm)


def _lagrange_weights(x, xs):
    """Lagrange interpolation weights at x for nodes xs (len 2 or 3)."""
    w = []
    for i in range(len(xs)):
        num = 1.0
        for j in range(len(xs)):
            if j != i:
                num *= (x - xs[j]) / (xs[i] - xs[j])
        w.append(num)
    return w


def base_mu(sym, anchors, e):
    """Edge-correspondence-warped ln-Z interpolation of the residual
    through 2 (linear) or 3 (quadratic) anchors — the generator's base
    curve; the xcom.py crossfade to fixed-E applies above 200-400 keV
    exactly as in _interp_element_mu."""
    e = np.atleast_1d(np.asarray(e, np.float64))
    z, a = xcom.ELEMENT_Z[sym], xcom.ATOMIC_WEIGHT[sym]
    lz = [np.log(xcom.ELEMENT_Z[s]) for s in anchors]
    lw = _lagrange_weights(np.log(z), lz)
    ex = edge_ladder(sym)

    def tau_mix(warp):
        lt = 0.0
        for wgt, sym_a in zip(lw, anchors):
            ea = edge_ladder(sym_a)
            n = min(len(ex), len(ea))
            e_eval = warp_map(e, ex[-n:], ea[-n:]) if warp else e
            lt = lt + wgt * np.log(tau_atom(sym_a, e_eval))
        return np.exp(lt)

    s = np.clip((np.log(400.0) - np.log(e)) / (np.log(400.0) - np.log(200.0)),
                0.0, 1.0)
    tau = np.exp(s * np.log(tau_mix(True)) + (1 - s) * np.log(tau_mix(False)))
    return xcom.AVOGADRO / a * (z * xcom.klein_nishina_cross_section(e) + tau)


def triangulate(sym, anchors, e):
    """Fixed-energy ln-Z residual interpolation through the same anchor
    set (the pin source; exact only above every anchor's K edge)."""
    z, a = xcom.ELEMENT_Z[sym], xcom.ATOMIC_WEIGHT[sym]
    lz = [np.log(xcom.ELEMENT_Z[s]) for s in anchors]
    lw = _lagrange_weights(np.log(z), lz)
    lt = sum(w * np.log(tau_atom(s_a, e)) for w, s_a in zip(lw, anchors))
    return xcom.AVOGADRO / a * np.exp(lt) + kn_g(sym, e)


def element_grid(sym):
    rows = [(e, 0) for e in STD_GRID]
    for ek in edge_ladder(sym):
        if ek >= 1.0:
            rows.append((float(ek), -1))
            rows.append((float(ek), +1))
    rows.sort()
    return rows


def build_table(sym, anchors, pin_es):
    pin_es = np.asarray(pin_es, np.float64)
    pins = triangulate(sym, anchors, pin_es)
    base_at = base_mu(sym, anchors, pin_es)
    r = pins / base_at

    def corr(e):
        le = np.log(np.asarray(e, np.float64))
        lr = np.interp(le, np.log(pin_es), np.log(r))
        s = np.clip((np.log(6000.0) - le) / (np.log(6000.0) - np.log(2000.0)),
                    0.0, 1.0)
        return np.exp(lr * s)

    rows = []
    for e, side in element_grid(sym):
        ee = e * (1.0 - 1e-7) if side < 0 else (
            e * (1.0 + 1e-7) if side > 0 else e)
        mu = float(base_mu(sym, anchors, ee)[0]) * float(corr(ee))
        rows.append((e, mu))
    return rows, r


def fmt(rows):
    out, line = [], "    "
    for e, mu in rows:
        tok = f"({e:g}, {mu:.4g}), "
        if len(line) + len(tok) > 78:
            out.append(line.rstrip())
            line = "    "
        line += tok
    out.append(line.rstrip())
    return "\n".join(out)


def report(sym, rows, r, anchors):
    es = np.array([x[0] for x in rows])
    ms = np.array([x[1] for x in rows])
    e2 = es.copy()
    for i in range(1, len(e2)):
        if e2[i] <= e2[i - 1]:
            e2[i] = e2[i - 1] * (1 + 1e-9)

    def mu_of(e):
        return float(np.exp(np.interp(np.log(e), np.log(e2), np.log(ms))))

    ek = K_EDGE_KEV[sym]
    jump = mu_of(ek * 1.0001) / mu_of(ek * 0.9999)
    print(f"# {sym} {anchors}: K={ek:.4f} jump {jump:.2f}; "
          f"pin corrections {r.min():.3f}..{r.max():.3f}", file=sys.stderr)
    for (s, e), v in RECALL_CHECKS.items():
        if s != sym:
            continue
        got = mu_of(e)
        rel = abs(got / v - 1) * 100
        flag = "  <-- CHECK FAILED" if rel > 2.5 else ""
        print(f"#   recall check {e:g} keV: got {got:.4g} vs {v:.4g} "
              f"({rel:.2f}%){flag}", file=sys.stderr)
    # drift vs the shipped interpolation (should be a few % at most)
    for e in (60.0, 100.0, 300.0):
        cur = float(xcom.element_mu(sym, e))
        print(f"#   vs shipped interp @{e:g}: {mu_of(e) / cur - 1:+.2%}",
              file=sys.stderr)


def main():
    print("EXT4_TABLES = {}")
    for sym, anchors, pin_es in TARGETS:
        rows, r = build_table(sym, anchors, pin_es)
        report(sym, rows, r, anchors)
        print()
        print(f'EXT4_TABLES["{sym}"] = _tbl(')
        print(fmt(rows))
        print(")")


if __name__ == "__main__":
    main()
