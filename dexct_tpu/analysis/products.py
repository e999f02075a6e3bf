"""Clinical dual-energy products: VNC, iodine maps, Z_eff, electron
density.

The reference's analysis synthesizes VMIs from the basis pair
(plots.py:136-144); clinical DECT consoles derive three more standard
products from the same basis-density images, all closed-form in the
decomposition output:

* **VNC** (virtual non-contrast): the image with the iodine basis
  component removed — what the scan would have looked like before
  contrast injection.
* **Iodine map**: the iodine basis density in mg/mL — contrast
  quantification (perfusion, lesion enhancement).
* **Electron density** (relative to water): the radiotherapy-planning
  quantity; exact from basis densities because electron density mixes
  linearly.
* **Effective atomic number** Z_eff: the Mayneord power-law mean
  ``(sum f_e Z^m)^(1/m)`` with m = 2.94 over the mixture's electron
  fractions.

All functions take basis-density images ``a`` (one per basis material,
g/cm^3 — the ``mat*_recon`` outputs) and the matching
:class:`~dexct_tpu.physics.materials.Material` list.
"""

from __future__ import annotations

import numpy as np

from ..physics import xcom
from ..physics.materials import WATER

__all__ = ["vnc_image", "iodine_map", "electron_density_map",
           "zeff_image", "WATER_ELECTRON_DENSITY"]

WATER_ELECTRON_DENSITY = 3.3428e23  # electrons/cm^3

_ZEFF_EXPONENT = 2.94


def _find_iodine_index(materials):
    names = [m.name.lower() for m in materials]
    idx = [i for i, n in enumerate(names) if "iodine" in n]
    if len(idx) != 1:
        raise ValueError(
            f"cannot identify the iodine basis among {names}; pass "
            "iodine_index")
    return idx[0]


def vnc_image(a_imgs, materials, e0_keV, *, iodine_index=None, HU=True):
    """Virtual non-contrast image at ``e0_keV``.

    a_imgs: list/array of basis-density images [g/cm^3];
    materials: matching Material list; the iodine basis (detected by
    name containing 'iodine' unless ``iodine_index`` given) is
    dropped and the remaining components are synthesized
    monoenergetically (the same construction as a VMI, plots.py:
    136-144, minus the contrast term).
    """
    a_imgs = [np.asarray(a, np.float64) for a in a_imgs]
    if iodine_index is None:
        iodine_index = _find_iodine_index(materials)
    e = np.atleast_1d(np.float64(e0_keV))
    mu = np.zeros_like(a_imgs[0])
    for i, (a, m) in enumerate(zip(a_imgs, materials)):
        if i == iodine_index:
            continue
        mu = mu + a * float(m.mass_atten(e)[0])
    if not HU:
        return mu
    mu_w = float(WATER.linear_atten(e)[0])
    return 1000.0 * (mu - mu_w) / mu_w


def iodine_map(a_imgs, materials, *, iodine_index=None, clip_negative=True):
    """Iodine concentration map [mg/mL] from the basis densities."""
    if iodine_index is None:
        iodine_index = _find_iodine_index(materials)
    conc = np.asarray(a_imgs[iodine_index], np.float64) * 1000.0
    return np.clip(conc, 0.0, None) if clip_negative else conc


def electron_density_map(a_imgs, materials, *, relative=True):
    """Electron density [electrons/cm^3], or relative to water.

    Exact from basis densities: rho_e = sum_m a_m * (N_A sum w Z/A)_m —
    electron density is linear in mass, which is why the (rho_e, Z_eff)
    parametrization is an equivalent basis pair.
    """
    out = np.zeros_like(np.asarray(a_imgs[0], np.float64))
    for a, m in zip(a_imgs, materials):
        out = out + np.asarray(a, np.float64) * m.electrons_per_gram()
    return out / WATER_ELECTRON_DENSITY if relative else out


def zeff_image(a_imgs, materials, *, m_exp=_ZEFF_EXPONENT, floor=0.05):
    """Effective atomic number map (Mayneord power law).

    Z_eff = (sum_i f_e,i Z_i^m)^(1/m) over the voxel mixture's
    electron fractions f_e,i; pixels whose total electron density is
    below ``floor`` of water's return 0 (air — Z_eff undefined).
    """
    a_imgs = [np.asarray(a, np.float64) for a in a_imgs]
    num = np.zeros_like(a_imgs[0])
    den = np.zeros_like(a_imgs[0])
    for a, mat in zip(a_imgs, materials):
        for s, w in xcom.parse_matcomp(mat.matcomp):
            z = xcom.ELEMENT_Z[s]
            e_per_g = xcom.AVOGADRO * w * z / xcom.ATOMIC_WEIGHT[s]
            num = num + np.clip(a, 0.0, None) * e_per_g * z ** m_exp
            den = den + np.clip(a, 0.0, None) * e_per_g
    ok = den > floor * WATER_ELECTRON_DENSITY
    zeff = np.zeros_like(num)
    zeff[ok] = (num[ok] / den[ok]) ** (1.0 / m_exp)
    return zeff
