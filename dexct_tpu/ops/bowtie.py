"""Bowtie (beam-shaping) filtration: channel-dependent source spectra.

Real scanners place a shaped compensator (aluminum or PTFE wedge) between
tube and patient so that the beam is progressively attenuated — and
hardened — toward the fan periphery.  The design goal is flat detected
flux through a body-sized water cylinder: peripheral rays traverse less
patient, so the bowtie adds the missing water-equivalent path.  Effects
captured here:

* detected flux dynamic range across channels collapses (detector
  auto-ranging / dose efficiency — the reason bowties exist);
* the *spectrum shape* becomes channel-dependent (peripheral hardening),
  so a decomposition or HU calibration that assumes the central spectrum
  is biased for peripheral rays;
* air-scan normalization becomes per-channel.

The reference has no bowtie (its spectra are per-scan constants,
/root/reference/matdecomp.py:149-151 interpolates one I0 per spectrum);
this is a beyond-reference scanner-realism subsystem in the spirit of
its dose studies (plots.py:541+).

TPU-native design
-----------------
The bowtie profile is **stepped**: thickness is quantized to ``n_steps``
levels (manufactured bowties are smooth, but a 32-step staircase is well
inside modeling tolerance and makes the downstream math *exact*).
Channels sharing a thickness step share an exact effective-fluence
table, so:

* the forward model stays two MXU matmuls — the per-channel fluence
  enters as one ``[C, E]`` weight array contracted with an einsum
  (``ops.spectral.counts_from_paths(..., per_channel=True)``);
* the GN decomposition runs as ONE ``vmap`` of the standard fused solve
  over thickness groups (each group has a few thousand rays and its own
  exact ``i0`` table) — no per-channel weight tensors, no model
  mismatch.

Usage::

    bt = design_flattening_bowtie(ct, water_radius_cm=15.0)
    raw, log = get_sino(ct, phantom, spec, bowtie=bt)
    mat1, mat2 = decompose_sinograms_bowtie(ct, raw1, raw2, s1, s2, bt)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import xcom
from ..physics.materials import Material
from . import matdecomp as md_ops
from . import spectral as sp_ops

__all__ = [
    "Bowtie",
    "ALUMINUM",
    "PTFE",
    "design_flattening_bowtie",
    "bowtie_fluence",
    "bowtie_second_moment",
    "decompose_sinograms_bowtie",
]

ALUMINUM = Material("aluminum", 2.699, "Al(100.0)")
PTFE = Material("PTFE", 2.2, "C(24.0)F(76.0)")


@dataclasses.dataclass(frozen=True)
class Bowtie:
    """A stepped bowtie: per-channel filter thickness of one material.

    ``t_ch`` [cm] must contain few distinct values (its unique levels
    define the decomposition groups); build via
    :func:`design_flattening_bowtie` or quantize your own profile.
    """

    material: Material
    t_ch: np.ndarray  # [C] thickness per channel [cm]
    name: str = "bowtie"

    def __post_init__(self):
        object.__setattr__(
            self, "t_ch", np.asarray(self.t_ch, np.float64))
        if self.t_ch.ndim != 1:
            raise ValueError("t_ch must be 1-D [N_channels]")
        if np.any(self.t_ch < 0):
            raise ValueError("bowtie thickness must be >= 0")

    def transmission(self, energy_keV):
        """Per-channel spectral transmission [C, E] (host, float64)."""
        mu = self.material.linear_atten(np.asarray(energy_keV))  # [E]
        return np.exp(-np.outer(self.t_ch, mu))

    def groups(self):
        """(t_levels [G], group_of_channel [C]) for the grouped solve."""
        levels, idx = np.unique(self.t_ch, return_inverse=True)
        return levels, idx


def design_flattening_bowtie(ct, water_radius_cm, material=ALUMINUM,
                             e_ref=60.0, n_steps=32, t_max_cm=None,
                             name=None):
    """Design a flux-flattening bowtie for a centered water cylinder.

    The water-equivalent path through a radius-``R`` cylinder at fan
    angle gamma is ``2 sqrt(R^2 - s^2)`` with ``s = SID sin(gamma)``
    (the parallel-rebin coordinate, CLAUDE.md conventions); the bowtie
    supplies the deficit ``path(0) - path(gamma)`` converted to filter
    material at the reference energy ``e_ref`` [keV]:

        t(gamma) = (path(0) - path(gamma)) * mu_water(e_ref) / mu_mat(e_ref)

    so at ``e_ref`` the *total* attenuation (cylinder + bowtie) is
    channel-independent — exactly flat for a monoenergetic beam, flat to
    residual beam hardening for a real spectrum.  The profile is
    quantized to ``n_steps`` thickness levels (see module docstring) and
    optionally clipped at ``t_max_cm``.
    """
    gam = ct.gammas  # [C]
    s = ct.SID * np.sin(gam)
    r = float(water_radius_cm)
    path = 2.0 * np.sqrt(np.clip(r * r - s * s, 0.0, None))
    weq = path.max() - path  # missing water-equivalent thickness [cm]
    e = np.atleast_1d(np.float64(e_ref))
    mu_w = float(xcom.mixatten("H(11.2)O(88.8)", e)[0])  # rho = 1
    mu_m = float(material.linear_atten(e)[0])
    t = weq * mu_w / mu_m
    if t_max_cm is not None:
        t = np.minimum(t, float(t_max_cm))
    if n_steps:
        if int(n_steps) < 2:
            raise ValueError("n_steps must be >= 2 (or 0/None to skip "
                             "quantization)")
        # quantize to n_steps levels over [0, max]; keep exact zero so the
        # central channels stay unfiltered
        hi = t.max()
        if hi > 0:
            q = hi / (int(n_steps) - 1)
            t = np.round(t / q) * q
    return Bowtie(material, t, name or f"{material.name} flattening bowtie")


def bowtie_fluence(spec, geometry, bowtie):
    """Per-channel effective fluence i0 [C, E] (host, float64).

    ``effective_fluence`` (detector-weighted, matdecomp.py:146-151
    construction) times the bowtie's spectral transmission.
    """
    base = sp_ops.effective_fluence(spec, geometry)  # [E]
    return bowtie.transmission(spec.E) * base[None, :]


def bowtie_second_moment(spec, geometry, bowtie):
    """Per-channel second-moment table [C, E] for compound EID noise."""
    base = sp_ops.second_moment_fluence(spec, geometry)
    return bowtie.transmission(spec.E) * base[None, :]


def decompose_sinograms_bowtie(geometry, sino1, sino2, spec1, spec2,
                               bowtie, *, n_iters=30, mask_thresh=0.95,
                               basis=md_ops.DEFAULT_BASIS,
                               dtype=jnp.float32, pixel_block=65536):
    """Bowtie-aware GN decomposition: exact per-thickness-group tables.

    Groups channels by bowtie thickness level, pads every group to the
    largest group's ray count, and runs ONE vmapped
    :func:`~dexct_tpu.ops.matdecomp.gauss_newton_solve` over the group
    axis with per-group ``i0`` tables — the forward model inside the
    solver then matches the bowtie-filtered acquisition exactly (zero
    spectral-model mismatch, unlike solving with the central spectrum).

    Returns (mat1, mat2) [N_proj, N_channels] in g/cm^2 with air rays
    masked per-channel (the bowtie makes raw air counts channel-
    dependent, so the reference's global 0.95*max mask, matdecomp.py:
    194-196, would only catch the unfiltered channels).
    """
    # union-grid tables WITHOUT the bowtie (pruning on the unfiltered
    # center channel keeps a superset of every group's detectable bins —
    # filtration only removes low-E fluence)
    ee, i0_base, mus = md_ops.prepare_decomposition(
        geometry, spec1, spec2, basis)
    levels, gidx = bowtie.groups()
    G = len(levels)
    mu_bt = bowtie.material.linear_atten(ee)  # [E']
    t_g = np.exp(-np.outer(levels, mu_bt))  # [G, E']
    i0_g = i0_base[None] * t_g[:, None, :]  # [G, 2, E']

    s1 = jnp.asarray(sino1, dtype)
    s2 = jnp.asarray(sino2, dtype)
    V, C = s1.shape
    # channel order grouped by thickness level, padded to equal size
    order = np.argsort(gidx, kind="stable")
    counts_per_g = np.bincount(gidx, minlength=G)
    cmax = int(counts_per_g.max())
    # per-group channel index table [G, cmax]; padding repeats the
    # group's first channel (a real, solvable ray — discarded on scatter)
    ch_tab = np.zeros((G, cmax), np.int32)
    pos = 0
    for g in range(G):
        n = int(counts_per_g[g])
        ch = order[pos:pos + n]
        ch_tab[g, :n] = ch
        ch_tab[g, n:] = ch[0]
        pos += n
    ch_tab_j = jnp.asarray(ch_tab)
    yg1 = s1[:, ch_tab_j]  # [V, G, cmax]
    yg2 = s2[:, ch_tab_j]
    y = jnp.stack([yg1, yg2], 0).transpose(2, 0, 1, 3)  # [G, 2, V, cmax]
    y = y.reshape(G, 2, V * cmax)

    solve = jax.vmap(
        lambda yy, ii: md_ops.gauss_newton_solve(
            yy, ii, jnp.asarray(mus, dtype), n_iters=n_iters,
            pixel_block=pixel_block),
        in_axes=(0, 0))
    a = solve(y, jnp.asarray(i0_g, dtype))  # [G, V*cmax, K]
    a = a.reshape(G, V, cmax, -1)

    # scatter back to [V, C]: each channel reads its (group, slot)
    slot_of_ch = np.zeros(C, np.int32)
    for g in range(G):
        n = int(counts_per_g[g])
        slot_of_ch[ch_tab[g, :n]] = np.arange(n)
    ga = jnp.asarray(gidx.astype(np.int32))
    sa = jnp.asarray(slot_of_ch)
    mat = a[ga, :, sa]  # [C, V, K]
    mat = mat.transpose(1, 0, 2)  # [V, C, K]

    # per-channel air mask: counts near the channel's own air level
    air1 = jnp.asarray(
        bowtie_fluence(spec1, geometry, bowtie).sum(-1), dtype)  # [C]
    mask = s1 >= mask_thresh * air1[None, :]
    mat1 = jnp.where(mask, 0.0, mat[..., 0])
    mat2 = jnp.where(mask, 0.0, mat[..., 1])
    return mat1, mat2
