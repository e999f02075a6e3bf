"""Katsevich resampling / derivative study (round 3).

Measures the z-varying sphere interior error (the VALIDATION.md
helical-exactness metric: |recon - per-slice fan truth| max / rms over
the interior, worst slice) across the chain's two accuracy axes —
``interp`` (linear vs Catmull-Rom resampling) and ``deriv`` (4th-order
stencil vs window-matched spectral gamma derivative) — at the three
study points:

  R=8  pitch 5.5  (high-pitch regime)
  R=16 pitch 5.5  (same helix, wider detector)
  R=16 pitch 2.0  (clinical pitch)

plus the off-center z-uniform cylinder amplitude check (must stay
0.99-1.01).  CPU-friendly scale (same grids as tests/test_katsevich.py).

Round-3 measured results (max / worst-slice rms, vs ramp-0.8 fan truth):

  deriv=stencil4 interp=linear : 4.3% / 4.3% / 3.3%   amp 0.999-1.001
  deriv=spectral interp=linear : 3.9% / 3.9% / 1.7%   amp 1.001-1.004
  deriv=spectral interp=cubic  : 3.3% / 3.4% / 2.6%   amp 1.009-1.010
  (cubic's clamped TD-edge taps bias the amplitude — linear default)

Diagnostics that located the error budget:
  * z-UNIFORM object, stencil4: 3.3% max — the stencil error is
    in-plane MTF mismatch vs the windowed-ramp truth, not helical.
  * spectral, R=32 h=0.25 at pitch 5.5: 3.9% -> 1.6% — the remaining
    high-pitch error is detector-row z-sampling (halves with h_iso).
  * views/turn 96 -> 384 and n_psi 128 -> 256: no change (<0.3%).

Run: python tools/bench_katsevich_interp.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from dexct_tpu.ops.conebeam import cone_material_paths
from dexct_tpu.ops.fbp import fan_backproject, filter_sinogram
from dexct_tpu.ops.katsevich import katsevich_reconstruct
from dexct_tpu.ops.siddon import material_path_sinogram, mono_sinogram
from dexct_tpu.physics.materials import AIR, BONE, WATER, MaterialTable
from dexct_tpu.system import HelicalConeBeamGeometry
from dexct_tpu.system.geometry import FanBeamGeometry
from dexct_tpu.system.phantom import VoxelPhantom, water_cylinder_phantom

N, NZ, DX = 48, 16, 0.5


def _mono(ph3, ct, mt):
    mu = mt.mu_table(np.array([60.0]))[:, 0]
    sino = jnp.einsum("vrcm,m->vrc", cone_material_paths(ph3, ct),
                      jnp.asarray(mu, jnp.float32))
    return sino, mu


def zvar_case(n_rows, pitch, h_iso, n_proj, turns, **kw):
    ph2 = water_cylinder_phantom(N=N, dx=DX)
    lab3 = np.broadcast_to(ph2.labels[0], (NZ, N, N)).copy()
    cz = (np.arange(NZ) + 0.5 - NZ / 2) * DX
    cy = (np.arange(N) + 0.5 - N / 2) * DX
    Z, Y, X = np.meshgrid(cz, cy, cy, indexing="ij")
    mt = MaterialTable([AIR, WATER, BONE])
    lab3[(X ** 2 + (Y - 2.0) ** 2 + Z ** 2) < 9.0] = 2
    ph3 = VoxelPhantom("zvar", lab3, mt, DX, DX, DX)
    ct = HelicalConeBeamGeometry(
        N_channels=64, N_proj=n_proj, N_rows=n_rows,
        gamma_fan=0.8230337, SID=60.0, SDD=100.0, h_iso=h_iso,
        pitch=pitch, rotation_total=turns * 2.0 * np.pi)
    sino, mu = _mono(ph3, ct, mt)
    z_out = cz[5:11]
    kat = np.asarray(katsevich_reconstruct(sino, ct, N, 20.0,
                                           z_out=z_out, **kw))
    fan = FanBeamGeometry(N_channels=64, N_proj=96,
                          gamma_fan=0.8230337, SID=60.0, SDD=100.0)
    interior = np.hypot(*np.meshgrid(*[np.arange(N) - 23.5] * 2)) < 16
    emax = erms = 0.0
    for i, iz in enumerate(range(5, 11)):
        ph_s = VoxelPhantom("s", lab3[iz][None], mt, DX, DX, DX)
        g = np.asarray(fan_backproject(
            filter_sinogram(
                mono_sinogram(material_path_sinogram(ph_s, fan),
                              jnp.asarray(mu, jnp.float32)),
                fan, 0.8),
            jnp.asarray(fan.betas, jnp.float32), fan.SID,
            fan.dgamma, N, 20.0))
        d = np.abs(kat[i] - g)[interior] / g.max()
        emax = max(emax, d.max())
        erms = max(erms, np.sqrt((d ** 2).mean()))
    return emax, erms


def amplitude_case(**kw):
    cy = (np.arange(N) + 0.5 - N / 2) * DX
    Y, X = np.meshgrid(cy, cy)
    lab = np.zeros((NZ, N, N), np.uint8)
    lab[:, (X ** 2 + (Y - 2.0) ** 2) < 36.0] = 1
    mt = MaterialTable([AIR, WATER])
    ph = VoxelPhantom("cyl", lab, mt, DX, DX, DX)
    ct = HelicalConeBeamGeometry(
        N_channels=64, N_proj=384, N_rows=16, gamma_fan=0.8230337,
        SID=60.0, SDD=100.0, h_iso=0.25, pitch=2.0,
        rotation_total=8.0 * np.pi)
    sino, mu = _mono(ph, ct, mt)
    cz = (np.arange(NZ) + 0.5 - NZ / 2) * DX
    vol = np.asarray(katsevich_reconstruct(sino, ct, N, 20.0,
                                           z_out=cz[6:10], **kw))
    inner = (X ** 2 + (Y - 2.0) ** 2) < 16.0
    mu_w = float(mu[1])
    amps = [vol[i][inner].mean() / mu_w for i in range(vol.shape[0])]
    return min(amps), max(amps)


if __name__ == "__main__":
    cases = [
        ("R=8  p=5.5", dict(n_rows=8, pitch=5.5, h_iso=0.5,
                            n_proj=768, turns=8)),
        ("R=16 p=5.5", dict(n_rows=16, pitch=5.5, h_iso=0.5,
                            n_proj=768, turns=8)),
        ("R=16 p=2.0", dict(n_rows=16, pitch=2.0, h_iso=0.25,
                            n_proj=768, turns=8)),
    ]
    for variant in (dict(deriv="stencil4", interp="linear"),
                    dict(deriv="spectral", interp="linear"),
                    dict(deriv="spectral", interp="cubic")):
        lo, hi = amplitude_case(**variant)
        print(f"--- {variant}  (cyl amplitude {lo:.4f}..{hi:.4f})")
        for name, kw in cases:
            emax, erms = zvar_case(**kw, **variant)
            print(f"  {name}: max {emax:.4f}  rms {erms:.4f}")
