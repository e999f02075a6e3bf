"""Composed clinical cone protocol at scale (VERDICT r3 item 9).

One run composes every realism subsystem the framework ships —
flattening bowtie, anode heel effect, longitudinal+angular TCM,
first-principles cone scatter (Compton + Rayleigh + measured multiple
tail), compound EID noise, model-based scatter correction, FDK volume
reconstruction, PWLS statistical recon, and the 3-D dose map — at the
SURVEY-scale protocol 800 channels x 1000 views x 64 rows on the TPU,
in supervised host-side chunks (the tunnel kills single device programs
much past ~60 s; every stage here is chunked well below that).

Prints a wall-clock ladder per stage and the physics cross-checks:
energy conservation (dose integral vs beam energy removed, both
TCM-weighted) and recon accuracy vs the phantom's monoenergetic oracle.

Scale notes:
  * acquisition/scatter/noise/dose run at the FULL protocol scale;
  * FDK reconstructs the full 256^2 x 64 volume;
  * PWLS: the exact 3-D Siddon normal-equation operator costs ~1e10
    gather-steps per application at 51M rays — minutes/iteration on one
    chip, so full-protocol 3-D PWLS is a multi-chip workload (the
    sharded implementation exists: parallel/iterative.py).  Here we
    measure (a) the clinical-style central-slice 2-D PWLS at the full
    channel count from the cone data, and (b) one timed application of
    the exact 3-D operator at quarter-view scale — the number that
    sizes the multi-chip budget.

Run on an idle tunnel:  python tools/protocol3d_study.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DEXCT_CPU"):  # --tiny shakeouts off the chip
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from dexct_tpu.ops import spectral as sp_ops
from dexct_tpu.ops.bhc import fit_water_bhc_bowtie
from dexct_tpu.ops.bowtie import design_flattening_bowtie
from dexct_tpu.ops.conebeam import cone_material_paths, fdk_reconstruct
from dexct_tpu.ops.dose import KEV_TO_J, dose_map_3d
from dexct_tpu.ops.fourier import plan_fourier_projector
from dexct_tpu.ops.heel import HeelEffect
from dexct_tpu.ops.iterative import pwls_recon
from dexct_tpu.ops.scatter_physics import (multiple_to_single_factor,
                                           single_scatter_conebeam)
from dexct_tpu.physics import kramers_spectrum
from dexct_tpu.pipeline.tcm import auto_tcm_profile
from dexct_tpu.system.geometry import ConeBeamGeometry, FanBeamGeometry
from dexct_tpu.system.phantom import VoxelPhantom, pelvis_phantom_3d
from dexct_tpu.utils.profiling import fence

V, R, C = 1000, 64, 800
# dz == dx: the packed cone tracer's z-slope bound needs the 16-row
# dominant group (16*dx*slope = 0.148 cm at this cone angle) inside
# one z layer — dz=0.1 silently fell back to the DDA (measured: the
# 51M-ray trace then exceeds the tunnel's ~60 s program limit)
N, NZ, DX = 256, 64, 0.2
H_ISO = 0.0625  # 64 rows x 0.0625 = 4 cm collimation at iso
NZ_OUT = 20  # recon the illuminated slab (|z| < 2 cm + cone divergence)
DOSE_VIEW_SUB = 4  # dose is smooth in views; weights rescale by sub
if "--tiny" in sys.argv:  # CPU shakeout of the composition logic
    V, R, C = 40, 8, 64
    N, NZ, DX = 64, 16, 0.8
    H_ISO = 0.5  # keep the beam thicker than a voxel at tiny scale
    NZ_OUT = 4
FOV = N * DX  # recon on the phantom grid (clean oracle comparison)
DOSE_MGY = 20.0  # abdomen/pelvis CTDI-class
# anti-scatter grid: wide-cone single-scatter SPR ~0.7 on this habitus
# without one; every clinical wide-cone scanner fields a grid.  (The
# round-4 note here cited "2nd/1st MC ratio ~12" as evidence of a
# multiple-DOMINATED regime — that ratio compared R-row 2nd order to
# 1-row single scatter; the round-5 deep-order walk at the true
# collimation measures the per-slab multiple fraction at ~0.2-0.5,
# converged — see tools/mc_order_convergence.py.)
GRID_P, GRID_S = 0.95, 0.10


def _stage(name, t0):
    dt = time.perf_counter() - t0
    print(f"  [{name:<26}] {dt:8.1f} s")
    return dt


def main():
    print("devices:", jax.devices())
    ladder = {}
    t0 = time.perf_counter()
    ct = ConeBeamGeometry(N_channels=C, N_proj=V, N_rows=R,
                          gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                          h_iso=H_ISO, eid=True)
    ph = pelvis_phantom_3d(N=N, nz=NZ, dx=DX, dz=DX)
    # Shipped 120 kV binary, re-anchored to TRUE free-in-air kerma at
    # the isocenter: the file's "1 mGy" label integrates to ~0.26 Gy
    # of actual air kerma (sum phi E muen/rho_air — the reference's
    # label convention, not this framework's physics), so DOSE_MGY
    # here is made a real measurement: kerma_air(iso, free-in-air,
    # full scan) = DOSE_MGY.
    from dexct_tpu.physics.materials import AIR
    from dexct_tpu.physics.spectrum import Spectrum
    spec = Spectrum.from_file(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "input", "spectrum", "120kV_1mGy_float32.bin"), "120kV")
    e_s = np.asarray(spec.E, np.float64)
    w_s = np.asarray(spec.I0, np.float64) * spec.bin_widths()
    kerma_label = float(np.sum(
        w_s * e_s * AIR.mass_energy_absorption(e_s))) * KEV_TO_J * 1e6
    print(f"  shipped '1 mGy' label = {kerma_label:.1f} mGy true air "
          f"kerma; re-anchored")
    spec.rescale_counts(ct.A_iso * (DOSE_MGY / kerma_label) / ct.N_proj)
    bow = design_flattening_bowtie(ct, water_radius_cm=15.0)
    heel = HeelEffect(d0_cm=15e-4)
    ladder["setup"] = _stage("setup", t0)

    # ---- TCM: angular (central-slice scout) x longitudinal ---------
    t0 = time.perf_counter()
    ct2 = FanBeamGeometry(N_channels=C, N_proj=V, gamma_fan=ct.gamma_fan,
                          SID=ct.SID, SDD=ct.SDD, h_iso=ct.h_iso,
                          eid=True)
    ph_mid = VoxelPhantom("mid", ph.labels[NZ // 2], ph.materials,
                          ph.dx, ph.dy, ph.dz)
    m_v = np.asarray(auto_tcm_profile(ct2, ph_mid, spec, strength=1.0))
    print(f"  TCM profile: min {m_v.min():.2f} max {m_v.max():.2f} "
          f"mean {m_v.mean():.3f}")
    ladder["tcm"] = _stage("tcm scout", t0)

    # ---- exact cone trace (view-chunked: the 51M-ray one-program
    # variant OOMs — output + bundle accumulators + unpermute are
    # ~3x 1.4 GB live at once) -----------------------------------
    t0 = time.perf_counter()
    from dexct_tpu.ops.conebeam import _cone_dominant_cached
    src3, dirs3 = ct.ray_geometry_3d()
    labels_np = np.asarray(ph.labels).astype(np.int32)
    tparts = []
    tvc = max(V // 4, 1)
    for i in range(0, V, tvc):
        p = _cone_dominant_cached(ph, ct, src3[i:i + tvc],
                                  dirs3[i:i + tvc], labels_np)
        fence(p[0, 0, 0])
        tparts.append(p)
    paths = jnp.concatenate(tparts)
    del tparts
    fence(paths[0, 0, 0])
    ladder["trace"] = _stage("exact cone trace", t0)

    # ---- counts with bowtie x heel x TCM (chunked einsum) ----------
    t0 = time.perf_counter()
    e = np.asarray(spec.E, np.float64)
    live = (np.asarray(spec.I0) > 0)
    i0_rc = (heel.transmission(ct, e)[:, None, :]
             * bow.transmission(e)[None, :, :]
             * sp_ops.effective_fluence(spec, ct)[None, None, :])
    i0_rc = i0_rc[..., live]  # [R, C, E']
    mu_t = ph.materials.mu_table(e[live])  # [K, E']

    @jax.jit
    def _counts_chunk(p_chunk, i0_dev, mu_dev):
        L = jnp.matmul(p_chunk, mu_dev,
                       precision=jax.lax.Precision.HIGHEST)
        att = jnp.exp(jnp.clip(-L, -700.0, 2.0))
        return jnp.einsum("vrce,rce->vrc", att, i0_dev,
                          precision=jax.lax.Precision.HIGHEST)

    i0_dev = jnp.asarray(i0_rc, jnp.float32)
    mu_dev = jnp.asarray(mu_t, jnp.float32)
    chunks = []
    vc = 50
    for i in range(0, V, vc):
        chunks.append(_counts_chunk(paths[i:i + vc], i0_dev, mu_dev))
    counts = jnp.concatenate(chunks) * jnp.asarray(
        m_v, jnp.float32)[:, None, None] * GRID_P
    fence(counts[0, 0])
    # air level: the scanner's air calibration sees the grid too
    air_rc = i0_rc.sum(-1) * GRID_P  # [R, C] (TCM-free)
    ladder["counts"] = _stage("counts (bowtie+heel+TCM)", t0)

    # ---- TCM-weighted beam energy removed (paths still resident;
    # computed early so the big paths buffer can be freed before the
    # recon/dose stages — the first full run crashed the remote
    # compile helper with everything live) ------------------------
    t0 = time.perf_counter()
    i0w = jnp.asarray(np.asarray(spec.I0) * spec.bin_widths()
                      * np.asarray(spec.E), jnp.float32)
    mu_full = jnp.asarray(ph.materials.mu_table(np.asarray(spec.E)),
                          jnp.float32)

    @jax.jit
    def _removed_chunk(p_chunk, w_chunk):
        L = jnp.matmul(p_chunk, mu_full,
                       precision=jax.lax.Precision.HIGHEST)
        per_view = jnp.sum((1.0 - jnp.exp(-L)) * i0w, axis=(1, 2, 3))
        return jnp.sum(per_view * w_chunk)

    removed = 0.0
    for i in range(0, V, 50):
        removed += float(_removed_chunk(
            paths[i:i + 50], jnp.asarray(m_v[i:i + 50], jnp.float32)))
    removed *= KEV_TO_J
    del paths
    ladder["removed"] = _stage("beam energy removed", t0)

    # ---- first-principles scatter (coherent + multiple tail) -------
    t0 = time.perf_counter()
    # channel-reduced MC proxy: m is a ratio of channel-integrated
    # totals, so 200 NEE targets measure it 4x faster than 800
    ct2m = FanBeamGeometry(N_channels=200, N_proj=V,
                           gamma_fan=ct.gamma_fan, SID=ct.SID,
                           SDD=ct.SDD, h_iso=ct.h_iso, eid=True)
    # round-5: CONVERGED deep-order walk (tools/mc_order_convergence.py
    # carries the full per-order table).  The round-4 order-2 ratio
    # compared R-row 2nd order against 1-ROW single scatter (~12 at
    # R=64) — a per-R overstatement of the per-slab multiple fraction;
    # the walk measures every order at the true collimation.
    diag = {}
    m_mult = multiple_to_single_factor(ph_mid, ct2m, spec,
                                       n_samples=20000, seed=5,
                                       n_rows=R, orders=12,
                                       tail_bound=diag)
    print(f"  multiple-to-single factor (deep-order MC, {R}-row "
          f"collimation): {m_mult:.3f} "
          f"(tail fraction {diag['tail_fraction']:.2%}, "
          f"r_last {diag['r_last']:.2f})")
    ladder["mc_factor"] = _stage("multiple-tail MC", t0)
    t0 = time.perf_counter()
    v_eval = np.arange(0, V, 50)  # scatter varies slowly over views
    s_eval = single_scatter_conebeam(
        ph, ct, spec, coarse=8, n_energy=8, channel_sub=8, row_sub=8,
        views=ct.betas[v_eval], view_chunk=2, multiple_factor=m_mult)
    # periodic interpolation over views
    scatter = np.empty((V, R, C), np.float32)
    vg = np.concatenate([v_eval, [V]])
    sg = np.concatenate([s_eval, s_eval[:1]], 0)
    for r in range(R):
        for c0 in range(0, C, 100):
            sl = slice(c0, c0 + 100)
            f = np.ascontiguousarray(sg[:, r, sl])
            for j, cc in enumerate(range(c0, min(c0 + 100, C))):
                scatter[:, r, cc] = np.interp(np.arange(V), vg, f[:, j])
    scatter *= m_v[:, None, None].astype(np.float32) * GRID_S
    spr = float(scatter.sum() / np.asarray(counts).sum())
    print(f"  mean SPR at the detector: {spr:.4f}")
    ladder["scatter"] = _stage("cone scatter (det.)", t0)

    # ---- compound noise + model-based scatter correction -----------
    t0 = time.perf_counter()
    key = jax.random.PRNGKey(0)
    total = counts + jnp.asarray(scatter)
    noisy = sp_ops.sample_noise(key, total, mode="gaussian")
    corrected = jnp.maximum(noisy - jnp.asarray(scatter), 1e-3)
    # per-element air normalization (bowtie+heel calibration) and the
    # TCM output normalization
    sino_log = -jnp.log(corrected / (jnp.asarray(
        air_rc, jnp.float32)[None] * jnp.asarray(
            m_v, jnp.float32)[:, None, None]))
    fence(sino_log[0, 0])
    ladder["noise+correct"] = _stage("noise + scatter corr", t0)

    # ---- water BHC (bowtie-aware, per channel; rows share it) ------
    t0 = time.perf_counter()
    bhc = fit_water_bhc_bowtie(spec, ct2, bow)
    sino_log = bhc(sino_log)  # [V, R, C]: [C]-trailing coeffs broadcast
    fence(sino_log[0, 0])
    ladder["bhc"] = _stage("water BHC (bowtie)", t0)

    # ---- FDK full volume -------------------------------------------
    t0 = time.perf_counter()
    vol = fdk_reconstruct(sino_log, ct, N, FOV, 0.8, nz_out=NZ_OUT,
                          dz_out=DX)
    fence(vol[0, 0])
    ladder["fdk"] = _stage(f"FDK {N}^2 x {NZ_OUT}", t0)
    mu_w = float(bhc.mu_eff)
    hu = 1000.0 * (np.asarray(vol) - mu_w) / mu_w
    gt = np.asarray(ph_mid.M_mono(70.0))
    # central-slice interior comparison
    mid = hu[NZ_OUT // 2]
    yy, xx = np.mgrid[0:N, 0:N]
    rr = np.hypot((yy - N / 2 + 0.5) * (FOV / N),
                  (xx - N / 2 + 0.5) * (FOV / N))
    # soft-tissue band only (scatter/BH bias shows here)
    sel = (rr < 15.0) & (np.abs(gt) < 300)
    print(f"  FDK central-slice soft-tissue median "
          f"{np.median(mid[sel]):+.1f} HU vs oracle "
          f"{np.median(gt[sel]):+.1f} HU")

    # ---- PWLS: clinical central-slice 2-D at full channel count ----
    t0 = time.perf_counter()
    plan = plan_fourier_projector(ph_mid, ct2, n_theta=1024)
    r0 = R // 2 - 1
    sino2d = np.asarray(sino_log[:, r0])  # central row ~ fan
    cnt2d = np.asarray(corrected[:, r0])
    x0 = jnp.maximum(jnp.asarray(vol[NZ_OUT // 2]), 0.0)  # FDK warm start
    rec2d = pwls_recon(plan, jnp.asarray(sino2d), jnp.asarray(cnt2d),
                       (V, C), n_iters=60, beta=1e-2, x0=x0)
    fence(rec2d[0])
    hu2 = 1000.0 * (np.asarray(rec2d) - mu_w) / mu_w
    print(f"  PWLS central slice: soft-tissue median "
          f"{np.median(hu2[sel]):+.1f} HU, interior std "
          f"{np.std(hu2[sel]):.1f} vs FDK {np.std(mid[sel]):.1f} HU")
    ladder["pwls2d"] = _stage("PWLS central slice", t0)

    # ---- one exact-3D-operator application (multi-chip sizing) -----
    t0 = time.perf_counter()
    from dexct_tpu.ops.conebeam import project_volume_3d
    # 25-view probe: one application of the exact LINEAR operator (the
    # DDA, ~10x the packed tracer) on 25x64x800 rays stays under the
    # tunnel's ~60 s program limit; the full-protocol cost is linear in
    # views
    ct_q = ConeBeamGeometry(N_channels=C, N_proj=max(V // 40, 1),
                            N_rows=R, gamma_fan=ct.gamma_fan, SID=60.0,
                            SDD=100.0, h_iso=ct.h_iso, eid=True)
    srcq, dirsq = ct_q.ray_geometry_3d()
    volj = jnp.zeros((NZ, N, N), jnp.float32).at[
        (NZ - NZ_OUT) // 2:(NZ + NZ_OUT) // 2].set(
        jnp.asarray(np.asarray(vol), jnp.float32))
    pj = jax.jit(lambda v: project_volume_3d(
        v, jnp.asarray(srcq, jnp.float32), jnp.asarray(dirsq, jnp.float32),
        DX, DX, DX))
    out = pj(volj)
    fence(out[0, 0])
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = pj(volj)
    fence(out[0, 0])
    t_apply = time.perf_counter() - t0
    nv_q = max(V // 40, 1)
    print(f"  exact 3-D operator, {nv_q}x{R}x{C} rays on {N}^2x{NZ}: "
          f"{t_apply:.2f} s/application (compile+first {t_first:.1f} s)"
          f" -> full-protocol PWLS ~{V / nv_q * 2 * t_apply:.0f} s/iter "
          f"on one chip (the sharded path's job)")
    ladder["op3d"] = _stage("3-D operator timing", t0)

    # ---- 3-D dose with the TCM profile + conservation --------------
    t0 = time.perf_counter()
    v_dose = np.asarray(ct.betas)[::DOSE_VIEW_SUB]
    w_dose = m_v[::DOSE_VIEW_SUB] * DOSE_VIEW_SUB
    # oversample=1/n_energy=16/view_chunk=4: the probed memory-viable
    # config at this volume (oversample=2 compiles to 16.6 GB > HBM)
    res = dose_map_3d(ph, ct, spec, views=v_dose, view_weights=w_dose,
                      view_chunk=4, n_energy=16, oversample=1)
    fence_val = float(np.asarray(res.dose_mGy[NZ // 2]).max())
    ratio = res.deposited_J / removed
    print(f"  dose max(central slice) {fence_val:.2f} mGy; "
          f"deposited {res.deposited_J:.3e} J vs removed "
          f"{removed:.3e} J -> conservation ratio {ratio:.3f}")
    ladder["dose3d"] = _stage("3-D dose (TCM-weighted)", t0)

    print("\nwall-clock ladder:")
    for k, v in ladder.items():
        print(f"  {k:<14} {v:8.1f} s")
    print(f"  TOTAL          {sum(ladder.values()):8.1f} s")


if __name__ == "__main__":
    main()
