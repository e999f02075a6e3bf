"""Run the reference protocol on the reference's *shipped* spectra.

VERDICT.md round-1 item 5: the round-1 validation used synthetic
Kramers/linac stand-ins; this tool points the full pipeline at the actual
binaries under /root/reference/input/ — both DE pairs of the reference
driver (detunedMV@9mGy + 80kV@1mGy, /root/reference/main.py:101; and
140kV@5mGy + 80kV@5mGy, main.py:102) with the shipped EID detector
response (eta_eid_mv.bin, params.txt:28) — and records VMI/BMI accuracy
plus the §2.6 output-file contract.

Run on the TPU:  python tools/validate_reference_spectra.py
"""

import os
import sys
import tempfile

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, ".")

from dexct_tpu.analysis import make_vmi, nonair_mask, rmse
from dexct_tpu.analysis.register import register_phantom_to_recon
from dexct_tpu.physics.spectrum import xRaySpectrum
from dexct_tpu.pipeline.fused import make_jitted_step, pack_dect
from dexct_tpu.system import FanBeamGeometry, pelvis_phantom, water_cylinder_phantom
from dexct_tpu.utils.io import StageWriter

REF = "/root/reference/input"
N_MATRIX, FOV = 512, 50.0


def load_ref_spectrum(spec_id, dose_mGy, ct):
    """The reference's load_spectrum (main.py:64-69) against the shipped
    binaries: counts/channel/view = fluence_per_mGy * A_iso * dose / N_proj."""
    s = xRaySpectrum(f"{REF}/spectrum/{spec_id}_1mGy_float32.bin", spec_id)
    s.rescale_counts(ct.A_iso * dose_mGy / ct.N_proj)
    return s


def run_pair(ct, ph, pair, gt, interior):
    (id1, d1), (id2, d2) = pair
    s1 = load_ref_spectrum(id1, d1, ct)
    s2 = load_ref_spectrum(id2, d2, ct)
    print(f"== DE pair {id1}@{d1}mGy + {id2}@{d2}mGy "
          f"(shipped spectra + eta_eid_mv.bin, exact projector, "
          f"noiseless) ==")
    print(f"  I0 sums/channel/view: {s1.total_counts:.3e} / "
          f"{s2.total_counts:.3e}")
    arrays, meta = pack_dect(ct, ph, s1, s2, N_MATRIX, FOV, 0.8, n_iters=50,
                             projector="siddon_dominant", recon="parallel")
    out = make_jitted_step(meta)(arrays)
    m1 = np.asarray(out["mat_recons"][0])
    m2 = np.asarray(out["mat_recons"][1])
    for e0 in (50.0, 70.0, 100.0, 150.0):
        v = make_vmi(e0, m1, m2)
        print(f"  VMI({e0:.0f}) interior RMSE: "
              f"{rmse(v, gt[e0], interior):.1f} HU")
    return out, (s1, s2), (id1, id2, d1, d2)


def check_output_contract(out, ids, run_id="ref_spectra"):
    """Write one pair through StageWriter and verify §2.6 names/layouts."""
    id1, id2, d1, d2 = ids
    with tempfile.TemporaryDirectory() as td:
        w = StageWriter(td, run_id)
        for i, sid, dose in ((0, id1, d1), (1, id2, d2)):
            w.acquisition(sid, dose,
                          sino_raw=np.asarray(out["sino_raw"][i]),
                          sino_log=np.asarray(out["sino_log"][i]),
                          recon_raw=np.asarray(out["recon_raw"][i]),
                          recon_HU=np.asarray(out["recon_HU"][i]))
        w.matdecomp(id1, id2, d1, d2,
                    mat_sinos=[np.asarray(x) for x in out["mat_sinos"]],
                    mat_recons=[np.asarray(x) for x in out["mat_recons"]])
        expect = [
            f"{run_id}/{id1}_{int(d1 * 1000):04d}uGy/sino_raw_float32.bin",
            f"{run_id}/{id1}_{int(d1 * 1000):04d}uGy/recon_HU_float32.bin",
            f"{run_id}/matdecomp_{id1}_{id2}_{int(d1 * 1000):04d}uGy_"
            f"{int(d2 * 1000):04d}uGy/mat1_sino_float32.bin",
            f"{run_id}/matdecomp_{id1}_{id2}_{int(d1 * 1000):04d}uGy_"
            f"{int(d2 * 1000):04d}uGy/mat2_recon_float32.bin",
        ]
        ok = True
        for rel in expect:
            p = os.path.join(td, rel)
            if not os.path.exists(p):
                print(f"  MISSING contract file: {rel}")
                ok = False
                continue
            n = os.path.getsize(p) // 4
            want = (N_MATRIX * N_MATRIX if "recon" in rel
                    else out["sino_raw"][0].shape[0]
                    * out["sino_raw"][0].shape[1])
            if n != want:
                print(f"  WRONG SIZE {rel}: {n} vs {want} float32")
                ok = False
        print("  output contract (§2.6 paths, flat float32 row-major):",
              "OK" if ok else "FAIL")


def main():
    ct = FanBeamGeometry(N_channels=800, N_proj=1000, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, eid=True,
                         detector_file=f"{REF}/detector/eta_eid_mv.bin")
    ph = pelvis_phantom(N=512, dx=0.1)
    gt = {e0: register_phantom_to_recon(ph, N_MATRIX, FOV, energy_keV=e0)
          for e0 in (50.0, 70.0, 100.0, 150.0)}
    r = np.hypot(*(np.mgrid[0:N_MATRIX, 0:N_MATRIX]
                   - (N_MATRIX - 1) / 2.0)) * FOV / N_MATRIX
    interior = nonair_mask(gt[100.0]) & (r < 20.0)

    # primary pair (main.py:101) and the alternate kV-kV pair (main.py:102)
    out, _, ids = run_pair(ct, ph, (("detunedMV", 9.0), ("80kV", 1.0)),
                           gt, interior)
    check_output_contract(out, ids)
    run_pair(ct, ph, (("140kV", 5.0), ("80kV", 5.0)), gt, interior)

    # absolute scale on the shipped spectra
    phw = water_cylinder_phantom(N=512, dx=0.1)
    s1 = load_ref_spectrum("detunedMV", 9.0, ct)
    s2 = load_ref_spectrum("80kV", 1.0, ct)
    aw, mw = pack_dect(ct, phw, s1, s2, N_MATRIX, FOV, 0.8, n_iters=30,
                       projector="siddon_dominant", recon="parallel")
    ow = make_jitted_step(mw)(aw)
    c = np.asarray(ow["recon_HU"][1])[248:264, 248:264].mean()
    t = np.asarray(ow["mat_recons"][0])[248:264, 248:264].mean()
    print(f"== water cylinder, shipped 80kV: center {c:.1f} HU; "
          f"tissue-basis density {t:.3f} g/cm^3 ==")


if __name__ == "__main__":
    main()
