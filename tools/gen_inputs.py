"""Generate the default input asset tree (spectra, detectors, phantom,
params) mirroring the reference's input/ layout (SURVEY.md §2.4).

Run from the repo root: ``python tools/gen_inputs.py [--out input]``.
The binaries are small (<100 KB total) and committed so the demo pipeline
runs with zero setup.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dexct_tpu.physics.detector import (
    photon_counting_response,
    scintillator_response,
)
from dexct_tpu.physics.spectrum import kramers_spectrum, linac_spectrum
from dexct_tpu.system.phantom import pelvis_phantom


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="input")
    p.add_argument("--phantom-n", type=int, default=256,
                   help="demo phantom grid (256 keeps the repo light; "
                   "bench regenerates 512 on the fly)")
    args = p.parse_args()

    spec_dir = os.path.join(args.out, "spectrum")
    det_dir = os.path.join(args.out, "detector")
    ph_dir = os.path.join(args.out, "phantom")
    for d in (spec_dir, det_dir, ph_dir):
        os.makedirs(d, exist_ok=True)

    # spectra: reference file naming {id}_1mGy_float32.bin (main.py:66)
    specs = {
        "80kV": kramers_spectrum(80.0),
        "120kV": kramers_spectrum(120.0),
        "140kV": kramers_spectrum(140.0),
        "6MV": linac_spectrum(detuned=False, e_min=157.56497,
                              photons_per_cm2_per_mGy=4.6e6),
        "detunedMV": linac_spectrum(detuned=True),
    }
    for sid, s in specs.items():
        s.to_file(os.path.join(spec_dir, f"{sid}_1mGy_float32.bin"))
        print("wrote", sid)

    # detector responses (reference file naming)
    scintillator_response().to_file(os.path.join(det_dir, "eta_eid_mv.bin"))
    photon_counting_response().to_file(
        os.path.join(det_dir, "eta_pcd_Si_30mm.bin"))

    # demo phantom: synthetic pelvis in the reference uint8 + CSV format
    n = args.phantom_n
    dx_mm = int(round(512 / n))
    ph = pelvis_phantom(N=n, dx=51.2 / n)
    base = os.path.join(ph_dir, f"pelvis_uint8_{n}_{n}_1_{dx_mm}mm.bin")
    ph.to_file(base, os.path.join(ph_dir, "materials.csv"))
    print("wrote phantom", base)

    # params file (reference JSON schema, params.txt:1-37)
    params = {
        "RUN_ID": "demo_pelvis",
        "forward_project": True,
        "back_project": True,
        "phantom_type": "voxel",
        "phantom_id": "pelvis",
        "phantom_filename": base,
        "matcomp_filename": os.path.join(ph_dir, "materials.csv"),
        "Nx": n, "Ny": n, "Nz": 1,
        "dx": 51.2 / n, "dy": 51.2 / n, "dz": 51.2 / n,
        "z_index": 0,
        "scanner_geometry": "fan_beam",
        "SID": 60.0, "SDD": 100.0,
        "N_channels": 800, "N_projections": 1000,
        "fan_angle_total": 0.8230337,
        "rotation_angle_total": 6.283185,
        "detector_px_height": 1.0,
        "detector_mode": "eid",
        "detector_filename": os.path.join(det_dir, "eta_eid_mv.bin"),
        "spectrum_id": "NA",
        "spectrum_filename": "NA",
        "N_photons_per_cm2_per_scan": "NA",
        "N_recon_matrix": 512,
        "FOV_recon": 50.0,
        "ramp_filter_percent_Nyquist": 0.8,
    }
    with open(os.path.join(args.out, "params.txt"), "w") as f:
        json.dump(params, f, indent=4)
    print("wrote params.txt")


if __name__ == "__main__":
    main()
