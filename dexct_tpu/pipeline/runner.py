"""The pipeline driver: configs -> simulated acquisitions -> output files.

Functional rebuild of the reference's ``main.py`` script (SURVEY.md §3.1
call stack): loops run configs and dual-energy spectrum pairs, runs
forward projection -> recon -> decomposition -> basis recon, and persists
the §2.6 output contract.  Improvements over the reference driver:

* DE spectrum pairs come from config/arguments, not hardcoded in the loop
  (the gap flagged in SURVEY.md §5 config system).
* The ray trace is shared across the spectra of a pair.
* Stages already persisted are skipped on resume (``resume=True``).
* Noise is an explicit, seedable stage.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import numpy as np

from ..system.config import RunConfig, read_parameter_file
from ..utils.io import StageWriter
from . import api

__all__ = ["DEFAULT_SPEC_PAIRS", "run_config", "run_parameter_file"]

# the reference's hardcoded protocol (main.py:101-102)
DEFAULT_SPEC_PAIRS = (
    ("detunedMV", "80kV", 9.0, 1.0),
    # ("140kV", "80kV", 5.0, 5.0),
)


@dataclasses.dataclass
class RunResult:
    run_id: str
    pair: tuple
    dect: api.DectResult
    wall_s: float


def _resolve_spectrum(spec_id, dose, ct, spectrum_dir, generators):
    """Load a spectrum binary if present, else synthesize analytically."""
    fname = os.path.join(spectrum_dir, f"{spec_id}_1mGy_float32.bin")
    if os.path.exists(fname):
        return api.load_spectrum(spec_id, dose, ct, spectrum_dir)
    if spec_id not in generators:
        raise FileNotFoundError(
            f"no spectrum file {fname} and no generator for {spec_id!r}"
        )
    spec = generators[spec_id]()
    spec.name = spec_id
    spec.rescale_counts(ct.A_iso * dose / ct.N_proj)
    return spec


def default_generators():
    from ..physics.spectrum import kramers_spectrum, linac_spectrum

    return {
        "80kV": lambda: kramers_spectrum(80.0),
        "120kV": lambda: kramers_spectrum(120.0),
        "140kV": lambda: kramers_spectrum(140.0),
        "6MV": lambda: linac_spectrum(detuned=False,
                                      e_min=157.56497,
                                      photons_per_cm2_per_mGy=4.6e6),
        "detunedMV": lambda: linac_spectrum(detuned=True),
    }


def run_config(cfg: RunConfig, *, out_dir="./output", spec_pairs=None,
               spectrum_dir="./input/spectrum", noise="none", seed=0,
               n_iters=50, param_file=None, verbose=True, bhc=False,
               engine="fused", projector="fourier", recon="parallel",
               recon3d="auto", resume=False, denoise=False):
    """Execute one run config over its DE spectrum pairs (main.py:90-178).

    engine='fused' runs the single-jit fast pipeline (projector/recon
    select its algorithms); engine='composed' runs the exact composed op
    path (Siddon DDA + direct fan FBP).  ``bhc=True`` additionally writes
    water- and bone-BHC reconstructions per acquisition (the
    plots.py:184-195 read-side contract).  ``denoise=True`` runs the
    vendored learned denoiser (:mod:`dexct_tpu.learn.denoiser_io`) on
    every reconstructed HU image of the pair — both spectra (and all
    slices of a volume) batched into ONE device program to amortize the
    tunnel fence — and writes ``recon_denoised_{raw,HU}_float32.bin``
    alongside the §2.6 outputs.
    """
    pairs = spec_pairs or DEFAULT_SPEC_PAIRS
    writer = StageWriter(out_dir, cfg.run_id, param_file)
    gens = default_generators()
    results = []
    for spec_id1, spec_id2, d1, d2 in pairs:
        t0 = time.time()
        if resume and _pair_complete(out_dir, cfg, spec_id1, spec_id2,
                                     d1, d2, denoise=denoise):
            if verbose:
                print(f"resume: skipping completed pair "
                      f"{spec_id1}-{spec_id2}")
            continue
        spec1 = _resolve_spectrum(spec_id1, d1, cfg.ct, spectrum_dir, gens)
        spec2 = _resolve_spectrum(spec_id2, d2, cfg.ct, spectrum_dir, gens)
        from ..system.geometry import ConeBeamGeometry as _Cone
        from ..system.geometry import FanBeamGeometry as _Fan

        if engine not in ("fused", "composed"):
            raise ValueError(f"unknown engine {engine!r}")
        if isinstance(cfg.ct, _Cone):
            # 3-D branch (round 3): cone/helical configs run the 3-D
            # pipelines and persist the natural volume extension of the
            # §2.6 contract — same filenames, flat float32, shapes
            # [V, R, C] (sinograms) and [nz, N, N] (volumes)
            dect = _cone_dect(cfg, spec1, spec2, n_iters=n_iters,
                              noise=noise, seed=seed, recon3d=recon3d)
        elif (engine == "fused" and isinstance(cfg.ct, _Fan)
              and getattr(cfg.ct, "ffs", "none") == "none"):
            # the fused fast path is fan-beam with a static spot; other
            # geometries (and flying-focal-spot scans) fall through to
            # the composed op path below (get_sino/get_recon dispatch
            # per geometry)
            from .fused import make_jitted_step, pack_dect

            import numpy as _np

            proj = projector
            if proj == "fourier" and cfg.phantom.Nx != cfg.phantom.Ny:
                proj = "siddon"  # fourier path requires square grids
            if proj == "siddon_dominant":
                from ..ops.siddon_fast import select_dominant_pack

                try:  # same predicate the pack itself enforces: even
                    #   dims, square cells, < 32 material labels
                    select_dominant_pack(
                        cfg.phantom.Ny, cfg.phantom.Nx,
                        cfg.phantom.n_materials, cfg.phantom.dx,
                        cfg.phantom.dy)
                except ValueError:
                    proj = "siddon"
            rec = recon
            if rec == "parallel" and abs(
                cfg.ct.rotation_total - 2.0 * _np.pi
            ) > 1e-3:
                rec = "fan"  # rebinning needs a full-rotation fan scan
            arrays, meta = pack_dect(
                cfg.ct, cfg.phantom, spec1, spec2, cfg.N_matrix, cfg.FOV,
                cfg.ramp, n_iters=n_iters, projector=proj, recon=rec,
                noise=_effective_noise(noise, cfg.ct), seed=seed,
            )
            out = make_jitted_step(meta)(arrays)
            bp = cfg.do_back_projection
            dect = api.DectResult(
                sino_raw=out["sino_raw"], sino_log=out["sino_log"],
                recon_raw=out["recon_raw"] if bp else (None, None),
                recon_HU=out["recon_HU"] if bp else (None, None),
                mat_sinos=out["mat_sinos"],
                mat_recons=out["mat_recons"] if bp else (None, None),
            )
        else:  # composed (or fused downgraded on a non-fan geometry)
            key = jax.random.PRNGKey(seed) if noise != "none" else None
            dect = api.simulate_dect(
                cfg.ct, cfg.phantom, spec1, spec2, cfg.N_matrix, cfg.FOV,
                cfg.ramp, n_iters=n_iters,
                noise=_effective_noise(noise, cfg.ct), key=key,
                do_recon=cfg.do_back_projection,
            )
        for i, (sid, dose) in enumerate(((spec_id1, d1), (spec_id2, d2))):
            writer.acquisition(
                sid, dose,
                sino_raw=np.asarray(dect.sino_raw[i]),
                sino_log=np.asarray(dect.sino_log[i]),
                recon_raw=(None if dect.recon_raw[i] is None
                           else np.asarray(dect.recon_raw[i])),
                recon_HU=(None if dect.recon_HU[i] is None
                          else np.asarray(dect.recon_HU[i])),
            )
        writer.matdecomp(
            spec_id1, spec_id2, d1, d2,
            mat_sinos=[np.asarray(m) for m in dect.mat_sinos],
            mat_recons=(None if dect.mat_recons[0] is None
                        else [np.asarray(m) for m in dect.mat_recons]),
        )
        if (denoise and cfg.do_back_projection
                and dect.recon_HU[0] is not None):
            from ..learn.denoiser_io import denoise_hu_batch
            from .api import effective_water_mu

            hu = [np.asarray(dect.recon_HU[i]) for i in range(2)]
            batch = np.concatenate(
                [h.reshape(-1, *h.shape[-2:]) for h in hu], 0)
            dn = denoise_hu_batch(batch)
            pos = 0
            for i, (sid, dose, spec) in enumerate(
                    ((spec_id1, d1, spec1), (spec_id2, d2, spec2))):
                n = int(np.prod(hu[i].shape[:-2], initial=1))
                hu_dn = dn[pos:pos + n].reshape(hu[i].shape)
                pos += n
                mu_w = float(effective_water_mu(spec, cfg.ct))
                writer.denoised(sid, dose,
                                recon_raw=mu_w * (1.0 + hu_dn / 1000.0),
                                recon_HU=hu_dn)
        if bhc and cfg.do_back_projection and isinstance(cfg.ct, _Cone):
            import warnings

            warnings.warn(
                "bhc=True is ignored for cone/helical configs (the BHC "
                "polynomials are calibrated on the 2-D fan path); no "
                "recon_*BHC_* artifacts will be written", stacklevel=2)
        if bhc and cfg.do_back_projection and not isinstance(cfg.ct,
                                                            _Cone):
            # (BHC polynomials are calibrated on the 2-D fan path)
            from ..ops.bhc import bone_bhc_recon, water_bhc_recon

            for i, (sid, spec) in enumerate(((spec_id1, spec1),
                                             (spec_id2, spec2))):
                r_w, h_w = water_bhc_recon(
                    dect.sino_log[i], cfg.ct, spec, cfg.N_matrix, cfg.FOV,
                    cfg.ramp)
                r_b, h_b = bone_bhc_recon(
                    dect.sino_log[i], cfg.ct, spec, cfg.N_matrix, cfg.FOV,
                    cfg.ramp)
                writer.bhc(cfg.phantom.name, sid, "water",
                           np.asarray(r_w), np.asarray(h_w))
                writer.bhc(cfg.phantom.name, sid, "bone",
                           np.asarray(r_b), np.asarray(h_b))
        wall = time.time() - t0
        if verbose:
            print(f"matdecomp finished for {spec_id1}-{spec_id2} : "
                  f"t={wall:.2f}s")
        results.append(RunResult(cfg.run_id, (spec_id1, spec_id2, d1, d2),
                                 dect, wall))
    return results


def _effective_noise(noise, ct):
    """The noise model a detector actually realizes: EID detectors
    integrate energy-weighted counts, so their ``poisson`` request is
    promoted to the compound (energy-weighted Poisson) model — the
    Gaussian-limit machinery in :func:`ops.spectral.sample_noise` is
    also what stays numerically correct at EID-scale rates (CLAUDE.md
    numerical rules).  One shared rule so the fused / composed / cone
    branches can never diverge."""
    return "compound" if noise == "poisson" and ct.eid else noise


def _cone_dect(cfg, spec1, spec2, *, n_iters, noise, seed,
               recon3d="auto"):
    """Run a cone/helical/flat-panel config through the 3-D pipelines.

    Circular AND helical orbits use the pack-once fused pipeline
    (:mod:`dexct_tpu.pipeline.cone` — the helical recon stage is the
    4-volume packed generalized Feldkamp); flat-panel, z-FFS, and
    ``recon3d='katsevich'`` configs route through the stateless
    :func:`~dexct_tpu.ops.conebeam.simulate_cone_dect`.
    ``back_project false`` configs skip the reconstruction stage
    entirely (the FDK stage is the dominant cost of the 3-D pipeline).
    """
    eff_noise = _effective_noise(noise, cfg.ct)
    bp = bool(cfg.do_back_projection)
    helical = abs(getattr(cfg.ct, "pitch", 0.0)) > 1e-12
    if not helical and recon3d in ("helical", "katsevich"):
        raise ValueError(
            f"recon3d={recon3d!r} requires a helical config (pitch>0); "
            f"config {cfg.run_id!r} is a circular orbit")
    if helical and recon3d == "fdk":
        raise ValueError(
            "recon3d='fdk' (circular FDK) cannot reconstruct a helical "
            f"scan; config {cfg.run_id!r} has pitch "
            f"{getattr(cfg.ct, 'pitch', 0.0)!r} — use 'helical', "
            "'katsevich', or 'auto'")
    flat = bool(getattr(cfg.ct, "flat_panel", False))
    stateless = (flat or getattr(cfg.ct, "ffs", "none") != "none"
                 or (helical and recon3d == "katsevich"))
    out = None
    if not stateless:
        # circular AND helical orbits run the pack-once fused pipeline
        # (round 3: fused helical gFDK) when the packed dominant
        # tracer's capability constraints hold; odd shapes (steep
        # slopes, anisotropic cells, >32 labels) fall back to the
        # stateless DDA path below
        from .cone import make_jitted_cone_step, pack_cone_dect

        try:
            arrays, meta = pack_cone_dect(
                cfg.ct, cfg.phantom, spec1, spec2, cfg.N_matrix,
                cfg.FOV, cfg.ramp, n_iters=n_iters, noise=eff_noise,
                seed=seed, do_recon=bp)
        except ValueError as e:
            print(f"fused cone pipeline unavailable for "
                  f"{cfg.run_id!r} ({e}); using the stateless path")
        else:
            out = make_jitted_cone_step(meta)(arrays)
    if out is None:
        # stateless path: flat panels (equidistant FDK), z-FFS scans
        # (per-view detector-row grids), the exact Katsevich
        # reconstructor, and fused-capability fallbacks
        from ..ops.conebeam import simulate_cone_dect

        key = jax.random.PRNGKey(seed) if eff_noise != "none" else None
        out = simulate_cone_dect(
            cfg.ct, cfg.phantom, spec1, spec2, cfg.N_matrix, cfg.FOV,
            cfg.ramp, n_iters=n_iters, noise=eff_noise, key=key,
            do_recon=bp, recon=recon3d)
    return api.DectResult(
        sino_raw=out["sino_raw"], sino_log=out["sino_log"],
        recon_raw=out["recon_raw"], recon_HU=out["recon_HU"],
        mat_sinos=out["mat_sinos"], mat_recons=out["mat_recons"],
    )


def _pair_complete(out_dir, cfg, spec_id1, spec_id2, d1, d2,
                   denoise=False):
    """All stage artifacts of a DE pair already on disk (SURVEY.md §5
    checkpoint/resume: stage binaries are the checkpoint format)."""
    from ..utils.io import acquisition_dir, matdecomp_dir

    want = []
    for sid, dose in ((spec_id1, d1), (spec_id2, d2)):
        d = acquisition_dir(out_dir, cfg.run_id, sid, dose)
        want += [os.path.join(d, "sino_raw_float32.bin"),
                 os.path.join(d, "sino_log_float32.bin")]
        if cfg.do_back_projection:
            want += [os.path.join(d, "recon_raw_float32.bin"),
                     os.path.join(d, "recon_HU_float32.bin")]
            if denoise:
                want += [os.path.join(
                    d, "recon_denoised_raw_float32.bin"),
                    os.path.join(d, "recon_denoised_HU_float32.bin")]
    md = matdecomp_dir(out_dir, cfg.run_id, spec_id1, spec_id2, d1, d2)
    want += [os.path.join(md, "mat1_sino_float32.bin"),
             os.path.join(md, "mat2_sino_float32.bin")]
    return all(os.path.exists(p) for p in want)


def run_parameter_file(param_file, *, out_dir="./output", **kw):
    """``python -m dexct_tpu.run`` entry: every config in the params file."""
    out = []
    for cfg in read_parameter_file(param_file):
        out.extend(run_config(cfg, out_dir=out_dir, param_file=param_file,
                              **kw))
    return out
