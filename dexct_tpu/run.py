"""CLI: ``python -m dexct_tpu.run --params ./input/params.txt``.

Replaces the reference's ``python main.py`` script entry (main.py:74-178)
with explicit flags for the output dir, spectrum pairs, noise, and seed.
"""

from __future__ import annotations

import argparse


def parse_pairs(items):
    pairs = []
    for it in items:
        parts = it.split(",")
        if len(parts) != 4:
            raise SystemExit(
                f"error: --pair expects SPEC1,SPEC2,DOSE1,DOSE2 "
                f"(e.g. detunedMV,80kV,9,1); got {it!r}"
            )
        s1, s2, d1, d2 = parts
        try:
            pairs.append((s1, s2, float(d1), float(d2)))
        except ValueError:
            raise SystemExit(
                f"error: --pair doses must be numbers; got {it!r}"
            )
    return tuple(pairs)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--params", default="./input/params.txt")
    p.add_argument("--output", default="./output")
    p.add_argument("--spectrum-dir", default="./input/spectrum")
    p.add_argument(
        "--pair", action="append", default=[],
        metavar="SPEC1,SPEC2,DOSE1,DOSE2",
        help="DE pair, e.g. detunedMV,80kV,9,1 (repeatable; default: "
        "the reference protocol)",
    )
    p.add_argument("--noise", choices=["none", "poisson", "gaussian"],
                   default="none")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--iters", type=int, default=50,
                   help="Gauss-Newton iterations (reference uses 50)")
    p.add_argument("--engine", choices=["fused", "composed"],
                   default="fused")
    p.add_argument("--projector",
                   choices=["fourier", "siddon", "siddon_dominant"],
                   default="fourier")
    p.add_argument("--recon", choices=["parallel", "fan"],
                   default="parallel")
    p.add_argument("--recon3d",
                   choices=["auto", "fdk", "helical", "katsevich"],
                   default="auto",
                   help="3-D reconstruction for cone/helical configs "
                   "(auto: FDK for circular, generalized Feldkamp for "
                   "helical; katsevich: exact helical FBP)")
    p.add_argument("--bhc", action="store_true",
                   help="also write water/bone BHC reconstructions")
    p.add_argument("--denoise", action="store_true",
                   help="also write learned-denoiser reconstructions "
                        "(recon_denoised_{raw,HU}; vendored DnCNN "
                        "checkpoint, both spectra batched per pair)")
    p.add_argument("--resume", action="store_true",
                   help="skip DE pairs whose stage artifacts exist")
    args = p.parse_args(argv)

    from .pipeline.runner import run_parameter_file

    run_parameter_file(
        args.params,
        out_dir=args.output,
        spec_pairs=parse_pairs(args.pair) if args.pair else None,
        spectrum_dir=args.spectrum_dir,
        noise=args.noise,
        seed=args.seed,
        n_iters=args.iters,
        engine=args.engine,
        projector=args.projector,
        recon=args.recon,
        recon3d=args.recon3d,
        bhc=args.bhc,
        resume=args.resume,
        denoise=args.denoise,
    )


if __name__ == "__main__":
    main()
