"""CLI: ``python -m dexct_tpu.run --params ./input/params.txt``.

Replaces the reference's ``python main.py`` script entry (main.py:74-178)
with explicit flags for the output dir, spectrum pairs, noise, and seed.
"""

from __future__ import annotations

import argparse


def parse_pairs(items):
    pairs = []
    for it in items:
        s1, s2, d1, d2 = it.split(",")
        pairs.append((s1, s2, float(d1), float(d2)))
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
    )


if __name__ == "__main__":
    main()
