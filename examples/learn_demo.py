"""Learned denoising trained on the simulator itself: the no-clean-data
(Noise2Noise) low-dose story in one figure.

    python examples/learn_demo.py --figdir ./output/learn

Workflow (the clinical vendor recipe, with the simulator as scanner):

  1. `learn.make_training_set` scans randomized procedural anatomy
     phantoms at low dose twice (two independent Poisson realizations)
     — no noiseless image enters training;
  2. `learn.train_denoiser` fits the DnCNN residual net on aligned
     patch pairs (Lehtinen 2018: the L2 minimizer against an
     independent equally-noisy target equals the clean-supervised one);
  3. the net denoises a HELD-OUT phantom, compared against the clean
     oracle only the simulator can provide.

Prints held-out rms-vs-clean for the noisy input, the n2n net, and a
clean-supervised net trained on the same scans (the oracle gap).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from dexct_tpu.learn import (apply_denoiser, extract_patches,  # noqa: E402
                             init_denoiser, make_training_set,
                             train_denoiser)


def _rms(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--figdir", default=None)
    ap.add_argument("--phantoms", type=int, default=6)
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()

    print("simulating paired low-dose scans (n2n targets) ...")
    ds = make_training_set(11, n_phantoms=args.phantoms, target="n2n")
    x, y, clean = ds["x"], ds["y"], ds["clean"]
    tr = slice(0, args.phantoms - 1)  # hold out the last phantom
    ho = args.phantoms - 1
    noise_in = _rms(x[ho], clean[ho])

    results = {}
    for name, targets in (("n2n", y[tr]), ("supervised", clean[tr])):
        px, py = extract_patches(0, x[tr], targets, patch=32,
                                 n_per_image=96)
        model, params = init_denoiser(jax.random.PRNGKey(1))
        params, losses = train_denoiser(model, params, px, py,
                                        steps=args.steps, batch=64,
                                        key=jax.random.PRNGKey(2))
        den = apply_denoiser(model, params, x[ho])
        results[name] = (np.asarray(den), _rms(den, clean[ho]))
        print(f"  {name:>10}: held-out rms vs clean "
              f"{results[name][1]:6.2f} HU  (final train loss "
              f"{losses[-20:].mean():.2e})")
    print(f"  {'input':>10}: held-out rms vs clean {noise_in:6.2f} HU")

    if args.figdir:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(args.figdir, exist_ok=True)
        panels = [("noisy input", x[ho], noise_in),
                  ("Noise2Noise net", *results["n2n"]),
                  ("supervised net", *results["supervised"]),
                  ("clean oracle", clean[ho], 0.0)]
        fig, axs = plt.subplots(1, 4, figsize=(14, 4))
        for ax, (title, img, rms) in zip(axs, panels):
            ax.imshow(np.asarray(img), cmap="gray", vmin=-150, vmax=250)
            ax.set_title(f"{title}\nrms {rms:.1f} HU" if rms else title)
            ax.axis("off")
        fig.tight_layout()
        path = os.path.join(args.figdir, "learn_denoise.png")
        fig.savefig(path, dpi=130)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
