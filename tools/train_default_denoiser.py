"""Train and vendor the default production denoiser checkpoint.

Round-5 VERDICT item 6: the round-4 TPU-validated training recipe
(tools/bench_learn_tpu.py — DnCNN features=48 depth=8, 24 simulated
128^2 anatomy phantoms, 64^2 clean-supervised patches at 10x dose
reduction, batch 256) rerun to convergence and SAVED to
``dexct_tpu/learn/weights/dncnn_default.npz`` — the checkpoint
:func:`dexct_tpu.learn.denoiser_io.load_default_denoiser` and the
pipeline runner's ``--denoise`` stage consume.

Prints the held-out PSNR (4 unseen phantoms) before/after for the
VALIDATION.md row.  Run on an idle tunnel (TPU) or CPU (slower):

    python tools/train_default_denoiser.py [--steps 1500]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from dexct_tpu.learn.data import extract_patches, make_training_set  # noqa: E402
from dexct_tpu.learn.denoiser_io import (  # noqa: E402
    default_weights_path, load_params, save_params)
from dexct_tpu.learn.train import (  # noqa: E402
    apply_denoiser, init_denoiser, train_denoiser)


def psnr(img, ref, peak=2000.0):
    mse = float(np.mean((np.asarray(img) - np.asarray(ref)) ** 2))
    return 10.0 * np.log10(peak * peak / mse)


def main():
    steps = 1500
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    print("devices:", jax.devices())
    t0 = time.perf_counter()
    kw = dict(N=128, dx=0.15, n_views=192, n_channels=128,
              dose_hi=2e-7, target="clean")
    train = make_training_set(seed=11, n_phantoms=24, **kw)
    held = make_training_set(seed=77, n_phantoms=4, **kw)
    print(f"data gen: {time.perf_counter() - t0:.1f}s")
    px, py = extract_patches(3, train["x"], train["y"], patch=64,
                             n_per_image=48)
    model, params = init_denoiser(jax.random.PRNGKey(0), features=48,
                                  depth=8, patch=64)
    t0 = time.perf_counter()
    params, losses = train_denoiser(model, params, px, py, steps=steps,
                                    batch=256, lr=2e-4,
                                    key=jax.random.PRNGKey(5))
    print(f"train {steps} steps: {time.perf_counter() - t0:.0f}s "
          f"(final loss {float(losses[-1]):.5f})")
    before = psnr(held["x"], held["y"])
    after = psnr(apply_denoiser(model, params, held["x"]), held["y"])
    print(f"held-out PSNR (4 unseen phantoms): {before:.1f} -> "
          f"{after:.1f} dB")
    out = default_weights_path()
    save_params(out, params, features=48, depth=8)
    print(f"saved {out} ({os.path.getsize(out) / 1e6:.2f} MB)")
    # round-trip sanity
    m2, p2 = load_params(out)
    np.testing.assert_allclose(
        np.asarray(apply_denoiser(m2, p2, held["x"][:1])),
        np.asarray(apply_denoiser(model, params, held["x"][:1])),
        rtol=1e-6)
    print("round-trip OK")


if __name__ == "__main__":
    main()
