"""TPU benchmark for the learned denoiser (VERDICT r3 item 8).

Trains the DnCNN at a realistic patch/batch scale on the chip and
records the numbers BASELINE.md was missing: steady-state step time,
patch throughput, and a held-out PSNR pinned against the noisy input.

Scale: 24 simulated anatomy phantoms at 128 x 128 (the toy example uses
64 x 64 x 8), 64 x 64 patches, batch 256, features 48 / depth 8 — a
DLIR-class restorer, not the demo net.  The training loop is one jitted
Adam step per host iteration (ms-scale programs), so the 60 s tunnel
guard is respected by construction; data generation chunks per phantom.

Run on an idle tunnel:  python tools/bench_learn_tpu.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from dexct_tpu.learn.data import extract_patches, make_training_set
from dexct_tpu.learn.train import (HU_SCALE, apply_denoiser, init_denoiser,
                                   train_denoiser)
from dexct_tpu.utils.profiling import fence


def psnr(img, ref, peak=2000.0):
    mse = float(np.mean((np.asarray(img) - np.asarray(ref)) ** 2))
    return 10.0 * np.log10(peak * peak / mse)


def main():
    print("devices:", jax.devices())
    t0 = time.perf_counter()
    # dose_hi: the data module's default is calibrated for its 64^2 toy
    # geometry; at 128^2/192 views it leaves ~500 HU rms inputs.  4x
    # puts the low-dose input at ~100-150 HU rms — deep enough to
    # matter, shallow enough to be a CT image
    kw = dict(N=128, dx=0.15, n_views=192, n_channels=128,
              dose_hi=2e-7, target="clean")
    train = make_training_set(seed=11, n_phantoms=24, **kw)
    held = make_training_set(seed=77, n_phantoms=4, **kw)
    print(f"data gen: {time.perf_counter() - t0:.1f}s "
          f"(train {train['x'].shape}, held {held['x'].shape})")
    px, py = extract_patches(3, train["x"], train["y"], patch=64,
                             n_per_image=48)
    print(f"patch bank: {px.shape}")

    model, params = init_denoiser(jax.random.PRNGKey(0), features=48,
                                  depth=8, patch=64)
    n_par = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(params))
    print(f"DnCNN features=48 depth=8: {n_par / 1e3:.0f}k params")

    batch = 256
    # warm-up + compile
    t0 = time.perf_counter()
    params1, losses = train_denoiser(model, params, px, py, steps=10,
                                     batch=batch,
                                     key=jax.random.PRNGKey(1))
    print(f"compile+10 steps: {time.perf_counter() - t0:.1f}s "
          f"(loss {losses[0]:.4f} -> {losses[-1]:.4f})")

    # steady-state timing: per-step wall including the scalar loss
    # fetch; 500 steps amortize the per-call entry copies (the first
    # 100-step run measured 357 ms/step of call overhead pollution)
    steps_timed = 500
    t0 = time.perf_counter()
    params1, _ = train_denoiser(model, params1, px, py,
                                steps=steps_timed, batch=batch,
                                key=jax.random.PRNGKey(2))
    dt = (time.perf_counter() - t0) / steps_timed
    print(f"steady step: {dt * 1e3:.2f} ms  "
          f"({batch / dt:.0f} patches/s, batch {batch}, 64x64)")

    # real training run for the PSNR pin
    t0 = time.perf_counter()
    params2, losses = train_denoiser(model, params1, px, py, steps=1500,
                                     batch=batch,
                                     key=jax.random.PRNGKey(3))
    print(f"1500 more steps: {time.perf_counter() - t0:.1f}s "
          f"(final loss {np.mean(losses[-50:]):.5f})")

    # held-out evaluation (full 128^2 images through the trained net)
    fence(apply_denoiser(model, params2, held["x"][0]))  # compile
    p_in, p_out = [], []
    t0 = time.perf_counter()
    for i in range(held["x"].shape[0]):
        den = apply_denoiser(model, params2, held["x"][i])
        fence(den)
        p_in.append(psnr(held["x"][i], held["clean"][i]))
        p_out.append(psnr(np.asarray(den), held["clean"][i]))
    t_apply = (time.perf_counter() - t0) / held["x"].shape[0]
    print(f"apply (warm): {t_apply * 1e3:.1f} ms per 128^2 image "
          f"(incl per-image fence)")
    print(f"held-out PSNR: noisy {np.mean(p_in):.2f} dB -> "
          f"denoised {np.mean(p_out):.2f} dB "
          f"(gain {np.mean(p_out) - np.mean(p_in):+.2f} dB)")
    noise_in = [float(np.std(held['x'][i] - held['clean'][i]))
                for i in range(held["x"].shape[0])]
    noise_out = []
    for i in range(held["x"].shape[0]):
        den = np.asarray(apply_denoiser(model, params2, held["x"][i]))
        noise_out.append(float(np.std(den - held["clean"][i])))
    print(f"held-out residual rms: {np.mean(noise_in):.1f} -> "
          f"{np.mean(noise_out):.1f} HU")


if __name__ == "__main__":
    main()
