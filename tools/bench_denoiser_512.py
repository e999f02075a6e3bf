"""512^2 rows for the integrated denoiser (round-5 VERDICT item 6):
held-out PSNR at product resolution + batched inference images/s.

The vendored checkpoint (learn/weights/dncnn_default.npz) is fully
convolutional, so the 128^2-trained net applies to 512^2 directly.
Held-out data: unseen simulated anatomy phantoms at the training noise
regime (10x dose reduction, ~100-150 HU rms), product resolution.

Run on an idle tunnel:  python tools/bench_denoiser_512.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402

from dexct_tpu.learn.data import make_training_set  # noqa: E402
from dexct_tpu.learn.denoiser_io import load_default_denoiser  # noqa: E402
from dexct_tpu.learn.train import apply_denoiser  # noqa: E402


def psnr(img, ref, peak=2000.0):
    mse = float(np.mean((np.asarray(img) - np.asarray(ref)) ** 2))
    return 10.0 * np.log10(peak * peak / mse)


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    held = make_training_set(seed=123, n_phantoms=2, N=512, dx=0.1,
                             n_views=512, n_channels=512, dose_hi=8e-7,
                             target="clean")
    print(f"data gen: {time.perf_counter() - t0:.1f}s "
          f"(x {held['x'].shape}, noise rms "
          f"{float(np.sqrt(np.mean((held['x'] - held['y'])**2))):.0f} "
          f"HU)", flush=True)
    model, params = load_default_denoiser()
    before = psnr(held["x"], held["y"])
    t0 = time.perf_counter()
    dn = np.asarray(apply_denoiser(model, params, held["x"]))
    print(f"first inference (compile) {time.perf_counter() - t0:.1f}s",
          flush=True)
    after = psnr(dn, held["y"])
    print(f"512^2 held-out PSNR: {before:.1f} -> {after:.1f} dB "
          f"(+{after - before:.1f})", flush=True)

    # throughput: one batched device program per fetch
    batch = np.repeat(held["x"], 8, axis=0)  # 16 x 512^2
    _ = np.asarray(apply_denoiser(model, params, batch))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(apply_denoiser(model, params, batch))
        ts.append(time.perf_counter() - t0)
    n_img = batch.shape[0]
    print(f"batched inference: {n_img} x 512^2 in {min(ts):.3f} s -> "
          f"{n_img / min(ts):.1f} images/s "
          f"({min(ts) / n_img * 1e3:.1f} ms/image)", flush=True)


if __name__ == "__main__":
    main()
