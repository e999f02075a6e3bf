"""Benchmark: the full dual-energy pipeline on the reference workload.

Headline metric (BASELINE.json): end-to-end wall-clock of dual acquisition
(2 spectra, 1000 views x 800 channels through a 512^2 phantom, EXACT
Siddon ray tracing — the reference's defining feature) + converged
Gauss-Newton decomposition (10 iterations == the reference's 50-iteration
fixed point to <1e-5) + FFBP of all four images to 512^2, as ONE jitted
program on a single TPU chip.  Target: < 1 s.

Prints exactly one JSON line:
    {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": target/s}
Detail (per-stage timings, rays/sec) goes to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def supervised_main():
    """Run the real benchmark in a child process with a hard timeout.

    The experimental device tunnel can die mid-run (observed: a trivial
    op hangs forever rather than erroring), and a hung bench run is
    worse than a failed one — the driver would wait on it.  The parent
    relays the child's one JSON line on success; on a dead/hung tunnel
    it emits an honest error JSON so the run is still parseable.
    """
    env = dict(os.environ, _DEXCT_BENCH_CHILD="1")
    budget = int(os.environ.get("DEXCT_BENCH_TIMEOUT", "2700"))
    child = subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__)],
        env=env, stdout=subprocess.PIPE, text=True,
    )
    try:
        out, _ = child.communicate(timeout=budget)
    except subprocess.TimeoutExpired:
        child.kill()
        out, _ = child.communicate()
        sys.stdout.write(out or "")
        print(json.dumps({
            "metric": "e2e_dect_sim_decomp_ffbp_512px_1000v_800ch",
            "value": None, "unit": "s", "vs_baseline": None,
            "error": f"timeout after {budget}s (TPU tunnel hung; last "
                     "known measured value in BASELINE.md)",
        }))
        sys.exit(1)
    sys.stdout.write(out or "")
    if child.returncode != 0 or '"metric"' not in (out or ""):
        print(json.dumps({
            "metric": "e2e_dect_sim_decomp_ffbp_512px_1000v_800ch",
            "value": None, "unit": "s", "vs_baseline": None,
            "error": f"bench child failed rc={child.returncode} (TPU "
                     "unreachable? last known measured value in "
                     "BASELINE.md)",
        }))
        sys.exit(1)
    sys.exit(0)


def main():
    import jax

    # persistent compile cache: the fused program is large and this
    # runtime's first compile is slow; cache across bench invocations
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from dexct_tpu.physics import kramers_spectrum, linac_spectrum
    from dexct_tpu.pipeline.fused import make_jitted_step, pack_dect
    from dexct_tpu.system import FanBeamGeometry, pelvis_phantom

    # 10 Newton iterations (6 log-warm + 4 HIGHEST-precision polish) reach
    # the same fixed point as the reference's 50 plain-GN iterations to
    # <1e-5 relative (tests/test_matdecomp.py parity bar; the log-residual
    # warm start converges globally in ~6 — see ops/matdecomp.py)
    N_CHANNELS, N_PROJ, N_PHANTOM, N_MATRIX, N_ITERS = 800, 1000, 512, 512, 10
    TARGET_S = 1.0  # BASELINE.json north-star bound

    log(f"devices: {jax.devices()}")
    ct = FanBeamGeometry(
        N_channels=N_CHANNELS, N_proj=N_PROJ, gamma_fan=0.8230337,
        SID=60.0, SDD=100.0, eid=True,
    )
    ph = pelvis_phantom(N=N_PHANTOM, dx=0.1)
    s1 = linac_spectrum()
    s1.rescale_counts(ct.A_iso * 9.0 / ct.N_proj)
    s2 = kramers_spectrum(80.0)
    s2.rescale_counts(ct.A_iso * 1.0 / ct.N_proj)

    t0 = time.time()
    # headline = EXACT Siddon projector (16-row-group dominant-axis
    # kernel): apples-to-apples with the reference's exact ray tracing
    arrays, meta = pack_dect(ct, ph, s1, s2, N_MATRIX, 50.0, 0.8,
                             n_iters=N_ITERS, projector="siddon_dominant",
                             recon="parallel")
    arrays = jax.device_put(arrays)
    step = make_jitted_step(meta)
    log(f"pack: {time.time() - t0:.2f}s")

    def run_once():
        """One full step, fenced by a host fetch (block_until_ready is not
        trustworthy through the experimental device tunnel).  ONE scalar
        fetch suffices — the jitted program runs to completion before any
        output element is readable; a second fetch only adds another
        host round-trip through the tunnel (~30 ms measurement artifact,
        confirmed against the XLA trace's 330 ms device span)."""
        t0 = time.time()
        out = step(arrays)
        fence = float(out["mat_recons"][0][0, 0])
        dt = time.time() - t0
        return dt, fence

    t0 = time.time()
    dt, _ = run_once()
    log(f"compile+first run: {time.time() - t0:.2f}s")

    times = [run_once()[0] for _ in range(3)]
    best = min(times)
    rays = N_PROJ * N_CHANNELS
    log(f"steady-state times: {[f'{t:.3f}' for t in times]}")
    log(f"rays/sec (trace amortized over full pipeline): {rays / best:.3e}")

    # secondary: exact-Siddon projection rate (the dominant-axis method)
    from dexct_tpu.ops.siddon import material_path_sinogram

    def exact_once():
        t0 = time.time()
        p = material_path_sinogram(ph, ct, method="dominant")
        _ = float(p[0, 0, 0])
        return time.time() - t0

    exact_once()  # compile
    t_exact = min(exact_once() for _ in range(3))
    log(f"exact Siddon (dominant-axis): {t_exact:.3f}s"
        f" -> {rays / t_exact:.3e} rays/s")

    # secondary: the approximate Fourier-slice fast path (~0.1% rms on
    # line integrals; VALIDATION.md)
    a2, m2 = pack_dect(ct, ph, s1, s2, N_MATRIX, 50.0, 0.8,
                       n_iters=N_ITERS, projector="fourier",
                       recon="parallel")
    step2 = make_jitted_step(m2)

    def fourier_e2e():
        t0 = time.time()
        o = step2(a2)
        _ = float(o["mat_recons"][0][0, 0])
        return time.time() - t0

    fourier_e2e()
    log(f"fourier fast-path e2e: {min(fourier_e2e() for _ in range(2)):.3f}s")

    # secondary: the analytic-phantom pipeline (closed-form exact tracing)
    from dexct_tpu.system.analytic import pelvis_analytic

    pha = pelvis_analytic()
    a3, m3 = pack_dect(ct, pha, s1, s2, N_MATRIX, 50.0, 0.8,
                       n_iters=N_ITERS, projector="analytic",
                       recon="parallel")
    step3 = make_jitted_step(m3)

    def analytic_e2e():
        t0 = time.time()
        o = step3(a3)
        _ = float(o["mat_recons"][0][0, 0])
        return time.time() - t0

    analytic_e2e()
    log(f"analytic-exact e2e: {min(analytic_e2e() for _ in range(2)):.3f}s")

    print(json.dumps({
        "metric": "e2e_dect_sim_decomp_ffbp_512px_1000v_800ch",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(TARGET_S / best, 3),
    }))


if __name__ == "__main__":
    if os.environ.get("_DEXCT_BENCH_CHILD"):
        main()
    else:
        supervised_main()
