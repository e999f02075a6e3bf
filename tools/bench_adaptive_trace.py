"""Measure slope-adaptive group/window candidates for the dominant tracer.

The dominant-axis tracer issues ONE row-(G*W) int32 gather per ray per
G-row group (ops/siddon_fast.py).  A y-dominant ray with folded slope
s = |dx/dy| drifts only floor(G*s)+2 columns across a G-row group, so
shallow rays can run LARGER groups at the same (or smaller) window
width, cutting the gather count:

    (G=32, W=1)  s <= 0.250   row-32 (128 B)   2x fewer gathers
    (G=48, W=1)  s <= 0.167   row-48 (192 B)   3x
    (G=64, W=1)  s <= 0.125   row-64 (256 B)   4x
    (G=32, W=2)  s <= 0.562   row-64 (256 B)   2x
    (G=48, W=2)  s <= 0.375   row-96 (384 B)   3x

This tool times the REAL kernel per candidate on the slope-filtered ray
population of the high-res (1024^2, 1440x1600) config, against the
shipped (G=16, W=2) baseline on the same rays, and prints the projected
aggregate trace-stage change.  Run on the TPU (one process at a time).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dexct_tpu.ops.siddon_fast import (_trace_dominant_grp,
                                       pack_labels_rowwin,
                                       rowwin_slope_max)
from dexct_tpu.system.geometry import FanBeamGeometry
from dexct_tpu.utils.profiling import fence

N = 1024
NM = 6
LBITS = 3
PAD = 4096


def main():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, NM, (N, N), dtype=np.int32)
    labels_j = jnp.asarray(labels)

    ct = FanBeamGeometry(N_channels=1600, N_proj=1440,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0)
    src, dirs = ct.ray_geometry()
    d = np.asarray(dirs).reshape(-1, 2)
    s_all = np.asarray(src).reshape(-1, 2)
    ydom = np.abs(d[:, 1]) >= np.abs(d[:, 0])
    dy_rays = d[ydom]
    sy_rays = s_all[ydom]
    slope = np.abs(dy_rays[:, 0]) / np.abs(dy_rays[:, 1])
    print(f"rays total {d.shape[0]}, y-dominant {ydom.sum()} "
          f"(the x pass mirrors by symmetry)")

    dxc = 0.05  # ~51 cm FOV at 1024
    candidates = [(16, 2), (32, 1), (64, 1), (32, 2), (64, 2)]
    packs = {}
    for g, w in candidates:
        packs[(g, w)] = jnp.asarray(pack_labels_rowwin(
            labels_j, g, lbits=LBITS, words=w))
        mib = packs[(g, w)].nbytes / 2**20
        print(f"pack G={g} W={w}: row {4*g*w} B, table {mib:.1f} MiB, "
              f"s_max {rowwin_slope_max(g, w, LBITS):.4f}")

    def run(gw, srcs, dirss):
        g, w = gw
        return _trace_dominant_grp(
            packs[gw], (N, N), srcs, dirss, dxc, dxc,
            n_materials=NM, group=g, lbits=LBITS, words=w)

    def timeit(gw, srcs, dirss, n=3):
        out = run(gw, srcs, dirss)
        fence(out)
        ts = []
        for _ in range(n):
            t0 = time.time()
            out = run(gw, srcs, dirss)
            fence(out)
            ts.append(time.time() - t0)
        return min(ts), out

    # per-candidate: rays eligible for THIS bucket, same set timed on
    # the baseline
    base = (16, 2)
    results = {}
    for g, w in candidates:
        if (g, w) == base:
            continue
        smax = rowwin_slope_max(g, w, LBITS)
        sel = np.nonzero(slope <= smax)[0]
        if len(sel) < PAD:
            print(f"G={g} W={w}: only {len(sel)} eligible rays, skip")
            continue
        m = len(sel) // PAD * PAD
        sel = sel[:m]
        srcs = jnp.asarray(sy_rays[sel], jnp.float32)
        dirss = jnp.asarray(dy_rays[sel], jnp.float32)
        t_new, out_new = timeit((g, w), srcs, dirss)
        t_old, out_old = timeit(base, srcs, dirss)
        diff = float(jnp.abs(out_new - out_old).max())
        ng = m * (N // g)
        frac = len(sel) / len(slope)
        results[(g, w)] = (t_new, t_old, m)
        print(f"G={g:2d} W={w}: {m/1e6:.2f}M rays ({frac:4.0%} of pop) "
              f"new {t_new*1e3:7.1f} ms  base {t_old*1e3:7.1f} ms  "
              f"ratio {t_new/t_old:.3f}  ({ng/t_new/1e6:.0f}M gathers/s)"
              f"  |diff| {diff:.2e}")

    # projected best composite: assign each ray to the fastest eligible
    # per-gather config, greedy by measured per-ray time
    per_ray = {}
    for gw, (t_new, t_old, m) in results.items():
        per_ray[gw] = t_new / m
    base_t = None
    for gw, (t_new, t_old, m) in results.items():
        base_t = t_old / m  # per-ray baseline (roughly constant)
    if per_ray and base_t:
        order = sorted(per_ray, key=lambda gw: per_ray[gw])
        assigned = np.full(len(slope), -1)
        total = 0.0
        for k, gw in enumerate(order):
            smax = rowwin_slope_max(gw[0], gw[1], LBITS)
            pick = (assigned < 0) & (slope <= smax)
            assigned[pick] = k
            total += pick.sum() * per_ray[gw]
        rest = (assigned < 0).sum()
        total += rest * base_t
        print(f"\nprojected composite trace: {total*1e3:.1f} ms vs "
              f"all-baseline {len(slope)*base_t*1e3:.1f} ms "
              f"({total/(len(slope)*base_t):.3f}x); {rest/len(slope):.0%}"
              " of rays stay on the 16/2 baseline")


if __name__ == "__main__" and not ("--floor" in sys.argv or "--bundle" in sys.argv):
    main()


def floor_probe():
    """Time the (16,2) kernel with the gather stubbed to a
    loop-dependent row broadcast: the remaining time is the subband +
    window-decode + one-hot-accumulate compute floor."""
    rng = np.random.default_rng(0)
    labels = rng.integers(0, NM, (N, N), dtype=np.int32)
    ct = FanBeamGeometry(N_channels=1600, N_proj=1440,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0)
    src, dirs = ct.ray_geometry()
    d = np.asarray(dirs).reshape(-1, 2)
    s_all = np.asarray(src).reshape(-1, 2)
    ydom = np.abs(d[:, 1]) >= np.abs(d[:, 0])
    m = ydom.sum() // PAD * PAD
    srcs = jnp.asarray(s_all[ydom][:m], jnp.float32)
    dirss = jnp.asarray(d[ydom][:m], jnp.float32)
    pk = jnp.asarray(pack_labels_rowwin(jnp.asarray(labels), 16,
                                        lbits=LBITS))

    for stub in (False, True):
        def run():
            return _trace_dominant_grp(
                pk, (N, N), srcs, dirss, 0.05, 0.05, n_materials=NM,
                group=16, lbits=LBITS, _stub_gather=stub)
        fence(run())
        ts = []
        for _ in range(3):
            t0 = time.time()
            fence(run())
            ts.append(time.time() - t0)
        print(f"G=16 W=2 stub_gather={stub}: {min(ts)*1e3:.1f} ms "
              f"({m/1e6:.2f}M rays)")


if __name__ == "__main__" and "--floor" in sys.argv:
    floor_probe()


def bundle_probe():
    """Bundled-gather hypothesis: 8 adjacent same-view channels share
    one anchor+gather per 16-row group (row-48 window).  Times the
    bundled kernel vs per-ray baseline on the high-res y-dominant
    population and checks exactness."""
    B = 8
    W = 3
    rng = np.random.default_rng(0)
    labels = rng.integers(0, NM, (N, N), dtype=np.int32)
    ct = FanBeamGeometry(N_channels=1600, N_proj=1440,
                         gamma_fan=0.8230337, SID=60.0, SDD=100.0)
    src, dirs = ct.ray_geometry()
    V, C = src.shape[:2]
    d = np.asarray(dirs).reshape(V, C, 2)
    s = np.asarray(src).reshape(V, C, 2)
    ydom = np.abs(d[..., 1]) >= np.abs(d[..., 0])
    dxc = 0.05
    half = 0.5 * N * dxc

    # build same-view runs of y-dominant channels, chunked to bundles
    idx = np.arange(V * C).reshape(V, C)
    bundles = []
    for v in range(V):
        cs = np.nonzero(ydom[v])[0]
        if len(cs) == 0:
            continue
        # split at non-consecutive channels
        brk = np.nonzero(np.diff(cs) > 1)[0] + 1
        for run in np.split(cs, brk):
            m = len(run) // B * B
            for k in range(0, m, B):
                bundles.append(idx[v, run[k:k + B]])
    bun = np.array(bundles)  # [NB, B]
    flat_d = d.reshape(-1, 2)[bun]  # [NB, B, 2]
    flat_s = s.reshape(-1, 2)[bun]
    # exact in-grid column spread per bundle: x_i(y) linear in y ->
    # max spread at y = +-half
    with np.errstate(divide="ignore"):
        slope = flat_d[..., 0] / flat_d[..., 1]
    xc = flat_s[..., 0] + (np.array([-half, half])[:, None, None]
                           - flat_s[..., 1]) * slope  # [2, NB, B]
    spread = (xc.max(-1) - xc.min(-1)).max(0) / dxc  # [NB] cells
    need = np.floor(16 * np.abs(slope).max(-1)) + 2 + np.ceil(spread)
    ok = need <= 10 * W
    print(f"bundles {len(bun)}, window-ok {ok.mean():.3%}, "
          f"max need {need.max():.0f} cols (have {10*W})")
    bun = bun[ok]
    nb = len(bun) // PAD * PAD
    bun = bun[:nb]
    order = bun.T.reshape(-1)  # bundle-transposed: member-major
    srcs = jnp.asarray(s.reshape(-1, 2)[order], jnp.float32)
    dirss = jnp.asarray(d.reshape(-1, 2)[order], jnp.float32)
    m = nb * B
    print(f"rays {m/1e6:.2f}M in {nb} bundles")

    pk3 = jnp.asarray(pack_labels_rowwin(jnp.asarray(labels), 16,
                                         lbits=LBITS, words=W))
    pk2 = jnp.asarray(pack_labels_rowwin(jnp.asarray(labels), 16,
                                         lbits=LBITS))

    def run(bundled):
        if bundled:
            return _trace_dominant_grp(
                pk3, (N, N), srcs, dirss, dxc, dxc, n_materials=NM,
                group=16, lbits=LBITS, words=W, bundle=B)
        return _trace_dominant_grp(
            pk2, (N, N), srcs, dirss, dxc, dxc, n_materials=NM,
            group=16, lbits=LBITS)

    outs = {}
    for bundled in (True, False):
        fence(run(bundled))
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = run(bundled)
            fence(out)
            ts.append(time.time() - t0)
        outs[bundled] = out
        print(f"bundled={bundled}: {min(ts)*1e3:.1f} ms")
    diff = float(jnp.abs(outs[True] - outs[False]).max())
    print(f"max |bundled - per-ray| = {diff:.3e}")


if __name__ == "__main__" and "--bundle" in sys.argv:
    bundle_probe()
