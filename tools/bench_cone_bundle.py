"""A/B the bundled cone tracer: production cone geometry
(360v x 16rows x 256ch through 256^2 x 32), bundled vs per-ray kernel.

Also reports the planner's bundled fraction — the cone feasibility is
stricter than 2-D (shared column window AND shared z-layer bracket).
"""
from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from dexct_tpu.ops.conebeam import (_trace_cone_dominant, build_cone_pack,
                                    plan_cone_dominant,
                                    plan_cone_dominant_bundled)
from dexct_tpu.system import ConeBeamGeometry
from dexct_tpu.utils.profiling import fence


def main():
    rng = np.random.default_rng(0)
    NZ, N, NM = 32, 256, 6
    labels = rng.integers(0, NM, (NZ, N, N)).astype(np.int32)
    ct = ConeBeamGeometry(N_channels=256, N_proj=360, N_rows=16,
                          gamma_fan=0.8230337, SID=60.0, SDD=100.0,
                          h_iso=0.25)
    src, dirs = ct.ray_geometry_3d()
    src = np.asarray(src)
    dirs = np.asarray(dirs)
    dxc, dzc = 0.1, 0.1
    t0 = time.time()
    plan = plan_cone_dominant_bundled(src, dirs, (NZ, N, N), dxc, dxc, dzc)
    print(f"plan {time.time()-t0:.1f}s  frac_bundled "
          f"{plan['frac_bundled']:.3f}  nb {plan['nb_y']}+{plan['nb_x']} "
          f"rest {plan['n_rest_y']}+{plan['n_rest_x']}")

    lab = jnp.asarray(labels)
    g, w, lb, B = (plan["group"], plan["words"], plan["lbits"],
                   plan["bundle"])
    pk_yw = build_cone_pack(lab, g, lb, words=w)
    pk_y2 = build_cone_pack(lab, g, lb)
    print(f"tables: W={w} {pk_yw.nbytes/2**20:.0f} MiB/side, "
          f"W=2 {pk_y2.nbytes/2**20:.0f} MiB/side")
    s2 = jnp.asarray(src.reshape(-1, 3), jnp.float32)
    d2 = jnp.asarray(dirs.reshape(-1, 3), jnp.float32)

    # y-side only (x mirrors): bundled+rest vs per-ray on the same rays
    bun = jnp.asarray(plan["bun_y"])
    rest = jnp.asarray(plan["rest_y"])

    def run_bundled():
        a = _trace_cone_dominant(pk_yw, (NZ, N, N), s2[bun], d2[bun],
                                 dxc, dxc, dzc, n_materials=NM, group=g,
                                 lbits=lb, words=w, bundle=B)
        b = _trace_cone_dominant(pk_yw, (NZ, N, N), s2[rest], d2[rest],
                                 dxc, dxc, dzc, n_materials=NM, group=g,
                                 lbits=lb, words=w)
        return a, b

    def run_perray():
        a = _trace_cone_dominant(pk_y2, (NZ, N, N), s2[bun], d2[bun],
                                 dxc, dxc, dzc, n_materials=NM, group=g,
                                 lbits=lb)
        b = _trace_cone_dominant(pk_y2, (NZ, N, N), s2[rest], d2[rest],
                                 dxc, dxc, dzc, n_materials=NM, group=g,
                                 lbits=lb)
        return a, b

    outs = {}
    for name, fn in (("bundled", run_bundled), ("perray", run_perray)):
        fence(fn()[0])
        ts = []
        for _ in range(3):
            t0 = time.time()
            o = fn()
            fence(o[0])
            ts.append(time.time() - t0)
        outs[name] = o
        nr = s2[bun].shape[0] + s2[rest].shape[0]
        print(f"{name}: {min(ts)*1e3:.1f} ms ({nr/1e6:.2f}M rays y-side)")
    d0 = float(jnp.abs(outs["bundled"][0] - outs["perray"][0]).max())
    d1 = float(jnp.abs(outs["bundled"][1] - outs["perray"][1]).max())
    print(f"max |bundled - perray|: bun {d0:.3e} rest {d1:.3e}")


if __name__ == "__main__":
    main()
