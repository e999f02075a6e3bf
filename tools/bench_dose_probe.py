"""Stage split of the 2-D dose map kernel (512^2 pelvis, 512 views).

Stub-probe methodology (same as the trace-kernel floor measurements,
BASELINE.md): re-run the kernel with one stage replaced by a shape-
preserving constant and attribute the time delta to that stage.
Variants:

  prod         — the shipped `_dose_accumulate`
  stub_polar   — labq gather replaced by a constant word (decode kept)
  stub_occ     — polar gather AND one-hot decode replaced (occ constant)
  stub_vox     — voxel T-taps read row 0 (gather simplifies to a slice)
  stub_spec    — spectral exp/matmul block replaced by a sum
  nocumsum     — cumsum along r replaced by identity
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pack_label_nines(labels2d):
    """[ny, nx] labels < 8 -> int32: word (y, x) holds the 3x3 block
    [y:y+3, x:x+3] at 3 bits per label, bit (r*3 + c)*3
    (edge-replicated past the top edges)."""
    import numpy as np

    lab = np.asarray(labels2d, np.int64)
    if lab.max() >= 8:
        raise ValueError("nine packing needs labels < 8")
    ny, nx = lab.shape
    padded = np.pad(lab, ((0, 2), (0, 2)), mode="edge")
    out = np.zeros((ny, nx), np.int64)
    for r in range(3):
        for c in range(3):
            out |= padded[r:r + ny, c:c + nx] << ((r * 3 + c) * 3)
    return out.astype(np.int32)


def make_accumulate(stub):
    import jax.numpy as jnp

    @functools.partial(
        jax.jit, static_argnames=("n_mats", "nx", "ny", "pixel_block"))
    def _dose_accumulate(labq, mu_kE, i0w_E, betas, gammas, rs, vox_xy,
                         rho_vox, lab_vox, scalars, *, n_mats, nx, ny,
                         pixel_block):
        f32 = jnp.float32
        sid, dx_w, dy_w, geom_const, g_half_fan, h_over_sid, dxdy = scalars
        n_g, n_r = gammas.shape[0], rs.shape[0]
        dr = rs[1] - rs[0]
        dg = gammas[1] - gammas[0]
        n_vox = vox_xy.shape[0]
        hi = jax.lax.Precision.HIGHEST
        mat_ids = jnp.arange(n_mats, dtype=jnp.int32)

        def one_view(carry, beta):
            dose_acc, edep_acc = carry
            src = sid * jnp.stack([jnp.cos(beta), jnp.sin(beta)])
            ang = beta + gammas
            px = src[0] - jnp.cos(ang)[:, None] * rs[None, :]
            py = src[1] - jnp.sin(ang)[:, None] * rs[None, :]
            fx = px / dx_w + (nx / 2 - 0.5)
            fy = py / dy_w + (ny / 2 - 0.5)
            ix0 = jnp.floor(fx).astype(jnp.int32)
            iy0 = jnp.floor(fy).astype(jnp.int32)
            wx = fx - ix0
            wy = fy - iy0
            cy = jnp.clip(iy0, 0, ny - 2)
            cx = jnp.clip(ix0, 0, nx - 2)
            offy, offx = iy0 - cy, ix0 - cx
            if stub == "pairnine":
                # labq is the NINE pack here: one flat gather serves a
                # consecutive-r sample pair (dr < 1 px so the pair's
                # bilinear corners fit the word's 3x3 block)
                nh = n_r // 2
                fx2 = fx.reshape(n_g, nh, 2)
                fy2 = fy.reshape(n_g, nh, 2)
                ix0p = jnp.floor(fx2).astype(jnp.int32)
                iy0p = jnp.floor(fy2).astype(jnp.int32)
                ax = jnp.clip(jnp.minimum(ix0p[..., 0], ix0p[..., 1]),
                              0, nx - 3)
                ay = jnp.clip(jnp.minimum(iy0p[..., 0], iy0p[..., 1]),
                              0, ny - 3)
                w9 = labq.reshape(-1)[ay * nx + ax]  # [n_g, nh]
                wx2 = fx2 - ix0p
                wy2 = fy2 - iy0p
                occ = jnp.zeros((n_g, nh, 2, n_mats), f32)
                for ty in (0, 1):
                    for tx in (0, 1):
                        iy = iy0p + ty
                        ix = ix0p + tx
                        ok = ((iy >= 0) & (iy < ny)
                              & (ix >= 0) & (ix < nx))
                        sy = jnp.clip(iy - ay[..., None], 0, 2)
                        sx = jnp.clip(ix - ax[..., None], 0, 2)
                        lab = (w9[..., None] >> ((sy * 3 + sx) * 3)) & 7
                        w = ((wy2 if ty else (1.0 - wy2))
                             * (wx2 if tx else (1.0 - wx2))) * ok
                        occ = occ + w[..., None] * (
                            lab[..., None] == mat_ids)
                occ = occ.reshape(n_g, n_r, n_mats)
            else:
                if stub == "stub_polar":
                    q = (cy * 0 + 0x01010101).astype(jnp.int32)
                elif stub == "flatidx":
                    q = labq.reshape(-1)[cy * nx + cx]
                elif stub == "flatidx_rowpair":
                    # row-2 gather: word pair (cy, cx), (cy, cx+1) in
                    # one gather — only the first word is used (upper
                    # bound probe for a 2-word window kernel)
                    qq = jnp.take(
                        labq.reshape(-1),
                        (cy * nx + jnp.minimum(cx, nx - 2))[..., None]
                        + jnp.arange(2, dtype=jnp.int32), axis=0)
                    q = qq[..., 0]
                else:
                    q = labq[cy, cx]
                if stub == "stub_occ":
                    occ = jnp.broadcast_to(
                        (wx * wy)[..., None],
                        (n_g, n_r, n_mats)).astype(f32)
                else:
                    occ = jnp.zeros((n_g, n_r, n_mats), f32)
                    for ty in (0, 1):
                        for tx in (0, 1):
                            iy = iy0 + ty
                            ix = ix0 + tx
                            ok = ((iy >= 0) & (iy < ny)
                                  & (ix >= 0) & (ix < nx))
                            sy = jnp.clip(ty + offy, 0, 1)
                            sx = jnp.clip(tx + offx, 0, 1)
                            lab = (q >> ((sy * 2 + sx) * 8)) & 0xFF
                            w = ((wy if ty else (1.0 - wy))
                                 * (wx if tx else (1.0 - wx))) * ok
                            occ = occ + w[..., None] * (
                                lab[..., None] == mat_ids[None, None, :])
            if stub == "nocumsum":
                T = occ * dr
            else:
                T = (jnp.cumsum(occ, axis=1) - 0.5 * occ) * dr
            Tf = T.reshape(n_g * n_r, n_mats)

            rel = vox_xy - src[None, :]
            r_v = jnp.sqrt(rel[:, 0] ** 2 + rel[:, 1] ** 2)
            d0 = -src / sid
            dotp = (rel[:, 0] * d0[0] + rel[:, 1] * d0[1]) / r_v
            crossp = (d0[0] * rel[:, 1] - d0[1] * rel[:, 0]) / r_v
            g_v = jnp.arctan2(crossp, dotp)
            gi = jnp.clip((g_v - gammas[0]) / dg, 0.0, n_g - 1.001)
            ri = jnp.clip((r_v - rs[0]) / dr, 0.0, n_r - 1.001)
            gi0 = jnp.floor(gi).astype(jnp.int32)
            ri0 = jnp.floor(ri).astype(jnp.int32)
            wg = (gi - gi0)[:, None]
            wr = (ri - ri0)[:, None]
            base = gi0 * n_r + ri0
            if stub == "stub_vox":
                base = base * 0
            Tp = jnp.concatenate([Tf, jnp.roll(Tf, -1, axis=0)], axis=-1)
            lo = Tp[base]
            hi_t = Tp[base + (0 if stub == "stub_vox" else n_r)]
            t_lo = lo[:, :n_mats] * (1 - wr) + lo[:, n_mats:] * wr
            t_hi = hi_t[:, :n_mats] * (1 - wr) + hi_t[:, n_mats:] * wr
            t_vox = t_lo * (1 - wg) + t_hi * wg

            in_fan = (jnp.abs(g_v) <= g_half_fan).astype(f32)
            phi0 = geom_const / (r_v * r_v) * in_fan

            def block(args):
                t_b, phi_b, lab_b = args
                if stub == "stub_spec":
                    return phi_b * jnp.sum(t_b, -1)
                att = jnp.exp(-jnp.matmul(t_b, mu_kE, precision=hi))
                w = att * i0w_E[None, :]
                c = jnp.matmul(w, mu_kE.T, precision=hi)
                oh = (lab_b[:, None] == mat_ids).astype(t_b.dtype)
                c_own = jnp.sum(c * oh, -1)
                return phi_b * c_own

            nb = -(-n_vox // pixel_block)
            pad = nb * pixel_block - n_vox
            e_vol = jax.lax.map(block, (
                jnp.pad(t_vox, ((0, pad), (0, 0))).reshape(
                    nb, pixel_block, n_mats),
                jnp.pad(phi0, (0, pad)).reshape(nb, pixel_block),
                jnp.pad(lab_vox, (0, pad)).reshape(nb, pixel_block),
            )).reshape(-1)[:n_vox]
            dose_acc = dose_acc + e_vol / rho_vox
            edep_acc = edep_acc + jnp.sum(e_vol * dxdy * (h_over_sid * r_v))
            return (dose_acc, edep_acc), 0.0

        init = (jnp.zeros(n_vox, f32), jnp.zeros((), f32))
        (dose, edep), _ = jax.lax.scan(one_view, init, betas)
        return dose, edep

    return _dose_accumulate


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import numpy as np

    import dexct_tpu.ops.dose as dm
    from dexct_tpu.physics import kramers_spectrum
    from dexct_tpu.system.geometry import FanBeamGeometry
    from dexct_tpu.system.phantom import pelvis_phantom
    from dexct_tpu.utils.profiling import fence

    log(f"devices: {jax.devices()}")
    ct = FanBeamGeometry(N_channels=512, N_proj=512, gamma_fan=0.8230337,
                         SID=60.0, SDD=100.0, h_iso=0.1, eid=True)
    ph = pelvis_phantom(N=512, dx=0.1)
    spec = kramers_spectrum(120.0)
    log(f"n_materials: {ph.n_materials}, labels max: "
        f"{int(np.asarray(ph.labels).max())}, E bins: {len(spec.E)}")

    labels2d = ph.slice_labels(None).astype(np.int32)
    ny, nx = labels2d.shape
    mu_kE, _mu_dep, i0w = dm._dose_energy_grid(ph, spec, None)
    betas = np.asarray(ct.betas, np.float64)
    gammas, rs = dm._sample_grids(ct, ph, None, None, 2)
    xs = (np.arange(nx) + 0.5 - nx / 2) * ph.dx
    ys = (np.arange(ny) + 0.5 - ny / 2) * ph.dy
    vx, vy = np.meshgrid(xs, ys, indexing="xy")
    vox_xy = np.stack([vx.ravel(), vy.ravel()], -1)
    rho = ph.materials.densities[labels2d].ravel()
    geom_const = ct.SID / (ct.dgamma * ct.h_iso)
    scalars = jnp.asarray(
        [ct.SID, ph.dx, ph.dy, geom_const, 0.5 * ct.gamma_fan,
         ct.h_iso / ct.SID, ph.dx * ph.dy], jnp.float32)
    args = (jnp.asarray(dm._pack_label_quads(labels2d)),
            jnp.asarray(mu_kE, jnp.float32), jnp.asarray(i0w, jnp.float32),
            jnp.asarray(betas, jnp.float32),
            jnp.asarray(gammas, jnp.float32), jnp.asarray(rs, jnp.float32),
            jnp.asarray(vox_xy, jnp.float32),
            jnp.asarray(np.maximum(rho, 1e-12), jnp.float32),
            jnp.asarray(labels2d.ravel()), scalars)
    kw = dict(n_mats=ph.n_materials, nx=nx, ny=ny, pixel_block=262144)

    args9 = (jnp.asarray(pack_label_nines(labels2d)),) + args[1:]

    results = {}
    d_ref = None
    for stub in (sys.argv[1:] or
                 ["prod", "stub_polar", "stub_occ", "stub_vox",
                  "stub_spec", "nocumsum"]):
        fn = make_accumulate(stub)
        a = args9 if stub == "pairnine" else args
        t0 = time.time()
        d, e = fn(*a, **kw)
        fence(d)
        t1 = time.time()
        d, e = fn(*a, **kw)
        fence(d)
        t2 = time.time()
        results[stub] = round(t2 - t1, 3)
        log(f"{stub}: compile+first {t1 - t0:.1f}s steady {t2 - t1:.3f}s")
        if stub == "prod":
            d_ref = np.asarray(d)
        elif stub in ("flatidx", "pairnine") and d_ref is not None:
            diff = float(np.abs(np.asarray(d) - d_ref).max())
            log(f"  {stub} vs prod max|diff|: {diff:.3e}")
            results[f"{stub}_diff"] = diff
    print(json.dumps(results))


if __name__ == "__main__":
    main()
