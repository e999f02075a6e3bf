"""Analytic phantoms: ellipse compositions with exact closed-form tracing.

The voxel phantom (system/phantom.py) is the reference's object model; its
generators are built from ellipse primitives anyway.  This module keeps
those primitives analytic, which buys two things on TPU:

* an EXACT projector with ZERO gathers: per ray, every ellipse
  intersection is a quadratic solve; paint-order semantics reduce to a
  small fixed-size event sort (2 x n_shapes values) plus coverage tests —
  pure VPU arithmetic, faster than any grid traversal and exact to float
  precision (no pixelization);
* infinitely sharp ground truth for convergence tests: voxelized Siddon
  paths must converge to the analytic paths as the grid refines.

Paint-order semantics match the voxel generators: shapes are painted in
list order over vacuum; a leading "air disk" models the surrounding air
of a voxel grid (an exact voxel grid is square — the disk approximation
differs only by air in the corners, ~1e-3 attenuation; documented).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..physics.materials import MaterialTable

__all__ = ["Ellipse", "AnalyticPhantom", "analytic_paths",
           "pelvis_analytic", "water_cylinder_analytic"]


@dataclasses.dataclass(frozen=True)
class Ellipse:
    material: int  # material table index
    cx: float
    cy: float
    rx: float
    ry: float
    angle: float = 0.0  # [rad], counterclockwise


@dataclasses.dataclass
class AnalyticPhantom:
    """Ordered ellipse composition over vacuum."""

    name: str
    shapes: list  # of Ellipse, painted in order
    materials: MaterialTable

    @property
    def n_materials(self):
        return len(self.materials)

    def shape_arrays(self):
        """(params [S, 5], labels [S]) host arrays for the tracer."""
        p = np.array([[s.cx, s.cy, s.rx, s.ry, s.angle]
                      for s in self.shapes], np.float64)
        lab = np.array([s.material for s in self.shapes], np.int32)
        return p, lab

    def rasterize(self, N, dx, name=None):
        """Voxelize onto an N x N grid of pixel size dx (paint order)."""
        from .phantom import VoxelPhantom, _ellipse_mask

        labels = np.zeros((N, N), np.uint8)
        for s in self.shapes:
            m = _ellipse_mask(N, dx, s.cx, s.cy, s.rx, s.ry, s.angle)
            labels[m] = s.material
        return VoxelPhantom(name or self.name, labels, self.materials,
                            dx, dx, dx)

    def mu_image(self, energy_keV, N, dx):
        return self.rasterize(N, dx).mu_image(energy_keV)


@functools.partial(jax.jit, static_argnames=("n_materials",))
def analytic_paths(params, labels, src, dirs, *, n_materials):
    """Exact per-material path lengths through an ellipse composition.

    params: [S, 5] (cx, cy, rx, ry, angle); labels: [S] material ids
    (paint order = array order); src/dirs: [..., 2].
    Returns [..., n_materials] — exact to float precision, no gathers.
    """
    dtype = jnp.result_type(src.dtype, jnp.float32)
    batch = src.shape[:-1]
    p = src.reshape(-1, 2).astype(dtype)
    d = dirs.reshape(-1, 2).astype(dtype)
    n_rays = p.shape[0]
    S = params.shape[0]

    prm = params.astype(dtype)
    cx, cy, rx, ry, ang = (prm[:, i] for i in range(5))
    ca, sa = jnp.cos(ang), jnp.sin(ang)

    # ray in each ellipse's unit-circle frame: o + t * v
    px = p[:, 0:1] - cx[None, :]
    py = p[:, 1:2] - cy[None, :]
    ox = (ca[None] * px + sa[None] * py) / rx[None]
    oy = (-sa[None] * px + ca[None] * py) / ry[None]
    vx = (ca[None] * d[:, 0:1] + sa[None] * d[:, 1:2]) / rx[None]
    vy = (-sa[None] * d[:, 0:1] + ca[None] * d[:, 1:2]) / ry[None]

    a = vx * vx + vy * vy
    b = ox * vx + oy * vy
    c = ox * ox + oy * oy - 1.0
    disc = b * b - a * c
    hit = disc > 0.0
    sq = jnp.sqrt(jnp.clip(disc, 0.0, None))
    safe_a = jnp.maximum(a, 1e-30)
    t_in = jnp.maximum((-b - sq) / safe_a, 0.0)  # clip behind-source
    t_out = jnp.maximum((-b + sq) / safe_a, 0.0)
    hit = hit & (t_out > t_in)
    t_in = jnp.where(hit, t_in, 0.0)
    t_out = jnp.where(hit, t_out, 0.0)

    # event sort: segment boundaries along the ray [R, 2S]
    events = jnp.sort(jnp.concatenate([t_in, t_out], axis=1), axis=1)
    seg_lo = events[:, :-1]
    seg_hi = events[:, 1:]
    seg_len = jnp.maximum(seg_hi - seg_lo, 0.0)
    t_mid = 0.5 * (seg_lo + seg_hi)  # [R, 2S-1]

    # topmost (last-painted) shape covering each segment midpoint
    cover = ((t_mid[:, :, None] >= t_in[:, None, :])
             & (t_mid[:, :, None] < t_out[:, None, :]))  # [R, G, S]
    order = jnp.arange(1, S + 1, dtype=jnp.int32)
    top = jnp.max(jnp.where(cover, order[None, None, :], 0), axis=-1)
    # label 0 when uncovered (vacuum contributes nothing anyway via length
    # x onehot of the AIR label only if shapes include an air backdrop)
    lab_tab = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               labels.astype(jnp.int32)])
    # tiny static table select (S+1 entries): one-hot contraction, no gather
    sel = jax.nn.one_hot(top, S + 1, dtype=dtype)  # [R, G, S+1]
    seg_label_oh = jnp.einsum(
        "rgs,sm->rgm", sel,
        jax.nn.one_hot(lab_tab, n_materials, dtype=dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    covered = top > 0
    out = jnp.einsum(
        "rg,rgm->rm", jnp.where(covered, seg_len, 0.0), seg_label_oh,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(*batch, n_materials)


def material_path_sinogram_analytic(phantom: AnalyticPhantom, geometry,
                                    dtype=jnp.float32):
    """[N_proj, N_channels, n_materials] exact paths for a geometry."""
    src, dirs = geometry.ray_geometry()
    params, labels = phantom.shape_arrays()
    return analytic_paths(
        jnp.asarray(params), jnp.asarray(labels),
        jnp.asarray(src, dtype), jnp.asarray(dirs, dtype),
        n_materials=phantom.n_materials,
    )


# ---------------------------------------------------------------------------
# Analytic versions of the built-in phantoms (shape-identical to the voxel
# generators in system/phantom.py)
# ---------------------------------------------------------------------------

def water_cylinder_analytic(extent_cm=12.8, radius_cm=None,
                            name="water_cyl"):
    from ..physics.materials import AIR, WATER

    radius = radius_cm if radius_cm is not None else 0.4 * extent_cm
    half = extent_cm / 2.0
    shapes = [
        Ellipse(0, 0.0, 0.0, half, half),  # air backdrop disk
        Ellipse(1, 0.0, 0.0, radius, radius),
    ]
    return AnalyticPhantom(name, shapes, MaterialTable([AIR, WATER]))


def pelvis_analytic(extent_cm=51.2, implant=None, name=None):
    """The synthetic pelvis as analytic shapes (mirrors
    system/phantom.pelvis_phantom)."""
    from ..physics.materials import (
        ADIPOSE,
        AIR,
        BONE,
        MaterialTable,
        MUSCLE,
        STEEL_316L,
        TISSUE,
        TITANIUM,
        WATER,
    )

    half = extent_cm / 2.0
    brx, bry = 0.82 * half, 0.58 * half
    shapes = [
        Ellipse(0, 0.0, 0.0, half, half),  # air backdrop
        Ellipse(1, 0.0, 0.0, brx, bry),  # adipose shell
        Ellipse(2, 0.0, 0.0, 0.92 * brx, 0.88 * bry),  # soft tissue
    ]
    for sx in (-1, 1):
        shapes.append(Ellipse(3, sx * 0.45 * brx, -0.35 * bry,
                              0.30 * brx, 0.38 * bry, sx * 0.3))
    shapes.append(Ellipse(5, 0.0, 0.12 * bry, 0.22 * brx, 0.30 * bry))
    for sx in (-1, 1):
        shapes.append(Ellipse(4, sx * 0.52 * brx, 0.18 * bry,
                              0.16 * brx, 0.42 * bry, -sx * 0.5))
        shapes.append(Ellipse(2, sx * 0.52 * brx, 0.18 * bry,
                              0.10 * brx, 0.34 * bry, -sx * 0.5))
    shapes.append(Ellipse(4, 0.0, -0.52 * bry, 0.18 * brx, 0.22 * bry))
    for sx in (-1, 1):
        shapes.append(Ellipse(4, sx * 0.62 * brx, -0.30 * bry,
                              0.085 * brx, 0.12 * bry))
    mats = [AIR, ADIPOSE, TISSUE, MUSCLE, BONE, WATER]
    if implant:
        metal = {"titanium": TITANIUM, "steel": STEEL_316L}[implant]
        mats.append(metal)
        shapes.append(Ellipse(6, 0.62 * brx, -0.30 * bry,
                              0.06 * brx, 0.09 * bry))
    default_name = "pelvis" + (f"_{implant}" if implant else "")
    return AnalyticPhantom(name or default_name, shapes,
                           MaterialTable(mats))
