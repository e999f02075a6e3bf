// Native runtime components for dexct_tpu.
//
// The reference repo has no native code (SURVEY.md §2.2) — its single
// accelerated path was CuPy.  Here the native layer serves the roles the
// TPU cannot: a float64 exact-Siddon CPU oracle for device-vs-host parity
// testing at full workload scale (the reference's own CuPy-vs-NumPy
// divergence, matdecomp.py:89-92, is why this matters), a threaded CPU
// baseline for speedup reporting, and fast binary IO for the stage-artifact
// contract.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC \
//            -o libdexct_native.so dexct_native.cpp

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

int dexct_native_version() { return 10; }

int dexct_native_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

// Exact Siddon traversal (float64), one ray per output row.
//
// labels: [ny, nx] row-major uint8 material ids
// src, dirs: [n_rays, 2] float64 (world coords; grid centered at origin,
//            pixel (iy, ix) center at ((ix+0.5-nx/2)dx, (iy+0.5-ny/2)dy))
// out: [n_rays, n_mat] float64 per-material path lengths [cm]
void siddon_trace_f64(const uint8_t* labels, int64_t ny, int64_t nx,
                      double dx, double dy, const double* src,
                      const double* dirs, int64_t n_rays, int64_t n_mat,
                      double* out) {
  const double x0 = -0.5 * static_cast<double>(nx) * dx;
  const double y0 = -0.5 * static_cast<double>(ny) * dy;
  const double x1 = -x0, y1 = -y0;
  const double eps = 1e-12;

#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_rays; ++r) {
    double* acc = out + r * n_mat;
    for (int64_t m = 0; m < n_mat; ++m) acc[m] = 0.0;

    const double px = src[2 * r], py = src[2 * r + 1];
    const double dxr = dirs[2 * r], dyr = dirs[2 * r + 1];

    // slab clipping
    double t_lo = 0.0, t_hi = 1e300;
    if (std::fabs(dxr) > eps) {
      const double ta = (x0 - px) / dxr, tb = (x1 - px) / dxr;
      t_lo = std::fmax(t_lo, std::fmin(ta, tb));
      t_hi = std::fmin(t_hi, std::fmax(ta, tb));
    } else if (px < x0 || px > x1) {
      continue;
    }
    if (std::fabs(dyr) > eps) {
      const double ta = (y0 - py) / dyr, tb = (y1 - py) / dyr;
      t_lo = std::fmax(t_lo, std::fmin(ta, tb));
      t_hi = std::fmin(t_hi, std::fmax(ta, tb));
    } else if (py < y0 || py > y1) {
      continue;
    }
    if (t_lo >= t_hi) continue;

    // entry cell (nudged inside)
    const double nudge = 1e-9 * (dx + dy);
    double ex = px + (t_lo + nudge) * dxr;
    double ey = py + (t_lo + nudge) * dyr;
    int64_t ix = static_cast<int64_t>(std::floor((ex - x0) / dx));
    int64_t iy = static_cast<int64_t>(std::floor((ey - y0) / dy));
    ix = ix < 0 ? 0 : (ix >= nx ? nx - 1 : ix);
    iy = iy < 0 ? 0 : (iy >= ny ? ny - 1 : iy);

    const int sx = dxr > eps ? 1 : (dxr < -eps ? -1 : 0);
    const int sy = dyr > eps ? 1 : (dyr < -eps ? -1 : 0);
    const double dtx = sx ? dx / std::fabs(dxr) : 1e300;
    const double dty = sy ? dy / std::fabs(dyr) : 1e300;
    double tnx = sx ? ((x0 + (ix + (sx > 0)) * dx) - px) / dxr : 1e300;
    double tny = sy ? ((y0 + (iy + (sy > 0)) * dy) - py) / dyr : 1e300;

    double t = t_lo;
    while (t < t_hi - 1e-14) {
      double tn = std::fmin(std::fmin(tnx, tny), t_hi);
      const double seg = tn - t;
      if (seg > 0.0) {
        const uint8_t lab = labels[iy * nx + ix];
        if (lab < n_mat) acc[lab] += seg;
      }
      if (tnx <= tny) {
        ix += sx;
        tnx += dtx;
        if (ix < 0 || ix >= nx) { t = tn; break; }
      } else {
        iy += sy;
        tny += dty;
        if (iy < 0 || iy >= ny) { t = tn; break; }
      }
      t = tn;
    }
  }
}

// Polyenergetic counts from material paths (float64 CPU baseline):
//   counts[r] = sum_E i0[e] * exp(-sum_m paths[r,m] * mu[m,e])
void counts_from_paths_f64(const double* paths, int64_t n_rays,
                           int64_t n_mat, const double* mu, int64_t n_e,
                           const double* i0, double* counts) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_rays; ++r) {
    const double* p = paths + r * n_mat;
    double total = 0.0;
    for (int64_t e = 0; e < n_e; ++e) {
      double L = 0.0;
      for (int64_t m = 0; m < n_mat; ++m) L += p[m] * mu[m * n_e + e];
      if (L < 700.0) total += i0[e] * std::exp(-L);
    }
    counts[r] = total;
  }
}

// Threaded float32 binary writer for the stage-artifact contract
// (SURVEY.md §2.6).  Returns 0 on success.
int write_f32(const char* path, const float* data, int64_t n) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const size_t written = std::fwrite(data, sizeof(float), n, f);
  std::fclose(f);
  return written == static_cast<size_t>(n) ? 0 : -2;
}

int read_f32(const char* path, float* data, int64_t n) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  const size_t got = std::fread(data, sizeof(float), n, f);
  std::fclose(f);
  return got == static_cast<size_t>(n) ? 0 : -2;
}

}  // extern "C"
