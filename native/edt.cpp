// Native metrics core: exact euclidean distance transform + HD95.
//
// The evaluation pipeline computes, per test case and per class, the 95th
// percentile symmetric surface distance (HD95, medpy convention — see
// cswin_unet_tpu/metrics.py). The scipy path does this with a full-volume
// EDT per direction; on 512x512xD CT volumes that dominates eval wall time.
// This file implements the same math natively:
//
//   * boundary extraction: mask & ~binary_erosion(mask) with the
//     1-connectivity structuring element and zero border (scipy semantics);
//   * exact squared EDT via the Felzenszwalb-Huttenlocher separable
//     lower-envelope algorithm, applied per axis;
//   * hd95: EDT of each mask's boundary sampled at the other boundary,
//     pooled, numpy 'linear' 95th percentile.
//
// Build: g++ -O3 -shared -fPIC -o libedt.so edt.cpp   (no dependencies)
// Python binding: ctypes in cswin_unet_tpu/utils/native.py (scipy fallback).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// 1-D squared distance transform (Felzenszwalb & Huttenlocher 2012).
// f: sampled squared distances; out: lower envelope of parabolas.
void dt1d(const double* f, double* out, int n, std::vector<int>& v,
          std::vector<double>& z) {
  v.resize(n);
  z.resize(n + 1);
  int k = 0;
  v[0] = 0;
  z[0] = -kInf;
  z[1] = kInf;
  for (int q = 1; q < n; ++q) {
    if (f[q] == kInf) continue;
    if (f[v[k]] == kInf) {  // first finite sample
      v[k] = q;
      continue;
    }
    double s = ((f[q] + double(q) * q) - (f[v[k]] + double(v[k]) * v[k])) /
               (2.0 * q - 2.0 * v[k]);
    while (k > 0 && s <= z[k]) {
      --k;
      s = ((f[q] + double(q) * q) - (f[v[k]] + double(v[k]) * v[k])) /
          (2.0 * q - 2.0 * v[k]);
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = kInf;
  }
  int j = 0;
  for (int q = 0; q < n; ++q) {
    if (f[v[0]] == kInf) {  // no feature in this line
      out[q] = kInf;
      continue;
    }
    while (z[j + 1] < q) ++j;
    double dq = double(q) - v[j];
    out[q] = dq * dq + f[v[j]];
  }
}

// In-place separable squared EDT over a (d, h, w) volume stored row-major.
// On input, grid holds 0 at feature voxels and +inf elsewhere.
void edt3_sq(double* grid, int d, int h, int w) {
  std::vector<int> v;
  std::vector<double> z;
  std::vector<double> f(std::max(std::max(d, h), w));
  std::vector<double> o(f.size());

  // along w
  for (int zz = 0; zz < d; ++zz)
    for (int y = 0; y < h; ++y) {
      double* row = grid + (size_t(zz) * h + y) * w;
      dt1d(row, o.data(), w, v, z);
      std::memcpy(row, o.data(), sizeof(double) * w);
    }
  // along h
  for (int zz = 0; zz < d; ++zz)
    for (int x = 0; x < w; ++x) {
      for (int y = 0; y < h; ++y) f[y] = grid[(size_t(zz) * h + y) * w + x];
      dt1d(f.data(), o.data(), h, v, z);
      for (int y = 0; y < h; ++y) grid[(size_t(zz) * h + y) * w + x] = o[y];
    }
  // along d
  if (d > 1) {
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        for (int zz = 0; zz < d; ++zz) f[zz] = grid[(size_t(zz) * h + y) * w + x];
        dt1d(f.data(), o.data(), d, v, z);
        for (int zz = 0; zz < d; ++zz) grid[(size_t(zz) * h + y) * w + x] = o[zz];
      }
  }
}

// boundary = mask & ~erosion(mask); erosion with the 1-connectivity cross
// (faces only), zero padding outside (scipy binary_erosion border_value=0,
// so every masked voxel touching the volume border is boundary).
void boundary(const uint8_t* m, uint8_t* out, int d, int h, int w, bool is2d) {
  auto at = [&](int zz, int y, int x) -> uint8_t {
    if (zz < 0 || zz >= d || y < 0 || y >= h || x < 0 || x >= w) return 0;
    return m[(size_t(zz) * h + y) * w + x];
  };
  for (int zz = 0; zz < d; ++zz)
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        size_t i = (size_t(zz) * h + y) * w + x;
        if (!m[i]) {
          out[i] = 0;
          continue;
        }
        bool eroded = at(zz, y - 1, x) && at(zz, y + 1, x) && at(zz, y, x - 1) &&
                      at(zz, y, x + 1);
        if (!is2d) eroded = eroded && at(zz - 1, y, x) && at(zz + 1, y, x);
        out[i] = eroded ? 0 : 1;
      }
}

double percentile_linear(std::vector<double>& vals, double pct) {
  if (vals.empty()) return 0.0;
  std::sort(vals.begin(), vals.end());
  double idx = (vals.size() - 1) * pct / 100.0;
  size_t lo = size_t(idx);
  size_t hi = std::min(lo + 1, vals.size() - 1);
  double frac = idx - double(lo);
  return vals[lo] + frac * (vals[hi] - vals[lo]);
}

}  // namespace

extern "C" {

// Squared EDT to the nearest feature (nonzero) voxel. out: double[d*h*w].
void edt_sq(const uint8_t* mask, double* out, int d, int h, int w) {
  size_t n = size_t(d) * h * w;
  for (size_t i = 0; i < n; ++i) out[i] = mask[i] ? 0.0 : kInf;
  edt3_sq(out, d, h, w);
}

// HD95 between two masks (medpy convention). is2d selects the 2-D
// structuring element for single-slice inputs. Returns -1 on empty borders.
double hd95(const uint8_t* a, const uint8_t* b, int d, int h, int w, int is2d) {
  size_t n = size_t(d) * h * w;
  std::vector<uint8_t> ba(n), bb(n);
  boundary(a, ba.data(), d, h, w, is2d);
  boundary(b, bb.data(), d, h, w, is2d);

  std::vector<double> dta(n), dtb(n);
  edt_sq(ba.data(), dta.data(), d, h, w);
  edt_sq(bb.data(), dtb.data(), d, h, w);

  std::vector<double> dists;
  dists.reserve(1024);
  for (size_t i = 0; i < n; ++i)
    if (ba[i]) dists.push_back(std::sqrt(dtb[i]));
  for (size_t i = 0; i < n; ++i)
    if (bb[i]) dists.push_back(std::sqrt(dta[i]));
  if (dists.empty()) return -1.0;
  return percentile_linear(dists, 95.0);
}

}  // extern "C"
