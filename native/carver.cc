// Native scalar reference carver — the framework's CPU-side "second oracle".
//
// A fresh C++ implementation of the executable spec in
// dct_carver_tpu/oracle/reference.py (NOT a copy of the GPL reference plugin;
// written from the documented semantics, citations therein):
//   * per-blocksize DCT conventions: orthonormal for 8/16
//     (reference src/fft2d/shrtdct.c:190-205), unnormalized case-2 ddct2d for
//     2/4 (src/fft2d/fftsg2d.c:200-211)
//   * max |AC| with last-tie-wins over the transposed block (kx outer),
//     edge atoms (0,1)/(1,0) weighted by `edges`, others by `textures`
//     (src/dct.c:96-110, LUTs :10-43)
//   * window offsets -r+1..r, positions clamped (src/render.c:146-151)
//   * f32 energy (gfloat), DP M[i,j] = E + min3 with leftmost-min ties,
//     visibility map in original coordinates (src/render.c:204-240)
//
// Roles: independent parity check for the JAX/Pallas paths, the
// "single-core CPU reference run" of BASELINE config 1, and a fast native
// energy/carve for hosts without an accelerator.
//
// Built as a shared library (see dct_carver_tpu/utils/native.py) and bound
// via ctypes — no pybind11 dependency.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846264338327950288;

// D[k*n + j] = DCT-II basis, rows = frequency; per-size convention.
void dct_matrix(int n, double* D) {
  for (int k = 0; k < n; ++k)
    for (int j = 0; j < n; ++j)
      D[k * n + j] = std::cos(kPi * (j + 0.5) * k / n);
  if (n == 8 || n == 16) {
    for (int k = 0; k < n; ++k) {
      double s = std::sqrt((k == 0 ? 1.0 : 2.0) / n);
      for (int j = 0; j < n; ++j) D[k * n + j] *= s;
    }
  }
}

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// Energy of the window centered (reference geometry) at (y, x).
// luma: buffer with row stride `stride`; window clamps to logical width `w`.
float pixel_energy(const double* luma, int H, int stride, int w, int y, int x,
                   int n, const double* D, float edges, float textures,
                   double* scratch) {
  const int r = n / 2;
  double* win = scratch;          // window, image orientation [dy][dx]
  double* t1 = scratch + n * n;   // D @ win
  double* t2 = scratch + 2 * n * n;  // D @ win @ D^T = coeff[ky][kx]
  for (int a = 0; a < n; ++a) {
    const int yy = clampi(y + a - (r - 1), 0, H - 1);
    for (int b = 0; b < n; ++b) {
      const int xx = clampi(x + b - (r - 1), 0, w - 1);
      win[a * n + b] = luma[yy * stride + xx];
    }
  }
  // t1 = D * win ; t2 = t1 * D^T
  for (int k = 0; k < n; ++k)
    for (int b = 0; b < n; ++b) {
      double acc = 0.0;
      for (int a = 0; a < n; ++a) acc += D[k * n + a] * win[a * n + b];
      t1[k * n + b] = acc;
    }
  for (int k = 0; k < n; ++k)
    for (int l = 0; l < n; ++l) {
      double acc = 0.0;
      for (int b = 0; b < n; ++b) acc += t1[k * n + b] * D[l * n + b];
      t2[k * n + l] = acc;  // [ky][kx]
    }
  // scan the TRANSPOSED block row-major (kx outer), `max <= cur` tie rule
  double maxv = 0.0;
  int kxm = 0, kym = 0;
  for (int kx = 0; kx < n; ++kx)
    for (int ky = 0; ky < n; ++ky) {
      const double cur = std::fabs(t2[ky * n + kx]);
      if (maxv <= cur && (kx || ky)) {
        maxv = cur;
        kxm = kx;
        kym = ky;
      }
    }
  const bool edge = (kxm == 0 && kym == 1) || (kxm == 1 && kym == 0);
  return static_cast<float>(maxv) * (edge ? edges : textures);
}

// f32-chain energy: replays the JAX production path's exact arithmetic
// (dct_carver_tpu/ops/dct.py `energy_from_bands`) — float taps (f64 basis
// rounded to f32), stage-1 chain ascending in dy, stage-2 chain ascending in
// dx, running max with last-tie-wins on rank = kx*n + ky.  Every mul/add is
// a separate exactly-rounded IEEE f32 op (the TU is compiled with
// -ffp-contract=off, see utils/native.py), so the value is bit-equal to the
// XLA/Pallas chains and seams can be compared seam-for-seam at f32.
float pixel_energy_f32(const float* luma, int H, int stride, int w, int y,
                       int x, int n, const double* D, float edges,
                       float textures, float* scratch) {
  const int r = n / 2;
  float* win = scratch;         // window, image orientation [dy][dx]
  float* V = scratch + n * n;   // stage-1: V[ky][dx]
  for (int a = 0; a < n; ++a) {
    const int yy = clampi(y + a - (r - 1), 0, H - 1);
    for (int b = 0; b < n; ++b) {
      const int xx = clampi(x + b - (r - 1), 0, w - 1);
      win[a * n + b] = luma[yy * stride + xx];
    }
  }
  for (int ky = 0; ky < n; ++ky)
    for (int dx = 0; dx < n; ++dx) {
      float v = static_cast<float>(D[ky * n + 0]) * win[0 * n + dx];
      for (int dy = 1; dy < n; ++dy)
        v = v + static_cast<float>(D[ky * n + dy]) * win[dy * n + dx];
      V[ky * n + dx] = v;
    }
  float maxval = -std::numeric_limits<float>::infinity();
  int winner = -1;
  for (int ky = 0; ky < n; ++ky) {
    const int kx0 = ky == 0 ? 1 : 0;  // DC excluded
    for (int kx = kx0; kx < n; ++kx) {
      float t = static_cast<float>(D[kx * n + 0]) * V[ky * n + 0];
      for (int dx = 1; dx < n; ++dx)
        t = t + static_cast<float>(D[kx * n + dx]) * V[ky * n + dx];
      const float a = std::fabs(t);
      const int rank = kx * n + ky;
      if (a > maxval) {
        maxval = a;
        winner = rank;
      } else if (a == maxval && rank > winner) {
        winner = rank;
      }
    }
  }
  const bool edge = winner == 1 || winner == n;
  return maxval * (edge ? edges : textures);
}

}  // namespace

extern "C" {

// Full energy map: luma (H*W f64) -> out (H*W f32).
void dc_energy_map(const double* luma, int H, int W, int blocksize,
                   float edges, float textures, float* out) {
  std::vector<double> D(blocksize * blocksize);
  dct_matrix(blocksize, D.data());
  std::vector<double> scratch(3 * blocksize * blocksize);
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x)
      out[y * W + x] = pixel_energy(luma, H, W, W, y, x, blocksize, D.data(),
                                    edges, textures, scratch.data());
}

// Remove n_seams vertical seams; writes the int32 visibility map
// (original coordinates; k = removed as k-th seam) into vmap (H*W).
// Returns 0 on success, nonzero on bad arguments.
int dc_carve(const double* luma_in, int H, int W, int blocksize, float edges,
             float textures, int n_seams, int32_t* vmap, int tie_rightmost) {
  if (n_seams < 0 || n_seams >= W) return 1;
  if (!(blocksize == 2 || blocksize == 4 || blocksize == 8 || blocksize == 16))
    return 2;
  std::vector<double> D(blocksize * blocksize);
  dct_matrix(blocksize, D.data());
  std::vector<double> scratch(3 * blocksize * blocksize);

  std::vector<double> luma(luma_in, luma_in + size_t(H) * W);
  std::vector<int32_t> orig(size_t(H) * W);
  std::vector<float> E(size_t(H) * W);
  std::vector<float> M(size_t(H) * W);
  std::vector<int> seam(H);
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) orig[y * W + x] = x;
  std::memset(vmap, 0, sizeof(int32_t) * size_t(H) * W);

  int w = W;  // logical width
  const int n = blocksize;
  const int half = n + 1;  // strip half-width (matches ops/carve.py bounds)
  const float inf = std::numeric_limits<float>::infinity();

  // initial full energy
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < w; ++x)
      E[y * W + x] = pixel_energy(luma.data(), H, W, w, y, x, n, D.data(),
                                  edges, textures, scratch.data());

  for (int k = 1; k <= n_seams; ++k) {
    // DP over logical width w (f32, same op order as the spec)
    for (int x = 0; x < w; ++x) M[x] = E[x];
    for (int y = 1; y < H; ++y) {
      const float* prev = &M[(y - 1) * size_t(W)];
      float* cur = &M[y * size_t(W)];
      const float* e = &E[y * size_t(W)];
      for (int x = 0; x < w; ++x) {
        float left = x > 0 ? prev[x - 1] : inf;
        float right = x + 1 < w ? prev[x + 1] : inf;
        float m = std::min(std::min(left, prev[x]), right);
        cur[x] = e[x] + m;
      }
    }
    // tie-most argmin of last row (S1 knob: leftmost scans with <,
    // rightmost with <= so the last tied minimum wins)
    int j = 0;
    {
      const float* last = &M[(H - 1) * size_t(W)];
      float best = last[0];
      for (int x = 1; x < w; ++x)
        if (tie_rightmost ? (last[x] <= best) : (last[x] < best)) {
          best = last[x]; j = x;
        }
    }
    seam[H - 1] = j;
    for (int y = H - 2; y >= 0; --y) {
      const float* row = &M[y * size_t(W)];
      int lo = j > 0 ? j - 1 : 0;
      int hi = j + 1 < w ? j + 1 : w - 1;
      int arg = lo;
      float best = row[lo];
      for (int x = lo + 1; x <= hi; ++x)
        if (tie_rightmost ? (row[x] <= best) : (row[x] < best)) {
          best = row[x]; arg = x;
        }
      j = arg;
      seam[y] = j;
    }
    // record + remove
    for (int y = 0; y < H; ++y) {
      const int s = seam[y];
      vmap[y * size_t(W) + orig[y * size_t(W) + s]] = k;
      double* lrow = &luma[y * size_t(W)];
      int32_t* orow = &orig[y * size_t(W)];
      float* erow = &E[y * size_t(W)];
      for (int x = s; x + 1 < w; ++x) {
        lrow[x] = lrow[x + 1];
        orow[x] = orow[x + 1];
        erow[x] = erow[x + 1];
      }
    }
    --w;
    // strip recompute around each row's seam (full recompute equivalence is
    // guaranteed because energy is a pure function of the window)
    for (int y = 0; y < H; ++y) {
      int lo = seam[y] - half, hi = seam[y] + half + 1;
      if (lo < 0) lo = 0;
      if (hi >= w) hi = w - 1;
      for (int x = lo; x <= hi; ++x)
        E[y * size_t(W) + x] = pixel_energy(luma.data(), H, W, w, y, x, n,
                                            D.data(), edges, textures,
                                            scratch.data());
    }
  }
  return 0;
}

// f32-chain full energy map: luma (H*W f32) -> out (H*W f32).
void dc_energy_map_f32(const float* luma, int H, int W, int blocksize,
                       float edges, float textures, float* out) {
  std::vector<double> D(blocksize * blocksize);
  dct_matrix(blocksize, D.data());
  std::vector<float> scratch(2 * blocksize * blocksize);
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x)
      out[y * W + x] = pixel_energy_f32(luma, H, W, W, y, x, blocksize,
                                        D.data(), edges, textures,
                                        scratch.data());
}

// f32-chain carve: same contract as dc_carve but the energy is the
// production f32 chain, so seams are comparable to the shipping JAX config.
int dc_carve_f32(const float* luma_in, int H, int W, int blocksize,
                 float edges, float textures, int n_seams, int32_t* vmap,
                 int tie_rightmost) {
  if (n_seams < 0 || n_seams >= W) return 1;
  if (!(blocksize == 2 || blocksize == 4 || blocksize == 8 || blocksize == 16))
    return 2;
  std::vector<double> D(blocksize * blocksize);
  dct_matrix(blocksize, D.data());
  std::vector<float> scratch(2 * blocksize * blocksize);

  std::vector<float> luma(luma_in, luma_in + size_t(H) * W);
  std::vector<int32_t> orig(size_t(H) * W);
  std::vector<float> E(size_t(H) * W);
  std::vector<float> M(size_t(H) * W);
  std::vector<int> seam(H);
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) orig[y * W + x] = x;
  std::memset(vmap, 0, sizeof(int32_t) * size_t(H) * W);

  int w = W;
  const int n = blocksize;
  const int half = n + 1;  // strip half-width (matches ops/carve.py bounds)
  const float inf = std::numeric_limits<float>::infinity();

  for (int y = 0; y < H; ++y)
    for (int x = 0; x < w; ++x)
      E[y * W + x] = pixel_energy_f32(luma.data(), H, W, w, y, x, n, D.data(),
                                      edges, textures, scratch.data());

  for (int k = 1; k <= n_seams; ++k) {
    for (int x = 0; x < w; ++x) M[x] = E[x];
    for (int y = 1; y < H; ++y) {
      const float* prev = &M[(y - 1) * size_t(W)];
      float* cur = &M[y * size_t(W)];
      const float* e = &E[y * size_t(W)];
      for (int x = 0; x < w; ++x) {
        float left = x > 0 ? prev[x - 1] : inf;
        float right = x + 1 < w ? prev[x + 1] : inf;
        float m = std::min(std::min(left, prev[x]), right);
        cur[x] = e[x] + m;
      }
    }
    int j = 0;
    {
      const float* last = &M[(H - 1) * size_t(W)];
      float best = last[0];
      for (int x = 1; x < w; ++x)
        if (tie_rightmost ? (last[x] <= best) : (last[x] < best)) {
          best = last[x]; j = x;
        }
    }
    seam[H - 1] = j;
    for (int y = H - 2; y >= 0; --y) {
      const float* row = &M[y * size_t(W)];
      int lo = j > 0 ? j - 1 : 0;
      int hi = j + 1 < w ? j + 1 : w - 1;
      int arg = lo;
      float best = row[lo];
      for (int x = lo + 1; x <= hi; ++x)
        if (tie_rightmost ? (row[x] <= best) : (row[x] < best)) {
          best = row[x]; arg = x;
        }
      j = arg;
      seam[y] = j;
    }
    for (int y = 0; y < H; ++y) {
      const int s = seam[y];
      vmap[y * size_t(W) + orig[y * size_t(W) + s]] = k;
      float* lrow = &luma[y * size_t(W)];
      int32_t* orow = &orig[y * size_t(W)];
      float* erow = &E[y * size_t(W)];
      for (int x = s; x + 1 < w; ++x) {
        lrow[x] = lrow[x + 1];
        orow[x] = orow[x + 1];
        erow[x] = erow[x + 1];
      }
    }
    --w;
    for (int y = 0; y < H; ++y) {
      int lo = seam[y] - half, hi = seam[y] + half + 1;
      if (lo < 0) lo = 0;
      if (hi >= w) hi = w - 1;
      for (int x = lo; x <= hi; ++x)
        E[y * size_t(W) + x] = pixel_energy_f32(luma.data(), H, W, w, y, x, n,
                                                D.data(), edges, textures,
                                                scratch.data());
    }
  }
  return 0;
}

}  // extern "C"
