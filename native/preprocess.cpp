// hicom-tpu native host preprocessing: batched frame resize + normalize.
//
// The reference pipeline maps Python/PIL transforms per frame
// (/root/reference/hicom/model/encoder.py:48-68); at TPU compression speeds the
// host becomes the bottleneck (SURVEY.md §7 "hard parts"), so the hot loop —
// uint8 RGB frames → bicubic-antialias resize → rescale → normalize → CHW
// float32 — runs here as a multithreaded C++ kernel.
//
// The resampler reproduces PIL's convolution-based resize (bicubic kernel
// a = -0.5, support 2.0, filter scaled by the downscale factor = antialias),
// in float32 (PIL uses 8.8 fixed point; agreement is within ~1e-2 of PIL's
// quantized output, far below the model's input noise floor).
//
// Build: make -C native   → libhicom_preprocess.so (loaded via ctypes).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline double bicubic(double x) {
  // Catmull-Rom-like kernel with a = -0.5 (PIL's BICUBIC).
  constexpr double a = -0.5;
  x = std::abs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct FilterTable {
  std::vector<float> coeffs;  // out_size * max_taps
  std::vector<int> bounds;    // out_size * 2: (first_tap_index, num_taps)
  int max_taps = 0;
};

// Precompute the 1-D resampling filter, PIL-style (support widened when
// downscaling = antialias).
FilterTable build_filter(int in_size, int out_size) {
  FilterTable ft;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 2.0 * filterscale;
  int max_taps = static_cast<int>(std::ceil(support)) * 2 + 1;
  ft.max_taps = max_taps;
  ft.coeffs.assign(static_cast<size_t>(out_size) * max_taps, 0.f);
  ft.bounds.assign(static_cast<size_t>(out_size) * 2, 0);

  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(std::max(0.0, std::floor(center - support)));
    int xmax = static_cast<int>(std::min(static_cast<double>(in_size), std::ceil(center + support)));
    int n = xmax - xmin;
    double total = 0.0;
    std::vector<double> w(n);
    for (int i = 0; i < n; ++i) {
      w[i] = bicubic((xmin + i - center + 0.5) / filterscale);
      total += w[i];
    }
    for (int i = 0; i < n; ++i) {
      ft.coeffs[static_cast<size_t>(xx) * max_taps + i] =
          total != 0.0 ? static_cast<float>(w[i] / total) : 0.f;
    }
    ft.bounds[xx * 2] = xmin;
    ft.bounds[xx * 2 + 1] = n;
  }
  return ft;
}

// Resize one H×W×3 uint8 image to out×out float (RGB interleaved).
void resize_one(const uint8_t* src, int h, int w, int out_h, int out_w,
                const FilterTable& fx, const FilterTable& fy, float* dst) {
  // horizontal pass: (h, out_w, 3)
  std::vector<float> tmp(static_cast<size_t>(h) * out_w * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      int xmin = fx.bounds[x * 2];
      int n = fx.bounds[x * 2 + 1];
      const float* cf = fx.coeffs.data() + static_cast<size_t>(x) * fx.max_taps;
      float r = 0.f, g = 0.f, b = 0.f;
      for (int i = 0; i < n; ++i) {
        const uint8_t* px = row + static_cast<size_t>(xmin + i) * 3;
        r += cf[i] * px[0];
        g += cf[i] * px[1];
        b += cf[i] * px[2];
      }
      // PIL keeps a uint8 intermediate between the two passes: round + clip
      // here so bicubic overshoot clamps identically.
      trow[x * 3 + 0] = std::round(std::min(std::max(r, 0.f), 255.f));
      trow[x * 3 + 1] = std::round(std::min(std::max(g, 0.f), 255.f));
      trow[x * 3 + 2] = std::round(std::min(std::max(b, 0.f), 255.f));
    }
  }
  // vertical pass: (out_h, out_w, 3)
  for (int y = 0; y < out_h; ++y) {
    int ymin = fy.bounds[y * 2];
    int n = fy.bounds[y * 2 + 1];
    const float* cf = fy.coeffs.data() + static_cast<size_t>(y) * fy.max_taps;
    float* drow = dst + static_cast<size_t>(y) * out_w * 3;
    std::memset(drow, 0, sizeof(float) * out_w * 3);
    for (int i = 0; i < n; ++i) {
      const float* trow = tmp.data() + static_cast<size_t>(ymin + i) * out_w * 3;
      float c = cf[i];
      for (int k = 0; k < out_w * 3; ++k) drow[k] += c * trow[k];
    }
  }
}

}  // namespace

extern "C" {

// frames: n × h × w × 3 uint8 (RGB). out: n × 3 × out_size × out_size float32,
// value = (clamp(resized,0,255) * rescale - mean[c]) / std[c].
void hicom_preprocess_frames(const uint8_t* frames, int n, int h, int w,
                             int out_size, float rescale, const float* mean,
                             const float* stddev, float* out, int num_threads) {
  FilterTable fx = build_filter(w, out_size);
  FilterTable fy = build_filter(h, out_size);
  const size_t per_in = static_cast<size_t>(h) * w * 3;
  const size_t plane = static_cast<size_t>(out_size) * out_size;
  const size_t per_out = 3 * plane;

  auto work = [&](int start, int step) {
    std::vector<float> hwc(per_out);
    for (int f = start; f < n; f += step) {
      resize_one(frames + f * per_in, h, w, out_size, out_size, fx, fy, hwc.data());
      float* dst = out + f * per_out;
      for (int c = 0; c < 3; ++c) {
        float m = mean[c], s = stddev[c];
        float* dp = dst + c * plane;
        const float* sp = hwc.data() + c;
        for (size_t i = 0; i < plane; ++i) {
          float v = sp[i * 3];
          v = std::min(std::max(v, 0.f), 255.f);  // PIL clips to uint8
          v = std::round(v);                       // PIL quantizes to uint8
          dp[i] = (v * rescale - m) / s;
        }
      }
    }
  };

  int threads = std::max(1, num_threads);
  if (threads == 1 || n == 1) {
    work(0, 1);
    return;
  }
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(work, t, threads);
  for (auto& th : pool) th.join();
}

// Pad an h×w×3 uint8 image to a square (max side), centered, fill = bg color.
void hicom_expand2square(const uint8_t* src, int h, int w, const uint8_t* bg,
                         uint8_t* dst) {
  int side = std::max(h, w);
  for (int y = 0; y < side; ++y) {
    uint8_t* drow = dst + static_cast<size_t>(y) * side * 3;
    for (int x = 0; x < side; ++x) {
      drow[x * 3 + 0] = bg[0];
      drow[x * 3 + 1] = bg[1];
      drow[x * 3 + 2] = bg[2];
    }
  }
  int off_y = (side - h) / 2;
  int off_x = (side - w) / 2;
  for (int y = 0; y < h; ++y) {
    std::memcpy(dst + (static_cast<size_t>(y + off_y) * side + off_x) * 3,
                src + static_cast<size_t>(y) * w * 3, static_cast<size_t>(w) * 3);
  }
}

}  // extern "C"
