// Monotonic Alignment Search — native host implementation.
//
// C++/OpenMP equivalent of the reference's Cython extension
// (Grad-TTS/model/monotonic_align/core.pyx:9-45): Viterbi DP + backtrace per
// batch element, parallelized over the batch. In this framework the on-device
// lax.scan implementation (tpu_speech/ops/monotonic_align.py) is the primary
// path; this native version serves host-side tooling (data preparation,
// alignment extraction pipelines) and as an independent oracle for tests.
//
// Built as a plain shared library (no Python.h); bound via ctypes.

#include <algorithm>
#include <cstdint>

namespace {

constexpr float kMaxNeg = -1e9f;

void maximum_path_each(int32_t* path, float* value, int t_x, int t_y,
                       int stride_x, int stride_y) {
  auto V = [&](int x, int y) -> float& {
    return value[x * stride_x + y * stride_y];
  };
  auto P = [&](int x, int y) -> int32_t& {
    return path[x * stride_x + y * stride_y];
  };

  for (int y = 0; y < t_y; ++y) {
    int x_lo = std::max(0, t_x + y - t_y);
    int x_hi = std::min(t_x, y + 1);
    for (int x = x_lo; x < x_hi; ++x) {
      float v_cur = (x == y) ? kMaxNeg : V(x, y - 1);
      float v_prev;
      if (x == 0) {
        v_prev = (y == 0) ? 0.0f : kMaxNeg;
      } else {
        v_prev = V(x - 1, y - 1);
      }
      V(x, y) += std::max(v_cur, v_prev);
    }
  }

  int index = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    P(index, y) = 1;
    if (index != 0 && (index == y || V(index, y - 1) < V(index - 1, y - 1))) {
      --index;
    }
  }
}

}  // namespace

extern "C" {

// paths: (b, t_x_max, t_y_max) int32, zero-initialized
// values: (b, t_x_max, t_y_max) float32 (log-prior * mask), modified in place
// t_xs, t_ys: (b,) int32 valid extents
void maximum_path_c(int32_t* paths, float* values, const int32_t* t_xs,
                    const int32_t* t_ys, int b, int t_x_max, int t_y_max) {
  const int plane = t_x_max * t_y_max;
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < b; ++i) {
    maximum_path_each(paths + i * plane, values + i * plane, t_xs[i], t_ys[i],
                      t_y_max, 1);
  }
}

}  // extern "C"
