// Native eval-harness ops: nearest-neighbor resize, histogram IoU, pixel
// accuracy, 3x3 gaussian blur.
//
// The reference (manuragkhullar/ConceptAttention) computes these per-image in
// Python/numpy inside the evaluation loop (concept_attention/utils.py:48-108,
// run_experiment.py:186-201). On this framework's target hosts the eval loop
// is host-CPU-bound between device steps, so the hot scalar loops live here.
// Built as a plain shared library (no pybind11 in the image); bound via
// ctypes in conceptattention_tpu/native.py with a numpy fallback.

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// dst[oh, ow] = src[i*h/oh, j*w/ow] (matches the harness' index mapping).
void nearest_resize_f32(const float* src, int64_t h, int64_t w,
                        float* dst, int64_t oh, int64_t ow) {
  for (int64_t i = 0; i < oh; ++i) {
    const int64_t si = std::min<int64_t>(i * h / oh, h - 1);
    const float* row = src + si * w;
    float* out = dst + i * ow;
    for (int64_t j = 0; j < ow; ++j) {
      out[j] = row[std::min<int64_t>(j * w / ow, w - 1)];
    }
  }
}

// Histogram intersection/union over class bins 1..nclass after a +1 shift
// (semantics of concept_attention/utils.py:85-108).
void hist_iou_i64(const int64_t* pred, const int64_t* target, int64_t n,
                  int64_t nclass, int64_t* inter, int64_t* uni) {
  // inter/uni must be zeroed by the caller; use local pred/label histograms.
  int64_t* area_pred = new int64_t[nclass]();
  int64_t* area_lab = new int64_t[nclass]();
  for (int64_t i = 0; i < n; ++i) {
    const int64_t t = target[i] + 1;
    int64_t p = pred[i] + 1;
    if (t <= 0) p = 0;  // predictions outside labeled pixels are dropped
    if (p >= 1 && p <= nclass) {
      area_pred[p - 1]++;
      if (p == t) inter[p - 1]++;
    }
    if (t >= 1 && t <= nclass) area_lab[t - 1]++;
  }
  for (int64_t c = 0; c < nclass; ++c) {
    uni[c] = area_pred[c] + area_lab[c] - inter[c];
  }
  delete[] area_pred;
  delete[] area_lab;
}

// out2 = {correct, labeled} pixel counts (utils.py:68-82 semantics).
void pix_acc_i64(const int64_t* pred, const int64_t* target, int64_t n,
                 int64_t* out2) {
  int64_t correct = 0, labeled = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t t = target[i] + 1;
    if (t > 0) {
      labeled++;
      if (pred[i] + 1 == t) correct++;
    }
  }
  out2[0] = correct;
  out2[1] = labeled;
}

// Separable 3x3 gaussian blur with reflect padding, sigma parameterized.
void gaussian_blur3_f32(const float* src, int64_t h, int64_t w,
                        float sigma, float* dst) {
  const float k1 = 1.0f;
  const float k0 = static_cast<float>(__builtin_expf(-1.0f / (2.0f * sigma * sigma)));
  const float norm = k0 + k1 + k0;
  float* tmp = new float[h * w];
  // horizontal
  for (int64_t i = 0; i < h; ++i) {
    const float* row = src + i * w;
    float* out = tmp + i * w;
    for (int64_t j = 0; j < w; ++j) {
      // reflect, clamped so 1-pixel-wide inputs stay in bounds
      const int64_t jl = j == 0 ? (w > 1 ? 1 : 0) : j - 1;
      const int64_t jr = j == w - 1 ? (w > 1 ? w - 2 : 0) : j + 1;
      out[j] = (k0 * row[jl] + k1 * row[j] + k0 * row[jr]) / norm;
    }
  }
  // vertical
  for (int64_t i = 0; i < h; ++i) {
    const int64_t iu = i == 0 ? (h > 1 ? 1 : 0) : i - 1;
    const int64_t id = i == h - 1 ? (h > 1 ? h - 2 : 0) : i + 1;
    for (int64_t j = 0; j < w; ++j) {
      dst[i * w + j] =
          (k0 * tmp[iu * w + j] + k1 * tmp[i * w + j] + k0 * tmp[id * w + j]) / norm;
    }
  }
  delete[] tmp;
}

}  // extern "C"
