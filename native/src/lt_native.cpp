// lightly-train-tpu native inference pre/post-processing.
//
// C++ rebuild of the reference's C++ inference utilities
// (examples/cpp/common/detection_utils.hpp:1-171): exact bilinear resize +
// ImageNet normalization of uint8 HWC images into planar CHW float32, and
// LT-DETR detection postprocessing (score/label decode over sigmoid logits,
// top-k selection, cxcywh -> xyxy pixel-coordinate rescale) matching the
// Python/JAX processors bit-for-bit at float32 precision.
//
// Exposed as a C ABI for ctypes binding (no pybind11 in this toolchain).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Bilinear resize (half-pixel centers, matching jax/PIL bilinear) of a
// uint8 HWC image to out_h x out_w, then normalize to planar CHW float32:
// out[c][y][x] = (pixel / 255 - mean[c]) / std[c].
void lt_preprocess_image(
    const uint8_t* img, int in_h, int in_w, int channels,
    int out_h, int out_w,
    const float* mean, const float* stddev,
    float* out /* channels * out_h * out_w */) {
  const float sy = static_cast<float>(in_h) / out_h;
  const float sx = static_cast<float>(in_w) / out_w;
  for (int y = 0; y < out_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::min(std::max(fy, 0.0f), static_cast<float>(in_h - 1));
    const int y0 = static_cast<int>(std::floor(fy));
    const int y1 = std::min(y0 + 1, in_h - 1);
    const float wy = fy - y0;
    for (int x = 0; x < out_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::min(std::max(fx, 0.0f), static_cast<float>(in_w - 1));
      const int x0 = static_cast<int>(std::floor(fx));
      const int x1 = std::min(x0 + 1, in_w - 1);
      const float wx = fx - x0;
      for (int c = 0; c < channels; ++c) {
        const float p00 = img[(y0 * in_w + x0) * channels + c];
        const float p01 = img[(y0 * in_w + x1) * channels + c];
        const float p10 = img[(y1 * in_w + x0) * channels + c];
        const float p11 = img[(y1 * in_w + x1) * channels + c];
        const float v = p00 * (1 - wx) * (1 - wy) + p01 * wx * (1 - wy) +
                        p10 * (1 - wx) * wy + p11 * wx * wy;
        out[(c * out_h + y) * out_w + x] =
            (v / 255.0f - mean[c]) / stddev[c];
      }
    }
  }
}

// LT-DETR detection postprocess: logits (Q, num_classes) raw (pre-sigmoid),
// boxes (Q, 4) normalized cxcywh. Selects the global top-k (query, class)
// pairs by sigmoid score, rescales boxes to xyxy pixel coordinates of an
// (img_h, img_w) image. Outputs: boxes_out (k, 4), scores_out (k,),
// labels_out (k,). Returns the number of detections written.
int lt_postprocess_detections(
    const float* logits, const float* boxes,
    int num_queries, int num_classes,
    int img_h, int img_w, int top_k, float score_threshold,
    float* boxes_out, float* scores_out, int* labels_out) {
  const int total = num_queries * num_classes;
  std::vector<int> idx(total);
  std::iota(idx.begin(), idx.end(), 0);
  std::vector<float> scores(total);
  for (int i = 0; i < total; ++i) {
    scores[i] = 1.0f / (1.0f + std::exp(-logits[i]));
  }
  const int k = std::min(top_k, total);
  std::partial_sort(idx.begin(), idx.begin() + k, idx.end(),
                    [&](int a, int b) { return scores[a] > scores[b]; });
  int n = 0;
  for (int i = 0; i < k; ++i) {
    const int flat = idx[i];
    if (scores[flat] < score_threshold) break;
    const int q = flat / num_classes;
    const int cls = flat % num_classes;
    const float cx = boxes[q * 4 + 0] * img_w;
    const float cy = boxes[q * 4 + 1] * img_h;
    const float w = boxes[q * 4 + 2] * img_w;
    const float h = boxes[q * 4 + 3] * img_h;
    boxes_out[n * 4 + 0] = cx - w / 2;
    boxes_out[n * 4 + 1] = cy - h / 2;
    boxes_out[n * 4 + 2] = cx + w / 2;
    boxes_out[n * 4 + 3] = cy + h / 2;
    scores_out[n] = scores[flat];
    labels_out[n] = cls;
    ++n;
  }
  return n;
}

// Per-pixel argmax over class logits (semantic-segmentation postprocess):
// logits (H, W, C) float32 -> mask (H, W) int32.
void lt_postprocess_semantic(
    const float* logits, int h, int w, int num_classes, int32_t* mask) {
  for (int i = 0; i < h * w; ++i) {
    const float* p = logits + i * num_classes;
    int best = 0;
    float best_v = p[0];
    for (int c = 1; c < num_classes; ++c) {
      if (p[c] > best_v) {
        best_v = p[c];
        best = c;
      }
    }
    mask[i] = best;
  }
}

}  // extern "C"
