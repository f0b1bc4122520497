// Exact connected-component speckle filter — host-side native kernel.
//
// The TPU disparity engine suppresses speckles with a windowed count
// approximation (stereo/sgm.py::_speckle_suppress); this C++ kernel provides
// the exact cv2.filterSpeckles semantics (reference depth_map.py:894-906 uses
// speckleWindowSize=100, speckleRange=32 inside SGBM): flood-fill 4-connected
// components of similar disparity, invalidate components smaller than
// max_speckle_size. Exposed through ctypes (stereovision_tpu/ops/native.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdlib>
#include <vector>

extern "C" {

// disp: float32 HxW, modified in place; invalid pixels set to new_val.
// Returns the number of invalidated pixels.
int64_t filter_speckles(float* disp, int32_t h, int32_t w, float new_val,
                        int32_t max_speckle_size, float max_diff) {
  std::vector<int32_t> label(static_cast<size_t>(h) * w, 0);
  std::vector<int32_t> stack;
  std::vector<int32_t> comp;
  stack.reserve(1024);
  comp.reserve(1024);
  int32_t cur = 0;
  int64_t removed = 0;

  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      const int32_t p0 = y * w + x;
      if (label[p0] != 0) continue;
      ++cur;
      comp.clear();
      stack.clear();
      stack.push_back(p0);
      label[p0] = cur;
      while (!stack.empty()) {
        const int32_t p = stack.back();
        stack.pop_back();
        comp.push_back(p);
        const float dp = disp[p];
        const int32_t py = p / w, px = p % w;
        const int32_t nb[4] = {p - w, p + w, p - 1, p + 1};
        const bool ok[4] = {py > 0, py + 1 < h, px > 0, px + 1 < w};
        for (int k = 0; k < 4; ++k) {
          if (!ok[k]) continue;
          const int32_t q = nb[k];
          if (label[q] == 0 && std::abs(disp[q] - dp) <= max_diff) {
            label[q] = cur;
            stack.push_back(q);
          }
        }
      }
      if (static_cast<int32_t>(comp.size()) <= max_speckle_size) {
        for (const int32_t p : comp) disp[p] = new_val;
        removed += static_cast<int64_t>(comp.size());
      }
    }
  }
  return removed;
}

}  // extern "C"
