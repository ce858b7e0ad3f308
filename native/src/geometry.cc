// Host-side mask geometry, C++ fast path.
//
// The reference delegates this work to OpenCV's C++ (findContours et al.,
// /root/reference/model_fuse.py, /root/reference/edge_3.py).  This library
// implements the two hot primitives the framework's post-processing layer
// calls per mask — everything else (areas, polygon simplification) runs on
// the traced contours, which are tiny:
//
//   bd_fill_holes     flood-fill background from the border (4-connected),
//                     invert: component pixels + interior holes
//   bd_find_contours  external contours of all top-level 8-connected
//                     components, Suzuki-Abe border following, point
//                     sequences identical to cv2's CHAIN_APPROX_NONE
//
// C ABI only; loaded from Python with ctypes (building_detection_tpu/post/
// _native.py).  Semantics are pinned by tests/test_geometry.py, which
// compares against both the NumPy fallback and cv2.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// out must be h*w bytes.  Writes 0/1.
int bd_fill_holes(const uint8_t* mask, int h, int w, uint8_t* out) {
  if (h <= 0 || w <= 0) return -1;
  const int n = h * w;
  // 0 = unknown background, 1 = foreground, 2 = outside background
  std::vector<uint8_t> state(n);
  for (int i = 0; i < n; ++i) state[i] = mask[i] ? 1 : 0;

  std::vector<int> stack;
  stack.reserve(2 * (h + w));
  auto push = [&](int y, int x) {
    const int idx = y * w + x;
    if (state[idx] == 0) {
      state[idx] = 2;
      stack.push_back(idx);
    }
  };
  for (int x = 0; x < w; ++x) { push(0, x); push(h - 1, x); }
  for (int y = 0; y < h; ++y) { push(y, 0); push(y, w - 1); }

  while (!stack.empty()) {
    const int idx = stack.back();
    stack.pop_back();
    const int y = idx / w, x = idx % w;
    if (y > 0) push(y - 1, x);
    if (y < h - 1) push(y + 1, x);
    if (x > 0) push(y, x - 1);
    if (x < w - 1) push(y, x + 1);
  }
  for (int i = 0; i < n; ++i) out[i] = (state[i] == 2) ? 0 : 1;
  return 0;
}

namespace {

// Moore neighbourhood, clockwise from west: W NW N NE E SE S SW
const int kDy[8] = {0, -1, -1, -1, 0, 1, 1, 1};
const int kDx[8] = {-1, -1, 0, 1, 1, 1, 0, -1};

inline int dir_of(int dy, int dx) {
  for (int k = 0; k < 8; ++k)
    if (kDy[k] == dy && kDx[k] == dx) return k;
  return 0;  // unreachable for valid neighbours
}

// Suzuki-Abe outer border following; fills (x, y) pairs into pts.
void trace_border(const uint8_t* filled, const int32_t* labels, int lbl,
                  int h, int w, int si, int sj, std::vector<int32_t>* pts) {
  auto pixel = [&](int y, int x) -> bool {
    return y >= 0 && y < h && x >= 0 && x < w && labels[y * w + x] == lbl;
  };
  // step 3.1: clockwise from west for the first neighbour
  int first = -1;
  for (int k = 0; k < 8; ++k) {
    if (pixel(si + kDy[k], sj + kDx[k])) { first = k; break; }
  }
  if (first < 0) {  // isolated pixel
    pts->push_back(sj);
    pts->push_back(si);
    return;
  }
  const int i1 = si + kDy[first], j1 = sj + kDx[first];
  int i2 = i1, j2 = j1;
  int i3 = si, j3 = sj;
  while (true) {
    const int d2 = dir_of(i2 - i3, j2 - j3);
    int found = -1;
    for (int step = 1; step <= 8; ++step) {
      const int k = ((d2 - step) % 8 + 8) % 8;  // counterclockwise
      if (pixel(i3 + kDy[k], j3 + kDx[k])) { found = k; break; }
    }
    pts->push_back(j3);
    pts->push_back(i3);
    const int i4 = i3 + kDy[found], j4 = j3 + kDx[found];
    if (i4 == si && j4 == sj && i3 == i1 && j3 == j1) break;
    i2 = i3; j2 = j3;
    i3 = i4; j3 = j4;
  }
}

}  // namespace

// External contours of top-level 8-connected components.
//
// Outputs (malloc'd; caller frees with bd_free):
//   *out_points   int32 (x, y) pairs, all contours concatenated
//   *out_offsets  int32 per-contour start offset into out_points, plus a
//                 final total-length entry (n_contours+1 entries, offsets in
//                 POINTS not ints)
// Returns the number of contours, or -1 on error.
int bd_find_contours(const uint8_t* mask, int h, int w,
                     int32_t** out_points, int32_t** out_offsets) {
  if (h <= 0 || w <= 0) return -1;
  const int n = h * w;
  std::vector<uint8_t> filled(n);
  if (bd_fill_holes(mask, h, w, filled.data()) != 0) return -1;

  // 8-connected labeling of the filled mask, raster order of discovery (the
  // same order the NumPy fallback's scipy labeling produces).
  std::vector<int32_t> labels(n, 0);
  std::vector<int> stack;
  int next_label = 0;
  std::vector<int> starts;  // index of first (topmost-left) pixel per label
  for (int i = 0; i < n; ++i) {
    if (!filled[i] || labels[i]) continue;
    ++next_label;
    starts.push_back(i);
    labels[i] = next_label;
    stack.push_back(i);
    while (!stack.empty()) {
      const int idx = stack.back();
      stack.pop_back();
      const int y = idx / w, x = idx % w;
      for (int k = 0; k < 8; ++k) {
        const int ny = y + kDy[k], nx = x + kDx[k];
        if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
        const int nidx = ny * w + nx;
        if (filled[nidx] && !labels[nidx]) {
          labels[nidx] = next_label;
          stack.push_back(nidx);
        }
      }
    }
  }

  std::vector<int32_t> points;
  std::vector<int32_t> offsets;
  offsets.reserve(next_label + 1);
  for (int lbl = 1; lbl <= next_label; ++lbl) {
    offsets.push_back(static_cast<int32_t>(points.size() / 2));
    const int start = starts[lbl - 1];
    trace_border(filled.data(), labels.data(), lbl, h, w,
                 start / w, start % w, &points);
  }
  offsets.push_back(static_cast<int32_t>(points.size() / 2));

  *out_points = static_cast<int32_t*>(malloc(points.size() * sizeof(int32_t)));
  *out_offsets =
      static_cast<int32_t*>(malloc(offsets.size() * sizeof(int32_t)));
  if (!*out_points || !*out_offsets) return -1;
  if (!points.empty())
    memcpy(*out_points, points.data(), points.size() * sizeof(int32_t));
  memcpy(*out_offsets, offsets.data(), offsets.size() * sizeof(int32_t));
  return next_label;
}

void bd_free(void* p) { free(p); }

}  // extern "C"
