// Sanitizer fuzz driver for the native geometry library.
//
// The reference delegates all mask geometry to OpenCV's compiled C++ and has
// no sanitizer/testing story at all (SURVEY.md §5).  This driver is the
// rebuild's memory-safety harness: it feeds adversarial and random masks
// through every exported entry point of geometry.cc under
// AddressSanitizer + UndefinedBehaviorSanitizer (`make -C native sanitize`),
// with differential checks against naive reimplementations where those are
// cheap (morphology, hole filling) and structural invariants everywhere
// else.  Any sanitizer report or invariant violation aborts the process, so
// the make target (and tests/test_native_sanitize.py, which runs it) fails.
//
// Determinism: a fixed-seed xorshift generator; iteration count from argv.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
int bd_fill_holes(const uint8_t* mask, int h, int w, uint8_t* out);
int bd_find_contours(const uint8_t* mask, int h, int w, int32_t** out_points,
                     int32_t** out_offsets);
int bd_morph(const uint8_t* img, int h, int w, int kh, int kw, int iters,
             int is_dilate, uint8_t* out);
int bd_process_mask(const uint8_t* mask, int h, int w, double min_area,
                    int split_k, int split_iters, double frag_area,
                    int do_split, uint8_t* out);
void bd_free(void* p);
}

namespace {

uint64_t g_state = 0x9e3779b97f4a7c15ull;

uint64_t next_u64() {
  uint64_t x = g_state;
  x ^= x << 13;
  x ^= x >> 7;
  x ^= x << 17;
  g_state = x;
  return x;
}

int rnd(int lo, int hi) {  // inclusive
  return lo + static_cast<int>(next_u64() % static_cast<uint64_t>(hi - lo + 1));
}

#define CHECK(cond, ...)                                             \
  do {                                                               \
    if (!(cond)) {                                                   \
      std::fprintf(stderr, "FUZZ INVARIANT FAILED %s:%d: ", __FILE__, \
                   __LINE__);                                        \
      std::fprintf(stderr, __VA_ARGS__);                             \
      std::fprintf(stderr, "\n");                                    \
      std::abort();                                                  \
    }                                                                \
  } while (0)

// ---------------------------------------------------------------- masks ---

// Fills mask (h*w, values 0/255) with one of several adversarial families.
void gen_mask(std::vector<uint8_t>* mask, int h, int w) {
  mask->assign(static_cast<size_t>(h) * w, 0);
  const int family = rnd(0, 7);
  switch (family) {
    case 0:  // uniform random density
    {
      const int pct = rnd(1, 95);
      for (auto& p : *mask) p = (rnd(0, 99) < pct) ? 255 : 0;
      break;
    }
    case 1:  // random filled rectangles (buildings)
    {
      const int k = rnd(1, 8);
      for (int i = 0; i < k; ++i) {
        const int y0 = rnd(0, h - 1), x0 = rnd(0, w - 1);
        const int y1 = rnd(y0, h - 1), x1 = rnd(x0, w - 1);
        for (int y = y0; y <= y1; ++y)
          for (int x = x0; x <= x1; ++x) (*mask)[static_cast<size_t>(y) * w + x] = 255;
      }
      break;
    }
    case 2:  // checkerboard (maximal contour count)
    {
      const int c = rnd(1, 3);
      for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x)
          (*mask)[static_cast<size_t>(y) * w + x] = (((y / c) + (x / c)) & 1) ? 255 : 0;
      break;
    }
    case 3:  // thin stripes (stress the axis erode-split)
    {
      const int horiz = rnd(0, 1), t = rnd(1, 4), gap = rnd(1, 4);
      for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x) {
          const int v = horiz ? y : x;
          (*mask)[static_cast<size_t>(y) * w + x] = (v % (t + gap) < t) ? 255 : 0;
        }
      break;
    }
    case 4:  // frame with interior holes (hole-fill stress)
    {
      for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x)
          if (y == 0 || x == 0 || y == h - 1 || x == w - 1)
            (*mask)[static_cast<size_t>(y) * w + x] = 255;
      const int k = rnd(0, 5);
      for (int i = 0; i < k; ++i)
        (*mask)[static_cast<size_t>(rnd(0, h - 1)) * w + rnd(0, w - 1)] = 255;
      break;
    }
    case 5:  // all foreground
      for (auto& p : *mask) p = 255;
      break;
    case 6:  // empty
      break;
    default:  // isolated pixels
    {
      const int k = rnd(1, 1 + h * w / 8);
      for (int i = 0; i < k; ++i)
        (*mask)[static_cast<size_t>(rnd(0, h - 1)) * w + rnd(0, w - 1)] = 255;
      break;
    }
  }
}

// ------------------------------------------------- naive reference impls ---

// Per-pixel BFS hole fill (4-connected background from the border).
void naive_fill_holes(const std::vector<uint8_t>& mask, int h, int w,
                      std::vector<uint8_t>* out) {
  const size_t n = static_cast<size_t>(h) * w;
  std::vector<uint8_t> outside(n, 0);
  std::vector<int> stack;
  auto push = [&](int y, int x) {
    const size_t i = static_cast<size_t>(y) * w + x;
    if (!mask[i] && !outside[i]) {
      outside[i] = 1;
      stack.push_back(static_cast<int>(i));
    }
  };
  for (int x = 0; x < w; ++x) { push(0, x); push(h - 1, x); }
  for (int y = 0; y < h; ++y) { push(y, 0); push(y, w - 1); }
  while (!stack.empty()) {
    const int idx = stack.back();
    stack.pop_back();
    const int y = idx / w, x = idx % w;
    if (y > 0) push(y - 1, x);
    if (y + 1 < h) push(y + 1, x);
    if (x > 0) push(y, x - 1);
    if (x + 1 < w) push(y, x + 1);
  }
  out->assign(n, 0);
  for (size_t i = 0; i < n; ++i) (*out)[i] = outside[i] ? 0 : 1;
}

// Direct (non-separable, non-iterated-window) morphology with cv2 borders.
void naive_morph(const std::vector<uint8_t>& img, int h, int w, int kh,
                 int kw, int iters, bool is_dilate,
                 std::vector<uint8_t>* out) {
  const int wh = iters * (kh - 1) + 1, ww = iters * (kw - 1) + 1;
  const int xlo = -(ww / 2), xhi = ww - 1 - ww / 2;
  const int ylo = -(wh / 2), yhi = wh - 1 - wh / 2;
  const uint8_t border = is_dilate ? 0 : 255;
  out->assign(static_cast<size_t>(h) * w, 0);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      uint8_t v = border;
      for (int dy = ylo; dy <= yhi; ++dy)
        for (int dx = xlo; dx <= xhi; ++dx) {
          const int yy = y + dy, xx = x + dx;
          const uint8_t s = (yy < 0 || yy >= h || xx < 0 || xx >= w)
                                ? border
                                : img[static_cast<size_t>(yy) * w + xx];
          v = is_dilate ? (s > v ? s : v) : (s < v ? s : v);
        }
      (*out)[static_cast<size_t>(y) * w + x] = v;
    }
}

// ------------------------------------------------------------ one round ---

void run_round(int h, int w) {
  std::vector<uint8_t> mask;
  gen_mask(&mask, h, w);
  const size_t n = static_cast<size_t>(h) * w;

  // bd_fill_holes: differential vs per-pixel BFS.
  std::vector<uint8_t> filled(n), naive(n);
  CHECK(bd_fill_holes(mask.data(), h, w, filled.data()) == 0, "fill rc");
  naive_fill_holes(mask, h, w, &naive);
  CHECK(std::memcmp(filled.data(), naive.data(), n) == 0,
        "fill_holes diverges from naive BFS (%dx%d)", h, w);

  // bd_find_contours: structural invariants + free round trip.
  int32_t* pts = nullptr;
  int32_t* offs = nullptr;
  const int nc = bd_find_contours(mask.data(), h, w, &pts, &offs);
  CHECK(nc >= 0, "find_contours rc (%dx%d)", h, w);
  CHECK(offs[0] == 0, "first offset");
  for (int i = 0; i < nc; ++i)
    CHECK(offs[i] < offs[i + 1], "offsets not strictly increasing");
  for (int32_t i = 0; i < offs[nc]; ++i) {
    const int32_t x = pts[2 * i], y = pts[2 * i + 1];
    CHECK(x >= 0 && x < w && y >= 0 && y < h, "contour point out of range");
    CHECK(mask[static_cast<size_t>(y) * w + x] != 0,
          "contour point on background");
  }
  bd_free(pts);
  bd_free(offs);

  // bd_morph: differential vs direct sliding-window on a random uint8 image
  // (not just binary — exercises the full min/max lattice).
  std::vector<uint8_t> img(n);
  for (auto& p : img) p = static_cast<uint8_t>(next_u64());
  const int kh = rnd(1, 7), kw = rnd(1, 7), iters = rnd(1, 5);
  for (int is_dilate = 0; is_dilate <= 1; ++is_dilate) {
    std::vector<uint8_t> got(n);
    CHECK(bd_morph(img.data(), h, w, kh, kw, iters, is_dilate, got.data()) == 0,
          "morph rc");
    naive_morph(img, h, w, kh, kw, iters, is_dilate, &naive);
    CHECK(std::memcmp(got.data(), naive.data(), n) == 0,
          "morph diverges from naive (%dx%d k=%dx%d it=%d dil=%d)", h, w, kh,
          kw, iters, is_dilate);
  }

  // bd_process_mask: reference constants plus downscaled ones so every
  // branch (keep-whole / split / drop) fires at fuzz sizes; invariants:
  // binary output, and output ⊆ hole-filled input (axis-aligned opening
  // cannot create pixels outside the filled component set).
  struct Cfg { double min_area; int k, it; double frag; int split; };
  const Cfg cfgs[] = {
      {1000.0, 5, 5, 500.0, 1},  // fusion pass constants (model_fuse.py)
      {100.0, 7, 1, 50.0, 1},    // edge pass constants (edge_3.py)
      {4.0, 3, 1, 2.0, 1},       // downscaled: splits actually happen
      {4.0, 3, 1, 2.0, 0},       // fill/delete only
  };
  for (const Cfg& c : cfgs) {
    std::vector<uint8_t> got(n, 0xAA);
    CHECK(bd_process_mask(mask.data(), h, w, c.min_area, c.k, c.it, c.frag,
                          c.split, got.data()) == 0,
          "process_mask rc");
    for (size_t i = 0; i < n; ++i) {
      CHECK(got[i] == 0 || got[i] == 255, "process_mask non-binary output");
      CHECK(!(got[i] && !filled[i]), "process_mask escaped the filled set");
    }
  }
}

}  // namespace

int main(int argc, char** argv) {
  const int iterations = argc > 1 ? std::atoi(argv[1]) : 400;

  // Invalid-argument paths must fail cleanly without touching outputs.
  uint8_t dummy_in = 255, dummy_out = 7;
  int32_t* p = nullptr;
  int32_t* o = nullptr;
  CHECK(bd_fill_holes(&dummy_in, 0, 1, &dummy_out) == -1, "fill h=0");
  CHECK(bd_find_contours(&dummy_in, 1, 0, &p, &o) == -1, "contours w=0");
  CHECK(bd_morph(&dummy_in, 1, 1, 0, 1, 1, 0, &dummy_out) == -1, "morph kh=0");
  CHECK(bd_morph(&dummy_in, 1, 1, 1, 1, 0, 0, &dummy_out) == -1, "morph it=0");
  CHECK(bd_process_mask(&dummy_in, -1, 1, 0, 5, 5, 0, 1, &dummy_out) == -1,
        "process h<0");
  CHECK(bd_process_mask(&dummy_in, 1, 1, 0, 0, 5, 0, 1, &dummy_out) == -1,
        "process k=0 with split");
  CHECK(dummy_out == 7, "error path wrote output");

  // Degenerate shapes every round hits once.
  const int fixed[][2] = {{1, 1}, {1, 23}, {23, 1}, {2, 2}, {3, 64}, {64, 3}};
  for (const auto& s : fixed) run_round(s[0], s[1]);

  for (int i = 0; i < iterations; ++i) {
    const int h = rnd(1, 96), w = rnd(1, 96);
    run_round(h, w);
    if ((i + 1) % 100 == 0)
      std::fprintf(stderr, "fuzz %d/%d rounds ok\n", i + 1, iterations);
  }
  std::printf("native geometry fuzz: %d rounds clean\n", iterations);
  return 0;
}
