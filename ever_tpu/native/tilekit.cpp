// tilekit — native host-side data-path kernels for ever_tpu.
//
// The reference gets its host data path from torch's C++ DataLoader
// machinery (pin-memory copies, vectorized PIL/albumentations ops backed by
// C). ever_tpu's loader is Python-thread based; these kernels move the two
// measured host hot spots into C++ with the GIL released:
//
//   1. tile gather + dihedral augmentation from a big uint8 scene
//      (GeoTileDataset's per-sample crop+flip/rot90, cf. reference
//      preprocess/segm.py RandomHorizontalFlip/RandomRotate90K semantics)
//   2. fused (x - mean) / std normalize + dtype conversion
//      (reference preprocess/function.py:9 th_mean_std_normalize) with
//      direct uint8 -> float32/bfloat16 output.
//
// C ABI only (consumed via ctypes). No external deps; C++17 + std::thread.
//
// Build: python -m ever_tpu.native.build   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

inline int nthreads_for(int64_t work_items) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  int64_t t = std::min<int64_t>(hw, work_items);
  return static_cast<int>(std::max<int64_t>(t, 1));
}

template <typename F>
void parallel_for(int64_t n, F&& body) {
  int nt = nthreads_for(n);
  if (nt <= 1) {
    for (int64_t i = 0; i < n; ++i) body(i);
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    ts.emplace_back([=]() {
      for (int64_t i = t; i < n; i += nt) body(i);
    });
  }
  for (auto& th : ts) th.join();
}

// round-to-nearest-even float32 -> bfloat16 (as uint16 payload).
// NaN must short-circuit: the rounding increment can carry a low-mantissa
// NaN (e.g. 0x7F800001) into the infinity encoding, silently laundering
// nodata sentinels into +/-Inf (numpy's astype preserves a quiet NaN).
inline uint16_t f32_to_bf16(float f) {
  uint32_t u;
  std::memcpy(&u, &f, 4);
  if ((u & 0x7FFFFFFFu) > 0x7F800000u)          // NaN (any payload)
    return static_cast<uint16_t>((u >> 16) | 0x0040u);  // quiet-NaN payload
  u += 0x7FFFu + ((u >> 16) & 1u);
  return static_cast<uint16_t>(u >> 16);
}

// map output (r, c) of a d4-transformed T x T tile to source (sr, sc).
// code 0..3: rot90(k=code) counter-clockwise (numpy rot90 convention);
// +4: horizontal flip (flip columns) applied BEFORE the rotation.
inline void d4_src(int code, int T, int r, int c, int* sr, int* sc) {
  int rr, cc;
  switch (code & 3) {  // out(r,c) = in(rr,cc) for rot90(k)
    case 0: rr = r;          cc = c;          break;
    case 1: rr = c;          cc = T - 1 - r;  break;  // k=1: out[r,c]=in[c, T-1-r]
    case 2: rr = T - 1 - r;  cc = T - 1 - c;  break;
    default: rr = T - 1 - c; cc = r;          break;  // k=3
  }
  if (code & 4) cc = T - 1 - cc;  // hflip of the INPUT
  *sr = rr;
  *sc = cc;
}

}  // namespace

extern "C" {

// Gather N fixed-size tiles from a uint8 HWC scene, applying a per-tile
// dihedral-group code (0..7; rotations require th == tw).
// scene: [H, W, C] u8 contiguous; boxes: [N, 2] int64 (y0, x0);
// codes: [N] int32 or nullptr; out: [N, th, tw, C] u8.
int ever_extract_tiles_u8(const uint8_t* scene, int64_t H, int64_t W,
                          int64_t C, const int64_t* boxes,
                          const int32_t* codes, int64_t N, int64_t th,
                          int64_t tw, uint8_t* out) {
  if (!scene || !boxes || !out || C <= 0 || th <= 0 || tw <= 0) return -1;
  // validate on the host thread (no data races, fail before any writes)
  for (int64_t i = 0; i < N; ++i) {
    int64_t y0 = boxes[2 * i], x0 = boxes[2 * i + 1];
    if (y0 < 0 || x0 < 0 || y0 + th > H || x0 + tw > W) return -2;
    int code = codes ? codes[i] : 0;
    if (code < 0 || code > 7) return -3;
    if (code != 0 && th != tw) return -4;  // d4 transforms need square tiles
  }
  const int64_t row_bytes = tw * C;
  parallel_for(N, [=](int64_t i) {
    int64_t y0 = boxes[2 * i], x0 = boxes[2 * i + 1];
    int code = codes ? codes[i] : 0;
    uint8_t* dst = out + i * th * tw * C;
    if (code == 0) {  // fast path: straight memcpy rows
      for (int64_t r = 0; r < th; ++r) {
        std::memcpy(dst + r * row_bytes,
                    scene + ((y0 + r) * W + x0) * C, row_bytes);
      }
      return;
    }
    int T = static_cast<int>(th);  // square when rotating; th for flips
    for (int64_t r = 0; r < th; ++r) {
      for (int64_t c = 0; c < tw; ++c) {
        int sr, sc;
        d4_src(code, T, static_cast<int>(r), static_cast<int>(c), &sr, &sc);
        std::memcpy(dst + (r * tw + c) * C,
                    scene + ((y0 + sr) * W + (x0 + sc)) * C, C);
      }
    }
  });
  return 0;
}

// Fused normalize: out = (in - mean[c]) / std[c], uint8 HWC -> float32.
// in: [N, H, W, C] u8; mean/std: [C] f32; out: [N, H, W, C] f32.
int ever_normalize_u8_f32(const uint8_t* in, int64_t n_pixels, int64_t C,
                          const float* mean, const float* stdv, float* out) {
  if (!in || !mean || !stdv || !out || C <= 0 || C > 64) return -1;
  float inv[64], mu[64];
  for (int64_t c = 0; c < C; ++c) {
    inv[c] = 1.0f / stdv[c];
    mu[c] = mean[c];
  }
  const int64_t chunk = 1 << 16;
  const int64_t n_chunks = (n_pixels + chunk - 1) / chunk;
  parallel_for(n_chunks, [=](int64_t k) {
    int64_t lo = k * chunk, hi = std::min(n_pixels, lo + chunk);
    const uint8_t* src = in + lo * C;
    float* dst = out + lo * C;
    for (int64_t p = lo; p < hi; ++p) {
      for (int64_t c = 0; c < C; ++c) {
        *dst++ = (static_cast<float>(*src++) - mu[c]) * inv[c];
      }
    }
  });
  return 0;
}

// Same, but emits bfloat16 (uint16 payload) — halves host->HBM transfer
// for bf16 training (the model casts its input to bf16 anyway).
int ever_normalize_u8_bf16(const uint8_t* in, int64_t n_pixels, int64_t C,
                           const float* mean, const float* stdv,
                           uint16_t* out) {
  if (!in || !mean || !stdv || !out || C <= 0 || C > 64) return -1;
  float inv[64], mu[64];
  for (int64_t c = 0; c < C; ++c) {
    inv[c] = 1.0f / stdv[c];
    mu[c] = mean[c];
  }
  const int64_t chunk = 1 << 16;
  const int64_t n_chunks = (n_pixels + chunk - 1) / chunk;
  parallel_for(n_chunks, [=](int64_t k) {
    int64_t lo = k * chunk, hi = std::min(n_pixels, lo + chunk);
    const uint8_t* src = in + lo * C;
    uint16_t* dst = out + lo * C;
    for (int64_t p = lo; p < hi; ++p) {
      for (int64_t c = 0; c < C; ++c) {
        *dst++ = f32_to_bf16((static_cast<float>(*src++) - mu[c]) * inv[c]);
      }
    }
  });
  return 0;
}

// Gather N tiles and emit them in 2x2 space-to-depth layout
// [N, th/2, tw/2, 4*C] (channel order (dy*2+dx)*C + c — the layout
// ever_tpu encoders consume with stem='s2d_input').  No augmentation codes:
// the s2d fold is applied after any geometric aug in the python pipeline.
int ever_extract_tiles_s2d_u8(const uint8_t* scene, int64_t H, int64_t W,
                              int64_t C, const int64_t* boxes, int64_t N,
                              int64_t th, int64_t tw, uint8_t* out) {
  if (!scene || !boxes || !out || C <= 0 || th <= 0 || tw <= 0) return -1;
  if ((th | tw) & 1) return -5;  // tile dims must be even
  for (int64_t i = 0; i < N; ++i) {
    int64_t y0 = boxes[2 * i], x0 = boxes[2 * i + 1];
    if (y0 < 0 || x0 < 0 || y0 + th > H || x0 + tw > W) return -2;
  }
  const int64_t oh = th / 2, ow = tw / 2, oc = 4 * C;
  parallel_for(N, [=](int64_t i) {
    int64_t y0 = boxes[2 * i], x0 = boxes[2 * i + 1];
    uint8_t* dst = out + i * oh * ow * oc;
    for (int64_t r = 0; r < oh; ++r) {
      const uint8_t* row0 = scene + ((y0 + 2 * r) * W + x0) * C;
      const uint8_t* row1 = row0 + W * C;
      uint8_t* d = dst + r * ow * oc;
      for (int64_t c2 = 0; c2 < ow; ++c2) {
        // output channels: (0,0), (0,1), (1,0), (1,1) blocks of C
        std::memcpy(d, row0 + 2 * c2 * C, 2 * C);        // dy=0: dx=0,1
        std::memcpy(d + 2 * C, row1 + 2 * c2 * C, 2 * C);  // dy=1: dx=0,1
        d += oc;
      }
    }
  });
  return 0;
}

// float32 -> bfloat16 bulk conversion (round-to-nearest-even).
int ever_f32_to_bf16(const float* in, int64_t n, uint16_t* out) {
  if (!in || !out) return -1;
  const int64_t chunk = 1 << 18;
  const int64_t n_chunks = (n + chunk - 1) / chunk;
  parallel_for(n_chunks, [=](int64_t k) {
    int64_t lo = k * chunk, hi = std::min(n, lo + chunk);
    for (int64_t i = lo; i < hi; ++i) out[i] = f32_to_bf16(in[i]);
  });
  return 0;
}

int ever_tilekit_abi_version() { return 1; }

}  // extern "C"
