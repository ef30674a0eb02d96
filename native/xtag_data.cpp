// Native data-plane for xtagclip_tpu: threaded JPEG decode + resize +
// center-crop producing uint8 RGB HWC crops ready for the device-side
// normalize/patch-embed fusion.
//
// This is the native-runtime counterpart of the reference's torchvision/PIL
// DataLoader worker chain (transform.py:274-390 + DataLoader workers): decode
// uses libjpeg's DCT scale-on-decode (decode at 1/2..1/8 resolution when the
// target is small — most of the IDCT work vanishes), then separable bilinear
// resize of the shortest side and a center crop.
//
// C ABI (ctypes):
//   xtag_decode_resize(jpeg_bytes, len, target, out[target*target*3]) -> 0 ok
//   xtag_decode_batch(ptrs, lens, n, target, out, n_threads) -> #ok
//   xtag_resize_crop_u8(src, h, w, target, out) -> 0 ok   (raw RGB input)
//   xtag_decode_rrc(jpeg, len, target, fx, fy, fw, fh, flip, out) -> 0 ok
//       (train-time RandomResizedCrop: fractional crop box + optional hflip,
//        the host side of reference transform.py:334-355)
//   xtag_decode_rrc_batch(ptrs, lens, n, target, boxes[n*4], flips[n],
//                         out, n_threads) -> #ok
//   xtag_jpeg_dims(jpeg, len, &h, &w) -> 0 ok          (header-only parse)
//   xtag_decode_square(jpeg, len, target, cap, out[cap*cap*3], &side) -> 0 ok
//       (device-preprocess host stage: M/8 DCT-scaled decode + square
//        center-crop by memcpy — minimum bytes over PCIe)
//   xtag_decode_square_batch(ptrs, lens, n, target, cap, out, sides[n],
//                            n_threads) -> #ok

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// bilinear resize of a source REGION [sy, sy+rh) x [sx, sx+rw), RGB u8,
// optional horizontal mirror of the output
void bilinear_resize_region(const uint8_t* src, int sh, int sw, float sx,
                            float sy, float rw, float rh, uint8_t* dst,
                            int dh, int dw, int flip) {
  const float ys = rh / dh;
  const float xs = rw / dw;
  std::vector<int> x0(dw), x1(dw);
  std::vector<float> xw(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = sx + (x + 0.5f) * xs - 0.5f;
    fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
    x0[x] = static_cast<int>(fx);
    x1[x] = std::min(x0[x] + 1, sw - 1);
    xw[x] = fx - x0[x];
  }
  for (int y = 0; y < dh; ++y) {
    float fy = sy + (y + 0.5f) * ys - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float wy = fy - y0;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * 3;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const int a = x0[x] * 3, b = x1[x] * 3;
      const float wx = xw[x];
      const int ox = flip ? (dw - 1 - x) : x;
      for (int c = 0; c < 3; ++c) {
        const float top = r0[a + c] + (r0[b + c] - r0[a + c]) * wx;
        const float bot = r1[a + c] + (r1[b + c] - r1[a + c]) * wx;
        out[ox * 3 + c] =
            static_cast<uint8_t>(std::lround(top + (bot - top) * wy));
      }
    }
  }
}

// separable bilinear resize, RGB u8
void bilinear_resize(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  const float ys = static_cast<float>(sh) / dh;
  const float xs = static_cast<float>(sw) / dw;
  std::vector<int> x0(dw), x1(dw);
  std::vector<float> xw(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * xs - 0.5f;
    fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
    x0[x] = static_cast<int>(fx);
    x1[x] = std::min(x0[x] + 1, sw - 1);
    xw[x] = fx - x0[x];
  }
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * ys - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float wy = fy - y0;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * 3;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const int a = x0[x] * 3, b = x1[x] * 3;
      const float wx = xw[x];
      for (int c = 0; c < 3; ++c) {
        const float top = r0[a + c] + (r0[b + c] - r0[a + c]) * wx;
        const float bot = r1[a + c] + (r1[b + c] - r1[a + c]) * wx;
        out[x * 3 + c] =
            static_cast<uint8_t>(std::lround(top + (bot - top) * wy));
      }
    }
  }
}

// resize shortest side to target then center-crop target x target
int resize_crop(const uint8_t* src, int sh, int sw, int target, uint8_t* out) {
  const float scale = std::max(static_cast<float>(target) / sh,
                               static_cast<float>(target) / sw);
  const int rh = std::max(target, static_cast<int>(std::lround(sh * scale)));
  const int rw = std::max(target, static_cast<int>(std::lround(sw * scale)));
  std::vector<uint8_t> resized(static_cast<size_t>(rh) * rw * 3);
  bilinear_resize(src, sh, sw, resized.data(), rh, rw);
  const int top = (rh - target) / 2;
  const int left = (rw - target) / 2;
  for (int y = 0; y < target; ++y) {
    std::memcpy(out + static_cast<size_t>(y) * target * 3,
                resized.data() + (static_cast<size_t>(y + top) * rw + left) * 3,
                static_cast<size_t>(target) * 3);
  }
  return 0;
}

// decode a JPEG into an RGB u8 buffer. `min_short_side` drives the DCT
// scale-on-decode choice: decode at the smallest M/8 scale (libjpeg-turbo
// supports every M in 1..8 during the IDCT, nearly free) whose output
// shortest side is still >= min_short_side. Callers bake their own quality
// margin into min_short_side (the host resize paths pass ~1.15x the crop
// target; the device-preprocess path passes the target exactly — the
// accelerator-side separable resampler takes it from there).
int decode_jpeg(const uint8_t* data, size_t len, int min_short_side,
                std::vector<uint8_t>* buf, int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  const int shortest = std::min(cinfo.image_width, cinfo.image_height);
  // smallest M with ceil(shortest * M / 8) >= min_short_side (jpeg rounds
  // output dims up, so shortest * M / 8 >= min_short suffices)
  int m = 8;
  if (min_short_side > 0 && shortest > min_short_side)
    m = std::max<long>(
        1, std::min<long>(8, (8L * min_short_side + shortest - 1) / shortest));
  cinfo.scale_num = m;
  cinfo.scale_denom = 8;
  cinfo.dct_method = JDCT_IFAST;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  const int comps = cinfo.output_components;
  buf->resize(static_cast<size_t>(h) * w * 3);
  std::vector<uint8_t> row(static_cast<size_t>(w) * comps);
  JSAMPROW rowp = row.data();
  for (int y = 0; y < h; ++y) {
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    uint8_t* dst = buf->data() + static_cast<size_t>(y) * w * 3;
    if (comps == 3) {
      std::memcpy(dst, row.data(), static_cast<size_t>(w) * 3);
    } else {  // grayscale -> RGB
      for (int x = 0; x < w; ++x)
        dst[x * 3] = dst[x * 3 + 1] = dst[x * 3 + 2] = row[x * comps];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_h = h;
  *out_w = w;
  return 0;
}

}  // namespace

extern "C" {

int xtag_resize_crop_u8(const uint8_t* src, int h, int w, int target,
                        uint8_t* out) {
  return resize_crop(src, h, w, target, out);
}

// decode one JPEG to a target x target RGB center crop; returns 0 on success
int xtag_decode_resize(const uint8_t* data, size_t len, int target,
                       uint8_t* out) {
  std::vector<uint8_t> buf;
  int h = 0, w = 0;
  // 1.15x quality margin: the host bilinear resample below wants a little
  // detail headroom over the crop target
  const int rc = decode_jpeg(data, len, (target * 23 + 19) / 20, &buf, &h, &w);
  if (rc != 0) return rc;
  return resize_crop(buf.data(), h, w, target, out);
}

// decode + RandomResizedCrop: fractional crop box (fx, fy, fw, fh) in [0,1]
// relative to the ORIGINAL image, bilinear resize to target x target,
// optional horizontal flip. Host side of reference transform.py:334-355.
int xtag_decode_rrc(const uint8_t* data, size_t len, int target, float fx,
                    float fy, float fw, float fh, int flip, uint8_t* out) {
  if (fw <= 0.0f || fh <= 0.0f || fx < 0.0f || fy < 0.0f ||
      fx + fw > 1.0001f || fy + fh > 1.0001f)
    return 3;
  // needed detail: the crop (fh/fw of the image) must still carry >= target
  // px, with the same 1.15x resample margin as the eval path
  const float min_frac = std::min(fw, fh);
  const int needed =
      static_cast<int>(std::ceil(1.15f * target / std::max(min_frac, 0.05f)));
  std::vector<uint8_t> buf;
  int h = 0, w = 0;
  const int rc = decode_jpeg(data, len, needed, &buf, &h, &w);
  if (rc != 0) return rc;
  bilinear_resize_region(buf.data(), h, w, fx * w, fy * h, fw * w, fh * h,
                         out, target, target, flip);
  return 0;
}

// threaded batch RRC decode; boxes is [n, 4] (fx, fy, fw, fh), flips is [n].
// returns the number of successful decodes; failures zero their slot.
int xtag_decode_rrc_batch(const uint8_t** datas, const size_t* lens, int n,
                          int target, const float* boxes,
                          const uint8_t* flips, uint8_t* out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), ok(0);
  const size_t stride = static_cast<size_t>(target) * target * 3;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      const float* b = boxes + static_cast<size_t>(i) * 4;
      if (xtag_decode_rrc(datas[i], lens[i], target, b[0], b[1], b[2], b[3],
                          flips ? flips[i] : 0, out + i * stride) == 0)
        ok.fetch_add(1);
      else
        std::memset(out + i * stride, 0, stride);
    }
  };
  std::vector<std::thread> threads;
  const int nt = std::min(n_threads, n);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// decode ONLY (device-side preprocess path: resize/crop/normalize run on
// the accelerator — ops/preprocess.py resize_crop_normalize): decode a JPEG
// at DCT-scaled resolution (shortest side kept >= ~1.15x needed_short) into
// a caller-provided zero-padded [cap_h, cap_w, 3] buffer, writing the true
// decoded dims. If the decode still exceeds the capacity (extreme aspect
// ratios), a bilinear shrink-to-fit preserves aspect. Returns 0 ok.
int xtag_decode_native(const uint8_t* data, size_t len, int needed_short,
                       int cap_h, int cap_w, uint8_t* out, int* out_h,
                       int* out_w) {
  std::vector<uint8_t> buf;
  int h = 0, w = 0;
  const int rc = decode_jpeg(data, len, needed_short, &buf, &h, &w);
  if (rc != 0) return rc;
  if (h > cap_h || w > cap_w) {
    const float fit = std::min(static_cast<float>(cap_h) / h,
                               static_cast<float>(cap_w) / w);
    const int nh = std::max(1, static_cast<int>(h * fit));
    const int nw = std::max(1, static_cast<int>(w * fit));
    std::vector<uint8_t> small(static_cast<size_t>(nh) * nw * 3);
    bilinear_resize(buf.data(), h, w, small.data(), nh, nw);
    buf.swap(small);
    h = nh;
    w = nw;
  }
  std::memset(out, 0, static_cast<size_t>(cap_h) * cap_w * 3);
  for (int y = 0; y < h; ++y)
    std::memcpy(out + static_cast<size_t>(y) * cap_w * 3,
                buf.data() + static_cast<size_t>(y) * w * 3,
                static_cast<size_t>(w) * 3);
  *out_h = h;
  *out_w = w;
  return 0;
}

// threaded batch native decode into [n, cap_h, cap_w, 3]; sizes is [n, 2]
// (h, w) int32, zeroed on failure. Returns the number of successful decodes.
int xtag_decode_native_batch(const uint8_t** datas, const size_t* lens, int n,
                             int needed_short, int cap_h, int cap_w,
                             uint8_t* out, int32_t* sizes, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), ok(0);
  const size_t stride = static_cast<size_t>(cap_h) * cap_w * 3;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      int h = 0, w = 0;
      if (xtag_decode_native(datas[i], lens[i], needed_short, cap_h, cap_w,
                             out + i * stride, &h, &w) == 0) {
        ok.fetch_add(1);
      } else {
        std::memset(out + i * stride, 0, stride);
      }
      sizes[i * 2] = h;
      sizes[i * 2 + 1] = w;
    }
  };
  std::vector<std::thread> threads;
  const int nt = std::min(n_threads, n);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// header-only parse: the encoded dimensions, no IDCT. Lets the Python side
// pick the padded-bucket capacity for a batch before decoding it.
int xtag_jpeg_dims(const uint8_t* data, size_t len, int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  *out_h = static_cast<int>(cinfo.image_height);
  *out_w = static_cast<int>(cinfo.image_width);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// minimum-bytes host stage for the device-preprocess path: decode at the
// smallest M/8 DCT scale with shortest side >= target, then CENTER-CROP TO
// SQUARE (pure row memcpy — the columns/rows a later
// resize-shortest-side-then-center-crop would discard never cross PCIe).
// The device resampler (ops/preprocess.resize_crop_normalize) turns the
// [side, side] square into the final [target, target] crop. Output is a
// zero-padded [cap, cap, 3] slab (static device shapes); side > cap falls
// back to a bilinear shrink-to-cap (extreme only: cap is chosen from the
// batch's own headers). Writes the true side; returns 0 ok.
int xtag_decode_square(const uint8_t* data, size_t len, int target, int cap,
                       uint8_t* out, int32_t* out_side) {
  std::vector<uint8_t> buf;
  int h = 0, w = 0;
  const int rc = decode_jpeg(data, len, target, &buf, &h, &w);
  if (rc != 0) return rc;
  int side = std::min(h, w);
  const int top = (h - side) / 2, left = (w - side) / 2;
  std::memset(out, 0, static_cast<size_t>(cap) * cap * 3);
  if (side <= cap) {
    for (int y = 0; y < side; ++y)
      std::memcpy(out + static_cast<size_t>(y) * cap * 3,
                  buf.data() + (static_cast<size_t>(y + top) * w + left) * 3,
                  static_cast<size_t>(side) * 3);
  } else {
    bilinear_resize_region(buf.data(), h, w, static_cast<float>(left),
                           static_cast<float>(top), static_cast<float>(side),
                           static_cast<float>(side), out, cap, cap, 0);
    // out rows are cap*3 wide == dst stride: full slab written
    side = cap;
  }
  *out_side = side;
  return 0;
}

// threaded batch square decode into [n, cap, cap, 3]; sides is [n] int32,
// zeroed on failure. Returns the number of successful decodes.
int xtag_decode_square_batch(const uint8_t** datas, const size_t* lens, int n,
                             int target, int cap, uint8_t* out,
                             int32_t* sides, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), ok(0);
  const size_t stride = static_cast<size_t>(cap) * cap * 3;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      int32_t side = 0;
      if (xtag_decode_square(datas[i], lens[i], target, cap, out + i * stride,
                             &side) == 0)
        ok.fetch_add(1);
      else
        std::memset(out + i * stride, 0, stride);
      sides[i] = side;
    }
  };
  std::vector<std::thread> threads;
  const int nt = std::min(n_threads, n);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// threaded batch decode; returns the number of successful decodes.
// failures leave zeros in the corresponding output slot.
int xtag_decode_batch(const uint8_t** datas, const size_t* lens, int n,
                      int target, uint8_t* out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), ok(0);
  const size_t stride = static_cast<size_t>(target) * target * 3;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      if (xtag_decode_resize(datas[i], lens[i], target, out + i * stride) == 0)
        ok.fetch_add(1);
      else
        std::memset(out + i * stride, 0, stride);
    }
  };
  std::vector<std::thread> threads;
  const int nt = std::min(n_threads, n);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

}  // extern "C"
