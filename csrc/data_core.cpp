// Native host-side data-loading core.
//
// The reference leans on PIL(-SIMD)/libjpeg for image decode and resize in
// its DataLoader workers (effdet/data/dataset.py:46, dataloader.py:112,
// preloader.py:133 — SURVEY §2.3). This library is the TPU build's native
// equivalent: libjpeg decode + PIL-compatible triangle-filter (BILINEAR)
// letterbox resize + a multithreaded batch loader that fills a fixed
// [B, TH, TW, 3] uint8 canvas ready for the fused on-device normalize.
// Plain C ABI, callable via ctypes (no pybind11 in this environment).
//
// Build: make -C csrc   (produces libdatacore.so)

#include <cstdio>   // jpeglib.h needs FILE declared first
#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg, error-resilient: returns rc instead of exit())
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Reads the header only. Returns 0 on success.
int jpeg_dims(const uint8_t* data, size_t len, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  *h = static_cast<int>(cinfo.image_height);
  *w = static_cast<int>(cinfo.image_width);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Full decode to tightly-packed RGB8 rows (grayscale/CMYK promoted to RGB).
int jpeg_decode_rgb(const uint8_t* data, size_t len, uint8_t* out,
                    int out_h, int out_w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_height) != out_h ||
      static_cast<int>(cinfo.output_width) != out_w ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  const size_t stride = static_cast<size_t>(out_w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + stride * cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------------------
// PIL-compatible BILINEAR (triangle filter) separable resize.
// Matches PIL's resample: when downscaling, the filter support widens by
// the scale factor (area-style averaging), which a naive 2x2 bilinear
// sample gets wrong.
// ---------------------------------------------------------------------------

struct FilterTaps {
  std::vector<int> xmin;     // first source index per output index
  std::vector<int> count;    // number of taps
  std::vector<float> weights;  // flattened [out, max_taps]
  int max_taps = 0;
};

FilterTaps build_taps(int in_size, int out_size) {
  FilterTaps t;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;  // triangle filter support
  t.max_taps = static_cast<int>(std::ceil(support)) * 2 + 1;
  t.xmin.resize(out_size);
  t.count.resize(out_size);
  t.weights.assign(static_cast<size_t>(out_size) * t.max_taps, 0.0f);
  for (int x = 0; x < out_size; ++x) {
    const double center = (x + 0.5) * scale;
    int lo = static_cast<int>(center - support + 0.5);
    int hi = static_cast<int>(center + support + 0.5);
    lo = std::max(lo, 0);
    hi = std::min(hi, in_size);
    double total = 0.0;
    std::vector<double> w(hi - lo);
    for (int i = lo; i < hi; ++i) {
      const double arg = (i - center + 0.5) / filterscale;
      const double v = std::abs(arg) < 1.0 ? 1.0 - std::abs(arg) : 0.0;
      w[i - lo] = v;
      total += v;
    }
    if (total == 0.0) {  // degenerate: nearest
      lo = std::min(std::max(static_cast<int>(center), 0), in_size - 1);
      hi = lo + 1;
      w.assign(1, 1.0);
      total = 1.0;
    }
    t.xmin[x] = lo;
    t.count[x] = hi - lo;
    for (int i = 0; i < hi - lo; ++i)
      t.weights[static_cast<size_t>(x) * t.max_taps + i] =
          static_cast<float>(w[i] / total);
  }
  return t;
}

// src: [sh, sw, 3] uint8 -> dst: [dh, dw, 3] uint8.
void resize_bilinear_pil(const uint8_t* src, int sh, int sw,
                         uint8_t* dst, int dh, int dw) {
  const FilterTaps tx = build_taps(sw, dw);
  const FilterTaps ty = build_taps(sh, dh);

  // horizontal pass: [sh, dw, 3] float
  std::vector<float> mid(static_cast<size_t>(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * sw * 3;
    float* mrow = mid.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float* w = &tx.weights[static_cast<size_t>(x) * tx.max_taps];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      const int lo = tx.xmin[x], n = tx.count[x];
      for (int i = 0; i < n; ++i) {
        const uint8_t* p = srow + static_cast<size_t>(lo + i) * 3;
        acc0 += w[i] * p[0];
        acc1 += w[i] * p[1];
        acc2 += w[i] * p[2];
      }
      mrow[x * 3 + 0] = acc0;
      mrow[x * 3 + 1] = acc1;
      mrow[x * 3 + 2] = acc2;
    }
  }
  // vertical pass -> uint8
  for (int y = 0; y < dh; ++y) {
    const float* w = &ty.weights[static_cast<size_t>(y) * ty.max_taps];
    const int lo = ty.xmin[y], n = ty.count[y];
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw * 3; ++x) {
      float acc = 0;
      for (int i = 0; i < n; ++i)
        acc += w[i] * mid[static_cast<size_t>(lo + i) * dw * 3 + x];
      drow[x] = static_cast<uint8_t>(
          std::min(std::max(acc + 0.5f, 0.0f), 255.0f));
    }
  }
}

// Decode one file's bytes and letterbox into dst [th, tw, 3] (top-left
// placement, zero fill — the reference ResizePad, transforms.py:75-107).
// Returns 0 ok; fills scale (original/target) and original (h, w).
int decode_letterbox(const uint8_t* bytes, size_t len, uint8_t* dst,
                     int th, int tw, float* scale, int* oh, int* ow) {
  int h = 0, w = 0;
  if (jpeg_dims(bytes, len, &h, &w)) return 1;
  std::vector<uint8_t> raw(static_cast<size_t>(h) * w * 3);
  if (jpeg_decode_rgb(bytes, len, raw.data(), h, w)) return 1;

  const double s = std::min(static_cast<double>(th) / h,
                            static_cast<double>(tw) / w);
  const int sh = static_cast<int>(h * s);
  const int sw = static_cast<int>(w * s);
  std::vector<uint8_t> resized(static_cast<size_t>(sh) * sw * 3);
  resize_bilinear_pil(raw.data(), h, w, resized.data(), sh, sw);

  std::memset(dst, 0, static_cast<size_t>(th) * tw * 3);
  for (int y = 0; y < sh; ++y)
    std::memcpy(dst + static_cast<size_t>(y) * tw * 3,
                resized.data() + static_cast<size_t>(y) * sw * 3,
                static_cast<size_t>(sw) * 3);
  *scale = static_cast<float>(1.0 / s);
  *oh = h;
  *ow = w;
  return 0;
}

std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> buf;
  FILE* f = std::fopen(path, "rb");
  if (!f) return buf;
  std::fseek(f, 0, SEEK_END);
  const long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n > 0) {
    buf.resize(static_cast<size_t>(n));
    if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) buf.clear();
  }
  std::fclose(f);
  return buf;
}

}  // namespace

extern "C" {

// Header-only probe. Returns 0 and fills (h, w) on success.
int dc_jpeg_dims(const uint8_t* data, long len, int* h, int* w) {
  return jpeg_dims(data, static_cast<size_t>(len), h, w);
}

// Decode to caller buffer out[h*w*3] (RGB8). Caller sizes via dc_jpeg_dims.
int dc_jpeg_decode(const uint8_t* data, long len, uint8_t* out,
                   int h, int w) {
  return jpeg_decode_rgb(data, static_cast<size_t>(len), out, h, w);
}

// PIL-BILINEAR-compatible resize of an RGB8 image.
void dc_resize_bilinear(const uint8_t* src, int sh, int sw,
                        uint8_t* dst, int dh, int dw) {
  resize_bilinear_pil(src, sh, sw, dst, dh, dw);
}

// Decode raw JPEG bytes + letterbox to [th, tw, 3] (top-left, zero fill).
int dc_decode_letterbox(const uint8_t* bytes, long len, uint8_t* dst,
                        int th, int tw, float* scale, int* oh, int* ow) {
  return decode_letterbox(bytes, static_cast<size_t>(len), dst, th, tw,
                          scale, oh, ow);
}

// Threaded batch loader: n_items NUL-terminated file paths (concatenated,
// offsets[i] = start of path i) -> out [n, th, tw, 3] uint8 canvases,
// scales [n] (original/target), sizes [n, 2] (h, w). rc[i] != 0 marks a
// failed item (canvas left zeroed) so callers can fall back per item.
// Returns the number of failures.
int dc_load_letterbox_batch(const char* paths, const long* offsets,
                            int n_items, int th, int tw, uint8_t* out,
                            float* scales, int* sizes, int* rc,
                            int n_threads) {
  if (n_threads <= 0)
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
  n_threads = std::max(1, std::min(n_threads, n_items));
  const size_t canvas = static_cast<size_t>(th) * tw * 3;

  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n_items) return;
      const char* path = paths + offsets[i];
      std::vector<uint8_t> bytes = read_file(path);
      int r = bytes.empty() ? 1 : 0;
      if (!r)
        r = decode_letterbox(bytes.data(), bytes.size(), out + canvas * i,
                             th, tw, &scales[i], &sizes[2 * i],
                             &sizes[2 * i + 1]);
      if (r) {
        std::memset(out + canvas * i, 0, canvas);
        scales[i] = 1.0f;
        sizes[2 * i] = sizes[2 * i + 1] = 0;
        failures.fetch_add(1);
      }
      rc[i] = r;
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failures.load();
}

}  // extern "C"
