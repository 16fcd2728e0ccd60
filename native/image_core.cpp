// Native data-loading core: JPEG/PNG decode + resize/crop + normalize,
// multithreaded batch assembly into NHWC float32 buffers.
//
// The reference delegates this work to PIL inside torch DataLoader worker
// processes (ref dataset/tiktok_video_arnold_copy.py + train_tiktok.py:1128);
// here it is a small C++ library driven through ctypes
// (magicdance_tpu/data/native.py) so host-side preprocessing keeps TPU
// feeder threads off the Python GIL. Falls back to the PIL path when the
// shared library is not built.
//
// Build: make -C native   (produces libmdimage.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;  // RGB, HWC
  int h = 0, w = 0;
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(const uint8_t* buf, size_t len, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadCtx {
  const uint8_t* buf;
  size_t len, pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
  if (ctx->pos + n > ctx->len) {
    png_error(png, "png: read past end");
  }
  memcpy(out, ctx->buf + ctx->pos, n);
  ctx->pos += n;
}

bool decode_png(const uint8_t* buf, size_t len, Image* out) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadCtx ctx{buf, len, 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);
  png_uint_32 w, h;
  int depth, color;
  png_get_IHDR(png, info, &w, &h, &depth, &color, nullptr, nullptr, nullptr);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->w = int(w);
  out->h = int(h);
  out->data.resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n);
  if (fread(buf.data(), 1, n, f) != size_t(n)) {
    fclose(f);
    return false;
  }
  fclose(f);
  if (n > 2 && buf[0] == 0xFF && buf[1] == 0xD8)
    return decode_jpeg(buf.data(), n, out);
  return decode_png(buf.data(), n, out);
}

// bilinear resize of an HWC-RGB crop region into a size x size output
void resize_crop_bilinear(const Image& img, int top, int left, int ch, int cw,
                          int size, float scale, float offset, float* out) {
  const float sy = float(ch) / size;
  const float sx = float(cw) / size;
  for (int oy = 0; oy < size; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f + top;
    int y0 = std::clamp(int(std::floor(fy)), 0, img.h - 1);
    int y1 = std::min(y0 + 1, img.h - 1);
    float wy = fy - std::floor(fy);
    for (int ox = 0; ox < size; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f + left;
      int x0 = std::clamp(int(std::floor(fx)), 0, img.w - 1);
      int x1 = std::min(x0 + 1, img.w - 1);
      float wx = fx - std::floor(fx);
      for (int c = 0; c < 3; ++c) {
        float v00 = img.data[(size_t(y0) * img.w + x0) * 3 + c];
        float v01 = img.data[(size_t(y0) * img.w + x1) * 3 + c];
        float v10 = img.data[(size_t(y1) * img.w + x0) * 3 + c];
        float v11 = img.data[(size_t(y1) * img.w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        out[(size_t(oy) * size + ox) * 3 + c] = v * scale + offset;
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode `n` image files, center-square-crop (crop_mode=1) or full-frame
// (crop_mode=0), bilinear-resize to size x size, normalize v*scale+offset,
// write into out[n, size, size, 3] float32 NHWC. Returns count of failures.
int md_batch_load(const char** paths, int n, int size, int crop_mode,
                  float scale, float offset, float* out) {
  std::atomic<int> failures{0};
  int threads = std::max(1u, std::thread::hardware_concurrency());
  threads = std::min(threads, n > 0 ? n : 1);
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image img;
      float* dst = out + size_t(i) * size * size * 3;
      if (!decode_file(paths[i], &img) || img.h == 0) {
        memset(dst, 0, size_t(size) * size * 3 * sizeof(float));
        failures.fetch_add(1);
        continue;
      }
      int top = 0, left = 0, ch = img.h, cw = img.w;
      if (crop_mode == 1) {  // center square
        int s = std::min(img.h, img.w);
        top = (img.h - s) / 2;
        left = (img.w - s) / 2;
        ch = cw = s;
      }
      resize_crop_bilinear(img, top, left, ch, cw, size, scale, offset, dst);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failures.load();
}

// Decode `n` images and apply a seeded random-resized-crop per image
// (training augmentation, ref tiktok_video_arnold_copy.py train stack:
// RandomResizedCrop(size, scale=(lo,hi)) with square ratio). Crop params are
// a pure function of (seed, image dims): passing the SAME seed for a target
// frame and its pose map (identical dims) yields the identical crop, which
// is the reference's shared-transform-per-sample semantics. RNG is
// splitmix64 so the Python side can reproduce params exactly.
static inline uint64_t splitmix64(uint64_t* s) {
  uint64_t z = (*s += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

static inline double rng_uniform(uint64_t* s) {
  return double(splitmix64(s) >> 40) / 16777216.0;  // 24-bit mantissa
}

int md_batch_load_rrc(const char** paths, int n, int size,
                      const long long* seeds, float scale_lo, float scale_hi,
                      float scale, float offset, float* out) {
  std::atomic<int> failures{0};
  int threads = std::max(1u, std::thread::hardware_concurrency());
  threads = std::min(threads, n > 0 ? n : 1);
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image img;
      float* dst = out + size_t(i) * size * size * 3;
      if (!decode_file(paths[i], &img) || img.h == 0) {
        memset(dst, 0, size_t(size) * size * 3 * sizeof(float));
        failures.fetch_add(1);
        continue;
      }
      uint64_t s = uint64_t(seeds[i]);
      double area_frac = scale_lo + (scale_hi - scale_lo) * rng_uniform(&s);
      int side = int(std::lround(std::sqrt(area_frac * img.h * img.w)));
      side = std::max(1, std::min(side, std::min(img.h, img.w)));
      int top = int(rng_uniform(&s) * (img.h - side + 1));
      int left = int(rng_uniform(&s) * (img.w - side + 1));
      top = std::min(top, img.h - side);
      left = std::min(left, img.w - side);
      resize_crop_bilinear(img, top, left, side, side, size, scale, offset,
                           dst);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failures.load();
}

// Decode a single image, return dims via out params; caller provides buffer
// of h*w*3 (call with out=null first to query size).
int md_image_size(const char* path, int* h, int* w) {
  Image img;
  if (!decode_file(path, &img)) return -1;
  *h = img.h;
  *w = img.w;
  return 0;
}

}  // extern "C"
