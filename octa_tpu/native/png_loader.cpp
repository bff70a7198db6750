// Native PNG loader with a thread-pool batch API.
//
// The reference feeds training through MONAI DataLoader worker *processes*
// doing PIL decodes per sample (reference data/image_dataset.py:80). Here the
// host-side IO path is a C++ libpng decoder with an OpenMP-free std::thread
// pool, ctypes-bound (see octa_tpu/native/__init__.py); the Python pipeline
// falls back to PIL when the toolchain or libpng is unavailable.
//
// API (C ABI):
//   png_probe(path, &w, &h, &c)        -> 0 ok / <0 error
//   png_read(path, out, w, h, c)       -> 0 ok; out must hold w*h*c uint8
//   png_read_batch(paths, n, outs, ws, hs, cs, threads) -> #ok
//
// Decodes to 8-bit; 16-bit PNGs are downshifted, palette/gray-alpha expanded.
// Channels: 1 (gray) or 3 (RGB); alpha is stripped.

#include <png.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Info {
  png_uint_32 w = 0, h = 0;
  int channels = 0;
};

// Read the transformed dimensions/channels. Returns 0 on success.
int read_png(const char* path, uint8_t* out, Info* info, bool header_only) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  unsigned char sig[8];
  if (fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) {
    fclose(f);
    return -2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop inf = png ? png_create_info_struct(png) : nullptr;
  if (!png || !inf) {
    if (png) png_destroy_read_struct(&png, &inf, nullptr);
    fclose(f);
    return -3;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &inf, nullptr);
    fclose(f);
    return -4;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, inf);

  png_byte color = png_get_color_type(png, inf);
  png_byte depth = png_get_bit_depth(png, inf);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (depth == 16) png_set_strip_16(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, inf);

  info->w = png_get_image_width(png, inf);
  info->h = png_get_image_height(png, inf);
  info->channels = png_get_channels(png, inf);

  if (!header_only && out != nullptr) {
    const size_t stride = (size_t)info->w * info->channels;
    std::vector<png_bytep> rows(info->h);
    for (png_uint_32 y = 0; y < info->h; ++y) rows[y] = out + y * stride;
    png_read_image(png, rows.data());
  }
  png_destroy_read_struct(&png, &inf, nullptr);
  fclose(f);
  return 0;
}

}  // namespace

extern "C" {

int png_probe(const char* path, int64_t* w, int64_t* h, int64_t* c) {
  Info info;
  int rc = read_png(path, nullptr, &info, /*header_only=*/true);
  if (rc != 0) return rc;
  *w = info.w;
  *h = info.h;
  *c = info.channels;
  return 0;
}

int png_read(const char* path, uint8_t* out, int64_t w, int64_t h, int64_t c) {
  Info info;
  int rc = read_png(path, out, &info, /*header_only=*/false);
  if (rc != 0) return rc;
  if ((int64_t)info.w != w || (int64_t)info.h != h ||
      (int64_t)info.channels != c)
    return -5;
  return 0;
}

// Decode n PNGs concurrently. outs[i] must hold ws[i]*hs[i]*cs[i] bytes
// (from a prior png_probe). Returns the number decoded successfully.
int64_t png_read_batch(const char** paths, int64_t n, uint8_t** outs,
                       const int64_t* ws, const int64_t* hs, const int64_t* cs,
                       int64_t threads) {
  if (threads < 1) threads = 1;
  if (threads > n) threads = n;
  std::vector<int64_t> ok(threads, 0);
  std::vector<std::thread> pool;
  for (int64_t t = 0; t < threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int64_t i = t; i < n; i += threads) {
        if (png_read(paths[i], outs[i], ws[i], hs[i], cs[i]) == 0) ok[t]++;
      }
    });
  }
  for (auto& th : pool) th.join();
  int64_t total = 0;
  for (int64_t v : ok) total += v;
  return total;
}

}  // extern "C"
