// Native multithreaded PNG frame loader for playslot_tpu.
//
// The reference pipeline decodes episode frames one-by-one in Python
// DataLoader workers (reference src/data/BlockPush.py:85-91 via PIL). This
// loader decodes a whole frame batch in parallel C++ threads (libpng) with
// bilinear resize + [0,1] float32 normalization, exposed through a plain C
// ABI consumed via ctypes (no pybind11 in this image).
//
// Build: g++ -O2 -shared -fPIC frameloader.cpp -lpng -lz -lpthread
//        -o libframeloader.so

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Decode one PNG file to RGB8. Returns true on success.
bool decode_png(const char* path, std::vector<uint8_t>* rgb, int* w, int* h) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);

  // normalize every input variant to 8-bit RGB
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  rgb->resize(static_cast<size_t>(*w) * *h * 3);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y) rows[y] = rgb->data() + static_cast<size_t>(y) * *w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

// Bilinear resize RGB8 (sw x sh) -> float32 [0,1] (dw x dh), HWC layout.
void resize_to_float(const uint8_t* src, int sw, int sh, float* dst, int dw,
                     int dh) {
  if (sw == dw && sh == dh) {
    const size_t n = static_cast<size_t>(dw) * dh * 3;
    for (size_t i = 0; i < n; ++i) dst[i] = src[i] * (1.0f / 255.0f);
    return;
  }
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(static_cast<size_t>(y0) * sw + x0) * 3 + c];
        float v01 = src[(static_cast<size_t>(y0) * sw + x1) * 3 + c];
        float v10 = src[(static_cast<size_t>(y1) * sw + x0) * 3 + c];
        float v11 = src[(static_cast<size_t>(y1) * sw + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(static_cast<size_t>(y) * dw + x) * 3 + c] = v * (1.0f / 255.0f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode `n` PNG files into out[n, out_h, out_w, 3] float32 (preallocated by
// the caller). Uses up to `num_threads` worker threads. Returns the number
// of successfully decoded frames.
int fl_load_batch(const char** paths, int n, int out_h, int out_w, float* out,
                  int num_threads) {
  if (num_threads <= 0) num_threads = std::thread::hardware_concurrency();
  if (num_threads <= 0) num_threads = 4;
  if (num_threads > n) num_threads = n;

  std::atomic<int> next(0), ok(0);
  const size_t frame_elems = static_cast<size_t>(out_h) * out_w * 3;

  auto worker = [&]() {
    std::vector<uint8_t> rgb;
    int w = 0, h = 0;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (decode_png(paths[i], &rgb, &w, &h)) {
        resize_to_float(rgb.data(), w, h, out + frame_elems * i, out_w, out_h);
        ok.fetch_add(1);
      } else {
        std::memset(out + frame_elems * i, 0, frame_elems * sizeof(float));
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

}  // extern "C"
