// Threaded CT-slice decode + resize pool.
//
// The embedding pipeline's host-side bottleneck is image decode
// (SURVEY.md §7 "hard parts": the reference's per-image PIL loop cannot
// feed ≥5k slices/sec).  This pool decodes JPEG/PNG with
// libjpeg/libpng across a thread pool and resizes straight into a
// caller-provided contiguous uint8 batch buffer that device_put can
// consume without further copies.
//
// C ABI (ctypes-friendly):
//   emr2a_decode_batch(paths, n, out, out_h, out_w, n_threads, ok)
//     paths:   array of n C strings
//     out:     n * out_h * out_w * 3 uint8 buffer (RGB)
//     ok:      n uint8 flags (1 = decoded, 0 = failed -> row zeroed)
//
// Resize: box-filter area averaging when downscaling (antialiased,
// cv2.INTER_AREA-like), bilinear when upscaling.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<unsigned char> data;  // H*W*3 RGB
  int h = 0, w = 0;
};

// ---------------------------------------------------------------- JPEG

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->data.resize(size_t(out->h) * out->w * 3);
  const int stride = out->w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out->data.data() + size_t(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG

bool decode_png(FILE* f, Image* out) {
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
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // Normalize every variant to 8-bit RGB.
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->h = int(h);
  out->w = int(w);
  out->data.resize(size_t(h) * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++)
    rows[y] = out->data.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8 && magic[2] == 0xFF) {
    ok = decode_jpeg(f, out);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok && out->h > 0 && out->w > 0;
}

// --------------------------------------------------------------- resize

// Area-average (downscale) / bilinear (upscale) into dst (dh*dw*3).
void resize_rgb(const Image& src, unsigned char* dst, int dh, int dw) {
  if (src.h == dh && src.w == dw) {
    std::memcpy(dst, src.data.data(), size_t(dh) * dw * 3);
    return;
  }
  const bool down = dh <= src.h && dw <= src.w;
  if (down) {
    const double sy = double(src.h) / dh, sx = double(src.w) / dw;
    for (int y = 0; y < dh; y++) {
      int y0 = int(std::floor(y * sy));
      int y1 = std::max(y0 + 1, int(std::ceil((y + 1) * sy)));
      y1 = std::min(y1, src.h);
      for (int x = 0; x < dw; x++) {
        int x0 = int(std::floor(x * sx));
        int x1 = std::max(x0 + 1, int(std::ceil((x + 1) * sx)));
        x1 = std::min(x1, src.w);
        int acc[3] = {0, 0, 0};
        int cnt = (y1 - y0) * (x1 - x0);
        for (int yy = y0; yy < y1; yy++) {
          const unsigned char* row = src.data.data() + (size_t(yy) * src.w + x0) * 3;
          for (int xx = x0; xx < x1; xx++) {
            acc[0] += row[0];
            acc[1] += row[1];
            acc[2] += row[2];
            row += 3;
          }
        }
        unsigned char* o = dst + (size_t(y) * dw + x) * 3;
        o[0] = (unsigned char)(acc[0] / cnt);
        o[1] = (unsigned char)(acc[1] / cnt);
        o[2] = (unsigned char)(acc[2] / cnt);
      }
    }
  } else {  // bilinear upscale
    const double sy = double(src.h - 1) / std::max(dh - 1, 1);
    const double sx = double(src.w - 1) / std::max(dw - 1, 1);
    for (int y = 0; y < dh; y++) {
      double fy = y * sy;
      int y0 = int(fy);
      int y1 = std::min(y0 + 1, src.h - 1);
      double wy = fy - y0;
      for (int x = 0; x < dw; x++) {
        double fx = x * sx;
        int x0 = int(fx);
        int x1 = std::min(x0 + 1, src.w - 1);
        double wx = fx - x0;
        unsigned char* o = dst + (size_t(y) * dw + x) * 3;
        for (int c = 0; c < 3; c++) {
          double v00 = src.data[(size_t(y0) * src.w + x0) * 3 + c];
          double v01 = src.data[(size_t(y0) * src.w + x1) * 3 + c];
          double v10 = src.data[(size_t(y1) * src.w + x0) * 3 + c];
          double v11 = src.data[(size_t(y1) * src.w + x1) * 3 + c];
          double v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                     v10 * wy * (1 - wx) + v11 * wy * wx;
          o[c] = (unsigned char)(v + 0.5);
        }
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode n files into out (n, out_h, out_w, 3) uint8 with a thread pool.
// ok[i] = 1 on success; failed rows are zeroed (skip-and-continue).
int emr2a_decode_batch(const char** paths, int n, unsigned char* out,
                       int out_h, int out_w, int n_threads,
                       unsigned char* ok) {
  if (n <= 0) return 0;
  if (n_threads <= 0) n_threads = int(std::thread::hardware_concurrency());
  n_threads = std::max(1, std::min(n_threads, n));
  const size_t row_bytes = size_t(out_h) * out_w * 3;

  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      Image img;
      unsigned char* dst = out + size_t(i) * row_bytes;
      if (decode_file(paths[i], &img)) {
        resize_rgb(img, dst, out_h, out_w);
        ok[i] = 1;
      } else {
        std::memset(dst, 0, row_bytes);
        ok[i] = 0;
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();

  int n_ok = 0;
  for (int i = 0; i < n; i++) n_ok += ok[i];
  return n_ok;
}

}  // extern "C"
