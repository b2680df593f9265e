// Native RGB-D frame decoding for the SLAM data path.
//
// The reference feeds its SLAM loop through Python-side cv2/PIL decodes
// (utils/dataset.py __getitem__); its heavy lifting elsewhere is CUDA/C++.
// Here the per-frame hot path — PNG/JPEG decode, RGB -> float32 CHW [0,1],
// 16-bit depth PNG -> float32 meters — is a small C library (libpng /
// libjpeg / zlib) called from Python via ctypes. Calls release the GIL, so
// the Python-side prefetcher (slam/prefetch.py) overlaps frame decode with
// device compute on real threads.
//
// Build (done automatically by online_lang_splatting_tpu/native/__init__.py):
//   g++ -O3 -shared -fPIC frame_decode.cpp -o _frame_decode.so -lpng -ljpeg -lz
//
// C ABI (all return 0 on success, negative error codes otherwise):
//   fd_probe(path, &w, &h, &channels, &bit_depth)
//   fd_decode_rgb(path, out_chw, h, w)        // float32 (3,h,w) in [0,1]
//   fd_decode_depth16(path, out, h, w, scale) // float32 (h,w), value/scale

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <vector>

#include <png.h>

extern "C" {
#include <jpeglib.h>
}

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrSize = -3;
constexpr int kErrDecode = -4;

bool has_png_magic(FILE* f) {
  unsigned char sig[8];
  if (fread(sig, 1, 8, f) != 8) return false;
  rewind(f);
  return png_sig_cmp(sig, 0, 8) == 0;
}

struct PngReader {
  png_structp png = nullptr;
  png_infop info = nullptr;
  FILE* f = nullptr;
  ~PngReader() {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    if (f) fclose(f);
  }
};

int open_png(const char* path, PngReader& r) {
  r.f = fopen(path, "rb");
  if (!r.f) return kErrOpen;
  if (!has_png_magic(r.f)) return kErrFormat;
  r.png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                                 nullptr);
  if (!r.png) return kErrDecode;
  r.info = png_create_info_struct(r.png);
  if (!r.info) return kErrDecode;
  if (setjmp(png_jmpbuf(r.png))) return kErrDecode;
  png_init_io(r.png, r.f);
  png_read_info(r.png, r.info);
  return 0;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

int decode_jpeg_rgb(const char* path, float* out, int h, int w) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return kErrDecode;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != h || (int)cinfo.output_width != w) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return kErrSize;
  }
  std::vector<unsigned char> row(3 * w);
  const float inv = 1.0f / 255.0f;
  const int64_t plane = (int64_t)h * w;
  for (int y = 0; y < h; ++y) {
    unsigned char* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    for (int x = 0; x < w; ++x) {
      out[0 * plane + (int64_t)y * w + x] = row[3 * x + 0] * inv;
      out[1 * plane + (int64_t)y * w + x] = row[3 * x + 1] * inv;
      out[2 * plane + (int64_t)y * w + x] = row[3 * x + 2] * inv;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

}  // namespace

extern "C" {

int fd_probe(const char* path, int* w, int* h, int* channels,
             int* bit_depth) {
  PngReader r;
  int rc = open_png(path, r);
  if (rc == 0) {
    *w = png_get_image_width(r.png, r.info);
    *h = png_get_image_height(r.png, r.info);
    *channels = png_get_channels(r.png, r.info);
    *bit_depth = png_get_bit_depth(r.png, r.info);
    return 0;
  }
  if (rc != kErrFormat) return rc;
  // JPEG fallback.
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return kErrFormat;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  *channels = cinfo.num_components;
  *bit_depth = 8;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// float32 CHW RGB in [0,1]; PNG (any layout via libpng transforms) or JPEG.
int fd_decode_rgb(const char* path, float* out, int h, int w) {
  PngReader r;
  int rc = open_png(path, r);
  if (rc == kErrFormat || rc == kErrDecode) return decode_jpeg_rgb(path, out, h, w);
  if (rc != 0) return rc;
  if (setjmp(png_jmpbuf(r.png))) return kErrDecode;
  if ((int)png_get_image_height(r.png, r.info) != h ||
      (int)png_get_image_width(r.png, r.info) != w)
    return kErrSize;
  // Normalize to 8-bit RGB.
  png_set_expand(r.png);
  if (png_get_bit_depth(r.png, r.info) == 16) png_set_strip_16(r.png);
  png_set_strip_alpha(r.png);
  png_set_gray_to_rgb(r.png);
  png_read_update_info(r.png, r.info);
  if (png_get_channels(r.png, r.info) != 3) return kErrDecode;
  std::vector<unsigned char> row(3 * (size_t)w);
  const float inv = 1.0f / 255.0f;
  const int64_t plane = (int64_t)h * w;
  for (int y = 0; y < h; ++y) {
    png_read_row(r.png, row.data(), nullptr);
    for (int x = 0; x < w; ++x) {
      out[0 * plane + (int64_t)y * w + x] = row[3 * x + 0] * inv;
      out[1 * plane + (int64_t)y * w + x] = row[3 * x + 1] * inv;
      out[2 * plane + (int64_t)y * w + x] = row[3 * x + 2] * inv;
    }
  }
  return 0;
}

// 16-bit (or 8-bit) grayscale depth PNG -> float32 meters (value / scale).
int fd_decode_depth16(const char* path, float* out, int h, int w,
                      float scale) {
  PngReader r;
  int rc = open_png(path, r);
  if (rc != 0) return rc;
  if (setjmp(png_jmpbuf(r.png))) return kErrDecode;
  if ((int)png_get_image_height(r.png, r.info) != h ||
      (int)png_get_image_width(r.png, r.info) != w)
    return kErrSize;
  const int depth = png_get_bit_depth(r.png, r.info);
  if (png_get_channels(r.png, r.info) != 1) return kErrDecode;
  const float inv = 1.0f / scale;
  if (depth == 16) {
    std::vector<unsigned char> row(2 * (size_t)w);
    for (int y = 0; y < h; ++y) {
      png_read_row(r.png, row.data(), nullptr);
      for (int x = 0; x < w; ++x) {
        // PNG 16-bit samples are big-endian.
        uint16_t v = (uint16_t)((row[2 * x] << 8) | row[2 * x + 1]);
        out[(int64_t)y * w + x] = v * inv;
      }
    }
  } else if (depth == 8) {
    std::vector<unsigned char> row(w);
    for (int y = 0; y < h; ++y) {
      png_read_row(r.png, row.data(), nullptr);
      for (int x = 0; x < w; ++x) out[(int64_t)y * w + x] = row[x] * inv;
    }
  } else {
    return kErrDecode;
  }
  return 0;
}

}  // extern "C"
