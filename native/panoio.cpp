// Native I/O runtime: fast RGBA PNG encode/decode on libpng/zlib.
//
// The reference's runtime layer is C++ (image I/O via OpenCV wrappers,
// CPU/util.cpp:19-46); this is the TPU framework's native counterpart:
// a small C core driving libpng directly with interlace-free, filter-
// tuned settings, exposed to Python over a plain C ABI (ctypes -- no
// pybind11 dependency).  Decode/encode avoid PIL's per-row Python
// overhead and release the GIL for the whole operation, so a host
// thread can stream the next panorama while the TPU stitches the
// current one (utils/native_io.py builds the double-buffered loader on
// top).
//
// Build: see native/build.sh (g++ -O3 -fPIC -shared -lpng -lz).

#include <png.h>
#include <zlib.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct MemReader {
  const unsigned char* data;
  size_t size;
  size_t pos;
};

void mem_read(png_structp png, png_bytep out, png_size_t n) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + n > r->size) {
    png_error(png, "read past end");
  }
  std::memcpy(out, r->data + r->pos, n);
  r->pos += n;
}

struct MemWriter {
  std::vector<unsigned char> buf;
};

void mem_write(png_structp png, png_bytep data, png_size_t n) {
  MemWriter* w = static_cast<MemWriter*>(png_get_io_ptr(png));
  w->buf.insert(w->buf.end(), data, data + n);
}

void mem_flush(png_structp) {}

}  // namespace

extern "C" {

// Decode a PNG buffer to RGBA8.  Returns 0 on success.  On the first
// call pass *out = nullptr and receive dimensions; the caller allocates
// h*w*4 bytes and calls again with the buffer.
int panoio_png_decode(const unsigned char* data, size_t size,
                      unsigned char* out, int* height, int* width) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -1;
  }
  MemReader reader{data, size, 0};
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  png_set_read_fn(png, &reader, mem_read);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  *height = static_cast<int>(h);
  *width = static_cast<int>(w);
  if (out == nullptr) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
  }

  // normalise everything to 8-bit RGBA
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (!(color_type & PNG_COLOR_MASK_ALPHA) &&
      !png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
  png_read_update_info(png, info);

  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = out + y * w * 4;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// Encode RGBA8 to PNG.  Returns the encoded size, or <0 on error.  Two
// phase: first call with out=nullptr to get the size upper bound is not
// supported -- instead the callback-grown buffer is copied into `out`
// (capacity `out_cap`); if too small, returns -(needed).
long panoio_png_encode(const unsigned char* rgba, int height, int width,
                       int compress_level, unsigned char* out,
                       size_t out_cap) {
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    return -1;
  }
  MemWriter writer;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    return -2;
  }
  png_set_write_fn(png, &writer, mem_write, mem_flush);
  png_set_IHDR(png, info, width, height, 8, PNG_COLOR_TYPE_RGBA,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_set_compression_level(png, compress_level);
  // SUB filter alone is a good speed/size point for photographic RGBA
  png_set_filter(png, 0, PNG_FILTER_SUB);
  png_write_info(png, info);

  std::vector<png_bytep> rows(height);
  for (int y = 0; y < height; ++y)
    rows[y] = const_cast<png_bytep>(rgba + static_cast<size_t>(y) * width * 4);
  png_write_image(png, rows.data());
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);

  if (writer.buf.size() > out_cap)
    return -static_cast<long>(writer.buf.size());
  std::memcpy(out, writer.buf.data(), writer.buf.size());
  return static_cast<long>(writer.buf.size());
}

}  // extern "C"
