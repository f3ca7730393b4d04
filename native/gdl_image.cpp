// gdl_image — native JPEG decode + resize for the visual host pipeline.
//
// Decodes a JPEG file straight to a fixed RGB canvas (the loaders'
// canonical RAW_IMAGE_SIZE) using the system libjpeg, with libjpeg's DCT
// scaling to avoid decoding pixels that will be thrown away, then a box /
// bilinear resample. GIL-free via ctypes; the Python loader's thread pool
// scales it across cores.
//
// Filter note: PIL's Image.BILINEAR downscale is antialiased (triangle
// filter with widened support); this path uses DCT-scale + box-average +
// bilinear, which differs per-pixel at the level of resampling filters.
// It is therefore OPT-IN (GDL_NATIVE_JPEG=1) — augmentation-level
// difference, not a correctness one (tests bound the divergence).
//
// Build: make -C native  (links -ljpeg)

#include <cstddef>
#include <cstdio>

extern "C" {
#include <jpeglib.h>
}

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// bilinear resample [h, w, 3] u8 -> [out, out, 3] u8
void bilinear(const uint8_t* src, int h, int w, uint8_t* dst, int out) {
  const float sy = (float)h / out;
  const float sx = (float)w / out;
  for (int y = 0; y < out; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = (int)fy;
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    float wy = fy - y0;
    for (int x = 0; x < out; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = (int)fx;
      int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(y0 * w + x0) * 3 + c];
        float v01 = src[(y0 * w + x1) * 3 + c];
        float v10 = src[(y1 * w + x0) * 3 + c];
        float v11 = src[(y1 * w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(y * out + x) * 3 + c] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode `path` and resize to [out_size, out_size, 3] RGB into `out`.
// Returns 0 on success, negative on error.
int gdl_jpeg_decode_resize(const char* path, int32_t out_size,
                           uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  std::vector<uint8_t> pixels;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;  // corrupt stream
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // DCT scaling: decode at >= out_size but as small as possible
  for (unsigned denom = 8; denom >= 2; --denom) {
    if ((cinfo.image_width + denom - 1) / denom >= (unsigned)out_size &&
        (cinfo.image_height + denom - 1) / denom >= (unsigned)out_size) {
      cinfo.scale_num = 1;
      cinfo.scale_denom = denom;
      break;
    }
  }

  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  pixels.resize((size_t)w * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels.data() + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);

  bilinear(pixels.data(), h, w, out, out_size);
  return 0;
}

}  // extern "C"
