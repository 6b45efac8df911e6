// Threaded JPEG batch decode for the data loader.
//
// Capability equivalent of the reference's host-side PIL decode
// (/root/reference/avssl/data/base_dataset.py:93-110, PIL.Image.open +
// CLIP preprocess), built for throughput: libjpeg decode with DCT
// prescaling (decode at 1/2, 1/4, 1/8 scale when the target is much
// smaller), bilinear shorter-side resize, center crop to a square uint8
// (size, size, 3) slot in the caller's batch buffer. Normalization (or the
// full CLIP bicubic preprocess) runs batched on device (data/image.py).
//
// API (ctypes, see speechclip_tpu/data/native.py):
//   jpegio_decode_batch(paths, n, out_size, out /*n*size*size*3 u8*/, threads)
//     -> 0 on success, else 1-based index of the first failed file.

#include <cstdint>
#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// bilinear resize HWC u8 -> HWC u8
void resize_bilinear(const std::vector<uint8_t>& in, int ih, int iw, int oh,
                     int ow, std::vector<uint8_t>* out) {
  out->resize(size_t(oh) * ow * 3);
  const float sy = float(ih) / oh, sx = float(iw) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::clamp(int(std::floor(fy)), 0, ih - 1);
    int y1 = std::min(y0 + 1, ih - 1);
    float wy = fy - std::floor(fy);
    if (fy < 0) wy = 0;
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::clamp(int(std::floor(fx)), 0, iw - 1);
      int x1 = std::min(x0 + 1, iw - 1);
      float wx = fx - std::floor(fx);
      if (fx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = in[(size_t(y0) * iw + x0) * 3 + c];
        float v01 = in[(size_t(y0) * iw + x1) * 3 + c];
        float v10 = in[(size_t(y1) * iw + x0) * 3 + c];
        float v11 = in[(size_t(y1) * iw + x1) * 3 + c];
        float v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                  wy * ((1 - wx) * v10 + wx * v11);
        (*out)[(size_t(y) * ow + x) * 3 + c] = uint8_t(v + 0.5f);
      }
    }
  }
}

// pixels/resized live in the caller so the setjmp frame holds no
// non-volatile automatics that are modified between setjmp and longjmp
// (C longjmp rule; destructing such an object would be UB)
bool decode_one(const char* path, int out_size, uint8_t* out,
                std::vector<uint8_t>* pixels, std::vector<uint8_t>* resized) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  // grayscale/YCbCr convert to RGB; CMYK/YCCK cannot (libjpeg only emits
  // CMYK for those) -> fail here so the caller's PIL fallback handles them
  cinfo.out_color_space = JCS_RGB;

  // DCT prescale: decode at the smallest scale >= out_size on the short side
  int short_side = std::min(cinfo.image_width, cinfo.image_height);
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  for (int denom = 2; denom <= 8; denom *= 2) {
    if (short_side / denom >= out_size)
      cinfo.scale_denom = denom;
    else
      break;
  }
  jpeg_start_decompress(&cinfo);
  const int iw = cinfo.output_width, ih = cinfo.output_height;
  pixels->resize(size_t(iw) * ih * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = pixels->data() + size_t(cinfo.output_scanline) * iw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);

  // shorter-side resize to out_size, then center crop (load_image_raw parity)
  int ow, oh;
  if (iw <= ih) {
    ow = out_size;
    oh = int(std::lround(double(ih) * out_size / iw));
  } else {
    oh = out_size;
    ow = int(std::lround(double(iw) * out_size / ih));
  }
  resize_bilinear(*pixels, ih, iw, oh, ow, resized);
  const int left = (ow - out_size) / 2, top = (oh - out_size) / 2;
  for (int y = 0; y < out_size; ++y)
    std::memcpy(out + size_t(y) * out_size * 3,
                resized->data() + (size_t(y + top) * ow + left) * 3,
                size_t(out_size) * 3);
  return true;
}

}  // namespace

extern "C" {

int jpegio_decode_batch(const char** paths, int n, int out_size, uint8_t* out,
                        int threads) {
  std::atomic<int> failed{0};
  std::atomic<int> next{0};
  if (threads <= 0) threads = int(std::thread::hardware_concurrency());
  if (threads <= 0) threads = 1;  // hardware_concurrency() may return 0
  if (threads > n) threads = n > 0 ? n : 1;

  auto worker = [&]() {
    std::vector<uint8_t> pixels, resized;  // reused across this worker's files
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* slot = out + size_t(i) * out_size * out_size * 3;
      if (!decode_one(paths[i], out_size, slot, &pixels, &resized)) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        std::memset(slot, 0, size_t(out_size) * out_size * 3);
      }
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failed.load();
}

}  // extern "C"
