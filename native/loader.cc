// Native host data-loader core: threaded JPEG decode + bbox crop + bilinear
// resize, producing fixed-size uint8 RGB batches for the device pipeline.
//
// This is the framework's equivalent of the reference's native host-loader
// stack (torch's C++ DataLoader worker pool + OpenCV decode/resize,
// reference: dataset/sbp_coco_dataset.py:259-277 and :42-51).  Exposed as a
// plain C API consumed from Python via ctypes
// (pytorch_pose_estimation_tpu/data/native_loader.py); the Python cv2 path
// remains as a fallback when the .so is absent.
//
// Build: make -C native   (links against system libjpeg)

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

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG blob to RGB; returns true on success and fills out/w/h.
bool DecodeJpeg(const uint8_t* data, int len, std::vector<uint8_t>* out,
                int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  out->resize(static_cast<size_t>(*width) * *height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() +
                   static_cast<size_t>(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear resize with half-pixel-center sampling (cv2 INTER_LINEAR
// geometry), clamped at the borders.
void ResizeBilinear(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                    int dh) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y0c = std::clamp(y0, 0, sh - 1);
    int y1c = std::clamp(y0 + 1, 0, sh - 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x0c = std::clamp(x0, 0, sw - 1);
      int x1c = std::clamp(x0 + 1, 0, sw - 1);
      const uint8_t* p00 = src + (static_cast<size_t>(y0c) * sw + x0c) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0c) * sw + x1c) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1c) * sw + x0c) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1c) * sw + x1c) * 3;
      uint8_t* q = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] * (1 - wx) + p01[c] * wx;
        float bot = p10[c] * (1 - wx) + p11[c] * wx;
        q[c] = static_cast<uint8_t>(
            std::clamp(top * (1 - wy) + bot * wy + 0.5f, 0.0f, 255.0f));
      }
    }
  }
}

// One sample: decode -> crop [x1, y1, w, h] (inclusive +1 like the
// reference's img[y1:y2+1, x1:x2+1]) -> resize to (out_w, out_h).
bool ProcessOne(const uint8_t* blob, int len, const int* box, int out_w,
                int out_h, uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!DecodeJpeg(blob, len, &rgb, &w, &h)) return false;

  int x1 = std::clamp(box[0], 0, w - 1);
  int y1 = std::clamp(box[1], 0, h - 1);
  int cw = std::clamp(box[2] + 1, 1, w - x1);
  int ch = std::clamp(box[3] + 1, 1, h - y1);

  std::vector<uint8_t> crop(static_cast<size_t>(cw) * ch * 3);
  for (int y = 0; y < ch; ++y) {
    std::memcpy(crop.data() + static_cast<size_t>(y) * cw * 3,
                rgb.data() + (static_cast<size_t>(y1 + y) * w + x1) * 3,
                static_cast<size_t>(cw) * 3);
  }
  ResizeBilinear(crop.data(), cw, ch, out, out_w, out_h);
  return true;
}

}  // namespace

extern "C" {

// Batch API.  blobs: concatenated JPEG bytes; offsets[i]/lens[i] address
// sample i; boxes: 4*n ints (x1, y1, w, h; w<0 means whole image);
// out: n*out_h*out_w*3 uint8.  Returns number of failed samples.
int ppe_batch_decode_crop_resize(int n, const uint8_t* blobs,
                                 const int64_t* offsets, const int* lens,
                                 const int* boxes, int out_h, int out_w,
                                 uint8_t* out, int n_threads) {
  std::atomic<int> next(0), failed(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      const int* box = boxes + 4 * i;
      int whole[4] = {0, 0, 1 << 28, 1 << 28};
      bool ok = ProcessOne(
          blobs + offsets[i], lens[i], box[2] < 0 ? whole : box, out_w,
          out_h, out + static_cast<size_t>(i) * out_h * out_w * 3);
      if (!ok) failed.fetch_add(1);
    }
  };
  int threads = std::max(1, n_threads);
  std::vector<std::thread> pool;
  pool.reserve(threads - 1);
  for (int t = 1; t < threads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return failed.load();
}

// Single-image decode (for tests / inspection).  Returns 0 on success.
int ppe_decode_jpeg(const uint8_t* blob, int len, uint8_t* out, int max_bytes,
                    int* width, int* height) {
  std::vector<uint8_t> rgb;
  if (!DecodeJpeg(blob, len, &rgb, width, height)) return 1;
  if (static_cast<int>(rgb.size()) > max_bytes) return 2;
  std::memcpy(out, rgb.data(), rgb.size());
  return 0;
}

}  // extern "C"
