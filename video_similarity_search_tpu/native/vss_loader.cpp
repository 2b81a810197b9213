// Native batched JPEG clip decoder for the TPU video-similarity framework.
//
// The host data path — decode T JPEG frames, resize to the fixed square
// buffer that feeds the on-device augmentation kernel — is the framework's
// per-step host bottleneck (the reference delegates it to PIL inside torch
// DataLoader workers, datasets/loader.py:10-21 + spatial_transforms).
// This module does the whole clip in one GIL-free C call:
//
//   * libjpeg DCT-scaled decode (scale_denom in {1,2,4,8}) so a 320x240
//     source headed for a 64px buffer is decoded at 1/4 resolution;
//   * bilinear resize to (out, out), or short-edge resize + center crop
//     in eval mode (reference Resize+CenterCrop, datasets/data_loader.py:
//     107-115);
//   * a std::thread pool over frames (atomic work counter).
//
// C ABI (ctypes-friendly, see ../data/native_loader.py):
//   int vss_decode_frames(const char** paths, int n_frames, int out_size,
//                         int eval_mode, unsigned char* out, int n_threads)
// 'out' is (n_frames, out_size, out_size, 3) uint8, caller-allocated.
// Returns 0 on success, -(i+1) if frame i failed to decode.

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize RGB (h, w) -> (oh, ow), then copy the (crop_top,
// crop_left, out, out) window into dst (which is out*out*3).
void resize_crop(const uint8_t* src, int h, int w, int oh, int ow,
                 int crop_top, int crop_left, int out, uint8_t* dst) {
  const float sy = oh > 1 ? static_cast<float>(h - 1) / (oh - 1) : 0.f;
  const float sx = ow > 1 ? static_cast<float>(w - 1) / (ow - 1) : 0.f;
  for (int y = 0; y < out; ++y) {
    const float fy = (y + crop_top) * sy;
    const int y0 = static_cast<int>(fy);
    const int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    const float wy = fy - y0;
    for (int x = 0; x < out; ++x) {
      const float fx = (x + crop_left) * sx;
      const int x0 = static_cast<int>(fx);
      const int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      const float wx = fx - x0;
      const uint8_t* p00 = src + (y0 * w + x0) * 3;
      const uint8_t* p01 = src + (y0 * w + x1) * 3;
      const uint8_t* p10 = src + (y1 * w + x0) * 3;
      const uint8_t* p11 = src + (y1 * w + x1) * 3;
      uint8_t* d = dst + (y * out + x) * 3;
      for (int c = 0; c < 3; ++c) {
        const float top = p00[c] * (1.f - wx) + p01[c] * wx;
        const float bot = p10[c] * (1.f - wx) + p11[c] * wx;
        d[c] = static_cast<uint8_t>(top * (1.f - wy) + bot * wy + 0.5f);
      }
    }
  }
}

// Decode one JPEG file into RGB; returns false on failure.
bool decode_one(const char* path, int out_size, int eval_mode,
                uint8_t* dst) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  std::vector<uint8_t> pixels;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);

  // DCT-scaled decode: largest denom keeping min-dim >= out_size
  const int full_min = cinfo.image_height < cinfo.image_width
                           ? cinfo.image_height
                           : cinfo.image_width;
  int denom = 1;
  while (denom < 8 && full_min / (denom * 2) >= out_size) denom *= 2;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  cinfo.out_color_space = JCS_RGB;

  jpeg_start_decompress(&cinfo);
  const int h = cinfo.output_height;
  const int w = cinfo.output_width;
  pixels.resize(static_cast<size_t>(h) * w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels.data() + static_cast<size_t>(
                                       cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);

  if (eval_mode) {
    // short-edge resize to out_size, center crop out_size^2
    const int mn = h < w ? h : w;
    const float s = static_cast<float>(out_size) / mn;
    const int oh = static_cast<int>(std::lround(h * s));
    const int ow = static_cast<int>(std::lround(w * s));
    const int top = (oh - out_size) / 2 > 0 ? (oh - out_size) / 2 : 0;
    const int left = (ow - out_size) / 2 > 0 ? (ow - out_size) / 2 : 0;
    resize_crop(pixels.data(), h, w, oh, ow, top, left, out_size, dst);
  } else {
    resize_crop(pixels.data(), h, w, out_size, out_size, 0, 0, out_size,
                dst);
  }
  return true;
}

}  // namespace

extern "C" int vss_decode_frames(const char** paths, int n_frames,
                                 int out_size, int eval_mode,
                                 unsigned char* out, int n_threads) {
  if (n_frames <= 0) return 0;
  std::atomic<int> next(0);
  std::atomic<int> failed(0);  // 0 = ok, else -(index+1) of first failure
  const size_t frame_bytes =
      static_cast<size_t>(out_size) * out_size * 3;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n_frames) return;
      if (!decode_one(paths[i], out_size, eval_mode,
                      out + frame_bytes * i)) {
        int expected = 0;
        failed.compare_exchange_strong(expected, -(i + 1));
      }
    }
  };

  const int nt = n_threads > 0 ? n_threads : 1;
  if (nt == 1 || n_frames == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    const int spawn = nt < n_frames ? nt : n_frames;
    pool.reserve(spawn);
    for (int t = 0; t < spawn; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failed.load();
}

extern "C" int vss_loader_version() { return 1; }
