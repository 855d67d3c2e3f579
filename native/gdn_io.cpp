// gdn-tpu native IO runtime: threaded image decode + resize.
//
// Role in the framework (SURVEY.md §2.1): the reference hides its decode
// cost inside torch DataLoader worker *processes*; this library is the
// TPU-native replacement — a C++ thread pool that decodes PNG/JPEG and
// resizes straight into a preallocated float32 batch buffer, so the
// Python host thread only hands out paths and the GIL is released for
// the whole batch.  Exposed to Python via ctypes (gdn_tpu/data/native_io.py)
// with a PIL fallback when the shared object is unavailable.
//
// Semantics are pinned to match the Python path bit-for-bit where it
// matters for the eval protocol:
//   - RGB: bilinear, half-pixel centers (cv2 INTER_LINEAR convention,
//     same as jax.image.resize "linear"), output float32 in [0,1].
//   - depth PNG16: nearest neighbor (no smearing of sparse LiDAR),
//     output value * scale (KITTI: 1/256 m).
//
// Build: `make -C native` -> native/libgdn_io.so  (links png/jpeg/z).

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>

namespace {

thread_local std::string g_error;

struct Image {
  std::vector<uint16_t> data;  // interleaved, up to 4 channels
  int h = 0, w = 0, channels = 0;
  int bit_depth = 8;
};

// ---------------------------------------------------------------- PNG
bool decode_png(const unsigned char* buf, size_t len, Image* out) {
  png_image img;
  memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&img, buf, len)) {
    g_error = std::string("png: ") + img.message;
    return false;
  }
  const bool gray16 =
      (img.format & PNG_FORMAT_FLAG_LINEAR) || img.format == PNG_FORMAT_LINEAR_Y;
  // Choose output format: 16-bit gray for depth-like images, RGB8 else.
  if (gray16 || img.format == PNG_FORMAT_GRAY) {
    img.format = PNG_FORMAT_LINEAR_Y;  // 16-bit grayscale
    out->channels = 1;
    out->bit_depth = 16;
  } else {
    img.format = PNG_FORMAT_RGB;
    out->channels = 3;
    out->bit_depth = 8;
  }
  out->h = img.height;
  out->w = img.width;
  const size_t stride = PNG_IMAGE_ROW_STRIDE(img);
  const size_t size = PNG_IMAGE_BUFFER_SIZE(img, stride);
  if (out->bit_depth == 16) {
    out->data.resize(size / 2);
    if (!png_image_finish_read(&img, nullptr, out->data.data(), stride, nullptr)) {
      g_error = std::string("png: ") + img.message;
      return false;
    }
  } else {
    std::vector<uint8_t> tmp(size);
    if (!png_image_finish_read(&img, nullptr, tmp.data(), stride, nullptr)) {
      g_error = std::string("png: ") + img.message;
      return false;
    }
    out->data.assign(tmp.begin(), tmp.end());
  }
  return true;
}

// --------------------------------------------------------------- JPEG
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  char msg[JMSG_LENGTH_MAX];
  (*cinfo->err->format_message)(cinfo, msg);
  g_error = std::string("jpeg: ") + msg;
  longjmp(err->jb, 1);
}

bool decode_jpeg(const unsigned char* buf, size_t len, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->channels = 3;
  out->bit_depth = 8;
  out->data.resize(size_t(out->h) * out->w * 3);
  std::vector<uint8_t> row(size_t(out->w) * 3);
  uint8_t* rp = row.data();
  for (int y = 0; y < out->h; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint16_t* dst = out->data.data() + size_t(y) * out->w * 3;
    for (int i = 0; i < out->w * 3; ++i) dst[i] = row[i];
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool read_file(const char* path, std::vector<unsigned char>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    g_error = std::string("open failed: ") + path;
    return false;
  }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf->resize(size);
  size_t got = fread(buf->data(), 1, size, f);
  fclose(f);
  if ((long)got != size) {
    g_error = std::string("short read: ") + path;
    return false;
  }
  return true;
}

bool decode_any(const char* path, Image* out) {
  std::vector<unsigned char> buf;
  if (!read_file(path, &buf)) return false;
  if (buf.size() >= 8 && buf[0] == 0x89 && buf[1] == 'P') {
    return decode_png(buf.data(), buf.size(), out);
  }
  if (buf.size() >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) {
    return decode_jpeg(buf.data(), buf.size(), out);
  }
  g_error = std::string("unknown image format: ") + path;
  return false;
}

// ------------------------------------------------------------- resize
// Antialiased bilinear (triangle filter), matching PIL's BILINEAR
// resampling: on downscale the filter support widens to in/out so the
// result is area-weighted, not 2-tap point-sampled — this is what the
// Python loader (PIL) and jax.image.resize produce, and the eval
// protocol pins it (SURVEY.md §7 "resize kernels differ" hard part).
struct FilterTaps {
  std::vector<int> xmin;        // first source index per output index
  std::vector<int> count;       // taps per output index
  std::vector<float> weights;   // max_taps per output index, normalized
  int max_taps = 0;
};

FilterTaps build_triangle_taps(int in_size, int out_size) {
  FilterTaps taps;
  const double scale = double(in_size) / out_size;
  const double ss = std::max(1.0, scale);
  const double support = 1.0 * ss;
  taps.max_taps = int(std::ceil(support)) * 2 + 1;
  taps.xmin.resize(out_size);
  taps.count.resize(out_size);
  taps.weights.assign(size_t(out_size) * taps.max_taps, 0.0f);
  for (int i = 0; i < out_size; ++i) {
    const double center = (i + 0.5) * scale;
    int x0 = std::max(0, int(center - support + 0.5));
    int x1 = std::min(in_size, int(center + support + 0.5));
    double total = 0.0;
    float* w = &taps.weights[size_t(i) * taps.max_taps];
    for (int x = x0; x < x1; ++x) {
      double t = std::abs((x + 0.5 - center) / ss);
      double v = t < 1.0 ? 1.0 - t : 0.0;
      w[x - x0] = float(v);
      total += v;
    }
    if (total > 0) {
      for (int x = 0; x < x1 - x0; ++x) w[x] = float(w[x] / total);
    }
    taps.xmin[i] = x0;
    taps.count[i] = x1 - x0;
  }
  return taps;
}

void resize_bilinear_rgb(const Image& src, float* out, int oh, int ow) {
  const float norm = 1.0f / 255.0f;
  FilterTaps hx = build_triangle_taps(src.w, ow);
  FilterTaps vy = build_triangle_taps(src.h, oh);
  // pass 1: horizontal into (src.h, ow, 3) float
  std::vector<float> tmp(size_t(src.h) * ow * 3);
  for (int y = 0; y < src.h; ++y) {
    const uint16_t* row = &src.data[size_t(y) * src.w * 3];
    for (int x = 0; x < ow; ++x) {
      const float* w = &hx.weights[size_t(x) * hx.max_taps];
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < hx.count[x]; ++k) {
        const uint16_t* p = row + size_t(hx.xmin[x] + k) * 3;
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      float* dst = &tmp[(size_t(y) * ow + x) * 3];
      dst[0] = acc[0]; dst[1] = acc[1]; dst[2] = acc[2];
    }
  }
  // pass 2: vertical into the output
  for (int y = 0; y < oh; ++y) {
    const float* w = &vy.weights[size_t(y) * vy.max_taps];
    for (int x = 0; x < ow; ++x) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < vy.count[y]; ++k) {
        const float* p = &tmp[(size_t(vy.xmin[y] + k) * ow + x) * 3];
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      float* dst = out + (size_t(y) * ow + x) * 3;
      dst[0] = acc[0] * norm; dst[1] = acc[1] * norm; dst[2] = acc[2] * norm;
    }
  }
}

void resize_nearest_depth(const Image& src, float* out, int oh, int ow,
                          float scale) {
  const float sy = float(src.h) / oh;
  const float sx = float(src.w) / ow;
  for (int y = 0; y < oh; ++y) {
    int ys = std::min(int((y + 0.5f) * sy), src.h - 1);
    for (int x = 0; x < ow; ++x) {
      int xs = std::min(int((x + 0.5f) * sx), src.w - 1);
      out[size_t(y) * ow + x] = src.data[size_t(ys) * src.w + xs] * scale;
    }
  }
}

template <typename Fn>
int run_pool(int n, int num_threads, Fn&& fn) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  int workers = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([&] {
      int i;
      while ((i = next.fetch_add(1)) < n) {
        if (!fn(i)) failures.fetch_add(1);
      }
    });
  }
  for (auto& th : pool) th.join();
  return failures.load() ? -1 : 0;
}

}  // namespace

extern "C" {

const char* gdn_last_error() { return g_error.c_str(); }

// RGB decode + bilinear resize into out[out_h*out_w*3] float32 [0,1].
int gdn_decode_rgb(const char* path, float* out, int out_h, int out_w) {
  Image img;
  if (!decode_any(path, &img)) return -1;
  if (img.channels != 3) {
    g_error = std::string("expected RGB image: ") + path;
    return -1;
  }
  resize_bilinear_rgb(img, out, out_h, out_w);
  return 0;
}

// 16-bit PNG depth decode + nearest resize; out = value * scale, meters.
int gdn_decode_depth(const char* path, float* out, int out_h, int out_w,
                     float scale) {
  Image img;
  if (!decode_any(path, &img)) return -1;
  if (img.channels != 1) {
    g_error = std::string("expected grayscale depth image: ") + path;
    return -1;
  }
  resize_nearest_depth(img, out, out_h, out_w, scale);
  return 0;
}

// Threaded batch decode: paths[n] -> out[n*out_h*out_w*3].
int gdn_decode_rgb_batch(const char** paths, int n, float* out, int out_h,
                         int out_w, int num_threads) {
  size_t stride = size_t(out_h) * out_w * 3;
  return run_pool(n, num_threads, [&](int i) {
    return gdn_decode_rgb(paths[i], out + stride * i, out_h, out_w) == 0;
  });
}

int gdn_decode_depth_batch(const char** paths, int n, float* out, int out_h,
                           int out_w, float scale, int num_threads) {
  size_t stride = size_t(out_h) * out_w;
  return run_pool(n, num_threads, [&](int i) {
    return gdn_decode_depth(paths[i], out + stride * i, out_h, out_w, scale) == 0;
  });
}

}  // extern "C"
