// Native data-loading core for semi_detr_tpu.
//
// The reference pipeline leans on torch's C++ DataLoader workers + cv2/PIL
// for image IO (SURVEY.md §2.3: LoadImageFromFile -> RandResize -> ...).
// This is the TPU-framework equivalent: a small C++ runtime that decodes
// (libjpeg/libpng), bilinear-resizes, normalizes and zero-pads images into
// caller-provided float32 buckets, with a thread-pool prefetcher so the
// host input pipeline overlaps device steps. Exposed via a C ABI consumed
// through ctypes (no pybind11 in this environment).
//
// Build: see semi_detr_tpu/native/__init__.py (g++ -O3 -shared -fPIC ...
// -ljpeg -lpng).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------- decode

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode a JPEG byte buffer to RGB u8. Returns 0 on success; fills
// *out_h/*out_w. `out` must hold max_h*max_w*3 bytes.
int sdt_decode_jpeg(const uint8_t* data, long size, uint8_t* out,
                    long max_pixels, int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, size);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int h = cinfo.output_height, w = cinfo.output_width;
  if (static_cast<long>(h) * w > max_pixels) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  std::vector<uint8_t*> rows(h);
  for (int i = 0; i < h; ++i) rows[i] = out + static_cast<long>(i) * w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, rows.data() + cinfo.output_scanline,
                        cinfo.output_height - cinfo.output_scanline);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_h = h;
  *out_w = w;
  return 0;
}

struct PngReadCtx {
  const uint8_t* data;
  long size;
  long pos;
};

static void png_read_fn(png_structp p, png_bytep out, png_size_t n) {
  PngReadCtx* c = static_cast<PngReadCtx*>(png_get_io_ptr(p));
  if (c->pos + static_cast<long>(n) > c->size) {
    png_error(p, "eof");
    return;
  }
  memcpy(out, c->data + c->pos, n);
  c->pos += n;
}

int sdt_decode_png(const uint8_t* data, long size, uint8_t* out,
                   long max_pixels, int* out_h, int* out_w) {
  if (size < 8 || png_sig_cmp(data, 0, 8)) return 2;
  png_structp p = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                         nullptr, nullptr);
  if (!p) return 1;
  png_infop info = png_create_info_struct(p);
  if (!info) {
    png_destroy_read_struct(&p, nullptr, nullptr);
    return 1;
  }
  if (setjmp(png_jmpbuf(p))) {
    png_destroy_read_struct(&p, &info, nullptr);
    return 1;
  }
  PngReadCtx ctx{data, size, 0};
  png_set_read_fn(p, &ctx, png_read_fn);
  png_read_info(p, info);
  png_set_expand(p);
  png_set_strip_16(p);
  png_set_strip_alpha(p);
  png_set_gray_to_rgb(p);
  png_read_update_info(p, info);
  const int h = png_get_image_height(p, info);
  const int w = png_get_image_width(p, info);
  if (static_cast<long>(h) * w > max_pixels ||
      png_get_rowbytes(p, info) != static_cast<size_t>(w) * 3) {
    png_destroy_read_struct(&p, &info, nullptr);
    return 3;
  }
  std::vector<png_bytep> rows(h);
  for (int i = 0; i < h; ++i) rows[i] = out + static_cast<long>(i) * w * 3;
  png_read_image(p, rows.data());
  png_destroy_read_struct(&p, &info, nullptr);
  *out_h = h;
  *out_w = w;
  return 0;
}

// -------------------------------------------------------------- resize

// Bilinear resize u8 RGB (half-pixel centers, matching
// cv2.resize(INTER_LINEAR)).
void sdt_resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                         int dh, int dw) {
  const float fy = static_cast<float>(sh) / dh;
  const float fx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float syf = (y + 0.5f) * fy - 0.5f;
    if (syf < 0) syf = 0;
    int y0 = static_cast<int>(syf);
    if (y0 > sh - 1) y0 = sh - 1;
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    const float wy = syf - y0;
    const uint8_t* r0 = src + static_cast<long>(y0) * sw * 3;
    const uint8_t* r1 = src + static_cast<long>(y1) * sw * 3;
    uint8_t* drow = dst + static_cast<long>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      float sxf = (x + 0.5f) * fx - 0.5f;
      if (sxf < 0) sxf = 0;
      int x0 = static_cast<int>(sxf);
      if (x0 > sw - 1) x0 = sw - 1;
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      const float wx = sxf - x0;
      for (int c = 0; c < 3; ++c) {
        const float top = r0[x0 * 3 + c] * (1 - wx) + r0[x1 * 3 + c] * wx;
        const float bot = r1[x0 * 3 + c] * (1 - wx) + r1[x1 * 3 + c] * wx;
        const float v = top * (1 - wy) + bot * wy;
        drow[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// -------------------------------------------------- normalize + pad

// u8 RGB (h, w) -> float32 (bh, bw, 3) bucket: (x - mean) / std, zero pad.
void sdt_normalize_pad(const uint8_t* src, int h, int w, float* dst,
                       int bh, int bw, const float* mean,
                       const float* stdv) {
  const float inv[3] = {1.0f / stdv[0], 1.0f / stdv[1], 1.0f / stdv[2]};
  memset(dst, 0, static_cast<long>(bh) * bw * 3 * sizeof(float));
  for (int y = 0; y < h; ++y) {
    const uint8_t* s = src + static_cast<long>(y) * w * 3;
    float* d = dst + static_cast<long>(y) * bw * 3;
    for (int x = 0; x < w; ++x) {
      d[x * 3 + 0] = (s[x * 3 + 0] - mean[0]) * inv[0];
      d[x * 3 + 1] = (s[x * 3 + 1] - mean[1]) * inv[1];
      d[x * 3 + 2] = (s[x * 3 + 2] - mean[2]) * inv[2];
    }
  }
}

// ----------------------------------------------------- prefetch loader

struct Task {
  long index;
  std::string path;
  int target_h, target_w;  // resize target (post keep-ratio math, host side)
};

struct Result {
  long index;
  std::vector<uint8_t> pixels;  // resized RGB u8
  int h, w;
  int status;
};

struct Loader {
  std::vector<std::thread> workers;
  std::queue<Task> tasks;
  std::queue<Result> results;
  std::mutex mu;
  std::condition_variable cv_task, cv_result;
  std::atomic<bool> stop{false};
  long max_pixels;

  explicit Loader(int n_threads, long max_px) : max_pixels(max_px) {
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { this->run(); });
  }

  void run() {
    std::vector<uint8_t> raw, decoded;
    decoded.resize(static_cast<size_t>(max_pixels) * 3);
    while (true) {
      Task t;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_task.wait(lk, [this] { return stop || !tasks.empty(); });
        if (stop && tasks.empty()) return;
        t = tasks.front();
        tasks.pop();
      }
      Result r;
      r.index = t.index;
      r.status = 0;
      FILE* f = fopen(t.path.c_str(), "rb");
      if (!f) {
        r.status = 10;
      } else {
        fseek(f, 0, SEEK_END);
        long sz = ftell(f);
        fseek(f, 0, SEEK_SET);
        raw.resize(sz);
        if (fread(raw.data(), 1, sz, f) != static_cast<size_t>(sz))
          r.status = 11;
        fclose(f);
        if (!r.status) {
          int h = 0, w = 0;
          int rc = sdt_decode_jpeg(raw.data(), sz, decoded.data(),
                                   max_pixels, &h, &w);
          if (rc)
            rc = sdt_decode_png(raw.data(), sz, decoded.data(), max_pixels,
                                &h, &w);
          if (rc) {
            r.status = rc;
          } else {
            r.h = t.target_h > 0 ? t.target_h : h;
            r.w = t.target_w > 0 ? t.target_w : w;
            r.pixels.resize(static_cast<size_t>(r.h) * r.w * 3);
            if (r.h == h && r.w == w)
              memcpy(r.pixels.data(), decoded.data(), r.pixels.size());
            else
              sdt_resize_bilinear(decoded.data(), h, w, r.pixels.data(),
                                  r.h, r.w);
          }
        }
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        results.push(std::move(r));
      }
      cv_result.notify_one();
    }
  }
};

void* sdt_loader_create(int n_threads, long max_pixels) {
  return new Loader(n_threads, max_pixels);
}

void sdt_loader_submit(void* loader, long index, const char* path,
                       int target_h, int target_w) {
  Loader* l = static_cast<Loader*>(loader);
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->tasks.push(Task{index, path, target_h, target_w});
  }
  l->cv_task.notify_one();
}

// Blocks for the next finished item; copies into `out` (capacity
// max_pixels*3). Returns status (0 ok), fills index/h/w.
int sdt_loader_next(void* loader, long* index, uint8_t* out, int* h,
                    int* w) {
  Loader* l = static_cast<Loader*>(loader);
  Result r;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    l->cv_result.wait(lk, [l] { return !l->results.empty(); });
    r = std::move(l->results.front());
    l->results.pop();
  }
  *index = r.index;
  *h = r.h;
  *w = r.w;
  if (!r.status) memcpy(out, r.pixels.data(), r.pixels.size());
  return r.status;
}

void sdt_loader_destroy(void* loader) {
  Loader* l = static_cast<Loader*>(loader);
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->stop = true;
  }
  l->cv_task.notify_all();
  for (auto& t : l->workers) t.join();
  delete l;
}

}  // extern "C"
