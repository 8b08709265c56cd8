// Native video-frame loading pipeline: threaded JPEG decode + triangle-filter
// resize (PIL-compatible) + center crop + [-1, 1] normalization.
//
// This is the TPU-native equivalent of the reference's torch DataLoader
// worker pool (reference train.py:247-249): the host-side hot path that
// keeps the chips fed.  Exposed to Python through a C ABI (ctypes); see
// seervideoldm_tpu/data/native.py.
//
// Build: make -C native    ->  native/libframeloader.so

#include <cstdio>  // must precede jpeglib.h (it uses FILE)

#include <jpeglib.h>

#include <algorithm>
#include <csetjmp>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- thread pool

class ThreadPool {
 public:
  explicit ThreadPool(int n_threads) : stop_(false) { grow(n_threads); }

  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void worker_loop() {
    for (;;) {
      std::function<void()> task;
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_.wait(lock, [this] { return stop_ || !tasks_.empty(); });
        if (stop_ && tasks_.empty()) return;
        task = std::move(tasks_.front());
        tasks_.pop();
      }
      task();
    }
  }

  void submit(std::function<void()> task) {
    {
      std::unique_lock<std::mutex> lock(mu_);
      tasks_.push(std::move(task));
    }
    cv_.notify_one();
  }

  // Grow to n_threads workers (never shrinks). The pool is global and
  // sized by the FIRST call; without this a small probe call would cap
  // decode throughput for the whole run.
  void grow(int n_threads) {
    std::unique_lock<std::mutex> lock(mu_);
    while ((int)workers_.size() < n_threads) {
      workers_.emplace_back([this] { worker_loop(); });
    }
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

ThreadPool* g_pool = nullptr;
std::mutex g_pool_mu;

ThreadPool& pool(int n_threads) {
  std::lock_guard<std::mutex> lock(g_pool_mu);
  if (g_pool == nullptr) g_pool = new ThreadPool(n_threads > 0 ? n_threads : 8);
  else if (n_threads > 0) g_pool->grow(n_threads);
  return *g_pool;
}

// ------------------------------------------------------------------ jpeg io

struct Image {
  int width = 0, height = 0, channels = 0;
  std::vector<uint8_t> data;  // HWC
};

bool decode_jpeg_file(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  // default error handler calls exit(); override fatal path
  struct ErrCtx {
    jmp_buf env;
  };
  jerr.error_exit = [](j_common_ptr cinfo) { longjmp(*(jmp_buf*)cinfo->client_data, 1); };
  jmp_buf env;
  cinfo.client_data = &env;
  if (setjmp(env)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  out->width = cinfo.output_width;
  out->height = cinfo.output_height;
  out->channels = 3;
  out->data.resize(size_t(out->width) * out->height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// --------------------------------------------------- PIL-style triangle resize

// Separable resampling with a triangle (bilinear) filter whose support
// scales with the downscale factor — matches PIL Image.BILINEAR, which the
// reference's torchvision Resize uses on PIL images.
struct FilterWeights {
  std::vector<int> bounds;    // 2 per output pixel: first tap, tap count
  std::vector<double> coefs;  // ksize per output pixel
  int ksize = 0;
};

FilterWeights triangle_weights(int in_size, int out_size) {
  FilterWeights fw;
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 1.0 * filterscale;  // triangle filter support = 1
  fw.ksize = int(std::ceil(support)) * 2 + 1;
  fw.bounds.resize(size_t(out_size) * 2);
  fw.coefs.resize(size_t(out_size) * fw.ksize, 0.0);

  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    int xmin = int(std::max(0.0, std::floor(center - support)));
    int xmax = std::min(in_size, int(std::ceil(center + support)));
    double* k = &fw.coefs[size_t(xx) * fw.ksize];
    int count = 0;
    for (int x = xmin; x < xmax; ++x) {
      double arg = std::abs((x + 0.5 - center) / filterscale);
      double weight = arg < 1.0 ? 1.0 - arg : 0.0;
      if (weight != 0.0 || count > 0) {
        k[count++] = weight;
        ww += weight;
      } else {
        ++xmin;
      }
    }
    while (count > 0 && k[count - 1] == 0.0) --count;
    for (int i = 0; i < count; ++i) k[i] /= (ww != 0.0 ? ww : 1.0);
    fw.bounds[size_t(xx) * 2] = xmin;
    fw.bounds[size_t(xx) * 2 + 1] = count;
  }
  return fw;
}

// Resize HWC uint8 -> HWC float (still 0..255 scale) with triangle filter.
void resize_triangle(const Image& src, int out_h, int out_w,
                     std::vector<float>* dst) {
  const int c = src.channels;
  FilterWeights fh = triangle_weights(src.height, out_h);
  FilterWeights fw = triangle_weights(src.width, out_w);

  // horizontal pass: (H, W, C) -> (H, out_w, C)
  std::vector<float> tmp(size_t(src.height) * out_w * c);
  for (int y = 0; y < src.height; ++y) {
    const uint8_t* row = src.data.data() + size_t(y) * src.width * c;
    for (int x = 0; x < out_w; ++x) {
      int x0 = fw.bounds[size_t(x) * 2];
      int cnt = fw.bounds[size_t(x) * 2 + 1];
      const double* k = &fw.coefs[size_t(x) * fw.ksize];
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int i = 0; i < cnt; ++i) acc += row[(x0 + i) * c + ch] * k[i];
        tmp[(size_t(y) * out_w + x) * c + ch] = float(acc);
      }
    }
  }
  // vertical pass: (H, out_w, C) -> (out_h, out_w, C)
  dst->resize(size_t(out_h) * out_w * c);
  for (int y = 0; y < out_h; ++y) {
    int y0 = fh.bounds[size_t(y) * 2];
    int cnt = fh.bounds[size_t(y) * 2 + 1];
    const double* k = &fh.coefs[size_t(y) * fh.ksize];
    for (int x = 0; x < out_w; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int i = 0; i < cnt; ++i)
          acc += tmp[(size_t(y0 + i) * out_w + x) * c + ch] * k[i];
        (*dst)[(size_t(y) * out_w + x) * c + ch] = float(acc);
      }
    }
  }
}

// Full per-frame pipeline into out[res, res, 3] float32 in [-1, 1].
bool process_frame(const char* path, int resolution, float* out) {
  Image img;
  if (!decode_jpeg_file(path, &img)) return false;

  // resize shorter side to `resolution` (round like PIL/torchvision)
  double scale = double(resolution) / std::min(img.width, img.height);
  int new_w = int(std::lround(img.width * scale));
  int new_h = int(std::lround(img.height * scale));
  new_w = std::max(new_w, resolution);
  new_h = std::max(new_h, resolution);

  std::vector<float> resized;
  resize_triangle(img, new_h, new_w, &resized);

  int left = (new_w - resolution) / 2;
  int top = (new_h - resolution) / 2;
  for (int y = 0; y < resolution; ++y) {
    const float* src_row = resized.data() + (size_t(top + y) * new_w + left) * 3;
    float* dst_row = out + size_t(y) * resolution * 3;
    for (int i = 0; i < resolution * 3; ++i) {
      float v = std::min(255.0f, std::max(0.0f, src_row[i])) / 255.0f;
      dst_row[i] = v * 2.0f - 1.0f;
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Decode + preprocess a batch of frames in parallel.
// paths: n zero-terminated strings; out: (n, resolution, resolution, 3) f32.
// Returns the number of successfully decoded frames (failed slots zeroed).
int decode_frames(const char** paths, int n, int resolution, float* out,
                  int n_threads) {
  std::atomic<int> ok{0};
  std::atomic<int> remaining{n};
  std::mutex done_mu;
  std::condition_variable done_cv;

  ThreadPool& tp = pool(n_threads);
  size_t frame_elems = size_t(resolution) * resolution * 3;
  for (int i = 0; i < n; ++i) {
    tp.submit([&, i] {
      float* dst = out + size_t(i) * frame_elems;
      if (process_frame(paths[i], resolution, dst)) {
        ok.fetch_add(1);
      } else {
        std::memset(dst, 0, frame_elems * sizeof(float));
      }
      // Decrement under the mutex: the waiter checks the predicate while
      // holding done_mu, so it cannot observe remaining==0 (and destroy
      // done_mu/done_cv on return) before this worker releases the lock.
      {
        std::lock_guard<std::mutex> lock(done_mu);
        if (remaining.fetch_sub(1) == 1) {
          done_cv.notify_all();
        }
      }
    });
  }
  std::unique_lock<std::mutex> lock(done_mu);
  done_cv.wait(lock, [&] { return remaining.load() == 0; });
  return ok.load();
}

}  // extern "C"
