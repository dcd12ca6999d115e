// Native host data-plane for layout2img_tpu.
//
// The reference feeds its GPUs through torch's C++ DataLoader machinery with
// Python/PIL per-item work (reference data/cocostuff_loader.py). This library
// is the TPU-side equivalent of that native path: JPEG decode (libjpeg),
// PIL-compatible antialiased bilinear resize, horizontal mirroring,
// [-1, 1] float NHWC normalization, and a persistent thread pool that fills
// whole fixed-shape batches in parallel. Exposed through a minimal C ABI for
// ctypes binding (layout2img_tpu/data/native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libl2i_dataplane.so
//        dataplane.cc -ljpeg -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// JPEG decode
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decodes a JPEG byte buffer to RGB8. Returns false on failure.
bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                 int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  rgb->resize(size_t(*width) * *height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + size_t(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// PIL-compatible antialiased bilinear resize (separable triangle filter with
// support scaled by the downsampling ratio — the algorithm Pillow uses for
// Image.BILINEAR since 2.7).
// ---------------------------------------------------------------------------

struct FilterTable {
  int ksize;                  // taps per output pixel
  std::vector<int> bounds;    // (out, 2): start index, actual taps
  std::vector<float> weights; // (out, ksize)
};

FilterTable build_triangle_table(int in_size, int out_size) {
  FilterTable t;
  double scale = double(in_size) / out_size;
  double support = std::max(1.0, scale);  // triangle filter support * scale
  t.ksize = int(std::ceil(support)) * 2 + 1;
  t.bounds.resize(out_size * 2);
  t.weights.assign(size_t(out_size) * t.ksize, 0.f);
  for (int x = 0; x < out_size; ++x) {
    double center = (x + 0.5) * scale;
    int xmin = std::max(0, int(center - support + 0.5));
    int xmax = std::min(in_size, int(center + support + 0.5));
    int n = xmax - xmin;
    double inv = 1.0 / std::max(1.0, scale);
    double total = 0.0;
    std::vector<double> w(n);
    for (int i = 0; i < n; ++i) {
      double d = std::abs((xmin + i + 0.5 - center) * inv);
      w[i] = d < 1.0 ? 1.0 - d : 0.0;
      total += w[i];
    }
    for (int i = 0; i < n; ++i) {
      t.weights[size_t(x) * t.ksize + i] = float(w[i] / (total > 0 ? total : 1));
    }
    t.bounds[x * 2] = xmin;
    t.bounds[x * 2 + 1] = n;
  }
  return t;
}

// RGB8 HWC resize via two separable passes in float.
void resize_triangle(const uint8_t* src, int in_w, int in_h, float* dst,
                     int out_w, int out_h) {
  FilterTable tx = build_triangle_table(in_w, out_w);
  FilterTable ty = build_triangle_table(in_h, out_h);
  // horizontal pass: (in_h, out_w, 3)
  std::vector<float> tmp(size_t(in_h) * out_w * 3);
  for (int y = 0; y < in_h; ++y) {
    const uint8_t* row = src + size_t(y) * in_w * 3;
    float* trow = tmp.data() + size_t(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      int xmin = tx.bounds[x * 2], n = tx.bounds[x * 2 + 1];
      const float* w = &tx.weights[size_t(x) * tx.ksize];
      float r = 0, g = 0, b = 0;
      for (int i = 0; i < n; ++i) {
        const uint8_t* p = row + size_t(xmin + i) * 3;
        r += w[i] * p[0];
        g += w[i] * p[1];
        b += w[i] * p[2];
      }
      trow[x * 3] = r;
      trow[x * 3 + 1] = g;
      trow[x * 3 + 2] = b;
    }
  }
  // vertical pass -> dst (out_h, out_w, 3)
  for (int y = 0; y < out_h; ++y) {
    int ymin = ty.bounds[y * 2], n = ty.bounds[y * 2 + 1];
    const float* w = &ty.weights[size_t(y) * ty.ksize];
    float* drow = dst + size_t(y) * out_w * 3;
    std::memset(drow, 0, sizeof(float) * out_w * 3);
    for (int i = 0; i < n; ++i) {
      const float* trow = tmp.data() + size_t(ymin + i) * out_w * 3;
      float wi = w[i];
      for (int x = 0; x < out_w * 3; ++x) drow[x] += wi * trow[x];
    }
  }
}

// ---------------------------------------------------------------------------
// Thread pool
// ---------------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

ThreadPool* pool = nullptr;
int pool_size = 0;
std::mutex pool_mu;

ThreadPool* get_pool(int threads) {
  std::lock_guard<std::mutex> lk(pool_mu);
  int want = threads > 0 ? threads : int(std::thread::hardware_concurrency());
  if (want < 1) want = 1;
  if (pool && want > pool_size) {
    // Grow on demand by REPLACING the global pointer but never deleting the
    // old pool: a concurrent l2i_load_batch may still hold it (deleting here
    // was a use-after-free). The abandoned pool's idle threads are a
    // deliberate leak of pool_size threads (plus queues) per grow event —
    // callers should pass a stable thread count.
    pool = nullptr;
  }
  if (!pool) {
    pool = new ThreadPool(want);
    pool_size = want;
  }
  return pool;
}

// Loads one file, decodes, optional mirror, resizes, normalizes to [-1, 1].
// Returns 0 on success.
int load_one(const char* path, int out_size, int flip, float* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (len < 0) {  // ftell failure would otherwise feed vector(huge)
    std::fclose(f);
    return 1;
  }
  std::vector<uint8_t> buf(len);
  if (std::fread(buf.data(), 1, len, f) != size_t(len)) {
    std::fclose(f);
    return 1;
  }
  std::fclose(f);

  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(buf.data(), buf.size(), &rgb, &w, &h)) return 2;
  if (flip) {
    for (int y = 0; y < h; ++y) {
      uint8_t* row = rgb.data() + size_t(y) * w * 3;
      for (int x = 0; x < w / 2; ++x) {
        for (int c = 0; c < 3; ++c) std::swap(row[x * 3 + c], row[(w - 1 - x) * 3 + c]);
      }
    }
  }
  std::vector<float> resized(size_t(out_size) * out_size * 3);
  resize_triangle(rgb.data(), w, h, resized.data(), out_size, out_size);
  const float inv = 1.0f / 255.0f;
  for (size_t i = 0; i < resized.size(); ++i) {
    out[i] = (resized[i] * inv - 0.5f) * 2.0f;
  }
  return 0;
}

// load_one with C++ exceptions contained (e.g. bad_alloc from a JPEG header
// declaring enormous dimensions) — an exception escaping a pool worker would
// std::terminate the whole process.
int load_one_noexcept(const char* path, int out_size, int flip,
                      float* out) noexcept {
  try {
    return load_one(path, out_size, flip, out);
  } catch (...) {
    return 3;
  }
}

}  // namespace

extern "C" {

// Decode+resize+normalize a single image file into out (out_size*out_size*3
// float NHWC). Returns 0 on success.
int l2i_load_image(const char* path, int out_size, int flip, float* out) {
  return load_one_noexcept(path, out_size, flip, out);
}

// Fill a batch of n images in parallel. paths: n C strings; flips: n ints;
// out: (n, out_size, out_size, 3) floats. Returns number of failures.
int l2i_load_batch(const char** paths, int n, int out_size, const int* flips,
                   float* out, int threads) {
  ThreadPool* p = get_pool(threads);
  std::atomic<int> failures{0};
  // done is mutated AND notified under mu: with an atomic counter outside
  // the lock, the waiter could observe done==n, return, and destroy these
  // stack-allocated mu/cv while the last worker was still about to lock
  // them (use-after-scope).
  int done = 0;
  std::mutex mu;
  std::condition_variable cv;
  size_t stride = size_t(out_size) * out_size * 3;
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      if (load_one_noexcept(paths[i], out_size, flips[i], out + stride * i) != 0) {
        failures.fetch_add(1);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        ++done;
        cv.notify_one();  // notify while holding mu: the waiter cannot
                          // finish (and destroy cv) until we release it
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done == n; });
  return failures.load();
}

// Deterministic Fisher-Yates shuffle of [0, n) with splitmix64.
void l2i_shuffle(uint64_t seed, int64_t n, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = i;
  uint64_t s = seed;
  auto next = [&s]() {
    s += 0x9E3779B97f4A7C15ULL;
    uint64_t z = s;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  };
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = int64_t(next() % uint64_t(i + 1));
    std::swap(out[i], out[j]);
  }
}

}  // extern "C"
