// ssdseg native data-loader runtime.
//
// The reference's input pipeline leans on TF's native kernels for its IO hot
// path (`tf.image.decode_png`, `tf.io.decode_csv` — reference
// ssdseglib/datacoder.py:194-196, :325-333) driven by tf.data's C++ thread
// pool.  This library is the TPU-framework equivalent: a dependency-light
// C++ runtime providing
//
//   - a PNG decoder (zlib inflate + scanline unfiltering; 8-bit gray /
//     gray+alpha / RGB / RGBA / palette, non-interlaced — covers the
//     dataset's camera PNGs and class-map mask PNGs)
//   - a ground-truth CSV parser (label, xmin, ymin, xmax, ymax rows)
//   - a persistent worker pool assembling fixed-shape training batches
//     (images + masks + padded ground truth) directly into caller-provided
//     buffers, so Python never touches per-sample data
//
// Exposed as a C ABI for ctypes (no pybind11 in the image).  All functions
// return 0 on success, negative error codes otherwise.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

#include "decode_core.h"

#include <malloc.h>

namespace {

using ssdseg::PngImage;
using ssdseg::decode_png;
using ssdseg::parse_png_header;
using ssdseg::read_file;
using ssdseg::to_gray_first_channel;
using ssdseg::to_rgb;

// Keep multi-MB decode buffers on the reusable heap instead of per-call
// mmap/munmap (page-fault churn measured at ~45% of decode time —
// native/bench_decode.cpp; glibc's default mmap threshold is 128 KB).
// Process-wide, set once on dlopen.
const int kMallocTuned = [] {
  mallopt(M_MMAP_THRESHOLD, 256 * 1024 * 1024);
  return 0;
}();

// ---------------------------------------------------------------------------
// ground-truth CSV parsing: rows of "label,xmin,ymin,xmax,ymax"
// ---------------------------------------------------------------------------

int parse_csv(const char* text_in, size_t len, int32_t* labels, float* boxes,
              int max_rows) {
  // strtol/strtof need a NUL terminator: the caller's buffer may end on
  // the last digit (no trailing newline) with stale bytes past `len`
  // (read_file reuses buffers), which would silently corrupt the final
  // coordinate.  CSVs are tiny, so a bounded copy is the simple fix.
  const std::string owned(text_in, len);
  const char* text = owned.c_str();
  int rows = 0;
  size_t pos = 0;
  while (pos < len && rows < max_rows) {
    // skip blank lines / CR LF
    while (pos < len && (text[pos] == '\n' || text[pos] == '\r')) ++pos;
    if (pos >= len) break;
    char* end = nullptr;
    long label = std::strtol(text + pos, &end, 10);
    if (end == text + pos) return -40;
    pos = size_t(end - text);
    float vals[4];
    for (int i = 0; i < 4; ++i) {
      if (pos >= len || text[pos] != ',') return -41;
      ++pos;
      vals[i] = std::strtof(text + pos, &end);
      if (end == text + pos) return -42;
      pos = size_t(end - text);
    }
    labels[rows] = int32_t(label);
    std::memcpy(boxes + rows * 4, vals, sizeof(vals));
    ++rows;
  }
  return rows;
}

// ---------------------------------------------------------------------------
// worker pool
// ---------------------------------------------------------------------------

class WorkerPool {
 public:
  explicit WorkerPool(int n_workers) : stop_(false) {
    for (int i = 0; i < n_workers; ++i) {
      threads_.emplace_back([this] { this->run(); });
    }
  }

  ~WorkerPool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }

  void submit(std::function<void()> task) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      tasks_.push(std::move(task));
    }
    cv_.notify_one();
  }

 private:
  void run() {
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

  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> tasks_;
  std::vector<std::thread> threads_;
  bool stop_;
};

struct Loader {
  explicit Loader(int n_workers) : pool(n_workers) {}
  WorkerPool pool;
};

// decode one sample into its slice of the batch buffers
int load_one(const char* image_path, const char* mask_path, const char* csv_path,
             uint32_t img_h, uint32_t img_w, uint8_t* image_out,
             uint8_t* mask_out, int32_t* labels_out, float* boxes_out,
             uint8_t* valid_out, int max_gt) {
  // per-worker reusable buffers: fresh multi-MB vectors per sample cost
  // ~45% of decode time in allocator/page-fault churn (bench_decode.cpp)
  thread_local std::vector<uint8_t> buf;
  thread_local PngImage img, mask;
  thread_local ssdseg::DecodeScratch scratch;
  int ret;

  if ((ret = read_file(image_path, buf)) != 0) return ret;
  if ((ret = decode_png(buf.data(), buf.size(), &img, &scratch)) != 0)
    return ret;
  if (img.width != img_w || img.height != img_h) return -50;
  if ((ret = to_rgb(img, image_out)) != 0) return ret;

  if ((ret = read_file(mask_path, buf)) != 0) return ret;
  if ((ret = decode_png(buf.data(), buf.size(), &mask, &scratch)) != 0)
    return ret;
  if (mask.width != img_w || mask.height != img_h) return -51;
  if ((ret = to_gray_first_channel(mask, mask_out)) != 0) return ret;

  if ((ret = read_file(csv_path, buf)) != 0) return ret;
  std::memset(labels_out, 0, sizeof(int32_t) * max_gt);
  std::memset(boxes_out, 0, sizeof(float) * max_gt * 4);
  std::memset(valid_out, 0, max_gt);
  int rows = parse_csv(reinterpret_cast<const char*>(buf.data()), buf.size(),
                       labels_out, boxes_out, max_gt);
  if (rows < 0) return rows;
  std::memset(valid_out, 1, size_t(rows));
  return 0;
}

}  // namespace

extern "C" {

int ssdseg_png_info(const uint8_t* data, size_t len, uint32_t* w, uint32_t* h,
                    uint32_t* channels) {
  // header-only: IHDR is the mandatory first chunk, so sizing the output
  // buffers costs a 33-byte parse, not a second full inflate + unfilter
  PngImage img;
  int ret = parse_png_header(data, len, &img);
  if (ret != 0) return ret;
  *w = img.width;
  *h = img.height;
  *channels = img.samples_per_pixel;
  return 0;
}

int ssdseg_png_decode_rgb(const uint8_t* data, size_t len, uint8_t* out) {
  try {
    thread_local PngImage img;
    thread_local ssdseg::DecodeScratch scratch;
    int ret = decode_png(data, len, &img, &scratch);
    if (ret != 0) return ret;
    return to_rgb(img, out);
  } catch (...) {  // bad_alloc etc. must not cross the C ABI
    return -60;
  }
}

int ssdseg_png_decode_gray(const uint8_t* data, size_t len, uint8_t* out) {
  try {
    thread_local PngImage img;
    thread_local ssdseg::DecodeScratch scratch;
    int ret = decode_png(data, len, &img, &scratch);
    if (ret != 0) return ret;
    return to_gray_first_channel(img, out);
  } catch (...) {
    return -60;
  }
}

int ssdseg_csv_parse(const char* text, size_t len, int32_t* labels, float* boxes,
                     int max_rows) {
  try {
    return parse_csv(text, len, labels, boxes, max_rows);
  } catch (...) {
    return -60;
  }
}

void* ssdseg_loader_create(int n_workers) {
  return new Loader(n_workers > 0 ? n_workers : 1);
}

void ssdseg_loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// Assemble one fixed-shape batch.  Buffers (caller-allocated):
//   images_out: batch * h * w * 3 uint8
//   masks_out:  batch * h * w uint8
//   labels_out: batch * max_gt int32
//   boxes_out:  batch * max_gt * 4 float32
//   valid_out:  batch * max_gt uint8
// Returns 0, or the first non-zero per-sample error.
int ssdseg_loader_load_batch(void* handle, const char** image_paths,
                             const char** mask_paths, const char** csv_paths,
                             int batch, uint32_t img_h, uint32_t img_w,
                             uint8_t* images_out, uint8_t* masks_out,
                             int32_t* labels_out, float* boxes_out,
                             uint8_t* valid_out, int max_gt) {
  Loader* loader = static_cast<Loader*>(handle);
  std::atomic<int> error{0};
  std::atomic<int> remaining{batch};
  std::mutex done_mu;
  std::condition_variable done_cv;

  const size_t img_stride = size_t(img_h) * img_w * 3;
  const size_t mask_stride = size_t(img_h) * img_w;

  for (int i = 0; i < batch; ++i) {
    loader->pool.submit([=, &error, &remaining, &done_mu, &done_cv] {
      int ret;
      try {
        ret = load_one(image_paths[i], mask_paths[i], csv_paths[i], img_h,
                       img_w, images_out + i * img_stride,
                       masks_out + i * mask_stride, labels_out + i * max_gt,
                       boxes_out + size_t(i) * max_gt * 4,
                       valid_out + i * max_gt, max_gt);
      } catch (...) {  // an escaping exception would std::terminate the
        ret = -60;     // whole process from a pool thread
      }
      if (ret != 0) {
        int expected = 0;
        error.compare_exchange_strong(expected, ret);
      }
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lock(done_mu);
        done_cv.notify_all();
      }
    });
  }

  std::unique_lock<std::mutex> lock(done_mu);
  done_cv.wait(lock, [&] { return remaining.load() == 0; });
  return error.load();
}

}  // extern "C"
