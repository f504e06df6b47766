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

namespace {

// ---------------------------------------------------------------------------
// PNG decoding
// ---------------------------------------------------------------------------

constexpr uint8_t kPngSignature[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

struct PngImage {
  uint32_t width = 0;
  uint32_t height = 0;
  uint8_t bit_depth = 0;
  uint8_t color_type = 0;
  std::vector<uint8_t> pixels;  // interleaved samples after unfiltering
  uint32_t samples_per_pixel = 0;
  std::vector<uint8_t> palette;  // RGB triples for color_type 3
};

inline uint32_t read_be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) |
         uint32_t(p[3]);
}

int inflate_all(const uint8_t* src, size_t src_len, std::vector<uint8_t>& dst) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return -1;
  zs.next_in = const_cast<Bytef*>(src);
  zs.avail_in = static_cast<uInt>(src_len);
  zs.next_out = dst.data();
  zs.avail_out = static_cast<uInt>(dst.size());
  int ret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (ret != Z_STREAM_END) return -2;
  if (zs.total_out != dst.size()) return -3;
  return 0;
}

inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

int samples_for_color_type(uint8_t color_type, uint32_t* spp) {
  switch (color_type) {
    case 0: *spp = 1; return 0;  // gray
    case 2: *spp = 3; return 0;  // rgb
    case 3: *spp = 1; return 0;  // palette index
    case 4: *spp = 2; return 0;  // gray + alpha
    case 6: *spp = 4; return 0;  // rgba
    default: return -17;
  }
}

// Header-only parse: IHDR is required to be the first chunk, so width /
// height / channels cost a 33-byte read — no inflate, no unfilter.
int parse_png_header(const uint8_t* data, size_t len, PngImage* out) {
  if (len < 8 || std::memcmp(data, kPngSignature, 8) != 0) return -10;
  if (len < 8 + 12 + 13) return -11;
  const uint8_t* type = data + 12;
  if (read_be32(data + 8) != 13 || std::memcmp(type, "IHDR", 4) != 0)
    return -12;
  const uint8_t* payload = data + 16;
  out->width = read_be32(payload);
  out->height = read_be32(payload + 4);
  out->bit_depth = payload[8];
  out->color_type = payload[9];
  if (payload[10] != 0 || payload[11] != 0) return -13;
  if (payload[12] != 0) return -14;
  if (out->bit_depth != 8) return -15;
  if (out->width == 0 || out->height == 0 || out->width > (1u << 20) ||
      out->height > (1u << 20) ||
      uint64_t(out->width) * out->height > (1ull << 28)) {
    return -19;
  }
  return samples_for_color_type(out->color_type, &out->samples_per_pixel);
}

// Parse + inflate + unfilter an 8-bit non-interlaced PNG.
int decode_png(const uint8_t* data, size_t len, PngImage* out) {
  if (len < 8 || std::memcmp(data, kPngSignature, 8) != 0) return -10;
  size_t pos = 8;
  std::vector<uint8_t> idat;
  bool saw_ihdr = false, saw_iend = false;

  while (pos + 8 <= len && !saw_iend) {
    uint32_t chunk_len = read_be32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* payload = data + pos + 8;
    if (pos + 12 + chunk_len > len) return -11;

    if (std::memcmp(type, "IHDR", 4) == 0) {
      if (chunk_len != 13) return -12;
      out->width = read_be32(payload);
      out->height = read_be32(payload + 4);
      out->bit_depth = payload[8];
      out->color_type = payload[9];
      if (payload[10] != 0 || payload[11] != 0) return -13;  // compression/filter
      if (payload[12] != 0) return -14;                      // interlaced: unsupported
      if (out->bit_depth != 8) return -15;
      // sanity-bound the declared dimensions BEFORE any size arithmetic:
      // a corrupt IHDR (e.g. 0xFFFFFFFF x 0xFFFFFFFF) would otherwise
      // overflow the size_t buffer math below into a small allocation and
      // turn the unfilter loop into a heap overwrite
      if (out->width == 0 || out->height == 0 || out->width > (1u << 20) ||
          out->height > (1u << 20) ||
          uint64_t(out->width) * out->height > (1ull << 28)) {
        return -19;
      }
      saw_ihdr = true;
    } else if (std::memcmp(type, "PLTE", 4) == 0) {
      out->palette.assign(payload, payload + chunk_len);
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), payload, payload + chunk_len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      saw_iend = true;
    }
    pos += 12 + chunk_len;
  }
  if (!saw_ihdr || idat.empty()) return -16;

  if (int r = samples_for_color_type(out->color_type, &out->samples_per_pixel))
    return r;

  const size_t stride = size_t(out->width) * out->samples_per_pixel;
  std::vector<uint8_t> raw(out->height * (stride + 1));
  int ret = inflate_all(idat.data(), idat.size(), raw);
  if (ret != 0) return ret;

  out->pixels.resize(out->height * stride);
  const size_t bpp = out->samples_per_pixel;  // bytes per pixel at depth 8
  for (uint32_t y = 0; y < out->height; ++y) {
    const uint8_t filter = raw[y * (stride + 1)];
    const uint8_t* src = raw.data() + y * (stride + 1) + 1;
    uint8_t* cur = out->pixels.data() + y * stride;
    const uint8_t* up = y > 0 ? out->pixels.data() + (y - 1) * stride : nullptr;
    switch (filter) {
      case 0:
        std::memcpy(cur, src, stride);
        break;
      case 1:  // Sub
        for (size_t x = 0; x < stride; ++x)
          cur[x] = uint8_t(src[x] + (x >= bpp ? cur[x - bpp] : 0));
        break;
      case 2:  // Up
        for (size_t x = 0; x < stride; ++x)
          cur[x] = uint8_t(src[x] + (up ? up[x] : 0));
        break;
      case 3:  // Average
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= bpp ? cur[x - bpp] : 0;
          int b = up ? up[x] : 0;
          cur[x] = uint8_t(src[x] + ((a + b) >> 1));
        }
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= bpp ? cur[x - bpp] : 0;
          int b = up ? up[x] : 0;
          int c = (up && x >= bpp) ? up[x - bpp] : 0;
          cur[x] = uint8_t(src[x] + paeth(a, b, c));
        }
        break;
      default:
        return -18;
    }
  }
  return 0;
}

// Expand decoded samples to tightly packed RGB (3ch) or first-channel gray.
int to_rgb(const PngImage& img, uint8_t* out) {
  const size_t n = size_t(img.width) * img.height;
  const uint8_t* p = img.pixels.data();
  switch (img.color_type) {
    case 0:
      for (size_t i = 0; i < n; ++i) {
        out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = p[i];
      }
      return 0;
    case 2:
      std::memcpy(out, p, n * 3);
      return 0;
    case 3:
      if (img.palette.size() < 3) return -20;
      for (size_t i = 0; i < n; ++i) {
        size_t idx = size_t(p[i]) * 3;
        if (idx + 2 >= img.palette.size()) return -21;
        out[3 * i] = img.palette[idx];
        out[3 * i + 1] = img.palette[idx + 1];
        out[3 * i + 2] = img.palette[idx + 2];
      }
      return 0;
    case 4:
      for (size_t i = 0; i < n; ++i) {
        out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = p[2 * i];
      }
      return 0;
    case 6:
      for (size_t i = 0; i < n; ++i) {
        out[3 * i] = p[4 * i];
        out[3 * i + 1] = p[4 * i + 1];
        out[3 * i + 2] = p[4 * i + 2];
      }
      return 0;
  }
  return -22;
}

int to_gray_first_channel(const PngImage& img, uint8_t* out) {
  const size_t n = size_t(img.width) * img.height;
  const uint8_t* p = img.pixels.data();
  const uint32_t spp = img.samples_per_pixel;
  // class-map masks store the label in the first channel; transparency is
  // ignored (reference datacoder.py:330-331 decodes with channels=1)
  for (size_t i = 0; i < n; ++i) out[i] = p[i * spp];
  return 0;
}

int read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -30;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 0) {
    std::fclose(f);
    return -31;
  }
  buf.resize(size_t(size));
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  return got == buf.size() ? 0 : -32;
}

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
  std::vector<uint8_t> buf;
  int ret;

  if ((ret = read_file(image_path, buf)) != 0) return ret;
  PngImage img;
  if ((ret = decode_png(buf.data(), buf.size(), &img)) != 0) return ret;
  if (img.width != img_w || img.height != img_h) return -50;
  if ((ret = to_rgb(img, image_out)) != 0) return ret;

  if ((ret = read_file(mask_path, buf)) != 0) return ret;
  PngImage mask;
  if ((ret = decode_png(buf.data(), buf.size(), &mask)) != 0) return ret;
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
    PngImage img;
    int ret = decode_png(data, len, &img);
    if (ret != 0) return ret;
    return to_rgb(img, out);
  } catch (...) {  // bad_alloc etc. must not cross the C ABI
    return -60;
  }
}

int ssdseg_png_decode_gray(const uint8_t* data, size_t len, uint8_t* out) {
  try {
    PngImage img;
    int ret = decode_png(data, len, &img);
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
