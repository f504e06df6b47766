// PNG decode core shared by the loader runtime (dataloader.cpp) and the
// stage-split micro-benchmark (bench_decode.cpp).  Header-only, C++17.
//
// Replaces the TF-native decode path of the reference input pipeline
// (`tf.image.decode_png`, reference ssdseglib/datacoder.py:325-333).
// 8-bit non-interlaced PNGs: gray / gray+alpha / RGB / RGBA / palette.
//
// Round-4 per-core decode optimizations (measured by bench_decode.cpp,
// table in docs/PERFORMANCE.md):
//   - raw-deflate inflate (windowBits -15, zlib header skipped, adler32
//     trailer not computed over the output)
//   - per-bpp specialized unfilter rows with carried left-pixel
//     registers and a branchless Paeth predictor

#pragma once

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace ssdseg {

constexpr uint8_t kPngSignature[8] = {0x89, 'P', 'N', 'G',
                                      '\r', '\n', 0x1a, '\n'};

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
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

// Reusable inflater: inflateInit2 allocates the ~40 KB window state per
// call; `inflateReset2` recycles it (and can change windowBits), saving
// two allocations per decoded sample.
class Inflater {
 public:
  ~Inflater() {
    if (initialized_) inflateEnd(&zs_);
  }

  int run(const uint8_t* src, size_t src_len, int window_bits,
          size_t skip, std::vector<uint8_t>& dst) {
    if (!initialized_) {
      std::memset(&zs_, 0, sizeof(zs_));
      if (inflateInit2(&zs_, window_bits) != Z_OK) return -1;
      initialized_ = true;
    } else if (inflateReset2(&zs_, window_bits) != Z_OK) {
      return -1;
    }
    zs_.next_in = const_cast<Bytef*>(src) + skip;
    zs_.avail_in = static_cast<uInt>(src_len - skip);
    zs_.next_out = dst.data();
    zs_.avail_out = static_cast<uInt>(dst.size());
    int ret = inflate(&zs_, Z_FINISH);
    const size_t total_out = zs_.total_out;
    // raw streams report Z_STREAM_END at end-of-deflate; the 4-byte adler
    // trailer is simply left unconsumed
    if (ret != Z_STREAM_END) return -2;
    if (total_out != dst.size()) return -3;
    return 0;
  }

 private:
  z_stream zs_;
  bool initialized_ = false;
};

// Raw-deflate inflate: PNG IDAT is a zlib stream (2-byte header, deflate
// body, 4-byte adler32).  Decoding the body with windowBits=-15 skips the
// header parse AND the adler32 checksum computed over every output byte —
// the PNG chunk layer has its own CRCs, and a corrupt stream still fails
// via Z_DATA_ERROR / the total_out check below.
inline int inflate_all(const uint8_t* src, size_t src_len,
                       std::vector<uint8_t>& dst,
                       Inflater* inflater = nullptr) {
  if (src_len < 2) return -1;
  // zlib header sanity (CM=8, CINFO<=7, FCHECK): fall back to the zlib
  // wrapper when the stream has a preset dictionary (FDICT) — never
  // produced by PNG encoders, but correctness beats assumptions.
  const bool zlib_wrapped =
      (src[0] & 0x0f) == 8 && ((src[0] << 8) | src[1]) % 31 == 0;
  const bool has_dict = zlib_wrapped && (src[1] & 0x20);
  const int window_bits = (zlib_wrapped && !has_dict) ? -15 : 15;
  const size_t skip = (zlib_wrapped && !has_dict) ? 2 : 0;
  Inflater local;
  Inflater& inf = inflater ? *inflater : local;
  return inf.run(src, src_len, window_bits, skip, dst);
}

inline int samples_for_color_type(uint8_t color_type, uint32_t* spp) {
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
inline int parse_png_header(const uint8_t* data, size_t len, PngImage* out) {
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

// Chunk walk: fills IHDR fields + palette into `out`, concatenates IDAT.
inline int collect_idat(const uint8_t* data, size_t len, PngImage* out,
                        std::vector<uint8_t>& idat) {
  if (len < 8 || std::memcmp(data, kPngSignature, 8) != 0) return -10;
  size_t pos = 8;
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
  return samples_for_color_type(out->color_type, &out->samples_per_pixel);
}

inline int paeth(int a, int b, int c) {
  // branchless predictor: compiles to cmovs instead of the 2-branch
  // cascade (the Paeth rows are the decode hot loop)
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  int bc = pb <= pc ? b : c;
  return (pa <= pb && pa <= pc) ? a : bc;
}

namespace detail {

// Per-bpp specialized rows: the left-pixel dependency stays in locals
// (no cur[x-bpp] reload), the first pixel is peeled (no x>=bpp branch),
// and `__restrict` lets the compiler vectorize the Up/None rows.

template <int BPP>
inline void row_sub(uint8_t* __restrict cur, const uint8_t* __restrict src,
                    size_t stride) {
  uint8_t left[BPP];
  for (int k = 0; k < BPP; ++k) left[k] = cur[k] = src[k];
  for (size_t x = BPP; x < stride; x += BPP)
    for (int k = 0; k < BPP && x + k < stride; ++k)
      left[k] = cur[x + k] = uint8_t(src[x + k] + left[k]);
}

inline void row_up(uint8_t* __restrict cur, const uint8_t* __restrict src,
                   const uint8_t* __restrict up, size_t stride) {
  if (up == nullptr) {
    std::memcpy(cur, src, stride);
    return;
  }
  for (size_t x = 0; x < stride; ++x) cur[x] = uint8_t(src[x] + up[x]);
}

template <int BPP>
inline void row_avg(uint8_t* __restrict cur, const uint8_t* __restrict src,
                    const uint8_t* __restrict up, size_t stride) {
  uint8_t left[BPP];
  for (int k = 0; k < BPP; ++k)
    left[k] = cur[k] = uint8_t(src[k] + ((up ? up[k] : 0) >> 1));
  for (size_t x = BPP; x < stride; x += BPP)
    for (int k = 0; k < BPP && x + k < stride; ++k)
      left[k] = cur[x + k] =
          uint8_t(src[x + k] + ((left[k] + (up ? up[x + k] : 0)) >> 1));
}

template <int BPP>
inline void row_paeth(uint8_t* __restrict cur, const uint8_t* __restrict src,
                      const uint8_t* __restrict up, size_t stride) {
  uint8_t left[BPP], upleft[BPP];
  for (int k = 0; k < BPP; ++k) {
    left[k] = cur[k] = uint8_t(src[k] + paeth(0, up ? up[k] : 0, 0));
    upleft[k] = up ? up[k] : 0;
  }
  for (size_t x = BPP; x < stride; x += BPP)
    for (int k = 0; k < BPP && x + k < stride; ++k) {
      int b = up ? up[x + k] : 0;
      left[k] = cur[x + k] =
          uint8_t(src[x + k] + paeth(left[k], b, upleft[k]));
      upleft[k] = uint8_t(b);
    }
}

template <int BPP>
inline int unfilter_rows(PngImage& img, const std::vector<uint8_t>& raw) {
  const size_t stride = size_t(img.width) * img.samples_per_pixel;
  for (uint32_t y = 0; y < img.height; ++y) {
    const uint8_t filter = raw[y * (stride + 1)];
    const uint8_t* src = raw.data() + y * (stride + 1) + 1;
    uint8_t* cur = img.pixels.data() + y * stride;
    const uint8_t* up =
        y > 0 ? img.pixels.data() + (y - 1) * stride : nullptr;
    switch (filter) {
      case 0:
        std::memcpy(cur, src, stride);
        break;
      case 1:
        row_sub<BPP>(cur, src, stride);
        break;
      case 2:
        row_up(cur, src, up, stride);
        break;
      case 3:
        row_avg<BPP>(cur, src, up, stride);
        break;
      case 4:
        row_paeth<BPP>(cur, src, up, stride);
        break;
      default:
        return -18;
    }
  }
  return 0;
}

}  // namespace detail

inline int unfilter(PngImage& img, const std::vector<uint8_t>& raw) {
  switch (img.samples_per_pixel) {
    case 1: return detail::unfilter_rows<1>(img, raw);
    case 2: return detail::unfilter_rows<2>(img, raw);
    case 3: return detail::unfilter_rows<3>(img, raw);
    case 4: return detail::unfilter_rows<4>(img, raw);
  }
  return -17;
}

// Reusable decode scratch: the IDAT concatenation and filtered-row
// buffers are ~1.8 MB per 480x640 RGB decode; freshly allocating them
// per image costs more than the unfilter itself (mmap + page-fault churn
// — measured 10.2 -> 5.6 ms/decode with buffer reuse + mallopt,
// native/bench_decode.cpp).  Thread-local instances make reuse free in
// the worker pool.
struct DecodeScratch {
  std::vector<uint8_t> idat, raw;
  Inflater inflater;
};

// Parse + inflate + unfilter an 8-bit non-interlaced PNG.  `scratch`
// (optional) recycles the intermediate buffers across calls; `out` also
// reuses its own `pixels`/`palette` capacity when the caller keeps the
// PngImage alive.
inline int decode_png(const uint8_t* data, size_t len, PngImage* out,
                      DecodeScratch* scratch = nullptr) {
  DecodeScratch local;
  DecodeScratch& s = scratch ? *scratch : local;
  s.idat.clear();
  out->palette.clear();
  int ret = collect_idat(data, len, out, s.idat);
  if (ret != 0) return ret;

  const size_t stride = size_t(out->width) * out->samples_per_pixel;
  s.raw.resize(out->height * (stride + 1));
  ret = inflate_all(s.idat.data(), s.idat.size(), s.raw, &s.inflater);
  if (ret != 0) return ret;

  out->pixels.resize(out->height * stride);
  return unfilter(*out, s.raw);
}

// Expand decoded samples to tightly packed RGB (3ch) or first-channel gray.
inline int to_rgb(const PngImage& img, uint8_t* out) {
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

inline int to_gray_first_channel(const PngImage& img, uint8_t* out) {
  const size_t n = size_t(img.width) * img.height;
  const uint8_t* p = img.pixels.data();
  const uint32_t spp = img.samples_per_pixel;
  // class-map masks store the label in the first channel; transparency is
  // ignored (reference datacoder.py:330-331 decodes with channels=1)
  for (size_t i = 0; i < n; ++i) out[i] = p[i * spp];
  return 0;
}

inline int read_file(const char* path, std::vector<uint8_t>& buf) {
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

}  // namespace ssdseg
