// Standalone decode micro-benchmark: splits PNG decode time into
// read / inflate / unfilter / expand so optimization effort lands where
// the time is.  Not part of the .so; build + run:
//   g++ -O3 -march=native -std=c++17 bench_decode.cpp -o /tmp/bench_decode -lz
//   /tmp/bench_decode <image.png> [reps]
// Reports per-stage ms and the implied single-core img/s for the full
// decode (read excluded: the loader reads each file once, the bench
// re-decodes a hot buffer).

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>
#include <malloc.h>

#define SSDSEG_DECODE_BENCH 1
#include "decode_core.h"

using clk = std::chrono::steady_clock;

static double ms_since(clk::time_point t0) {
  return std::chrono::duration<double, std::milli>(clk::now() - t0).count();
}

int main(int argc, char** argv) {
  mallopt(M_MMAP_THRESHOLD, 256 * 1024 * 1024);  // keep big buffers on the reusable heap
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <image.png> [reps]\n", argv[0]);
    return 2;
  }
  const int reps = argc > 2 ? std::atoi(argv[2]) : 200;

  std::vector<uint8_t> buf;
  if (ssdseg::read_file(argv[1], buf) != 0) {
    std::fprintf(stderr, "read failed\n");
    return 1;
  }

  ssdseg::PngImage probe;
  if (ssdseg::decode_png(buf.data(), buf.size(), &probe) != 0) {
    std::fprintf(stderr, "decode failed\n");
    return 1;
  }
  std::printf("%ux%u color_type=%d spp=%u filters:", probe.width,
              probe.height, probe.color_type, probe.samples_per_pixel);
  // filter histogram (re-parse IDAT)
  {
    ssdseg::PngImage img;
    std::vector<uint8_t> idat;
    ssdseg::collect_idat(buf.data(), buf.size(), &img, idat);
    const size_t stride =
        size_t(img.width) * img.samples_per_pixel;
    std::vector<uint8_t> raw(img.height * (stride + 1));
    ssdseg::inflate_all(idat.data(), idat.size(), raw);
    int hist[5] = {0, 0, 0, 0, 0};
    for (uint32_t y = 0; y < img.height; ++y) {
      uint8_t f = raw[y * (stride + 1)];
      if (f < 5) hist[f]++;
    }
    std::printf(" none=%d sub=%d up=%d avg=%d paeth=%d\n", hist[0], hist[1],
                hist[2], hist[3], hist[4]);
  }

  // stage timings
  ssdseg::PngImage img;
  std::vector<uint8_t> idat;
  ssdseg::collect_idat(buf.data(), buf.size(), &img, idat);
  const size_t stride = size_t(img.width) * img.samples_per_pixel;
  std::vector<uint8_t> raw(img.height * (stride + 1));

  auto t0 = clk::now();
  for (int i = 0; i < reps; ++i)
    ssdseg::inflate_all(idat.data(), idat.size(), raw);
  double inflate_ms = ms_since(t0) / reps;

  img.pixels.resize(img.height * stride);
  t0 = clk::now();
  for (int i = 0; i < reps; ++i)
    ssdseg::unfilter(img, raw);
  double unfilter_ms = ms_since(t0) / reps;

  std::vector<uint8_t> rgb(size_t(img.width) * img.height * 3);
  t0 = clk::now();
  for (int i = 0; i < reps; ++i) ssdseg::to_rgb(img, rgb.data());
  double expand_ms = ms_since(t0) / reps;

  ssdseg::PngImage full;
  t0 = clk::now();
  for (int i = 0; i < reps; ++i) {
    full = ssdseg::PngImage();
    ssdseg::decode_png(buf.data(), buf.size(), &full);
    ssdseg::to_rgb(full, rgb.data());
  }
  double total_ms = ms_since(t0) / reps;

  std::printf(
      "inflate %.3f ms  unfilter %.3f ms  expand %.3f ms  "
      "full-decode %.3f ms (%.0f img/s/core)\n",
      inflate_ms, unfilter_ms, expand_ms, total_ms, 1000.0 / total_ms);
  return 0;
}
