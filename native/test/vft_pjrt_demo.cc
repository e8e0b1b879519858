// Pure-native TPU inference demo: PJRT C API, zero Python.
//
//   vft_pjrt_demo model=<dir> [plugin=<path>] [iters=N] [mode=demo]
//   vft_pjrt_demo model=<dir> mode=latency iters=1000
//   vft_pjrt_demo model=<dir> mode=stream frames=256 depth=24
//
// <dir> comes from: python -m vit_fpga_tpu.utils.export_pjrt out=<dir>
// Default plugin resolution order: $VFT_PJRT_PLUGIN, /opt/axon/libaxon_pjrt.so
// (tunneled dev chip), libtpu.so (real TPU host).
//
// mode=demo    — forward passes + argmax logits + the µs forward counter
//                (the reference's PERFORMANCE surface, netFPGA.cpp:262-284).
// mode=latency — N blocking forwards, TRUE per-call percentiles
//                (p50/p90/p95/p99/max) from the host-observed counter: the
//                native client blocks on the device-complete event, so
//                unlike the tunnel-acked Python path these are real
//                per-request latencies.
// mode=stream  — N frames through the bounded in-flight ring
//                (net::pjrt::Stream, the reference's 24-slot event chain):
//                reports frames/s and the overlap factor vs blocking
//                latency (>1.0 = device compute overlapped host work).

#include <unistd.h>

#include <algorithm>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "net_pjrt.h"
#include "net_utils.h"

int main(int argc, char** argv) {
  net::utils::Options opts(argc, argv);
  std::string dir = opts.get<std::string>("model",
                                          std::string("/tmp/vft_pjrt_model"));
  const char* env = std::getenv("VFT_PJRT_PLUGIN");
  std::string plugin = opts.get<std::string>(
      "plugin",
      std::string(env != nullptr ? env : "/opt/axon/libaxon_pjrt.so"));
  const int iters = opts.get<int>("iters", 3);

  // The axon dev plugin (tunneled chip) needs pool-mode create options;
  // a real libtpu.so needs none.  Auto-detected by plugin filename.
  std::vector<net::pjrt::Option> options =
      net::pjrt::default_plugin_options(plugin);

  try {
    auto rt = std::make_shared<net::pjrt::Runtime>(plugin, options);
    std::printf("platform: %s\n", rt->platform_name().c_str());
    net::pjrt::Model model(rt, dir);

    const auto& in = model.input_spec();
    std::size_t in_bytes = net::pjrt::dtype_size(in.dtype);
    std::size_t in_elems = 1;
    for (auto d : in.dims) in_elems *= static_cast<std::size_t>(d);
    in_bytes *= in_elems;
    // deterministic pseudo input (uint8 pattern, or small f32 values)
    std::vector<std::uint8_t> input(in_bytes);
    if (in.dtype == "f32") {
      std::vector<float> xs(in_elems);
      for (std::size_t i = 0; i < in_elems; ++i)
        xs[i] = static_cast<float>((i * 2654435761u) >> 24) / 255.0f;
      std::memcpy(input.data(), xs.data(), in_bytes);
    } else {
      for (std::size_t i = 0; i < input.size(); ++i)
        input[i] = static_cast<std::uint8_t>((i * 2654435761u) >> 24);
    }

    const std::string mode = opts.get<std::string>("mode",
                                                   std::string("demo"));
    if (mode == "latency") {
      const int n = iters > 3 ? iters : 1000;
      model.forward_bytes(input.data(), input.size());  // warm (compile)
      std::vector<long long> us(n);
      for (int i = 0; i < n; ++i) {
        model.forward_bytes(input.data(), input.size());
        us[i] = model.last_forward_us();
      }
      std::sort(us.begin(), us.end());
      auto pct = [&](double p) {
        return us[static_cast<std::size_t>(p / 100.0 * (n - 1))];
      };
      std::printf("latency over %d calls (us): p50=%lld p90=%lld "
                  "p95=%lld p99=%lld max=%lld\n", n, pct(50), pct(90),
                  pct(95), pct(99), us[n - 1]);
      std::printf("PJRT NATIVE DEMO OK\n");
      return 0;
    }
    if (mode == "stream") {
      const int frames = opts.get<int>("frames", 256);
      const int depth = opts.get<int>("depth", 24);
      model.forward_bytes(input.data(), input.size());  // warm (compile)
      // blocking baseline
      const int warm = 16;
      long long block_us = 0;
      for (int i = 0; i < warm; ++i) {
        model.forward_bytes(input.data(), input.size());
        block_us += model.last_forward_us();
      }
      block_us /= warm;
      // pipelined ring
      net::pjrt::Stream stream(model, static_cast<std::size_t>(depth));
      std::vector<std::uint8_t> sink;
      unsigned long long check = 0;
      const auto t0 = std::chrono::high_resolution_clock::now();
      int fetched = 0;
      for (int f = 0; f < frames; ++f) {
        while (stream.in_flight() >= stream.capacity()) {
          if (stream.fetch(sink)) { ++fetched; check += sink[0]; }
        }
        if (!stream.submit(input.data(), input.size())) --f;
      }
      while (stream.fetch(sink)) { ++fetched; check += sink[0]; }
      const auto dt = std::chrono::duration_cast<std::chrono::microseconds>(
          std::chrono::high_resolution_clock::now() - t0).count();
      const double per_frame = static_cast<double>(dt) / frames;
      std::printf("stream: %d frames depth=%d in %.3f ms -> %.1f us/frame "
                  "(%.0f frames/s), fetched=%d dropped=%zu check=%llu\n",
                  frames, depth, dt / 1e3, per_frame, 1e6 / per_frame,
                  fetched, stream.dropped(), check);
      std::printf("blocking latency %lld us -> overlap factor %.2fx\n",
                  block_us, static_cast<double>(block_us) / per_frame);
      if (fetched == frames && per_frame < static_cast<double>(block_us))
        std::printf("PJRT STREAM OVERLAP OK\n");
      std::printf("PJRT NATIVE DEMO OK\n");
      return 0;
    }

    const auto& out = model.output_spec();
    if (out.dtype != "f32") {
      // e.g. the uint8 image-filter program: print a checksum
      std::vector<std::uint8_t> raw;
      for (int it = 0; it < iters; ++it) {
        raw = model.forward_bytes(input.data(), input.size());
        std::printf("iter %d: forward %lld us\n", it,
                    static_cast<long long>(model.last_forward_us()));
      }
      unsigned long long sum = 0;
      for (auto b : raw) sum += b;
      std::printf("output bytes=%zu checksum=%llu\n", raw.size(), sum);
      std::printf("PJRT NATIVE DEMO OK\n");
      return 0;
    }
    const std::size_t batch = static_cast<std::size_t>(out.dims[0]);
    const std::size_t classes = static_cast<std::size_t>(out.dims[1]);
    std::vector<float> logits;
    for (int it = 0; it < iters; ++it) {
      logits = model.forward(input.data(), input.size());
      std::printf("iter %d: forward %lld us\n", it,
                  static_cast<long long>(model.last_forward_us()));
    }
    for (std::size_t b = 0; b < batch; ++b) {
      std::size_t arg = 0;
      for (std::size_t c = 1; c < classes; ++c)
        if (logits[b * classes + c] > logits[b * classes + arg]) arg = c;
      std::printf("image %zu: argmax=%zu logit=%.4f\n", b, arg,
                  logits[b * classes + arg]);
    }
    std::printf("PJRT NATIVE DEMO OK\n");
    return 0;
  } catch (const std::exception& e) {
    std::fprintf(stderr, "vft_pjrt_demo: %s\n", e.what());
    return 1;
  }
}
