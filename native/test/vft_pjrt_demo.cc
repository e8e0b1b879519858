// Pure-native TPU inference demo: PJRT C API, zero Python.
//
//   vft_pjrt_demo model=<dir> [plugin=<path>] [iters=N]
//
// <dir> comes from: python -m vit_fpga_tpu.utils.export_pjrt out=<dir>
// Default plugin resolution order: $VFT_PJRT_PLUGIN, /opt/axon/libaxon_pjrt.so
// (tunneled dev chip), libtpu.so (real TPU host).
//
// Prints the argmax logits per image plus the µs forward counter — the
// same observable surface as the reference's PERFORMANCE build
// (/root/reference/src/netFPGA.cpp:262-284).

#include <unistd.h>

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
  // a real libtpu.so needs none.  Auto-detect by plugin filename.
  std::vector<net::pjrt::Option> options;
  if (plugin.find("axon") != std::string::npos) {
    const char* topo = std::getenv("PALLAS_AXON_TPU_GEN");
    std::string topology =
        std::string(topo != nullptr ? topo : "v5e") + ":1x1x1";
    auto s = [](const char* k, std::string v) {
      net::pjrt::Option o; o.key = k; o.str = std::move(v); return o;
    };
    auto n = [](const char* k, std::int64_t v) {
      net::pjrt::Option o; o.key = k; o.i64 = v; o.is_int = true; return o;
    };
    options = {n("remote_compile", 1), n("local_only", 0),
               n("priority", 0), s("topology", topology),
               n("n_slices", 1),
               s("session_id",
                 "vft-native-" + std::to_string(::getpid())),
               n("rank", 0xFFFFFFFFll)};
  }

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
