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
    for (auto d : in.dims) in_bytes *= static_cast<std::size_t>(d);
    // deterministic pseudo-image batch
    std::vector<std::uint8_t> pixels(in_bytes);
    for (std::size_t i = 0; i < pixels.size(); ++i)
      pixels[i] = static_cast<std::uint8_t>((i * 2654435761u) >> 24);

    const auto& out = model.output_spec();
    const std::size_t batch = static_cast<std::size_t>(out.dims[0]);
    const std::size_t classes = static_cast<std::size_t>(out.dims[1]);
    std::vector<float> logits;
    for (int it = 0; it < iters; ++it) {
      logits = model.forward(pixels.data(), pixels.size());
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
