// Demo CLI: exercises the native runtime end-to-end from C++.
//
// Usage:
//   vft_demo [backend=native|tpu] [n_ins=64] [layers=128,32,10]
//            [train_iters=100] [frames=4]
//
// With backend=tpu the binary embeds CPython and drives the JAX runtime —
// run it with PYTHONPATH pointing at the repo (and the axon site dir, if
// TPU hardware is desired).

#include <cstdio>
#include <random>
#include <sstream>
#include <string>
#include <vector>

#include "net_interface.h"
#include "net_native.h"
#include "net_utils.h"
#ifdef VFT_WITH_PYTHON
#include "net_tpu_embed.h"
#endif

static int vit_demo(const net::utils::Options& opts) {
#ifdef VFT_WITH_PYTHON
  const std::string variant = opts.get<std::string>("variant", "vit_ti16");
  const std::size_t image = opts.get<std::size_t>("image", 224);
  const std::size_t classes = opts.get<std::size_t>("classes", 10);
  long long h = net::vit_embed::create(variant, image, classes, 0,
                                       "bfloat16", "");
  std::vector<std::uint8_t> img(image * image * 3);
  for (std::size_t i = 0; i < img.size(); ++i)
    img[i] = static_cast<std::uint8_t>((i * 31) % 251);
  std::int64_t t0 = net::utils::now_ns();
  auto logits = net::vit_embed::forward(h, img.data(), 1, image, image);
  std::int64_t us = (net::utils::now_ns() - t0) / 1000;
  std::printf("vit %s: %zu logits, first=%.4f, %lld us (incl. compile)\n",
              variant.c_str(), logits.size(), logits[0],
              static_cast<long long>(us));
  t0 = net::utils::now_ns();
  logits = net::vit_embed::forward(h, img.data(), 1, image, image);
  us = (net::utils::now_ns() - t0) / 1000;
  std::printf("vit %s warm: %lld us\n", variant.c_str(),
              static_cast<long long>(us));
  net::vit_embed::destroy(h);
  std::puts("vit demo OK");
  return 0;
#else
  (void)opts;
  std::fprintf(stderr, "built without embedded python\n");
  return 2;
#endif
}

int main(int argc, char** argv) {
  net::utils::Options opts(argc, argv);
  const std::string backend = opts.get<std::string>("backend", "native");
  if (backend == "vit") return vit_demo(opts);
  const std::size_t n_ins = opts.get<std::size_t>("n_ins", 64);
  const std::string layers = opts.get<std::string>("layers", "128,32,10");
  const std::size_t train_iters = opts.get<std::size_t>("train_iters", 100);
  const std::size_t frames = opts.get<std::size_t>("frames", 4);

  net::NetDesc desc;
  desc.n_ins = n_ins;
  std::stringstream ss(layers);
  for (std::string tok; std::getline(ss, tok, ',');)
    desc.n_p_l.push_back(std::stoi(tok));
  desc.activations.assign(desc.n_p_l.size(), 1);
  desc.activations.back() = 0;  // identity head

  std::unique_ptr<net::NetInterface> netp;
  if (backend == "tpu") {
#ifdef VFT_WITH_PYTHON
    netp = std::make_unique<net::NetTpu>(desc, /*random_init=*/true, 1);
#else
    std::fprintf(stderr, "built without embedded python\n");
    return 2;
#endif
  } else {
    netp = std::make_unique<net::NetNative>(desc, /*random_init=*/true, 1);
  }

  // forward
  std::vector<float> x(n_ins, 0.1f);
  auto out = netp->launch_forward(x);
  std::printf("forward: %zu outputs, first=%.4f, %lld us\n", out.size(),
              out.empty() ? 0.0 : out[0],
              static_cast<long long>(netp->get_forward_performance()));

  // training on a random linear target
  std::mt19937 rng(3);
  std::uniform_real_distribution<float> dist(-1.0f, 1.0f);
  net::TrainSet s;
  s.n_sets = 32;
  s.n_ins = n_ins;
  s.n_out = desc.n_p_l.back();
  s.ins.resize(s.n_sets * n_ins);
  s.outs.resize(s.n_sets * s.n_out);
  for (auto& v : s.ins) v = dist(rng);
  for (auto& v : s.outs) v = dist(rng);
  netp->init_gradient(s);
  auto errs = netp->launch_gradient(train_iters, 1e-5f, 0.01f);
  float last = 0.0f;
  for (auto e : errs)
    if (e > 0.0f) last = e;
  std::printf("train: loss %.4f -> %.4f in %lld us\n", errs[0], last,
              static_cast<long long>(netp->get_gradient_performance()));

  // streaming pipeline
  net::ImageFrame f;
  f.h = 256;
  f.w = 512;
  f.pixels.assign(f.h * f.w, 0);
  for (std::size_t i = 0; i < frames; ++i) {
    for (std::size_t p = 0; p < f.pixels.size(); ++p)
      f.pixels[p] = static_cast<std::uint8_t>((p + i) % 251);
    f.x_pos = static_cast<std::int64_t>(i);
    netp->filter_image(f);
  }
  std::size_t got = 0;
  for (std::size_t i = 0; i < frames; ++i) {
    auto r = netp->get_filtered_image();
    if (!r.empty()) ++got;
  }
  std::printf("pipeline: %zu/%zu frames retrieved\n", got, frames);

  // export round-trip sanity
  auto desc2 = netp->get_net_data();
  std::printf("export: %zu params, %zu biases\n", desc2.params_flat.size(),
              desc2.bias_flat.size());
  std::puts("demo OK");
  return 0;
}
