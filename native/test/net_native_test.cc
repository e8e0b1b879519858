// Native unit tests for NetNative + the C API (assert-based; no gtest in
// the image). Exercises forward math, training convergence, export
// round-trip, the async ring's FIFO/drop/empty semantics, and the options
// parser.

#include <cassert>
#include <cmath>
#include <cstdio>
#include <vector>

#include "net_c_api.h"
#include "net_native.h"
#include "net_utils.h"

using net::NetDesc;
using net::NetNative;

static NetDesc tiny_net() {
  // 2 -> 2 -> 1, hand-checkable (mirrors tests/test_cpu_reference.py).
  NetDesc d;
  d.n_ins = 2;
  d.n_p_l = {2, 1};
  d.params_flat = {1.0f, -1.0f, 0.5f, 0.5f, 2.0f, -1.0f};
  d.bias_flat = {0.0f, 1.0f, -0.5f};
  d.activations = {1, 0};  // relu, identity
  return d;
}

static void test_forward_hand_computed() {
  NetNative n(tiny_net());
  auto out = n.launch_forward({2.0f, 1.0f});
  // layer0: [1, 2.5] -> relu; layer1: 2*1 - 2.5 - 0.5 = -1
  assert(out.size() == 1);
  assert(std::fabs(out[0] - (-1.0f)) < 1e-6f);
  assert(n.get_forward_performance() >= 0);
  std::puts("forward_hand_computed OK");
}

static void test_training_converges() {
  NetDesc d;
  d.n_ins = 4;
  d.n_p_l = {16, 2};
  d.activations = {1, 0};
  NetNative n(d, /*random_init=*/true, /*seed=*/42);
  // Target: y = x @ W for a fixed random W.
  const std::size_t B = 64;
  net::TrainSet s;
  s.n_sets = B;
  s.n_ins = 4;
  s.n_out = 2;
  unsigned state = 123;
  auto frand = [&state]() {
    state = state * 1664525u + 1013904223u;
    return static_cast<float>(static_cast<int>(state >> 16) % 2000 - 1000) /
           1000.0f;
  };
  std::vector<float> W(4 * 2);
  for (auto& v : W) v = frand();
  s.ins.resize(B * 4);
  s.outs.assign(B * 2, 0.0f);
  for (std::size_t b = 0; b < B; ++b) {
    for (int i = 0; i < 4; ++i) s.ins[b * 4 + i] = frand();
    for (int j = 0; j < 2; ++j)
      for (int i = 0; i < 4; ++i)
        s.outs[b * 2 + j] += s.ins[b * 4 + i] * W[i * 2 + j];
  }
  n.init_gradient(s);
  auto errs = n.launch_gradient(300, 1e-6f, 0.05f);
  float first = errs[0], last = 0.0f;
  for (auto e : errs)
    if (e > 0.0f) last = e;
  std::printf("training loss %.4f -> %.4f\n", first, last);
  assert(last < first * 0.5f);
  assert(n.get_gradient_performance() > 0);
  std::puts("training_converges OK");
}

static void test_export_roundtrip() {
  NetDesc d;
  d.n_ins = 8;
  d.n_p_l = {16, 4};
  d.activations = {1, 1};
  NetNative a(d, true, 7);
  auto exported = a.get_net_data();
  NetNative b(exported);
  std::vector<float> x(8, 0.25f);
  auto ya = a.launch_forward(x);
  auto yb = b.launch_forward(x);
  for (std::size_t i = 0; i < ya.size(); ++i) assert(ya[i] == yb[i]);
  std::puts("export_roundtrip OK");
}

static void test_ring_semantics() {
  NetNative n(tiny_net(), false, 0, /*ring_depth=*/2,
              net::FilterKind::kIdentity);
  // empty -> sentinel
  assert(n.get_filtered_image().empty());
  net::ImageFrame f;
  f.h = 8;
  f.w = 8;
  for (int i = 0; i < 3; ++i) {
    f.pixels.assign(64, static_cast<std::uint8_t>(i));
    f.x_pos = i;
    n.filter_image(f);  // third submit must drop (depth 2)
  }
  // allow worker to finish both frames; retrieval blocks as needed
  auto a = n.get_filtered_image();
  auto b = n.get_filtered_image();
  assert(!a.empty() && !b.empty());
  assert(a.x_pos == 0 && b.x_pos == 1);          // FIFO
  assert(a.pixels[10] == 0 && b.pixels[10] == 1);  // identity filter
  assert(n.ring_dropped() == 1);
  assert(n.get_filtered_image().empty());  // frame 2 was dropped
  std::puts("ring_semantics OK");
}

static void test_filter_matches_reference_semantics() {
  // sharpen on a flat image: interior stays, borders brighten per taps
  std::vector<std::uint8_t> img(16 * 16, 100), out(16 * 16, 0);
  net::filter_frame(img.data(), out.data(), 16, 16,
                    net::FilterKind::kSharpen);
  assert(out[8 * 16 + 8] == 100);   // interior: 5*100 - 4*100
  assert(out[0] == 255);            // corner: 5*100 - 2*100 = 300 -> clip
  std::puts("filter_semantics OK");
}

static void test_c_api_roundtrip() {
  NetDesc d = tiny_net();
  vft_net* h = vft_create(d.n_ins, d.n_p_l.size(), d.n_p_l.data(),
                          d.params_flat.data(), d.bias_flat.data(),
                          d.activations.data(), VFT_BACKEND_NATIVE, 0, 0,
                          24, VFT_FILTER_IDENTITY);
  assert(h != nullptr);
  assert(vft_n_ins(h) == 2 && vft_n_outs(h) == 1);
  assert(vft_n_params(h) == 6 && vft_n_neurons(h) == 3);
  float in[2] = {2.0f, 1.0f}, outv[1] = {0.0f};
  assert(vft_launch_forward(h, in, 2, outv, 1) == 0);
  assert(std::fabs(outv[0] + 1.0f) < 1e-6f);
  float params[6], bias[3];
  assert(vft_get_net_data(h, params, bias) == 0);
  assert(params[0] == 1.0f && bias[2] == -0.5f);
  // error path: wrong output size must fail with a message
  assert(vft_launch_forward(h, in, 2, outv, 7) == -1);
  assert(vft_last_error()[0] != '\0');
  vft_destroy(h);
  std::puts("c_api_roundtrip OK");
}

static void test_options_parser() {
  const char* argv[] = {"prog", "model=vit_b16", "batch=64", "flag=true",
                        "pos"};
  net::utils::Options o(5, argv);
  assert(o.get<std::string>("model") == "vit_b16");
  assert(o.get<int>("batch") == 64);
  assert(o.get<bool>("flag"));
  assert(o.get<int>("missing", 7) == 7);
  assert(o.positional().size() == 1);
  bool threw = false;
  try {
    o.get<int>("model");
  } catch (const net::utils::Error&) {
    threw = true;
  }
  assert(threw);
  std::puts("options_parser OK");
}


static void test_copy_semantics() {
  NetDesc d;
  d.n_ins = 4;
  d.n_p_l = {8, 2};
  d.activations = {1, 0};
  NetNative a(d, true, 11);
  NetNative b(a);  // copy ctor
  std::vector<float> x(4, 0.5f);
  auto ya = a.launch_forward(x);
  auto yb = b.launch_forward(x);
  for (std::size_t i = 0; i < ya.size(); ++i) assert(ya[i] == yb[i]);
  NetNative c(d, true, 99);
  c = a;  // copy assign (same shape must still copy, unlike the reference)
  auto yc = c.launch_forward(x);
  for (std::size_t i = 0; i < ya.size(); ++i) assert(ya[i] == yc[i]);
  std::puts("copy_semantics OK");
}

int main() {
  test_forward_hand_computed();
  test_training_converges();
  test_export_roundtrip();
  test_ring_semantics();
  test_filter_matches_reference_semantics();
  test_c_api_roundtrip();
  test_options_parser();
  test_copy_semantics();
  std::puts("ALL NATIVE TESTS PASSED");
  return 0;
}
