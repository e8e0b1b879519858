#include "net_native.h"

#include <algorithm>
#include <cfenv>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <random>

#include "net_utils.h"

namespace net {

// ---------------------------------------------------------------------------
// NetDesc helpers
// ---------------------------------------------------------------------------

std::size_t NetDesc::n_neurons() const {
  std::size_t n = 0;
  for (auto v : n_p_l) n += static_cast<std::size_t>(v);
  return n;
}

std::size_t NetDesc::n_params() const {
  std::size_t n = 0;
  for (std::size_t l = 0; l < n_p_l.size(); ++l)
    n += static_cast<std::size_t>(n_p_l[l]) * fan_in(l);
  return n;
}

bool NetDesc::valid() const {
  return n_ins > 0 && !n_p_l.empty() &&
         params_flat.size() == n_params() &&
         bias_flat.size() == n_neurons() &&
         activations.size() == n_p_l.size();
}

// ---------------------------------------------------------------------------
// Activations (semantics shared with vit_fpga_tpu/activations.py)
// ---------------------------------------------------------------------------

static inline data_t apply_act(std::int32_t code, data_t x) {
  switch (static_cast<Activation>(code)) {
    case Activation::kIdentity:
      return x;
    case Activation::kRelu2:
      return x > 0.0f ? x : 0.0f;
    case Activation::kGelu: {
      const float c = 0.7978845608028654f;  // sqrt(2/pi)
      return 0.5f * x * (1.0f + std::tanh(c * (x + 0.044715f * x * x * x)));
    }
    case Activation::kTanh:
      return std::tanh(x);
    case Activation::kSigmoid:
      return 1.0f / (1.0f + std::exp(-x));
  }
  throw utils::Error("unknown activation code");
}

static inline data_t act_grad(std::int32_t code, data_t x) {
  switch (static_cast<Activation>(code)) {
    case Activation::kIdentity:
      return 1.0f;
    case Activation::kRelu2:
      return x > 0.0f ? 1.0f : 0.0f;
    case Activation::kTanh: {
      float t = std::tanh(x);
      return 1.0f - t * t;
    }
    case Activation::kSigmoid: {
      float s = 1.0f / (1.0f + std::exp(-x));
      return s * (1.0f - s);
    }
    case Activation::kGelu: {
      const float c = 0.7978845608028654f;
      float inner = c * (x + 0.044715f * x * x * x);
      float t = std::tanh(inner);
      float dinner = c * (1.0f + 3.0f * 0.044715f * x * x);
      return 0.5f * (1.0f + t) + 0.5f * x * (1.0f - t * t) * dinner;
    }
  }
  throw utils::Error("unknown activation code");
}

// ---------------------------------------------------------------------------
// Lifecycle
// ---------------------------------------------------------------------------

NetNative::NetNative(NetDesc desc, bool random_init, unsigned seed,
                     std::size_t ring_depth, FilterKind filter)
    : desc_(std::move(desc)), ring_depth_(ring_depth), filter_(filter) {
  if (random_init) {
    // Reference-style uniform init in [kMinRange, kMaxRange)
    // (src/netFPGA.cpp:82-88), from a seeded PRNG for reproducibility.
    desc_.params_flat.assign(desc_.n_params(), 0.0f);
    desc_.bias_flat.assign(desc_.n_neurons(), 0.0f);
    std::mt19937 rng(seed);
    std::uniform_real_distribution<float> dist(kMinRange, kMaxRange);
    for (auto& v : desc_.params_flat) v = dist(rng);
    for (auto& v : desc_.bias_flat) v = dist(rng);
    if (desc_.activations.empty())
      desc_.activations.assign(desc_.n_layers(),
                               static_cast<std::int32_t>(Activation::kRelu2));
  }
  VFT_CHECK(desc_.valid(), "invalid network description");
  worker_ = std::thread([this] { worker_loop(); });
}

NetNative::NetNative(const NetNative& other)
    : NetNative([&other] {
        // snapshot the current weights under the other's lock via export
        return const_cast<NetNative&>(other).get_net_data();
      }(),
                false, 0, other.ring_depth_, other.filter_) {}

NetNative& NetNative::operator=(const NetNative& other) {
  if (this == &other) return *this;
  NetDesc snap = const_cast<NetNative&>(other).get_net_data();
  {
    std::lock_guard<std::mutex> lk(mu_);
    desc_ = std::move(snap);
    sets_.reset();
    forward_us_ = 0;
    gradient_us_ = 0;
  }
  return *this;
}

NetNative::~NetNative() {
  {
    std::lock_guard<std::mutex> lk(mu_);
    stop_ = true;
  }
  cv_.notify_all();
  if (worker_.joinable()) worker_.join();
}

NetDesc NetNative::get_net_data() {
  // Snapshot under mu_: launch_gradient mutates params_flat in place, so an
  // unlocked read from another thread could see a torn weight set.
  std::lock_guard<std::mutex> lk(mu_);
  return desc_;
}

// ---------------------------------------------------------------------------
// Forward
// ---------------------------------------------------------------------------

std::vector<data_t> NetNative::forward_batch(const data_t* x,
                                             std::size_t batch) {
  std::vector<data_t> cur(x, x + batch * desc_.n_ins);
  std::vector<data_t> next;
  std::size_t p_off = 0, b_off = 0;
  std::size_t fan_in = desc_.n_ins;
  for (std::size_t l = 0; l < desc_.n_layers(); ++l) {
    const std::size_t width = static_cast<std::size_t>(desc_.n_p_l[l]);
    const std::int32_t code = desc_.activations[l];
    next.assign(batch * width, 0.0f);
    const data_t* w = desc_.params_flat.data() + p_off;
    const data_t* b = desc_.bias_flat.data() + b_off;
    for (std::size_t s = 0; s < batch; ++s) {
      const data_t* xi = cur.data() + s * fan_in;
      data_t* yo = next.data() + s * width;
      for (std::size_t j = 0; j < width; ++j) {
        const data_t* wj = w + j * fan_in;
        float acc = 0.0f;
        for (std::size_t i = 0; i < fan_in; ++i) acc += wj[i] * xi[i];
        yo[j] = apply_act(code, acc + b[j]);
      }
    }
    cur.swap(next);
    p_off += width * fan_in;
    b_off += width;
    fan_in = width;
  }
  return cur;
}

std::vector<data_t> NetNative::launch_forward(
    const std::vector<data_t>& inputs) {
  VFT_CHECK(inputs.size() == desc_.n_ins,
            "input size " << inputs.size() << " != n_ins " << desc_.n_ins);
  utils::ScopedTimerUs timer(&forward_us_);
  std::lock_guard<std::mutex> lk(mu_);   // consistent weights vs training
  return forward_batch(inputs.data(), 1);
}

// ---------------------------------------------------------------------------
// Training (full-batch SGD; semantics of backends/cpu.py _loss_and_grads)
// ---------------------------------------------------------------------------

void NetNative::init_gradient(const TrainSet& sets) {
  VFT_CHECK(sets.n_ins == desc_.n_ins, "train set n_ins mismatch");
  VFT_CHECK(sets.ins.size() == sets.n_sets * sets.n_ins &&
                sets.outs.size() == sets.n_sets * sets.n_out,
            "train set sizes inconsistent");
  std::lock_guard<std::mutex> lk(mu_);
  sets_ = sets;
}

void NetNative::backprop(const TrainSet& s, data_t lr, data_t* loss_out) {
  const std::size_t L = desc_.n_layers();
  const std::size_t B = s.n_sets;
  // Forward, keeping pre-activations and activations.
  std::vector<std::vector<data_t>> pre(L), post(L + 1);
  post[0].assign(s.ins.begin(), s.ins.end());
  std::size_t p_off = 0, b_off = 0, fan_in = desc_.n_ins;
  std::vector<std::size_t> p_offs(L), b_offs(L), fan_ins(L);
  for (std::size_t l = 0; l < L; ++l) {
    const std::size_t width = static_cast<std::size_t>(desc_.n_p_l[l]);
    p_offs[l] = p_off;
    b_offs[l] = b_off;
    fan_ins[l] = fan_in;
    pre[l].assign(B * width, 0.0f);
    post[l + 1].assign(B * width, 0.0f);
    const data_t* w = desc_.params_flat.data() + p_off;
    const data_t* b = desc_.bias_flat.data() + b_off;
    for (std::size_t sdx = 0; sdx < B; ++sdx) {
      const data_t* xi = post[l].data() + sdx * fan_in;
      for (std::size_t j = 0; j < width; ++j) {
        const data_t* wj = w + j * fan_in;
        float acc = 0.0f;
        for (std::size_t i = 0; i < fan_in; ++i) acc += wj[i] * xi[i];
        acc += b[j];
        pre[l][sdx * width + j] = acc;
        post[l + 1][sdx * width + j] =
            apply_act(desc_.activations[l], acc);
      }
    }
    p_off += width * fan_in;
    b_off += width;
    fan_in = width;
  }
  // Loss = mean((out - target)^2); g = d loss / d out.
  const std::size_t n_out = static_cast<std::size_t>(desc_.n_p_l[L - 1]);
  std::vector<data_t> g(B * n_out);
  double loss = 0.0;
  for (std::size_t i = 0; i < B * n_out; ++i) {
    float d = post[L][i] - s.outs[i];
    loss += static_cast<double>(d) * d;
    g[i] = 2.0f / static_cast<float>(B * n_out) * d;
  }
  *loss_out = static_cast<data_t>(loss / static_cast<double>(B * n_out));
  // Backward with in-place SGD update.
  for (std::size_t li = L; li-- > 0;) {
    const std::size_t width = static_cast<std::size_t>(desc_.n_p_l[li]);
    const std::size_t fi = fan_ins[li];
    data_t* w = desc_.params_flat.data() + p_offs[li];
    data_t* b = desc_.bias_flat.data() + b_offs[li];
    for (std::size_t i = 0; i < B * width; ++i)
      g[i] *= act_grad(desc_.activations[li], pre[li][i]);
    std::vector<data_t> g_prev;
    if (li > 0) {
      g_prev.assign(B * fi, 0.0f);
      for (std::size_t sdx = 0; sdx < B; ++sdx)
        for (std::size_t j = 0; j < width; ++j) {
          const float gj = g[sdx * width + j];
          const data_t* wj = w + j * fi;
          data_t* gp = g_prev.data() + sdx * fi;
          for (std::size_t i = 0; i < fi; ++i) gp[i] += gj * wj[i];
        }
    }
    for (std::size_t j = 0; j < width; ++j) {
      data_t* wj = w + j * fi;
      float gb = 0.0f;
      for (std::size_t sdx = 0; sdx < B; ++sdx) {
        const float gj = g[sdx * width + j];
        gb += gj;
        const data_t* xi = post[li].data() + sdx * fi;
        for (std::size_t i = 0; i < fi; ++i) wj[i] -= lr * gj * xi[i];
      }
      b[j] -= lr * gb;
    }
    g.swap(g_prev);
  }
}

std::vector<data_t> NetNative::launch_gradient(std::size_t iterations,
                                               data_t error_threshold,
                                               data_t multiplier) {
  VFT_CHECK(sets_.has_value(), "init_gradient must be called first");
  utils::ScopedTimerUs timer(&gradient_us_);
  std::lock_guard<std::mutex> lk(mu_);   // in-place weight updates
  std::vector<data_t> errs(iterations, 0.0f);
  for (std::size_t it = 0; it < iterations; ++it) {
    data_t loss = 0.0f;
    backprop(*sets_, multiplier, &loss);
    errs[it] = loss;
    if (loss < error_threshold) break;
  }
  return errs;
}

void NetNative::print_inner_vals() {
  std::lock_guard<std::mutex> lk(mu_);
  std::size_t p_off = 0, b_off = 0, fan_in = desc_.n_ins;
  for (std::size_t l = 0; l < desc_.n_layers(); ++l) {
    const std::size_t width = static_cast<std::size_t>(desc_.n_p_l[l]);
    double wsum = 0.0, bsum = 0.0;
    for (std::size_t i = 0; i < width * fan_in; ++i)
      wsum += desc_.params_flat[p_off + i];
    for (std::size_t i = 0; i < width; ++i)
      bsum += desc_.bias_flat[b_off + i];
    std::printf("layer %zu: W(%zu,%zu) mean=%.6f b mean=%.6f act=%d\n", l,
                width, fan_in, wsum / (width * fan_in), bsum / width,
                desc_.activations[l]);
    p_off += width * fan_in;
    b_off += width;
    fan_in = width;
  }
}

std::int64_t NetNative::get_gradient_performance() { return gradient_us_; }
std::int64_t NetNative::get_forward_performance() { return forward_us_; }

// ---------------------------------------------------------------------------
// Image filter + async ring
// ---------------------------------------------------------------------------

void filter_frame(const std::uint8_t* in, std::uint8_t* out, std::size_t h,
                  std::size_t w, FilterKind kind) {
  // Taps match vit_fpga_tpu/ops/image_filter.py::FILTERS exactly.
  float k[3][3];
  switch (kind) {
    case FilterKind::kSharpen: {
      float t[3][3] = {{0, -1, 0}, {-1, 5, -1}, {0, -1, 0}};
      std::memcpy(k, t, sizeof(k));
      break;
    }
    case FilterKind::kBlur: {
      float t[3][3] = {{1 / 16.f, 2 / 16.f, 1 / 16.f},
                       {2 / 16.f, 4 / 16.f, 2 / 16.f},
                       {1 / 16.f, 2 / 16.f, 1 / 16.f}};
      std::memcpy(k, t, sizeof(k));
      break;
    }
    case FilterKind::kEdge: {
      float t[3][3] = {{0, 1, 0}, {1, -4, 1}, {0, 1, 0}};
      std::memcpy(k, t, sizeof(k));
      break;
    }
    case FilterKind::kIdentity: {
      float t[3][3] = {{0, 0, 0}, {0, 1, 0}, {0, 0, 0}};
      std::memcpy(k, t, sizeof(k));
      break;
    }
  }
  const int hh = static_cast<int>(h), ww = static_cast<int>(w);
  for (int y = 0; y < hh; ++y) {
    for (int x = 0; x < ww; ++x) {
      float acc = 0.0f;
      for (int dy = -1; dy <= 1; ++dy) {
        const int yy = y + dy;
        if (yy < 0 || yy >= hh) continue;  // zero padding
        for (int dx = -1; dx <= 1; ++dx) {
          const int xx = x + dx;
          if (xx < 0 || xx >= ww) continue;
          acc += k[dy + 1][dx + 1] *
                 static_cast<float>(in[yy * ww + xx]);
        }
      }
      // round-half-to-even like np.rint / jnp.round
      float r = std::nearbyintf(acc);
      out[y * ww + x] = static_cast<std::uint8_t>(
          std::min(255.0f, std::max(0.0f, r)));
    }
  }
}

void NetNative::worker_loop() {
  std::fesetround(FE_TONEAREST);
  for (;;) {
    ImageFrame frame;
    {
      std::unique_lock<std::mutex> lk(mu_);
      cv_.wait(lk, [this] { return stop_ || !pending_.empty(); });
      if (stop_ && pending_.empty()) return;
      frame = std::move(pending_.front());
      pending_.pop_front();
    }
    ImageFrame result;
    result.h = frame.h;
    result.w = frame.w;
    result.x_pos = frame.x_pos;
    result.y_pos = frame.y_pos;
    result.pixels.resize(frame.pixels.size());
    filter_frame(frame.pixels.data(), result.pixels.data(), frame.h,
                 frame.w, filter_);
    {
      std::lock_guard<std::mutex> lk(mu_);
      done_.push_back(std::move(result));
    }
    cv_.notify_all();
  }
}

void NetNative::filter_image(const ImageFrame& frame) {
  VFT_CHECK(frame.pixels.size() == frame.h * frame.w,
            "frame pixel buffer does not match h*w");
  {
    std::lock_guard<std::mutex> lk(mu_);
    if (in_flight_ >= ring_depth_) {
      // Reference behavior: drop with a console warning
      // (src/netFPGA.cpp:330-333).
      ++dropped_;
      std::fprintf(stderr, "vit-fpga-tpu native: ring full, dropping frame\n");
      return;
    }
    pending_.push_back(frame);
    ++in_flight_;
  }
  cv_.notify_all();
}

ImageFrame NetNative::get_filtered_image() {
  std::unique_lock<std::mutex> lk(mu_);
  if (in_flight_ == 0) {
    // Reference behavior: empty sentinel (src/netFPGA.cpp:358-361).
    std::fprintf(stderr, "vit-fpga-tpu native: ring empty\n");
    return ImageFrame{};
  }
  cv_.wait(lk, [this] { return !done_.empty(); });
  ImageFrame out = std::move(done_.front());
  done_.pop_front();
  --in_flight_;
  return out;
}

}  // namespace net
