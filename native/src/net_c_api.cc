// C FFI implementation over the NetInterface backends.

#include "net_c_api.h"

#include <cstring>
#include <memory>
#include <string>

#include "net_interface.h"
#include "net_native.h"
#include "net_utils.h"

#ifdef VFT_WITH_PYTHON
#include "net_tpu_embed.h"
#endif

namespace {

thread_local std::string t_last_error;

void set_error(const std::string& msg) { t_last_error = msg; }

net::FilterKind to_filter(int kind) {
  switch (kind) {
    case VFT_FILTER_BLUR:
      return net::FilterKind::kBlur;
    case VFT_FILTER_EDGE:
      return net::FilterKind::kEdge;
    case VFT_FILTER_IDENTITY:
      return net::FilterKind::kIdentity;
    default:
      return net::FilterKind::kSharpen;
  }
}

const char* filter_name(int kind) {
  switch (kind) {
    case VFT_FILTER_BLUR:
      return "blur";
    case VFT_FILTER_EDGE:
      return "edge";
    case VFT_FILTER_IDENTITY:
      return "identity";
    default:
      return "sharpen";
  }
}

}  // namespace

struct vft_net {
  std::unique_ptr<net::NetInterface> impl;
  net::NetDesc geometry;  // shapes only (params may be stale)
};

extern "C" {

vft_net* vft_create(size_t n_ins, size_t n_layers, const int32_t* n_p_l,
                    const float* params_flat, const float* bias_flat,
                    const int32_t* activations, int backend,
                    int random_init, unsigned seed, size_t ring_depth,
                    int filter_kind) {
  try {
    net::NetDesc desc;
    desc.n_ins = n_ins;
    desc.n_p_l.assign(n_p_l, n_p_l + n_layers);
    if (activations != nullptr)
      desc.activations.assign(activations, activations + n_layers);
    else
      desc.activations.assign(
          n_layers, static_cast<int32_t>(net::Activation::kRelu2));
    if (!random_init) {
      VFT_CHECK(params_flat != nullptr && bias_flat != nullptr,
                "weights required unless random_init");
      desc.params_flat.assign(params_flat, params_flat + desc.n_params());
      desc.bias_flat.assign(bias_flat, bias_flat + desc.n_neurons());
    }
    auto holder = std::make_unique<vft_net>();
    if (backend == VFT_BACKEND_TPU) {
#ifdef VFT_WITH_PYTHON
      holder->impl = std::make_unique<net::NetTpu>(
          desc, random_init != 0, seed, ring_depth,
          filter_name(filter_kind));
#else
      VFT_CHECK(false, "library built without embedded-Python support");
#endif
    } else {
      holder->impl = std::make_unique<net::NetNative>(
          std::move(desc), random_init != 0, seed, ring_depth,
          to_filter(filter_kind));
    }
    holder->geometry.n_ins = n_ins;
    holder->geometry.n_p_l.assign(n_p_l, n_p_l + n_layers);
    return holder.release();
  } catch (const std::exception& e) {
    set_error(e.what());
    return nullptr;
  }
}

void vft_destroy(vft_net* net) { delete net; }

size_t vft_n_ins(const vft_net* net) { return net->geometry.n_ins; }

size_t vft_n_outs(const vft_net* net) {
  return static_cast<size_t>(net->geometry.n_p_l.back());
}

size_t vft_n_params(const vft_net* net) {
  return net->geometry.n_params();
}

size_t vft_n_neurons(const vft_net* net) {
  return net->geometry.n_neurons();
}

#define VFT_TRY(body)                  \
  try {                                \
    body;                              \
    return 0;                          \
  } catch (const std::exception& e) {  \
    set_error(e.what());               \
    return -1;                         \
  }

int vft_launch_forward(vft_net* net, const float* inputs, size_t n_inputs,
                       float* outputs, size_t n_outputs) {
  VFT_TRY({
    std::vector<float> in(inputs, inputs + n_inputs);
    auto out = net->impl->launch_forward(in);
    VFT_CHECK(out.size() == n_outputs, "output buffer size "
                                           << n_outputs << " != "
                                           << out.size());
    std::memcpy(outputs, out.data(), out.size() * sizeof(float));
  })
}

int vft_get_net_data(vft_net* net, float* params_flat, float* bias_flat) {
  VFT_TRY({
    auto desc = net->impl->get_net_data();
    std::memcpy(params_flat, desc.params_flat.data(),
                desc.params_flat.size() * sizeof(float));
    std::memcpy(bias_flat, desc.bias_flat.data(),
                desc.bias_flat.size() * sizeof(float));
  })
}

int vft_init_gradient(vft_net* net, const float* set_ins,
                      const float* set_outs, size_t n_sets, size_t n_out) {
  VFT_TRY({
    net::TrainSet s;
    s.n_sets = n_sets;
    s.n_ins = net->geometry.n_ins;
    s.n_out = n_out;
    s.ins.assign(set_ins, set_ins + n_sets * s.n_ins);
    s.outs.assign(set_outs, set_outs + n_sets * n_out);
    net->impl->init_gradient(s);
  })
}

int vft_launch_gradient(vft_net* net, size_t iterations,
                        float error_threshold, float multiplier,
                        float* errs_out) {
  VFT_TRY({
    auto errs =
        net->impl->launch_gradient(iterations, error_threshold, multiplier);
    std::memcpy(errs_out, errs.data(), errs.size() * sizeof(float));
  })
}

int64_t vft_get_forward_performance(vft_net* net) {
  return net->impl->get_forward_performance();
}

int64_t vft_get_gradient_performance(vft_net* net) {
  return net->impl->get_gradient_performance();
}

int vft_print_inner_vals(vft_net* net) {
  VFT_TRY({ net->impl->print_inner_vals(); })
}

int vft_filter_image(vft_net* net, const uint8_t* pixels, size_t h,
                     size_t w, int64_t x_pos, int64_t y_pos) {
  VFT_TRY({
    net::ImageFrame f;
    f.pixels.assign(pixels, pixels + h * w);
    f.h = h;
    f.w = w;
    f.x_pos = x_pos;
    f.y_pos = y_pos;
    net->impl->filter_image(f);
  })
}

int vft_get_filtered_image(vft_net* net, uint8_t* out, size_t h, size_t w,
                           int64_t* x_pos, int64_t* y_pos) {
  try {
    auto frame = net->impl->get_filtered_image();
    if (frame.empty()) return 1;
    VFT_CHECK(frame.pixels.size() == h * w,
              "retrieved frame size mismatch");
    std::memcpy(out, frame.pixels.data(), frame.pixels.size());
    if (x_pos != nullptr) *x_pos = frame.x_pos;
    if (y_pos != nullptr) *y_pos = frame.y_pos;
    return 0;
  } catch (const std::exception& e) {
    set_error(e.what());
    return -1;
  }
}

// -- ViT family ---------------------------------------------------------

struct vft_vit {
  long long handle = 0;
  size_t num_classes = 0;
};

vft_vit* vft_vit_create(const char* variant, size_t image_size,
                        size_t num_classes, unsigned seed,
                        const char* dtype, const char* weights_npz) {
#ifdef VFT_WITH_PYTHON
  try {
    auto v = std::make_unique<vft_vit>();
    v->handle = net::vit_embed::create(
        variant ? variant : "vit_b16", image_size, num_classes, seed,
        dtype ? dtype : "bfloat16", weights_npz ? weights_npz : "");
    v->num_classes = num_classes;
    return v.release();
  } catch (const std::exception& e) {
    set_error(e.what());
    return nullptr;
  }
#else
  (void)variant; (void)image_size; (void)num_classes; (void)seed;
  (void)dtype; (void)weights_npz;
  set_error("library built without embedded-Python support");
  return nullptr;
#endif
}

int vft_vit_forward(vft_vit* vit, const uint8_t* pixels, size_t batch,
                    size_t h, size_t w, float* logits_out,
                    size_t logits_len) {
#ifdef VFT_WITH_PYTHON
  try {
    auto out = net::vit_embed::forward(vit->handle, pixels, batch, h, w);
    VFT_CHECK(out.size() == logits_len,
              "logits buffer " << logits_len << " != " << out.size());
    std::memcpy(logits_out, out.data(), out.size() * sizeof(float));
    return 0;
  } catch (const std::exception& e) {
    set_error(e.what());
    return -1;
  }
#else
  (void)vit; (void)pixels; (void)batch; (void)h; (void)w;
  (void)logits_out; (void)logits_len;
  set_error("library built without embedded-Python support");
  return -1;
#endif
}

size_t vft_vit_num_classes(const vft_vit* vit) { return vit->num_classes; }

void vft_vit_destroy(vft_vit* vit) {
  if (vit == nullptr) return;
#ifdef VFT_WITH_PYTHON
  net::vit_embed::destroy(vit->handle);
#endif
  delete vit;
}

const char* vft_last_error(void) { return t_last_error.c_str(); }

const char* vft_version(void) { return "0.1.0"; }

}  // extern "C"
