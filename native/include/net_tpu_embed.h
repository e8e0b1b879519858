// NetTpu: drives the JAX/XLA runtime from native code via an embedded
// CPython interpreter (see net_tpu_embed.cc for the design notes).
#ifndef VFT_NET_TPU_EMBED_H
#define VFT_NET_TPU_EMBED_H

#include <string>

#include "net_interface.h"

namespace net {

class NetTpu : public NetInterface {
 public:
  // `desc` uses the flat layout of net_types.h. With random_init the
  // params/bias contents are ignored.
  explicit NetTpu(const NetDesc& desc, bool random_init = false,
                  unsigned seed = 0, std::size_t ring_depth = kRingDepth,
                  const std::string& filter_name = "sharpen");
  ~NetTpu() override;

  NetTpu(const NetTpu&) = delete;
  NetTpu& operator=(const NetTpu&) = delete;

  NetDesc get_net_data() override;
  std::vector<data_t> launch_forward(
      const std::vector<data_t>& inputs) override;
  void init_gradient(const TrainSet& sets) override;
  std::vector<data_t> launch_gradient(std::size_t iterations,
                                      data_t error_threshold,
                                      data_t multiplier) override;
  void print_inner_vals() override;
  std::int64_t get_gradient_performance() override;
  std::int64_t get_forward_performance() override;
  void filter_image(const ImageFrame& frame) override;
  ImageFrame get_filtered_image() override;

  std::size_t n_ins() const { return n_ins_; }
  const std::vector<std::int32_t>& n_p_l() const { return n_p_l_; }

 private:
  long long handle_ = 0;
  std::size_t n_ins_ = 0;
  std::vector<std::int32_t> n_p_l_;
  std::vector<std::int32_t> activations_;
};

// ViT model family over the embedded interpreter (C API backing).
namespace vit_embed {

// Returns a bridge handle (> 0) or throws net::utils::Error.
long long create(const std::string& variant, std::size_t image_size,
                 std::size_t num_classes, unsigned seed,
                 const std::string& dtype, const std::string& weights_npz);
// pixels is batch*h*w*3 uint8 RGB; returns batch*num_classes logits.
std::vector<float> forward(long long handle, const std::uint8_t* pixels,
                           std::size_t batch, std::size_t h,
                           std::size_t w);
void destroy(long long handle);

}  // namespace vit_embed

}  // namespace net

#endif  // VFT_NET_TPU_EMBED_H
