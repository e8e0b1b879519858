// Data model for the native runtime layer of vit-fpga-tpu.
//
// TPU-native re-design of the reference's data structs (def/defines.h:14-38
// in the upstream repo): the nested-vector network description, training-set
// container and streaming-image container, expressed with flat contiguous
// storage so they cross the C FFI (and the Python bridge) without
// marshalling. Scalar type and init ranges match the reference
// (DATA_TYPE=float, MAX/MIN_RANGE = +/-1; def/defines.h:10-12).
#ifndef VFT_NET_TYPES_H
#define VFT_NET_TYPES_H

#include <cstddef>
#include <cstdint>
#include <vector>

namespace net {

using data_t = float;

constexpr data_t kMaxRange = 1.0f;
constexpr data_t kMinRange = -1.0f;

// Streaming frame geometry defaults (reference: include/netFPGA.h:14-15)
// and in-flight ring depth (reference: BATCH_SIZE 24, src/netFPGA.cpp:12).
constexpr std::size_t kImageHeight = 1080;
constexpr std::size_t kImageWidth = 1920;
constexpr std::size_t kRingDepth = 24;

// Activation codes (shared with the Python side; the reference hard-codes
// a single code 1 = "RELU2", src/netFPGA.cpp:79).
enum class Activation : std::int32_t {
  kIdentity = 0,
  kRelu2 = 1,
  kGelu = 2,
  kTanh = 3,
  kSigmoid = 4,
};

// Dense-network description. Weight layout is the reference's row-major
// [layer][neuron][input] flattening (src/netFPGA.cpp:94-106):
// params_flat holds sum(n_p_l[l] * fan_in(l)) floats where
// fan_in(0) = n_ins and fan_in(l) = n_p_l[l-1]; bias_flat holds one value
// per neuron in layer-major order.
struct NetDesc {
  std::size_t n_ins = 0;
  std::vector<std::int32_t> n_p_l;
  std::vector<data_t> params_flat;
  std::vector<data_t> bias_flat;
  std::vector<std::int32_t> activations;

  std::size_t n_layers() const { return n_p_l.size(); }
  std::size_t fan_in(std::size_t layer) const {
    return layer == 0 ? n_ins : static_cast<std::size_t>(n_p_l[layer - 1]);
  }
  std::size_t n_neurons() const;
  std::size_t n_params() const;
  bool valid() const;
};

// Training set: row-major (n_sets, n_ins) inputs and (n_sets, n_out)
// targets (reference net_sets, def/defines.h:25-29).
struct TrainSet {
  std::size_t n_sets = 0;
  std::size_t n_ins = 0;
  std::size_t n_out = 0;
  std::vector<data_t> ins;   // n_sets * n_ins
  std::vector<data_t> outs;  // n_sets * n_out
};

// Streaming grayscale frame (reference image_set, def/defines.h:31-38):
// flat uint8 pixels plus caller bookkeeping carried through untouched.
struct ImageFrame {
  std::vector<std::uint8_t> pixels;  // h * w
  std::size_t h = 0;
  std::size_t w = 0;
  std::int64_t x_pos = 0;
  std::int64_t y_pos = 0;

  bool empty() const { return pixels.empty(); }
};

}  // namespace net

#endif  // VFT_NET_TYPES_H
