// Backend-agnostic network interface for native callers.
//
// Native mirror of the reference's pure-virtual net::net_abstract
// (include/netAbstract.h:8-21): the same nine-capability contract —
// weight export, forward inference, training staging + launch, debug
// introspection, microsecond perf counters, and the bounded streaming
// image pipeline — re-expressed over the flat data model in net_types.h.
// Implementations: NetNative (in-process C++ compute, the parity oracle
// for native callers) and NetTpu (delegates to the JAX/XLA runtime through
// an embedded Python interpreter). Both also surface through the C FFI in
// net_c_api.h for ctypes/cffi and non-C++ callers.
#ifndef VFT_NET_INTERFACE_H
#define VFT_NET_INTERFACE_H

#include <cstdint>
#include <vector>

#include "net_types.h"

namespace net {

class NetInterface {
 public:
  virtual ~NetInterface() = default;

  // Export the current weights (must round-trip exactly; the reference's
  // exporter was broken, src/netFPGA.cpp:206-237).
  virtual NetDesc get_net_data() = 0;

  // One forward pass: inputs.size() == n_ins, returns the last layer's
  // activations (reference launch_forward, src/netFPGA.cpp:239-290).
  virtual std::vector<data_t> launch_forward(
      const std::vector<data_t>& inputs) = 0;

  // Stage a training set (real training; the reference stubs it,
  // src/netFPGA.cpp:518-580).
  virtual void init_gradient(const TrainSet& sets) = 0;

  // Up to `iterations` full-batch SGD steps at learning rate `multiplier`,
  // early-stopping below `error_threshold`; returns per-iteration MSE
  // losses (zero-padded after early stop).
  virtual std::vector<data_t> launch_gradient(std::size_t iterations,
                                              data_t error_threshold,
                                              data_t multiplier) = 0;

  // Debug introspection.
  virtual void print_inner_vals() = 0;

  // Wall-clock microseconds of the last gradient / forward launch
  // (reference perf counters, src/netFPGA.cpp:593-611).
  virtual std::int64_t get_gradient_performance() = 0;
  virtual std::int64_t get_forward_performance() = 0;

  // Streaming pipeline: submit drops the frame with a warning when the
  // ring is full (reference src/netFPGA.cpp:330-333); retrieve returns an
  // empty frame when drained (src/netFPGA.cpp:358-361); FIFO otherwise.
  virtual void filter_image(const ImageFrame& frame) = 0;
  virtual ImageFrame get_filtered_image() = 0;
};

}  // namespace net

#endif  // VFT_NET_INTERFACE_H
