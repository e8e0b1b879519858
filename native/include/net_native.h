// NetNative: in-process C++ backend (the native parity oracle).
//
// Re-implements the full NetInterface contract with host compute: dense
// forward, real full-batch SGD training, and a genuinely asynchronous
// streaming pipeline (a worker thread + bounded FIFO reproduces the
// overlap the reference got from its OpenCL event ring,
// src/netFPGA.cpp:292-365, with identical drop-on-full / empty-on-drain
// semantics). Numerics match the Python numpy oracle: f32 accumulate,
// round-half-to-even, [0,255] clip for the image filter.
#ifndef VFT_NET_NATIVE_H
#define VFT_NET_NATIVE_H

#include <condition_variable>
#include <deque>
#include <memory>
#include <mutex>
#include <optional>
#include <thread>

#include "net_interface.h"

namespace net {

// 3x3 filter taps, matching vit_fpga_tpu/ops/image_filter.py FILTERS.
enum class FilterKind { kSharpen, kBlur, kEdge, kIdentity };

class NetNative : public NetInterface {
 public:
  explicit NetNative(NetDesc desc, bool random_init = false,
                     unsigned seed = 0,
                     std::size_t ring_depth = kRingDepth,
                     FilterKind filter = FilterKind::kSharpen);
  ~NetNative() override;

  // Copy semantics: weights/config are deep-copied; runtime state (ring
  // contents, perf counters, staged training set) starts fresh in the
  // copy.  The reference's copy-assign is accidentally a no-op for
  // same-shape nets and its move ctor frees uninitialized pointers
  // (SURVEY.md §3.6) — we implement the obviously-intended semantics.
  // Moves stay deleted: the worker thread binds `this`.
  NetNative(const NetNative& other);
  NetNative& operator=(const NetNative& other);
  NetNative(NetNative&&) = delete;
  NetNative& operator=(NetNative&&) = delete;

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

  // Batched forward used by training and the C API: row-major
  // (batch, n_ins) -> (batch, n_out).
  std::vector<data_t> forward_batch(const data_t* x, std::size_t batch);

  std::size_t ring_dropped() const { return dropped_; }

 private:
  void worker_loop();
  void backprop(const TrainSet& s, data_t lr, data_t* loss_out);

  NetDesc desc_;
  std::optional<TrainSet> sets_;
  std::int64_t forward_us_ = 0;
  std::int64_t gradient_us_ = 0;

  // streaming ring state
  std::size_t ring_depth_;
  FilterKind filter_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::deque<ImageFrame> pending_;   // submitted, not yet filtered
  std::deque<ImageFrame> done_;      // filtered, not yet retrieved
  std::size_t in_flight_ = 0;        // pending_ + worker-held + done_
  std::size_t dropped_ = 0;
  bool stop_ = false;
  std::thread worker_;
};

// The filter itself (exposed for tests / the C API).
void filter_frame(const std::uint8_t* in, std::uint8_t* out, std::size_t h,
                  std::size_t w, FilterKind kind);

}  // namespace net

#endif  // VFT_NET_NATIVE_H
