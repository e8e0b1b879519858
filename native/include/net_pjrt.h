// Pure-native TPU client over the PJRT C API — no Python anywhere.
//
// The reference ships a static library an application links directly
// (/root/reference/Makefile:75,94-95); its device programs are precompiled
// .aocx bitstreams loaded at runtime (src/netFPGA.cpp:388-390).  The
// TPU-native analogue: the model is AOT-lowered to StableHLO by
// vit_fpga_tpu/utils/export_pjrt.py (the ".aocx" of this stack), and this
// client dlopens a PJRT plugin (libtpu.so on a TPU host), compiles the
// program, stages the weights once (device residency ≙ _load_params,
// src/netFPGA.cpp:484-515), and runs forward passes with microsecond perf
// counters (≙ src/netFPGA.cpp:262-284).  `ldd` on the linking binary shows
// no libpython.
#ifndef VFT_NET_PJRT_H
#define VFT_NET_PJRT_H

#include <cstdint>
#include <deque>
#include <memory>
#include <string>
#include <vector>

struct PJRT_Api;
struct PJRT_Client;
struct PJRT_Device;
struct PJRT_Buffer;
struct PJRT_Event;
struct PJRT_LoadedExecutable;

namespace net {
namespace pjrt {

// One logical array argument or result.
struct Spec {
  std::string dtype;               // f32 | bf16 | u8 | i8 | i32
  std::vector<std::int64_t> dims;
  std::size_t offset = 0;          // into weights.bin (weights only)
  std::size_t nbytes = 0;
  bool is_input = false;           // per-call data (vs staged weight)
};

std::size_t dtype_size(const std::string& dtype);

// Plugin create-option (string- or int-valued PJRT_NamedValue).
struct Option {
  std::string key;
  std::string str;      // used when is_int == false
  std::int64_t i64 = 0;
  bool is_int = false;
};

// Create-options auto-detected from the plugin filename: the axon dev
// plugin (tunneled chip) needs pool-mode options; a real libtpu.so
// needs none.  Used by vft_pjrt_demo and the C FFI (net_pjrt_c.h).
std::vector<Option> default_plugin_options(const std::string& plugin_path);

// Thin RAII runtime: plugin + client + one addressable device.
class Runtime {
 public:
  explicit Runtime(const std::string& plugin_path,
                   const std::vector<Option>& options = {});
  ~Runtime();
  Runtime(const Runtime&) = delete;
  Runtime& operator=(const Runtime&) = delete;

  const PJRT_Api* api() const { return api_; }
  PJRT_Client* client() const { return client_; }
  PJRT_Device* device() const { return device_; }
  std::string platform_name() const { return platform_; }

 private:
  void* dl_ = nullptr;
  const PJRT_Api* api_ = nullptr;
  PJRT_Client* client_ = nullptr;
  PJRT_Device* device_ = nullptr;
  std::string platform_;
};

// A compiled model with staged (device-resident) weights.
class Model {
 public:
  // `dir` holds model.mlir / compile_options.pb / weights.bin /
  // manifest.txt (see export_pjrt.py).
  Model(std::shared_ptr<Runtime> rt, const std::string& dir);
  ~Model();
  Model(const Model&) = delete;
  Model& operator=(const Model&) = delete;

  // Runs the program on `input` (raw bytes of the single per-call input
  // arg; shape/dtype per manifest) and returns the f32 output flattened.
  std::vector<float> forward(const void* input_data,
                             std::size_t input_nbytes);
  // Same, but returns the raw output bytes in the manifest's out dtype
  // (e.g. the uint8 image-filter program).
  std::vector<std::uint8_t> forward_bytes(const void* input_data,
                                          std::size_t input_nbytes);

  const Spec& input_spec() const { return specs_[input_idx_]; }
  const Spec& output_spec() const { return out_spec_; }
  std::int64_t last_forward_us() const { return forward_us_; }
  std::size_t output_nbytes() const;

  // Low-level async primitives (used by Stream; forward_bytes composes
  // them).  execute_async stages the input and dispatches WITHOUT
  // awaiting device completion; await_and_read blocks on the completion
  // event, reads the result back, and destroys both buffers.
  struct Pending {
    PJRT_Buffer* in = nullptr;
    PJRT_Buffer* out = nullptr;
    PJRT_Event* done = nullptr;
  };
  Pending execute_async(const void* input_data, std::size_t input_nbytes);
  void await_and_read(Pending& p, std::vector<std::uint8_t>& host_out);

 private:
  std::shared_ptr<Runtime> rt_;
  PJRT_LoadedExecutable* exe_ = nullptr;
  std::vector<Spec> specs_;
  std::size_t input_idx_ = 0;
  Spec out_spec_;
  std::vector<PJRT_Buffer*> weight_bufs_;   // staged once
  std::int64_t forward_us_ = 0;
};

// Bounded in-flight execution ring — the reference's 24-slot event chain
// (src/netFPGA.cpp:12,319-327: enqueue depends on the event 24 frames
// back) done natively on TPU.  submit() dispatches without awaiting
// device completion so up to `depth` executions queue on the device
// stream while the host stages the next frame; fetch() awaits and reads
// back the OLDEST in-flight execution (FIFO).  Streaming throughput then
// exceeds 1/latency: device compute overlaps host staging and readback.
//
// Semantics mirror runtime/pipeline.StreamingRing (and the reference
// frame ring): submit on a full ring DROPS the frame (returns false);
// fetch on an empty ring returns false.
class Stream {
 public:
  explicit Stream(Model& model, std::size_t depth = 24);
  ~Stream();   // drains (awaits + releases) any outstanding work

  bool submit(const void* input_data, std::size_t input_nbytes);
  bool fetch(std::vector<std::uint8_t>& out);
  std::size_t in_flight() const { return q_.size(); }
  std::size_t capacity() const { return depth_; }
  std::size_t dropped() const { return dropped_; }

 private:
  Model& model_;
  std::size_t depth_;
  std::deque<Model::Pending> q_;
  std::size_t dropped_ = 0;
};

}  // namespace pjrt
}  // namespace net

#endif  // VFT_NET_PJRT_H
