// C FFI over the pure-native PJRT client (net_pjrt.h) — the no-Python
// analogue of net_c_api.h's vft_net surface, exported from
// libnet_pjrt.so so any language with a C FFI can drive the TPU client
// (the reference ships its host API as a linkable C++ lib,
// /root/reference/Makefile:75; this is that surface for the TPU stack,
// including the async ring the reference implements with its 24-slot
// OpenCL event chain, src/netFPGA.cpp:319-327).
//
// All functions return 0/!0 style codes documented per function and set
// a thread-local error string readable via vft_pjrt_last_error().
#ifndef VFT_NET_PJRT_C_H
#define VFT_NET_PJRT_C_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct vft_pjrt_model vft_pjrt_model;
typedef struct vft_pjrt_stream vft_pjrt_stream;

// Load plugin + compile the exported model dir (export_pjrt.py).
// Plugin create-options are auto-detected from the plugin filename
// (axon dev plugin vs real libtpu), like vft_pjrt_demo.
// Returns NULL on failure (see vft_pjrt_last_error).
vft_pjrt_model* vft_pjrt_load(const char* plugin_path,
                              const char* model_dir);
void vft_pjrt_model_destroy(vft_pjrt_model* m);

// Sizes in bytes of the per-call input and the output.
size_t vft_pjrt_input_nbytes(const vft_pjrt_model* m);
size_t vft_pjrt_output_nbytes(const vft_pjrt_model* m);

// Blocking forward: raw input bytes in, raw output bytes out.
// Returns 0 on success, -1 on error.
int vft_pjrt_forward(vft_pjrt_model* m, const void* input,
                     size_t input_nbytes, void* output,
                     size_t output_nbytes);
// Host-observed latency of the last blocking forward (microseconds).
int64_t vft_pjrt_last_forward_us(const vft_pjrt_model* m);

// Async in-flight execution ring (net::pjrt::Stream): submit dispatches
// without awaiting device completion; fetch awaits + reads the OLDEST
// in-flight execution (FIFO).  Reference frame-ring semantics: submit
// on a full ring drops (returns 0); fetch on an empty ring returns 0.
vft_pjrt_stream* vft_pjrt_stream_create(vft_pjrt_model* m, size_t depth);
void vft_pjrt_stream_destroy(vft_pjrt_stream* s);
// 1 = submitted, 0 = ring full (dropped), -1 = error.
int vft_pjrt_stream_submit(vft_pjrt_stream* s, const void* input,
                           size_t input_nbytes);
// 1 = fetched, 0 = ring empty, -1 = error.
int vft_pjrt_stream_fetch(vft_pjrt_stream* s, void* output,
                          size_t output_nbytes);
size_t vft_pjrt_stream_in_flight(const vft_pjrt_stream* s);
size_t vft_pjrt_stream_dropped(const vft_pjrt_stream* s);

// Thread-local message for the most recent failure.
const char* vft_pjrt_last_error(void);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // VFT_NET_PJRT_C_H
