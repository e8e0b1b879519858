// C FFI over the native runtime — the surface ctypes/cffi (and any non-C++
// caller) binds. Mirrors the full NetInterface contract (BASELINE
// north_star: "the public netAbstract C API is preserved via ctypes/FFI
// bindings over the JAX runtime").
//
// Backends:
//   VFT_BACKEND_NATIVE — in-process C++ compute (NetNative)
//   VFT_BACKEND_TPU    — embedded-Python JAX/XLA runtime (NetTpu); requires
//                        the process to have (or be allowed to start) a
//                        Python interpreter with vit_fpga_tpu importable.
//
// All functions return 0 on success and -1 on error (message via
// vft_last_error(), thread-local).
#ifndef VFT_NET_C_API_H
#define VFT_NET_C_API_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct vft_net vft_net;  // opaque handle

enum {
  VFT_BACKEND_NATIVE = 0,
  VFT_BACKEND_TPU = 1,
};

enum {
  VFT_FILTER_SHARPEN = 0,
  VFT_FILTER_BLUR = 1,
  VFT_FILTER_EDGE = 2,
  VFT_FILTER_IDENTITY = 3,
};

// Create a network. Layout contract matches net_types.h / the reference's
// flat [layer][neuron][input] layout: params_flat has
// sum(n_p_l[l] * fan_in(l)) floats, bias_flat has sum(n_p_l) floats,
// activations has n_layers codes. If random_init != 0 the weight contents
// are ignored and drawn uniform in [-1, 1) from `seed` (pass NULL
// params/bias in that case).
vft_net* vft_create(size_t n_ins, size_t n_layers, const int32_t* n_p_l,
                    const float* params_flat, const float* bias_flat,
                    const int32_t* activations, int backend,
                    int random_init, unsigned seed, size_t ring_depth,
                    int filter_kind);

void vft_destroy(vft_net* net);

// Geometry queries.
size_t vft_n_ins(const vft_net* net);
size_t vft_n_outs(const vft_net* net);
size_t vft_n_params(const vft_net* net);
size_t vft_n_neurons(const vft_net* net);

// Forward: inputs[n_ins] -> outputs[n_outs].
int vft_launch_forward(vft_net* net, const float* inputs, size_t n_inputs,
                       float* outputs, size_t n_outputs);

// Weight export (round-trips exactly; fixes the reference's broken
// exporter). Buffers must hold vft_n_params / vft_n_neurons floats.
int vft_get_net_data(vft_net* net, float* params_flat, float* bias_flat);

// Training: stage a row-major training set, then run SGD.
int vft_init_gradient(vft_net* net, const float* set_ins,
                      const float* set_outs, size_t n_sets, size_t n_out);
// errs_out must hold `iterations` floats (zero-padded after early stop).
int vft_launch_gradient(vft_net* net, size_t iterations,
                        float error_threshold, float multiplier,
                        float* errs_out);

// Perf counters (microseconds of the last launch; 0 before first use).
int64_t vft_get_forward_performance(vft_net* net);
int64_t vft_get_gradient_performance(vft_net* net);

// Debug dump to stdout.
int vft_print_inner_vals(vft_net* net);

// Streaming pipeline. Submit never blocks (drops + returns 1 when the ring
// is full); retrieve returns 1 and leaves `out` untouched when drained,
// else fills out[h*w] (FIFO) and echoes the submit-side x/y bookkeeping.
int vft_filter_image(vft_net* net, const uint8_t* pixels, size_t h,
                     size_t w, int64_t x_pos, int64_t y_pos);
int vft_get_filtered_image(vft_net* net, uint8_t* out, size_t h, size_t w,
                           int64_t* x_pos, int64_t* y_pos);

// ---------------------------------------------------------------------------
// ViT model family (drives the JAX runtime via the embedded interpreter;
// requires a VFT_BACKEND_TPU-capable build). Raw uint8 RGB images in ->
// f32 class logits out, preprocessing fused on device.
// ---------------------------------------------------------------------------

typedef struct vft_vit vft_vit;

// variant: vit_ti16 | vit_s16 | vit_b16 | vit_b32 | vit_l16 | vit_l14 |
// vit_h14. dtype: "bfloat16" | "float32". weights_npz: path to a params
// .npz saved by utils/checkpoint.save_params, or NULL for seeded init.
vft_vit* vft_vit_create(const char* variant, size_t image_size,
                        size_t num_classes, unsigned seed,
                        const char* dtype, const char* weights_npz);
// pixels: batch*h*w*3 uint8 RGB; logits_out: batch*num_classes floats.
int vft_vit_forward(vft_vit* vit, const uint8_t* pixels, size_t batch,
                    size_t h, size_t w, float* logits_out,
                    size_t logits_len);
size_t vft_vit_num_classes(const vft_vit* vit);
void vft_vit_destroy(vft_vit* vit);

// Last error message for this thread ("" if none).
const char* vft_last_error(void);

// Library version string.
const char* vft_version(void);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // VFT_NET_C_API_H
