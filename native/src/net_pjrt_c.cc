// C FFI shim over the native PJRT client (see net_pjrt_c.h).

#include "net_pjrt_c.h"

#include <cstring>
#include <exception>
#include <memory>
#include <string>
#include <vector>

#include "net_pjrt.h"

namespace {

thread_local std::string g_last_error;

int set_error(const char* where, const std::exception& e) {
  g_last_error = std::string(where) + ": " + e.what();
  return -1;
}

}  // namespace

struct vft_pjrt_model {
  std::shared_ptr<net::pjrt::Runtime> rt;
  std::unique_ptr<net::pjrt::Model> model;
};

struct vft_pjrt_stream {
  std::unique_ptr<net::pjrt::Stream> stream;
};

extern "C" {

vft_pjrt_model* vft_pjrt_load(const char* plugin_path,
                              const char* model_dir) {
  try {
    auto m = std::make_unique<vft_pjrt_model>();
    m->rt = std::make_shared<net::pjrt::Runtime>(
        plugin_path, net::pjrt::default_plugin_options(plugin_path));
    m->model = std::make_unique<net::pjrt::Model>(m->rt, model_dir);
    return m.release();
  } catch (const std::exception& e) {
    set_error("vft_pjrt_load", e);
    return nullptr;
  }
}

void vft_pjrt_model_destroy(vft_pjrt_model* m) { delete m; }

size_t vft_pjrt_input_nbytes(const vft_pjrt_model* m) {
  const net::pjrt::Spec& in = m->model->input_spec();
  size_t n = net::pjrt::dtype_size(in.dtype);
  for (auto d : in.dims) n *= static_cast<size_t>(d);
  return n;
}

size_t vft_pjrt_output_nbytes(const vft_pjrt_model* m) {
  return m->model->output_nbytes();
}

int vft_pjrt_forward(vft_pjrt_model* m, const void* input,
                     size_t input_nbytes, void* output,
                     size_t output_nbytes) {
  try {
    std::vector<std::uint8_t> out =
        m->model->forward_bytes(input, input_nbytes);
    if (out.size() != output_nbytes) {
      g_last_error = "vft_pjrt_forward: output buffer size " +
                     std::to_string(output_nbytes) + " != " +
                     std::to_string(out.size());
      return -1;
    }
    std::memcpy(output, out.data(), out.size());
    return 0;
  } catch (const std::exception& e) {
    return set_error("vft_pjrt_forward", e);
  }
}

int64_t vft_pjrt_last_forward_us(const vft_pjrt_model* m) {
  return m->model->last_forward_us();
}

vft_pjrt_stream* vft_pjrt_stream_create(vft_pjrt_model* m, size_t depth) {
  try {
    auto s = std::make_unique<vft_pjrt_stream>();
    s->stream = std::make_unique<net::pjrt::Stream>(*m->model, depth);
    return s.release();
  } catch (const std::exception& e) {
    set_error("vft_pjrt_stream_create", e);
    return nullptr;
  }
}

void vft_pjrt_stream_destroy(vft_pjrt_stream* s) { delete s; }

int vft_pjrt_stream_submit(vft_pjrt_stream* s, const void* input,
                           size_t input_nbytes) {
  try {
    return s->stream->submit(input, input_nbytes) ? 1 : 0;
  } catch (const std::exception& e) {
    return set_error("vft_pjrt_stream_submit", e);
  }
}

int vft_pjrt_stream_fetch(vft_pjrt_stream* s, void* output,
                          size_t output_nbytes) {
  try {
    std::vector<std::uint8_t> out;
    if (!s->stream->fetch(out)) return 0;
    if (out.size() != output_nbytes) {
      g_last_error = "vft_pjrt_stream_fetch: output buffer size " +
                     std::to_string(output_nbytes) + " != " +
                     std::to_string(out.size());
      return -1;
    }
    std::memcpy(output, out.data(), out.size());
    return 1;
  } catch (const std::exception& e) {
    return set_error("vft_pjrt_stream_fetch", e);
  }
}

size_t vft_pjrt_stream_in_flight(const vft_pjrt_stream* s) {
  return s->stream->in_flight();
}

size_t vft_pjrt_stream_dropped(const vft_pjrt_stream* s) {
  return s->stream->dropped();
}

const char* vft_pjrt_last_error(void) { return g_last_error.c_str(); }

}  // extern "C"
