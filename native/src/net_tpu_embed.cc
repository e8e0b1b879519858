// NetTpu: NetInterface backend that drives the JAX/XLA runtime through an
// embedded CPython interpreter.
//
// This is the native analogue of the reference's host->accelerator dispatch
// layer: where net_fpga staged flat arrays into OpenCL device buffers and
// enqueued kernels (src/netFPGA.cpp:239-290, 484-515), NetTpu marshals the
// same flat arrays across the Python boundary into vit_fpga_tpu's NetTPU
// engine (jit cache, device-resident params, async streaming ring all live
// there). Marshalling is bytes-only through vit_fpga_tpu.native_bridge so
// this file needs nothing beyond the stable CPython ABI.

#include "net_tpu_embed.h"

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstring>
#include <mutex>
#include <string>

#include "net_utils.h"

namespace net {
namespace {

std::once_flag g_py_once;
PyThreadState* g_main_tstate = nullptr;

void ensure_python() {
  std::call_once(g_py_once, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
      // Release the GIL acquired by Py_Initialize so worker threads (and
      // this one, via PyGILState_Ensure) can take it on demand.
      g_main_tstate = PyEval_SaveThread();
    }
  });
}

// RAII GIL hold.
class Gil {
 public:
  Gil() : state_(PyGILState_Ensure()) {}
  ~Gil() { PyGILState_Release(state_); }

 private:
  PyGILState_STATE state_;
};

// Throw a net::utils::Error carrying the current Python exception.
[[noreturn]] void raise_py_error(const char* where) {
  std::string msg = std::string("python error in ") + where;
  PyObject *type = nullptr, *value = nullptr, *trace = nullptr;
  PyErr_Fetch(&type, &value, &trace);
  if (value != nullptr) {
    PyObject* s = PyObject_Str(value);
    if (s != nullptr) {
      msg += ": ";
      msg += PyUnicode_AsUTF8(s);
      Py_DECREF(s);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(trace);
  throw utils::Error(msg);
}

PyObject* bridge() {
  static PyObject* mod = nullptr;
  if (mod == nullptr) {
    mod = PyImport_ImportModule("vit_fpga_tpu.native_bridge");
    if (mod == nullptr) raise_py_error("import vit_fpga_tpu.native_bridge");
  }
  return mod;
}

std::vector<data_t> bytes_to_floats(PyObject* obj, const char* where) {
  char* buf = nullptr;
  Py_ssize_t len = 0;
  if (PyBytes_AsStringAndSize(obj, &buf, &len) != 0) raise_py_error(where);
  std::vector<data_t> out(static_cast<std::size_t>(len) / sizeof(data_t));
  std::memcpy(out.data(), buf, out.size() * sizeof(data_t));
  return out;
}

}  // namespace

NetTpu::NetTpu(const NetDesc& desc, bool random_init, unsigned seed,
               std::size_t ring_depth, const std::string& filter_name) {
  VFT_CHECK(random_init || desc.valid(), "invalid network description");
  n_ins_ = desc.n_ins;
  n_p_l_ = desc.n_p_l;
  activations_ = desc.activations;
  if (activations_.empty())
    activations_.assign(n_p_l_.size(),
                        static_cast<std::int32_t>(Activation::kRelu2));
  ensure_python();
  Gil gil;
  PyObject* h = PyObject_CallMethod(
      bridge(), "create", "(ny#y#y#y#iins)",
      static_cast<Py_ssize_t>(desc.n_ins),
      reinterpret_cast<const char*>(n_p_l_.data()),
      static_cast<Py_ssize_t>(n_p_l_.size() * sizeof(std::int32_t)),
      reinterpret_cast<const char*>(desc.params_flat.data()),
      static_cast<Py_ssize_t>(desc.params_flat.size() * sizeof(data_t)),
      reinterpret_cast<const char*>(desc.bias_flat.data()),
      static_cast<Py_ssize_t>(desc.bias_flat.size() * sizeof(data_t)),
      reinterpret_cast<const char*>(activations_.data()),
      static_cast<Py_ssize_t>(activations_.size() * sizeof(std::int32_t)),
      random_init ? 1 : 0, static_cast<int>(seed),
      static_cast<Py_ssize_t>(ring_depth), filter_name.c_str());
  if (h == nullptr) raise_py_error("native_bridge.create");
  handle_ = PyLong_AsLongLong(h);
  Py_DECREF(h);
}

NetTpu::~NetTpu() {
  if (handle_ == 0 || !Py_IsInitialized()) return;
  Gil gil;
  PyObject* r = PyObject_CallMethod(bridge(), "destroy", "(L)", handle_);
  Py_XDECREF(r);
  PyErr_Clear();
}

NetDesc NetTpu::get_net_data() {
  Gil gil;
  PyObject* t =
      PyObject_CallMethod(bridge(), "get_net_data", "(L)", handle_);
  if (t == nullptr) raise_py_error("get_net_data");
  NetDesc out;
  out.n_ins = n_ins_;
  out.n_p_l = n_p_l_;
  out.activations = activations_;
  out.params_flat = bytes_to_floats(PyTuple_GetItem(t, 0), "get_net_data");
  out.bias_flat = bytes_to_floats(PyTuple_GetItem(t, 1), "get_net_data");
  Py_DECREF(t);
  return out;
}

std::vector<data_t> NetTpu::launch_forward(
    const std::vector<data_t>& inputs) {
  VFT_CHECK(inputs.size() == n_ins_, "input size mismatch");
  Gil gil;
  PyObject* r = PyObject_CallMethod(
      bridge(), "forward", "(Ly#)", handle_,
      reinterpret_cast<const char*>(inputs.data()),
      static_cast<Py_ssize_t>(inputs.size() * sizeof(data_t)));
  if (r == nullptr) raise_py_error("forward");
  auto out = bytes_to_floats(r, "forward");
  Py_DECREF(r);
  return out;
}

void NetTpu::init_gradient(const TrainSet& sets) {
  Gil gil;
  PyObject* r = PyObject_CallMethod(
      bridge(), "init_gradient", "(Ly#y#nn)", handle_,
      reinterpret_cast<const char*>(sets.ins.data()),
      static_cast<Py_ssize_t>(sets.ins.size() * sizeof(data_t)),
      reinterpret_cast<const char*>(sets.outs.data()),
      static_cast<Py_ssize_t>(sets.outs.size() * sizeof(data_t)),
      static_cast<Py_ssize_t>(sets.n_sets),
      static_cast<Py_ssize_t>(sets.n_out));
  if (r == nullptr) raise_py_error("init_gradient");
  Py_DECREF(r);
}

std::vector<data_t> NetTpu::launch_gradient(std::size_t iterations,
                                            data_t error_threshold,
                                            data_t multiplier) {
  Gil gil;
  PyObject* r = PyObject_CallMethod(
      bridge(), "launch_gradient", "(Lnff)", handle_,
      static_cast<Py_ssize_t>(iterations),
      static_cast<double>(error_threshold),
      static_cast<double>(multiplier));
  if (r == nullptr) raise_py_error("launch_gradient");
  auto out = bytes_to_floats(r, "launch_gradient");
  Py_DECREF(r);
  return out;
}

void NetTpu::print_inner_vals() {
  Gil gil;
  PyObject* r =
      PyObject_CallMethod(bridge(), "print_inner_vals", "(L)", handle_);
  if (r == nullptr) raise_py_error("print_inner_vals");
  Py_DECREF(r);
}

std::int64_t NetTpu::get_gradient_performance() {
  Gil gil;
  PyObject* r =
      PyObject_CallMethod(bridge(), "gradient_perf", "(L)", handle_);
  if (r == nullptr) raise_py_error("gradient_perf");
  std::int64_t v = PyLong_AsLongLong(r);
  Py_DECREF(r);
  return v;
}

std::int64_t NetTpu::get_forward_performance() {
  Gil gil;
  PyObject* r =
      PyObject_CallMethod(bridge(), "forward_perf", "(L)", handle_);
  if (r == nullptr) raise_py_error("forward_perf");
  std::int64_t v = PyLong_AsLongLong(r);
  Py_DECREF(r);
  return v;
}

void NetTpu::filter_image(const ImageFrame& frame) {
  VFT_CHECK(frame.pixels.size() == frame.h * frame.w,
            "frame pixel buffer does not match h*w");
  Gil gil;
  PyObject* r = PyObject_CallMethod(
      bridge(), "filter_image", "(Ly#nnLL)", handle_,
      reinterpret_cast<const char*>(frame.pixels.data()),
      static_cast<Py_ssize_t>(frame.pixels.size()),
      static_cast<Py_ssize_t>(frame.h), static_cast<Py_ssize_t>(frame.w),
      static_cast<long long>(frame.x_pos),
      static_cast<long long>(frame.y_pos));
  if (r == nullptr) raise_py_error("filter_image");
  Py_DECREF(r);
}

ImageFrame NetTpu::get_filtered_image() {
  Gil gil;
  PyObject* t =
      PyObject_CallMethod(bridge(), "get_filtered_image", "(L)", handle_);
  if (t == nullptr) raise_py_error("get_filtered_image");
  ImageFrame out;
  long status = PyLong_AsLong(PyTuple_GetItem(t, 0));
  if (status == 0) {
    char* buf = nullptr;
    Py_ssize_t len = 0;
    PyBytes_AsStringAndSize(PyTuple_GetItem(t, 1), &buf, &len);
    out.pixels.assign(buf, buf + len);
    out.h = static_cast<std::size_t>(
        PyLong_AsSize_t(PyTuple_GetItem(t, 2)));
    out.w = static_cast<std::size_t>(
        PyLong_AsSize_t(PyTuple_GetItem(t, 3)));
    out.x_pos = PyLong_AsLongLong(PyTuple_GetItem(t, 4));
    out.y_pos = PyLong_AsLongLong(PyTuple_GetItem(t, 5));
  }
  Py_DECREF(t);
  return out;
}

namespace vit_embed {

long long create(const std::string& variant, std::size_t image_size,
                 std::size_t num_classes, unsigned seed,
                 const std::string& dtype,
                 const std::string& weights_npz) {
  ensure_python();
  Gil gil;
  PyObject* h = PyObject_CallMethod(
      bridge(), "vit_create", "(snniss)", variant.c_str(),
      static_cast<Py_ssize_t>(image_size),
      static_cast<Py_ssize_t>(num_classes), static_cast<int>(seed),
      dtype.c_str(), weights_npz.c_str());
  if (h == nullptr) raise_py_error("vit_create");
  long long handle = PyLong_AsLongLong(h);
  Py_DECREF(h);
  return handle;
}

std::vector<float> forward(long long handle, const std::uint8_t* pixels,
                           std::size_t batch, std::size_t h,
                           std::size_t w) {
  Gil gil;
  PyObject* r = PyObject_CallMethod(
      bridge(), "vit_forward", "(Ly#nnn)", handle,
      reinterpret_cast<const char*>(pixels),
      static_cast<Py_ssize_t>(batch * h * w * 3),
      static_cast<Py_ssize_t>(batch), static_cast<Py_ssize_t>(h),
      static_cast<Py_ssize_t>(w));
  if (r == nullptr) raise_py_error("vit_forward");
  auto out = bytes_to_floats(r, "vit_forward");
  Py_DECREF(r);
  return out;
}

void destroy(long long handle) {
  if (!Py_IsInitialized()) return;
  Gil gil;
  PyObject* r = PyObject_CallMethod(bridge(), "vit_destroy", "(L)", handle);
  Py_XDECREF(r);
  PyErr_Clear();
}

}  // namespace vit_embed

}  // namespace net
