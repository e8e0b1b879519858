// PJRT C-API client implementation (see net_pjrt.h for the design notes).
//
// Error handling mirrors the reference's fail-fast checkError discipline
// (src/netFPGA.cpp passim): every PJRT call goes through CHECK_PJRT which
// converts a PJRT_Error into net::utils::Error with the plugin's message.

#include "net_pjrt.h"

#include <dlfcn.h>
#include <unistd.h>

#include <chrono>
#include <cstdlib>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>

#include "net_utils.h"
#include "pjrt_c_api.h"

namespace net {
namespace pjrt {

namespace {

std::string error_message(const PJRT_Api* api, PJRT_Error* err) {
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  api->PJRT_Error_Destroy(&dargs);
  return msg;
}

#define CHECK_PJRT(api, call)                                        \
  do {                                                               \
    PJRT_Error* _err = (call);                                       \
    if (_err != nullptr) {                                           \
      throw net::utils::Error(std::string(#call) + ": " +            \
                              error_message((api), _err));           \
    }                                                                \
  } while (0)

void await_event(const PJRT_Api* api, PJRT_Event* ev) {
  if (ev == nullptr) return;
  PJRT_Event_Await_Args aargs;
  std::memset(&aargs, 0, sizeof(aargs));
  aargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  aargs.event = ev;
  PJRT_Error* err = api->PJRT_Event_Await(&aargs);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = ev;
  api->PJRT_Event_Destroy(&dargs);
  if (err != nullptr)
    throw net::utils::Error("PJRT_Event_Await: " +
                            error_message(api, err));
}

std::string read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw net::utils::Error("cannot open " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

PJRT_Buffer_Type buffer_type(const std::string& dtype) {
  if (dtype == "f32") return PJRT_Buffer_Type_F32;
  if (dtype == "bf16") return PJRT_Buffer_Type_BF16;
  if (dtype == "u8") return PJRT_Buffer_Type_U8;
  if (dtype == "i8") return PJRT_Buffer_Type_S8;
  if (dtype == "i32") return PJRT_Buffer_Type_S32;
  throw net::utils::Error("unsupported dtype " + dtype);
}

PJRT_Buffer* to_device(const PJRT_Api* api, PJRT_Client* client,
                       PJRT_Device* device, const void* data,
                       const Spec& spec) {
  PJRT_Client_BufferFromHostBuffer_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  args.client = client;
  args.data = data;
  args.type = buffer_type(spec.dtype);
  args.dims = spec.dims.data();
  args.num_dims = spec.dims.size();
  args.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  args.device = device;
  CHECK_PJRT(api, api->PJRT_Client_BufferFromHostBuffer(&args));
  await_event(api, args.done_with_host_buffer);
  return args.buffer;
}

void destroy_buffer(const PJRT_Api* api, PJRT_Buffer* buf) {
  if (buf == nullptr) return;
  PJRT_Buffer_Destroy_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  args.buffer = buf;
  api->PJRT_Buffer_Destroy(&args);
}

}  // namespace

std::size_t dtype_size(const std::string& dtype) {
  if (dtype == "f32" || dtype == "i32") return 4;
  if (dtype == "bf16") return 2;
  return 1;
}

std::vector<Option> default_plugin_options(const std::string& plugin_path) {
  std::vector<Option> options;
  if (plugin_path.find("axon") == std::string::npos) return options;
  // axon dev plugin (tunneled chip): pool-mode create options
  const char* topo = std::getenv("PALLAS_AXON_TPU_GEN");
  std::string topology =
      std::string(topo != nullptr ? topo : "v5e") + ":1x1x1";
  auto s = [](const char* k, std::string v) {
    Option o; o.key = k; o.str = std::move(v); return o;
  };
  auto n = [](const char* k, std::int64_t v) {
    Option o; o.key = k; o.i64 = v; o.is_int = true; return o;
  };
  options = {n("remote_compile", 1), n("local_only", 0),
             n("priority", 0), s("topology", topology),
             n("n_slices", 1),
             s("session_id", "vft-native-" + std::to_string(::getpid())),
             n("rank", 0xFFFFFFFFll)};
  return options;
}

// ---------------------------------------------------------------------------
// Runtime
// ---------------------------------------------------------------------------

Runtime::Runtime(const std::string& plugin_path,
                 const std::vector<Option>& options) {
  dl_ = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (dl_ == nullptr)
    throw utils::Error("dlopen(" + plugin_path + "): " + dlerror());
  using GetApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetApiFn>(dlsym(dl_, "GetPjrtApi"));
  if (get_api == nullptr)
    throw utils::Error(plugin_path + " has no GetPjrtApi symbol");
  api_ = get_api();
  VFT_CHECK(api_ != nullptr, "GetPjrtApi returned null");

  PJRT_Plugin_Initialize_Args init;
  std::memset(&init, 0, sizeof(init));
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  CHECK_PJRT(api_, api_->PJRT_Plugin_Initialize(&init));

  std::vector<PJRT_NamedValue> named(options.size());
  for (std::size_t i = 0; i < options.size(); ++i) {
    const Option& o = options[i];
    std::memset(&named[i], 0, sizeof(PJRT_NamedValue));
    named[i].struct_size = PJRT_NamedValue_STRUCT_SIZE;
    named[i].name = o.key.c_str();
    named[i].name_size = o.key.size();
    if (o.is_int) {
      named[i].type = PJRT_NamedValue_kInt64;
      named[i].int64_value = o.i64;
      named[i].value_size = 1;
    } else {
      named[i].type = PJRT_NamedValue_kString;
      named[i].string_value = o.str.c_str();
      named[i].value_size = o.str.size();
    }
  }

  PJRT_Client_Create_Args create;
  std::memset(&create, 0, sizeof(create));
  create.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  create.create_options = named.empty() ? nullptr : named.data();
  create.num_options = named.size();
  CHECK_PJRT(api_, api_->PJRT_Client_Create(&create));
  client_ = create.client;

  PJRT_Client_AddressableDevices_Args devs;
  std::memset(&devs, 0, sizeof(devs));
  devs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  devs.client = client_;
  CHECK_PJRT(api_, api_->PJRT_Client_AddressableDevices(&devs));
  VFT_CHECK(devs.num_addressable_devices > 0, "no addressable devices");
  device_ = devs.addressable_devices[0];

  PJRT_Client_PlatformName_Args plat;
  std::memset(&plat, 0, sizeof(plat));
  plat.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  plat.client = client_;
  CHECK_PJRT(api_, api_->PJRT_Client_PlatformName(&plat));
  platform_.assign(plat.platform_name, plat.platform_name_size);
}

Runtime::~Runtime() {
  if (client_ != nullptr && api_ != nullptr) {
    PJRT_Client_Destroy_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    args.client = client_;
    api_->PJRT_Client_Destroy(&args);
  }
  // The plugin stays loaded for the process lifetime (libtpu does not
  // support re-dlopen), mirroring the reference's process-wide session.
}

// ---------------------------------------------------------------------------
// Model
// ---------------------------------------------------------------------------

Model::Model(std::shared_ptr<Runtime> rt, const std::string& dir)
    : rt_(std::move(rt)) {
  const PJRT_Api* api = rt_->api();

  // manifest
  std::istringstream mf(read_file(dir + "/manifest.txt"));
  std::string tok, version;
  mf >> tok >> version;
  VFT_CHECK(tok == "vft-pjrt-manifest" && version == "v1",
            "bad manifest header: " << tok << " " << version);
  std::size_t nargs = 0;
  mf >> tok >> nargs;
  VFT_CHECK(tok == "nargs", "bad manifest nargs line");
  specs_.resize(nargs);
  for (std::size_t i = 0; i < nargs; ++i) {
    std::size_t idx = 0, ndim = 0;
    std::string kind;
    Spec s;
    mf >> tok >> idx >> kind >> s.dtype >> ndim;
    VFT_CHECK(tok == "arg" && idx < nargs, "bad manifest arg line " << i);
    s.dims.resize(ndim);
    for (auto& d : s.dims) mf >> d;
    mf >> s.offset >> s.nbytes;
    s.is_input = (kind == "input");
    if (s.is_input) input_idx_ = idx;
    specs_[idx] = s;
  }
  std::size_t ondim = 0;
  mf >> tok >> out_spec_.dtype >> ondim;
  VFT_CHECK(tok == "out", "bad manifest out line");
  out_spec_.dims.resize(ondim);
  for (auto& d : out_spec_.dims) mf >> d;

  // compile
  std::string mlir = read_file(dir + "/model.mlir");
  std::string copts = read_file(dir + "/compile_options.pb");
  PJRT_Program prog;
  std::memset(&prog, 0, sizeof(prog));
  prog.struct_size = PJRT_Program_STRUCT_SIZE;
  prog.code = mlir.data();
  prog.code_size = mlir.size();
  static const char kFormat[] = "mlir";
  prog.format = kFormat;
  prog.format_size = sizeof(kFormat) - 1;
  PJRT_Client_Compile_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  cargs.client = rt_->client();
  cargs.program = &prog;
  cargs.compile_options = copts.data();
  cargs.compile_options_size = copts.size();
  CHECK_PJRT(api, api->PJRT_Client_Compile(&cargs));
  exe_ = cargs.executable;

  // stage weights once (device residency ≙ _load_params caching)
  std::string weights = read_file(dir + "/weights.bin");
  weight_bufs_.assign(specs_.size(), nullptr);
  for (std::size_t i = 0; i < specs_.size(); ++i) {
    const Spec& s = specs_[i];
    if (s.is_input) continue;
    VFT_CHECK(s.offset + s.nbytes <= weights.size(),
              "weights.bin too small for arg " << i);
    weight_bufs_[i] = to_device(api, rt_->client(), rt_->device(),
                                weights.data() + s.offset, s);
  }
}

Model::~Model() {
  const PJRT_Api* api = rt_->api();
  for (PJRT_Buffer* b : weight_bufs_) destroy_buffer(api, b);
  if (exe_ != nullptr) {
    PJRT_LoadedExecutable_Destroy_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
    args.executable = exe_;
    api->PJRT_LoadedExecutable_Destroy(&args);
  }
}

std::vector<float> Model::forward(const void* input_data,
                                  std::size_t input_nbytes) {
  VFT_CHECK(out_spec_.dtype == "f32",
            "forward() expects an f32 program; use forward_bytes() for "
            "dtype " << out_spec_.dtype);
  std::vector<std::uint8_t> raw = forward_bytes(input_data, input_nbytes);
  std::vector<float> host(raw.size() / sizeof(float));
  std::memcpy(host.data(), raw.data(), raw.size());
  return host;
}

std::size_t Model::output_nbytes() const {
  std::size_t out_bytes = dtype_size(out_spec_.dtype);
  for (auto d : out_spec_.dims) out_bytes *= static_cast<std::size_t>(d);
  return out_bytes;
}

Model::Pending Model::execute_async(const void* input_data,
                                    std::size_t input_nbytes) {
  const PJRT_Api* api = rt_->api();
  const Spec& in = specs_[input_idx_];
  std::size_t expect = dtype_size(in.dtype);
  for (auto d : in.dims) expect *= static_cast<std::size_t>(d);
  VFT_CHECK(input_nbytes == expect,
            "input bytes " << input_nbytes << " != expected " << expect);

  Pending p;
  p.in = to_device(api, rt_->client(), rt_->device(), input_data, in);
  std::vector<PJRT_Buffer*> argv(specs_.size());
  for (std::size_t i = 0; i < specs_.size(); ++i)
    argv[i] = (i == input_idx_) ? p.in : weight_bufs_[i];

  PJRT_Buffer* const* arg_list = argv.data();
  PJRT_Buffer** out_inner = &p.out;

  PJRT_ExecuteOptions opts;
  std::memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_LoadedExecutable_Execute_Args eargs;
  std::memset(&eargs, 0, sizeof(eargs));
  eargs.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  eargs.executable = exe_;
  eargs.options = &opts;
  eargs.argument_lists = &arg_list;
  eargs.num_devices = 1;
  eargs.num_args = argv.size();
  eargs.output_lists = &out_inner;
  eargs.device_complete_events = &p.done;
  CHECK_PJRT(api, api->PJRT_LoadedExecutable_Execute(&eargs));
  return p;   // NOT awaited — caller (Stream / forward_bytes) decides
}

void Model::await_and_read(Pending& p, std::vector<std::uint8_t>& host) {
  const PJRT_Api* api = rt_->api();
  await_event(api, p.done);
  p.done = nullptr;

  host.resize(output_nbytes());
  PJRT_Buffer_ToHostBuffer_Args hargs;
  std::memset(&hargs, 0, sizeof(hargs));
  hargs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  hargs.src = p.out;
  hargs.dst = host.data();
  hargs.dst_size = host.size();
  CHECK_PJRT(api, api->PJRT_Buffer_ToHostBuffer(&hargs));
  await_event(api, hargs.event);

  destroy_buffer(api, p.out);
  destroy_buffer(api, p.in);
  p.out = nullptr;
  p.in = nullptr;
}

std::vector<std::uint8_t> Model::forward_bytes(const void* input_data,
                                               std::size_t input_nbytes) {
  const auto t0 = std::chrono::high_resolution_clock::now();
  Pending p = execute_async(input_data, input_nbytes);
  std::vector<std::uint8_t> host;
  await_and_read(p, host);
  forward_us_ = std::chrono::duration_cast<std::chrono::microseconds>(
                    std::chrono::high_resolution_clock::now() - t0)
                    .count();
  return host;
}

// ---------------------------------------------------------------------------
// Stream — bounded in-flight execution ring (see net_pjrt.h)
// ---------------------------------------------------------------------------

Stream::Stream(Model& model, std::size_t depth)
    : model_(model), depth_(depth) {
  VFT_CHECK(depth_ > 0, "stream depth must be positive");
}

Stream::~Stream() {
  std::vector<std::uint8_t> sink;
  while (!q_.empty()) {
    try {
      model_.await_and_read(q_.front(), sink);
    } catch (...) {
      // drain must not throw from a destructor; buffers of a failed
      // execution are released by await_and_read before it throws
    }
    q_.pop_front();
  }
}

bool Stream::submit(const void* input_data, std::size_t input_nbytes) {
  if (q_.size() >= depth_) {
    ++dropped_;   // reference ring semantics: drop-on-full, warn once
    if (dropped_ == 1)
      std::fprintf(stderr, "vft: stream ring full (depth %zu), dropping\n",
                   depth_);
    return false;
  }
  q_.push_back(model_.execute_async(input_data, input_nbytes));
  return true;
}

bool Stream::fetch(std::vector<std::uint8_t>& out) {
  if (q_.empty()) return false;   // empty sentinel
  model_.await_and_read(q_.front(), out);
  q_.pop_front();
  return true;
}

}  // namespace pjrt
}  // namespace net
