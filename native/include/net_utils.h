// Native utility layer — the AOCLUtils-equivalent surface (SURVEY.md §2.2
// item 3): fatal error checking, 64-byte-aligned host allocation, event-pair
// timing, and a key=value options parser, re-imagined for the TPU runtime
// (no OpenCL; timing wraps std::chrono, errors carry messages not cl_int).
#ifndef VFT_NET_UTILS_H
#define VFT_NET_UTILS_H

#include <chrono>
#include <cstdint>
#include <cstdlib>
#include <map>
#include <optional>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace net::utils {

// ---------------------------------------------------------------------------
// Error checking (≙ aocl_utils::checkError — but recoverable: throws instead
// of abort(), so embedding applications stay alive).
// ---------------------------------------------------------------------------

class Error : public std::runtime_error {
 public:
  explicit Error(const std::string& what) : std::runtime_error(what) {}
};

#define VFT_CHECK(cond, msg)                                       \
  do {                                                             \
    if (!(cond)) {                                                 \
      std::ostringstream vft_oss_;                                 \
      vft_oss_ << "vit-fpga-tpu native: " << msg << " (" << #cond  \
               << ") at " << __FILE__ << ":" << __LINE__;          \
      throw ::net::utils::Error(vft_oss_.str());                   \
    }                                                              \
  } while (0)

// ---------------------------------------------------------------------------
// Aligned host allocation (≙ aocl_utils::alignedMalloc/Free). 64-byte
// alignment keeps buffers cacheline- and DMA-friendly.
// ---------------------------------------------------------------------------

inline void* aligned_malloc(std::size_t size, std::size_t align = 64) {
  void* p = nullptr;
  if (posix_memalign(&p, align, size) != 0) return nullptr;
  return p;
}

inline void aligned_free(void* p) { free(p); }

template <typename T>
struct AlignedDeleter {
  void operator()(T* p) const { aligned_free(p); }
};

// ---------------------------------------------------------------------------
// Event-pair timing (≙ aocl_utils::getStartEndTime): nanosecond timestamps
// from a monotonic clock, plus a scoped microsecond timer for the perf
// counters (reference PERFORMANCE flag, src/netFPGA.cpp:262-284).
// ---------------------------------------------------------------------------

inline std::int64_t now_ns() {
  return std::chrono::duration_cast<std::chrono::nanoseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

struct Event {
  std::int64_t start_ns = 0;
  std::int64_t end_ns = 0;
  std::int64_t duration_ns() const { return end_ns - start_ns; }
};

class ScopedTimerUs {
 public:
  explicit ScopedTimerUs(std::int64_t* out)
      : out_(out), t0_(now_ns()) {}
  ~ScopedTimerUs() { *out_ = (now_ns() - t0_) / 1000; }

 private:
  std::int64_t* out_;
  std::int64_t t0_;
};

// ---------------------------------------------------------------------------
// key=value options (≙ aocl_utils::Options): typed get with clear errors.
// ---------------------------------------------------------------------------

class Options {
 public:
  Options() = default;
  Options(int argc, const char* const* argv) {
    for (int i = 1; i < argc; ++i) parse_one(argv[i]);
  }

  void parse_one(const std::string& arg) {
    auto eq = arg.find('=');
    if (eq == std::string::npos) {
      positional_.push_back(arg);
      return;
    }
    VFT_CHECK(eq > 0, "nameless option '" << arg << "'");
    raw_[arg.substr(0, eq)] = arg.substr(eq + 1);
  }

  bool has(const std::string& key) const { return raw_.count(key) > 0; }

  template <typename T>
  T get(const std::string& key) const {
    auto it = raw_.find(key);
    VFT_CHECK(it != raw_.end(), "option '" << key << "' does not exist");
    return convert<T>(key, it->second);
  }

  template <typename T>
  T get(const std::string& key, T fallback) const {
    auto it = raw_.find(key);
    if (it == raw_.end()) return fallback;
    return convert<T>(key, it->second);
  }

  const std::vector<std::string>& positional() const { return positional_; }

 private:
  template <typename T>
  static T convert(const std::string& key, const std::string& raw) {
    std::istringstream iss(raw);
    T value{};
    iss >> value;
    VFT_CHECK(!iss.fail(), "option '" << key << "'='" << raw
                                      << "' has the wrong type");
    return value;
  }

  std::map<std::string, std::string> raw_;
  std::vector<std::string> positional_;
};

template <>
inline std::string Options::convert<std::string>(const std::string&,
                                                 const std::string& raw) {
  return raw;
}

template <>
inline bool Options::convert<bool>(const std::string& key,
                                   const std::string& raw) {
  if (raw == "1" || raw == "true" || raw == "yes" || raw == "on")
    return true;
  if (raw == "0" || raw == "false" || raw == "no" || raw == "off")
    return false;
  VFT_CHECK(false, "option '" << key << "'='" << raw << "' is not a bool");
  return false;
}

}  // namespace net::utils

#endif  // VFT_NET_UTILS_H
