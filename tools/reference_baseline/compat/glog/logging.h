// Minimal glog stand-in for the reference baseline build.  Covers the
// reference's usage: InitGoogleLogging, LOG(INFO/WARNING/ERROR/FATAL)
// streams and CHECK_EQ (/root/reference/CPU/util.cpp:54-88,
// PixFlow.hpp:194,222).
#pragma once
#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>

namespace google {
inline void InitGoogleLogging(const char*) {}
}  // namespace google

namespace glog_shim {
struct Msg {
  std::ostringstream os;
  bool fatal;
  explicit Msg(const char* sev, bool f) : fatal(f) { os << sev << ": "; }
  Msg(Msg&&) = delete;
  ~Msg() {
    std::cerr << os.str() << std::endl;
    if (fatal) std::abort();
  }
  template <class T>
  Msg& operator<<(const T& v) {
    os << v;
    return *this;
  }
};
inline constexpr bool is_fatal(const char* sev) {
  return sev[0] == 'F';
}
}  // namespace glog_shim

#define LOG(sev) ::glog_shim::Msg(#sev, ::glog_shim::is_fatal(#sev))

#define CHECK_EQ(a, b) \
  if ((a) == (b)) {    \
  } else               \
    LOG(FATAL) << "CHECK_EQ failed: " #a " vs " #b " "
