// Minimal gflags stand-in for building the reference baseline binaries
// on a box without libgflags.  Implements exactly the surface the
// reference uses (DEFINE_string, ParseCommandLineNonHelpFlags,
// HandleCommandLineHelpFlags, fLB::FLAGS_help/FLAGS_helpshort --
// /root/reference/CPU/util.cpp:86-93, util.hpp:28-31, main.cpp:16-18).
// Accepts -name value, -name=value and --name=value.
#pragma once
#include <cstdlib>
#include <iostream>
#include <string>
#include <vector>

namespace fLB {
// C++14 (no inline variables): internal linkage per TU is fine -- the
// only TU that touches these is util.cpp (initOpticalFlow), and the
// inline parse/help functions below share its copies when called there.
static bool FLAGS_help = false;
static bool FLAGS_helpshort = false;
}  // namespace fLB

namespace gflags_shim {
struct StringFlag {
  std::string* var;
  const char* name;
  const char* help;
};
inline std::vector<StringFlag>& registry() {
  static std::vector<StringFlag> r;
  return r;
}
struct Registrar {
  Registrar(std::string* v, const char* n, const char* h) {
    registry().push_back({v, n, h});
  }
};
}  // namespace gflags_shim

#define DEFINE_string(name, def, help)                                  \
  std::string FLAGS_##name = def;                                       \
  static ::gflags_shim::Registrar gflags_shim_reg_##name(&FLAGS_##name, \
                                                         #name, help);

namespace gflags {

inline void SetUsageMessage(const std::string&) {}

inline void ParseCommandLineNonHelpFlags(int* argc, char*** argv, bool) {
  for (int i = 1; i < *argc; ++i) {
    const char* a = (*argv)[i];
    if (a[0] != '-') continue;
    while (*a == '-') ++a;
    std::string s(a), name, val;
    bool has_val = false;
    auto eq = s.find('=');
    if (eq != std::string::npos) {
      name = s.substr(0, eq);
      val = s.substr(eq + 1);
      has_val = true;
    } else {
      name = s;
    }
    if (name == "help" || name == "helpshort") {
      fLB::FLAGS_help = true;
      continue;
    }
    for (auto& f : gflags_shim::registry()) {
      if (name == f.name) {
        if (!has_val && i + 1 < *argc) val = (*argv)[++i];
        *f.var = val;
      }
    }
  }
}

inline void HandleCommandLineHelpFlags() {
  if (fLB::FLAGS_helpshort || fLB::FLAGS_help) {
    for (auto& f : gflags_shim::registry())
      std::cout << "  -" << f.name << "\t" << f.help << "\n";
    std::exit(0);
  }
}

}  // namespace gflags
