// Test-only shim for absl/log/check.h: the image has no absl dev headers,
// and the parity oracle (tests/parity/board_oracle.cc) only needs the CHECK
// macro family (including message streaming) to compile the reference board
// sources against.
#pragma once

#include <cstdio>
#include <cstdlib>

namespace p3_shim {

struct CheckStream {
  bool ok;
  ~CheckStream() {
    if (!ok) std::abort();
  }
  template <typename T>
  CheckStream& operator<<(const T&) {
    return *this;
  }
};

}  // namespace p3_shim

#define P3_CHECK_IMPL(cond, text)                                          \
  ::p3_shim::CheckStream {                                                 \
    static_cast<bool>(cond) ||                                             \
        (std::fprintf(stderr, "CHECK failed: %s at %s:%d\n", text,         \
                      __FILE__, __LINE__),                                 \
         false)                                                            \
  }

#define CHECK(cond) P3_CHECK_IMPL((cond), #cond)
#define CHECK_EQ(a, b) P3_CHECK_IMPL((a) == (b), #a " == " #b)
#define CHECK_NE(a, b) P3_CHECK_IMPL((a) != (b), #a " != " #b)
#define CHECK_GT(a, b) P3_CHECK_IMPL((a) > (b), #a " > " #b)
#define CHECK_GE(a, b) P3_CHECK_IMPL((a) >= (b), #a " >= " #b)
#define CHECK_LT(a, b) P3_CHECK_IMPL((a) < (b), #a " < " #b)
#define CHECK_LE(a, b) P3_CHECK_IMPL((a) <= (b), #a " <= " #b)

#define DCHECK(cond) CHECK(cond)
#define DCHECK_EQ(a, b) CHECK_EQ(a, b)
#define DCHECK_NE(a, b) CHECK_NE(a, b)
#define DCHECK_GT(a, b) CHECK_GT(a, b)
#define DCHECK_GE(a, b) CHECK_GE(a, b)
#define DCHECK_LT(a, b) CHECK_LT(a, b)
#define DCHECK_LE(a, b) CHECK_LE(a, b)
