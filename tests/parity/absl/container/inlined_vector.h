// Test-only shim: absl::InlinedVector -> std::vector (see absl/log/check.h
// shim note). The inline-capacity parameter is ignored.
#pragma once

#include <vector>

namespace absl {

template <typename T, size_t N>
class InlinedVector : public std::vector<T> {
 public:
  using std::vector<T>::vector;
};

}  // namespace absl
