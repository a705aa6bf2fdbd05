// Test-only shim: absl::uint128 -> GCC __int128 (see absl/log/check.h shim
// note).
#pragma once

#include <cstdint>
#include <functional>
#include <limits>  // rand.h uses std::numeric_limits, upstream absl
                   // headers include <limits> transitively

namespace absl {

using uint128 = unsigned __int128;

inline uint128 MakeUint128(uint64_t high, uint64_t low) {
  return (static_cast<uint128>(high) << 64) | low;
}

inline uint64_t Uint128Low64(uint128 v) { return static_cast<uint64_t>(v); }
inline uint64_t Uint128High64(uint128 v) {
  return static_cast<uint64_t>(v >> 64);
}

}  // namespace absl

namespace std {
template <>
struct hash<absl::uint128> {
  size_t operator()(const absl::uint128& v) const {
    return std::hash<uint64_t>{}(absl::Uint128Low64(v)) ^
           (std::hash<uint64_t>{}(absl::Uint128High64(v)) * 1099511628211ULL);
  }
};
}  // namespace std
