// Test-only shim for absl/hash/hash.h (see absl/log/check.h shim note).
// Provides absl::Hash<T> over either std::hash or an AbslHashValue friend,
// plus the minimal combinator state those friends expect.
#pragma once

#include <cstddef>
#include <functional>
#include <type_traits>
#include <utility>

namespace absl {

struct HashState {
  size_t value = 0xcbf29ce484222325ULL;

  static HashState combine(HashState s) { return s; }

  template <typename T, typename... Ts>
  static HashState combine(HashState s, const T& v, const Ts&... rest) {
    s.value ^= std::hash<T>{}(v) + 0x9e3779b97f4a7c15ULL + (s.value << 6) +
               (s.value >> 2);
    return combine(s, rest...);
  }
};

template <typename T, typename = void>
struct HasAbslHashValue : std::false_type {};

template <typename T>
struct HasAbslHashValue<
    T, std::void_t<decltype(AbslHashValue(std::declval<HashState>(),
                                          std::declval<const T&>()))>>
    : std::true_type {};

template <typename T>
struct Hash {
  size_t operator()(const T& v) const {
    if constexpr (HasAbslHashValue<T>::value) {
      return AbslHashValue(HashState{}, v).value;
    } else {
      return std::hash<T>{}(v);
    }
  }
};

template <typename T>
size_t HashOf(const T& v) {
  return Hash<T>{}(v);
}

}  // namespace absl
