// Test-only shim: absl::flat_hash_map -> std::unordered_map (see
// absl/log/check.h shim note). Semantics (not performance) compatible.
#pragma once

#include <unordered_map>

#include "absl/hash/hash.h"

namespace absl {

template <typename K, typename V, typename H = absl::Hash<K>,
          typename Eq = std::equal_to<K>>
using flat_hash_map = std::unordered_map<K, V, H, Eq>;

}  // namespace absl
