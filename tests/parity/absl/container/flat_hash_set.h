// Test-only shim: absl::flat_hash_set -> std::unordered_set (see
// absl/log/check.h shim note).
#pragma once

#include <unordered_set>

#include "absl/hash/hash.h"

namespace absl {

template <typename K, typename H = absl::Hash<K>,
          typename Eq = std::equal_to<K>>
using flat_hash_set = std::unordered_set<K, H, Eq>;

}  // namespace absl
