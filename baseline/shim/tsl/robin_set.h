// std::unordered_set stand-in for tsl::robin_set — the reference's
// thirdparty/robin-map submodule is empty in this snapshot.
#pragma once
#include <unordered_set>
namespace tsl {
template <class K, class... Rest>
using robin_set = std::unordered_set<K>;
}
