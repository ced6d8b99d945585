// std::unordered_map stand-in for tsl::robin_map.
#pragma once
#include <unordered_map>
namespace tsl {
template <class K, class V, class... Rest>
using robin_map = std::unordered_map<K, V>;
}
