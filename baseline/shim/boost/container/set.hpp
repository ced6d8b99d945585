// std::set stand-in for boost::container::set (see ../dynamic_bitset.hpp).
#pragma once
#include <set>
namespace boost {
namespace container {
template <class K, class C = std::less<K>>
using set = std::set<K, C>;
}
}  // namespace boost
