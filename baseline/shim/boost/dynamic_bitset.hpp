// Minimal stand-in for boost::dynamic_bitset so the unmodified reference
// sources compile in this boost-less image. Only the operations the
// reference uses (ctor(size, value), set, test, reset) are provided.
#pragma once
#include <cstdint>
#include <cstddef>
#include <vector>

namespace boost {

template <typename Block = unsigned long>
class dynamic_bitset {
 public:
  dynamic_bitset() = default;
  explicit dynamic_bitset(std::size_t n, unsigned long value = 0)
      : bits_((n + 63) / 64, 0), n_(n) {
    if (value & 1) bits_[0] = 1;
  }
  // proxy so `bits[i] = true` compiles (used by the reference's dfs)
  class reference {
   public:
    reference(std::uint64_t& w, unsigned b) : w_(w), b_(b) {}
    reference& operator=(bool v) {
      if (v) w_ |= (1ULL << b_); else w_ &= ~(1ULL << b_);
      return *this;
    }
    operator bool() const { return (w_ >> b_) & 1ULL; }
   private:
    std::uint64_t& w_;
    unsigned b_;
  };

  void set(std::size_t i) { bits_[i >> 6] |= (1ULL << (i & 63)); }
  bool test(std::size_t i) const {
    return (bits_[i >> 6] >> (i & 63)) & 1ULL;
  }
  reference operator[](std::size_t i) {
    return reference(bits_[i >> 6], unsigned(i & 63));
  }
  bool operator[](std::size_t i) const { return test(i); }
  void reset() { bits_.assign(bits_.size(), 0); }
  void reserve(std::size_t n) {             // match boost's grow-capacity API
    if ((n + 63) / 64 > bits_.size()) bits_.resize((n + 63) / 64, 0);
    if (n > n_) n_ = n;
  }
  std::size_t size() const { return n_; }

 private:
  std::vector<std::uint64_t> bits_;
  std::size_t n_ = 0;
};

}  // namespace boost
