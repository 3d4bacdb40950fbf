// Just boost::math::tools::epsilon<T>() (used once, in mtkmath.hpp:147).
#pragma once
#include <limits>

namespace boost { namespace math { namespace tools {
template <typename T>
inline T epsilon() { return std::numeric_limits<T>::epsilon(); }
}}}  // namespace boost::math::tools
