// Force-included (-include) when compiling the reference TUs on Linux:
// MSVC exposes ::size_t implicitly; libstdc++ needs it pulled in explicitly.
#pragma once
#include <cstddef>
using std::size_t;
