// Offline stub for the Rust `sprk` FFI (the real crate needs cargo, which is
// unavailable here).  The parity build selects IndexSNN at runtime, so these
// symbols must link but are never called.
#pragma once
#include <cstddef>
#include <cstdint>
#include <cstdlib>
#include <cstdio>
extern "C" {
struct SprkHandle;
inline SprkHandle* sprk_create(const float*, size_t, size_t) {
    std::fprintf(stderr, "sprk stub called -- use IndexSNN\n");
    std::abort();
}
inline void sprk_destroy(SprkHandle*) {}
inline void sprk_query_radius(SprkHandle*, const float*, double, uint64_t**, size_t*) {
    std::abort();
}
inline void sprk_free_results(uint64_t*, size_t) { std::abort(); }
}
