// Shared in-place int32 prefix-max: AVX-512 log-step scan when available
// (exact -- max is associative/commutative), scalar otherwise.
#pragma once

#include <algorithm>
#include <climits>
#include <cstdint>

#ifdef __AVX512F__
#include <immintrin.h>
#endif

inline void prefix_max_i32_inplace(int32_t* y, int64_t len) {
#ifdef __AVX512F__
  const __m512i kMin = _mm512_set1_epi32(INT32_MIN);
  __m512i carry = kMin;
  int64_t t = 0;
  for (; t + 16 <= len; t += 16) {
    __m512i v = _mm512_loadu_si512(y + t);
    v = _mm512_max_epi32(v, _mm512_alignr_epi32(v, kMin, 15));
    v = _mm512_max_epi32(v, _mm512_alignr_epi32(v, kMin, 14));
    v = _mm512_max_epi32(v, _mm512_alignr_epi32(v, kMin, 12));
    v = _mm512_max_epi32(v, _mm512_alignr_epi32(v, kMin, 8));
    v = _mm512_max_epi32(v, carry);
    _mm512_storeu_si512(y + t, v);
    carry = _mm512_permutexvar_epi32(_mm512_set1_epi32(15), v);
  }
  int32_t c = _mm_cvtsi128_si32(_mm512_castsi512_si128(carry));
  for (; t < len; ++t) {
    c = std::max(c, y[t]);
    y[t] = c;
  }
#else
  int32_t c = INT32_MIN;
  for (int64_t t = 0; t < len; ++t) {
    c = std::max(c, y[t]);
    y[t] = c;
  }
#endif
}
