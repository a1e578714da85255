/* Native ext-op tape evaluator over GF(p^2), p = 2^64 - 2^32 + 1, x^2 = 7.
 *
 * Evaluates backend/optape.py tapes in one sequential pass (the tape's
 * alpha-combination chains are inherently sequential, so this is the
 * right tool: ~10^6 ops in milliseconds). Opcodes match optape.py:
 * 0 add, 1 sub, 2 mul, 3 neg, 4 leaf (value pre-resolved host-side in
 * leaf_vals). Output: all node values, (n, 2) u64 row-major. */

#include <stddef.h>
#include <stdint.h>

#define P 0xFFFFFFFF00000001ULL

typedef unsigned __int128 u128;

static inline uint64_t gl_red(u128 x) {
  uint64_t lo = (uint64_t)x;
  uint64_t hi = (uint64_t)(x >> 64);
  uint64_t hi_hi = hi >> 32;
  uint64_t hi_lo = hi & 0xFFFFFFFFULL;
  uint64_t t0 = lo - hi_hi;
  if (lo < hi_hi) t0 -= 0xFFFFFFFFULL; /* wrap: subtract 2^64 mod p */
  uint64_t t1 = (hi_lo << 32) - hi_lo;
  uint64_t r = t0 + t1;
  if (r < t0) r += 0xFFFFFFFFULL;
  if (r >= P) r -= P;
  return r;
}

static inline uint64_t gl_mul(uint64_t a, uint64_t b) {
  return gl_red((u128)a * b);
}

static inline uint64_t gl_add(uint64_t a, uint64_t b) {
  uint64_t s = a + b;
  if (s < a) s += 0xFFFFFFFFULL;
  if (s >= P) s -= P;
  return s;
}

static inline uint64_t gl_sub(uint64_t a, uint64_t b) {
  return a >= b ? a - b : a + (P - b);
}

void eval_tape(const int64_t *ops, const int64_t *aa, const int64_t *bb,
               size_t n, const uint64_t *leaf_vals, uint64_t *out) {
  for (size_t i = 0; i < n; i++) {
    int64_t op = ops[i];
    uint64_t r0, r1;
    if (op == 4) { /* leaf */
      r0 = leaf_vals[2 * i];
      r1 = leaf_vals[2 * i + 1];
    } else if (op == 3) { /* neg */
      const uint64_t *a = &out[2 * aa[i]];
      r0 = a[0] ? P - a[0] : 0;
      r1 = a[1] ? P - a[1] : 0;
    } else {
      const uint64_t *a = &out[2 * aa[i]];
      const uint64_t *b = &out[2 * bb[i]];
      if (op == 0) {
        r0 = gl_add(a[0], b[0]);
        r1 = gl_add(a[1], b[1]);
      } else if (op == 1) {
        r0 = gl_sub(a[0], b[0]);
        r1 = gl_sub(a[1], b[1]);
      } else { /* ext mul, x^2 = 7 */
        r0 = gl_add(gl_mul(a[0], b[0]), gl_mul(7, gl_mul(a[1], b[1])));
        r1 = gl_add(gl_mul(a[0], b[1]), gl_mul(a[1], b[0]));
      }
    }
    out[2 * i] = r0;
    out[2 * i + 1] = r1;
  }
}
