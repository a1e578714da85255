/* Poseidon2-GL12 batch permutation — native host kernel.
 *
 * The host verifier must hash the opened LDE rows (84 x 89018 for the
 * miller loop = ~935k permutations); the XLA-CPU jitted path executes
 * that in minutes (docs/PERF.md round-4 measurement), while this scalar
 * C kernel with the shift-add Poseidon2 layers does ~300k perm/s/core.
 * Bit-identical to backend/poseidon.py permute_s: the round constants
 * and internal-diagonal exponents are PASSED IN from python (single
 * source of truth); only the paper's public M4 block schedule is coded
 * here (Poseidon2 §5.1, same schedule as poseidon.py _m4_block).
 *
 * Reference capability: the Poseidon-Goldilocks hashing of the
 * starky/plonky2 backend (SURVEY.md §2.2). Built by
 * backend/poseidon_native.py with the system gcc; no external deps.
 */

#include <stddef.h>
#include <stdint.h>

typedef unsigned __int128 u128;

static const uint64_t P = 0xFFFFFFFF00000001ULL;
static const uint64_t NEG = 0xFFFFFFFFULL; /* 2^64 mod p = 2^32 - 1 */

static inline uint64_t add_m(uint64_t a, uint64_t b) {
    uint64_t s = a + b;
    if (s < a) s += NEG; /* cannot re-wrap: a,b < p */
    if (s >= P) s -= P;
    return s;
}

static inline uint64_t red128(uint64_t hi, uint64_t lo) {
    /* (hi*2^64 + lo) mod p — mirrors poseidon.py _reduce128 */
    uint64_t hi_hi = hi >> 32, hi_lo = hi & 0xFFFFFFFFULL;
    uint64_t t0 = lo - hi_hi;
    if (lo < hi_hi) t0 -= NEG;
    uint64_t t1 = (hi_lo << 32) - hi_lo;
    uint64_t res = t0 + t1;
    if (res < t0) res += NEG;
    if (res >= P) res -= P;
    return res;
}

static inline uint64_t mul_m(uint64_t a, uint64_t b) {
    u128 x = (u128)a * b;
    return red128((uint64_t)(x >> 64), (uint64_t)x);
}

static inline uint64_t shl_m(uint64_t x, int e) {
    /* x * 2^e mod p, 1 <= e <= 63 */
    return red128(x >> (64 - e), x << e);
}

static inline uint64_t sbox7(uint64_t x) {
    uint64_t x2 = mul_m(x, x);
    uint64_t x3 = mul_m(x2, x);
    return mul_m(mul_m(x3, x3), x);
}

static inline void m4_block(uint64_t *a) {
    /* Poseidon2 §5.1 M4 add/double schedule (poseidon.py _m4_block) */
    uint64_t t0 = add_m(a[0], a[1]);
    uint64_t t1 = add_m(a[2], a[3]);
    uint64_t t2 = add_m(add_m(a[1], a[1]), t1);
    uint64_t t3 = add_m(add_m(a[3], a[3]), t0);
    uint64_t d1 = add_m(t1, t1);
    uint64_t t4 = add_m(add_m(d1, d1), t3);
    uint64_t d0 = add_m(t0, t0);
    uint64_t t5 = add_m(add_m(d0, d0), t2);
    a[0] = add_m(t3, t5);
    a[1] = t5;
    a[2] = add_m(t2, t4);
    a[3] = t4;
}

static inline void external_layer(uint64_t *s) {
    m4_block(s);
    m4_block(s + 4);
    m4_block(s + 8);
    for (int i = 0; i < 4; i++) {
        uint64_t sum = add_m(add_m(s[i], s[4 + i]), s[8 + i]);
        s[i] = add_m(s[i], sum);
        s[4 + i] = add_m(s[4 + i], sum);
        s[8 + i] = add_m(s[8 + i], sum);
    }
}

static inline void internal_layer(uint64_t *s, const int64_t *diag_exp) {
    uint64_t total = s[0];
    for (int i = 1; i < 12; i++) total = add_m(total, s[i]);
    for (int i = 0; i < 12; i++) s[i] = add_m(total, shl_m(s[i], (int)diag_exp[i]));
}

static void permute_one(uint64_t *s, const uint64_t *rc, const int64_t *diag_exp,
                        int n_rounds, int half_full, int n_partial) {
    external_layer(s);
    for (int r = 0; r < n_rounds; r++) {
        const uint64_t *rcr = rc + 12 * r;
        if (r >= half_full && r < half_full + n_partial) {
            s[0] = sbox7(add_m(s[0], rcr[0]));
            internal_layer(s, diag_exp);
        } else {
            for (int i = 0; i < 12; i++) s[i] = sbox7(add_m(s[i], rcr[i]));
            external_layer(s);
        }
    }
}

void permute_batch(uint64_t *states, size_t n, const uint64_t *rc,
                   const int64_t *diag_exp, int n_rounds, int half_full,
                   int n_partial) {
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < n; i++)
        permute_one(states + 12 * i, rc, diag_exp, n_rounds, half_full, n_partial);
}
