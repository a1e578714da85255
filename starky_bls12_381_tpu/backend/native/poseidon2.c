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

#if defined(__AVX512F__) && defined(__AVX512DQ__)
/* 8-lane AVX-512 path: 8 independent states per vector op (the batch is
 * embarrassingly parallel). Bit-identical to permute_one lane-by-lane:
 * every helper mirrors its scalar twin's exact carry/select order. */
#include <immintrin.h>

#define VP _mm512_set1_epi64((long long)0xFFFFFFFF00000001ULL)
#define VNEG _mm512_set1_epi64((long long)0xFFFFFFFFULL)
#define VM32 _mm512_set1_epi64((long long)0xFFFFFFFFULL)

static inline __m512i addm_v(__m512i a, __m512i b) {
    __m512i s = _mm512_add_epi64(a, b);
    __mmask8 c = _mm512_cmplt_epu64_mask(s, a);
    s = _mm512_mask_add_epi64(s, c, s, VNEG);
    __mmask8 ge = _mm512_cmpge_epu64_mask(s, VP);
    return _mm512_mask_sub_epi64(s, ge, s, VP);
}

static inline __m512i red128_v(__m512i hi, __m512i lo) {
    __m512i hi_hi = _mm512_srli_epi64(hi, 32);
    __m512i hi_lo = _mm512_and_epi64(hi, VM32);
    __m512i t0 = _mm512_sub_epi64(lo, hi_hi);
    __mmask8 bw = _mm512_cmplt_epu64_mask(lo, hi_hi);
    t0 = _mm512_mask_sub_epi64(t0, bw, t0, VNEG);
    __m512i t1 = _mm512_sub_epi64(_mm512_slli_epi64(hi_lo, 32), hi_lo);
    __m512i res = _mm512_add_epi64(t0, t1);
    __mmask8 c = _mm512_cmplt_epu64_mask(res, t0);
    res = _mm512_mask_add_epi64(res, c, res, VNEG);
    __mmask8 ge = _mm512_cmpge_epu64_mask(res, VP);
    return _mm512_mask_sub_epi64(res, ge, res, VP);
}

static inline __m512i mul_v(__m512i a, __m512i b) {
    __m512i ah = _mm512_srli_epi64(a, 32);
    __m512i bh = _mm512_srli_epi64(b, 32);
    __m512i ll = _mm512_mul_epu32(a, b);   /* vpmuludq: low32(a)*low32(b) */
    __m512i lh = _mm512_mul_epu32(a, bh);
    __m512i hl = _mm512_mul_epu32(ah, b);
    __m512i hh = _mm512_mul_epu32(ah, bh);
    __m512i mid = _mm512_add_epi64(lh, hl);
    __mmask8 midc = _mm512_cmplt_epu64_mask(mid, lh);
    __m512i lo = _mm512_add_epi64(ll, _mm512_slli_epi64(_mm512_and_epi64(mid, VM32), 32));
    __mmask8 loc = _mm512_cmplt_epu64_mask(lo, ll);
    __m512i hi = _mm512_add_epi64(hh, _mm512_srli_epi64(mid, 32));
    hi = _mm512_mask_add_epi64(hi, midc, hi, _mm512_set1_epi64(1LL << 32));
    hi = _mm512_mask_add_epi64(hi, loc, hi, _mm512_set1_epi64(1));
    return red128_v(hi, lo);
}

static inline __m512i sqr_v(__m512i a) {
    /* square: lh == hl, so 3 vpmuludq + a doubling instead of 4 */
    __m512i ah = _mm512_srli_epi64(a, 32);
    __m512i ll = _mm512_mul_epu32(a, a);
    __m512i cross = _mm512_mul_epu32(a, ah);
    __m512i hh = _mm512_mul_epu32(ah, ah);
    __m512i mid = _mm512_slli_epi64(cross, 1);
    __m512i over = _mm512_srli_epi64(cross, 63); /* bit 64 of 2*cross */
    __m512i lo = _mm512_add_epi64(ll, _mm512_slli_epi64(_mm512_and_epi64(mid, VM32), 32));
    __mmask8 loc = _mm512_cmplt_epu64_mask(lo, ll);
    __m512i hi = _mm512_add_epi64(hh, _mm512_srli_epi64(mid, 32));
    hi = _mm512_add_epi64(hi, _mm512_slli_epi64(over, 32));
    hi = _mm512_mask_add_epi64(hi, loc, hi, _mm512_set1_epi64(1));
    return red128_v(hi, lo);
}

static inline __m512i shl_v(__m512i x, int e) {
    return red128_v(_mm512_srli_epi64(x, 64 - e), _mm512_slli_epi64(x, e));
}

static inline __m512i sbox7_v(__m512i x) {
    __m512i x3 = mul_v(sqr_v(x), x);
    return mul_v(sqr_v(x3), x);
}

static inline void m4_block_v(__m512i *a) {
    __m512i t0 = addm_v(a[0], a[1]);
    __m512i t1 = addm_v(a[2], a[3]);
    __m512i t2 = addm_v(addm_v(a[1], a[1]), t1);
    __m512i t3 = addm_v(addm_v(a[3], a[3]), t0);
    __m512i d1 = addm_v(t1, t1);
    __m512i t4 = addm_v(addm_v(d1, d1), t3);
    __m512i d0 = addm_v(t0, t0);
    __m512i t5 = addm_v(addm_v(d0, d0), t2);
    a[0] = addm_v(t3, t5);
    a[1] = t5;
    a[2] = addm_v(t2, t4);
    a[3] = t4;
}

static inline void external_layer_v(__m512i *s) {
    m4_block_v(s);
    m4_block_v(s + 4);
    m4_block_v(s + 8);
    for (int i = 0; i < 4; i++) {
        __m512i sum = addm_v(addm_v(s[i], s[4 + i]), s[8 + i]);
        s[i] = addm_v(s[i], sum);
        s[4 + i] = addm_v(s[4 + i], sum);
        s[8 + i] = addm_v(s[8 + i], sum);
    }
}

static inline void internal_layer_v(__m512i *s, const int64_t *diag_exp) {
    __m512i total = s[0];
    for (int i = 1; i < 12; i++) total = addm_v(total, s[i]);
    for (int i = 0; i < 12; i++) s[i] = addm_v(total, shl_v(s[i], (int)diag_exp[i]));
}

static void permute_eight(uint64_t *states, const uint64_t *rc,
                          const int64_t *diag_exp, int n_rounds, int half_full,
                          int n_partial) {
    /* gather lane k of the 8 consecutive (12-word) states */
    __m512i idx = _mm512_setr_epi64(0, 12, 24, 36, 48, 60, 72, 84);
    __m512i s[12];
    for (int k = 0; k < 12; k++)
        s[k] = _mm512_i64gather_epi64(_mm512_add_epi64(idx, _mm512_set1_epi64(k)),
                                      (const long long *)states, 8);
    external_layer_v(s);
    for (int r = 0; r < n_rounds; r++) {
        const uint64_t *rcr = rc + 12 * r;
        if (r >= half_full && r < half_full + n_partial) {
            s[0] = sbox7_v(addm_v(s[0], _mm512_set1_epi64((long long)rcr[0])));
            internal_layer_v(s, diag_exp);
        } else {
            for (int i = 0; i < 12; i++)
                s[i] = sbox7_v(addm_v(s[i], _mm512_set1_epi64((long long)rcr[i])));
            external_layer_v(s);
        }
    }
    for (int k = 0; k < 12; k++)
        _mm512_i64scatter_epi64((long long *)states,
                                _mm512_add_epi64(idx, _mm512_set1_epi64(k)), s[k], 8);
}
#endif /* AVX-512 */

static void permute_record_one(const uint64_t *in, uint64_t *blocks,
                               const uint64_t *rc, const int64_t *diag_exp,
                               int n_rounds, int half_full, int n_partial,
                               int rows_per_perm, int block_cols,
                               int S, int W3, int W6, int U) {
    /* Witness-recording permutation (starks/poseidon_block.py
     * permute_record): pre row S = raw input; per round rows record
     * [S | W3 | W6 | U]; result row S = output. Bit-identical. */
    uint64_t s[12], tmp[12], w3[12], w6[12], u[12];
    for (int i = 0; i < 12; i++) s[i] = in[i];
    for (int i = 0; i < 12; i++) blocks[0 * block_cols + S + i] = s[i];
    external_layer(s);
    for (int r = 0; r < n_rounds; r++) {
        const uint64_t *rcr = rc + 12 * r;
        int full = !(r >= half_full && r < half_full + n_partial);
        uint64_t *row = blocks + (size_t)(1 + r) * block_cols;
        for (int i = 0; i < 12; i++) {
            tmp[i] = add_m(s[i], rcr[i]);
            uint64_t t2 = mul_m(tmp[i], tmp[i]);
            w3[i] = mul_m(t2, tmp[i]);
            w6[i] = mul_m(w3[i], w3[i]);
            u[i] = (full || i == 0) ? mul_m(w6[i], tmp[i]) : tmp[i];
        }
        for (int i = 0; i < 12; i++) {
            row[S + i] = s[i];
            row[W3 + i] = w3[i];
            row[W6 + i] = w6[i];
            row[U + i] = u[i];
        }
        for (int i = 0; i < 12; i++) s[i] = u[i];
        if (full) external_layer(s);
        else internal_layer(s, diag_exp);
    }
    uint64_t *res = blocks + (size_t)(rows_per_perm - 1) * block_cols;
    for (int i = 0; i < 12; i++) res[S + i] = s[i];
}

void permute_record_batch(const uint64_t *states, size_t n, uint64_t *blocks,
                          const uint64_t *rc, const int64_t *diag_exp,
                          int n_rounds, int half_full, int n_partial,
                          int rows_per_perm, int block_cols,
                          int S, int W3, int W6, int U) {
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < n; i++)
        permute_record_one(states + 12 * i,
                           blocks + i * (size_t)rows_per_perm * block_cols,
                           rc, diag_exp, n_rounds, half_full, n_partial,
                           rows_per_perm, block_cols, S, W3, W6, U);
}

void permute_batch(uint64_t *states, size_t n, const uint64_t *rc,
                   const int64_t *diag_exp, int n_rounds, int half_full,
                   int n_partial) {
#if defined(__AVX512F__) && defined(__AVX512DQ__)
    size_t n8 = n / 8;
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < n8; i++)
        permute_eight(states + 96 * i, rc, diag_exp, n_rounds, half_full, n_partial);
    for (size_t i = n8 * 8; i < n; i++)
        permute_one(states + 12 * i, rc, diag_exp, n_rounds, half_full, n_partial);
#else
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < n; i++)
        permute_one(states + 12 * i, rc, diag_exp, n_rounds, half_full, n_partial);
#endif
}
