"""Goldilocks field arithmetic, p = 2^64 - 2^32 + 1.

This is the proving field of the STARK backend (the reference uses the same
field via plonky2's `GoldilocksField`; see SURVEY.md §2.2). Two layers:

1. Array ops over uint64, backend-agnostic between numpy (host verifier /
   tests) and jax.numpy (TPU prover). TPU v5e has no native u64 ALU but XLA
   emulates uint64 with exact wraparound semantics, which is all we need:
   every op below is branchless (where-select) and lane-parallel on the VPU.

2. Scalar ops on python ints (``gl_*_s``) plus the quadratic extension
   GF(p^2) = F[x]/(x^2 - 7) used for DEEP/FRI challenges (plonky2 uses the
   same tower: D=2, W=7; 7 is a quadratic non-residue mod p).

All array inputs/outputs are canonical (< p) uint64 unless noted.
"""

from __future__ import annotations

import numpy as np

P = 0xFFFFFFFF_00000001  # 2^64 - 2^32 + 1
NEG = 0xFFFFFFFF  # 2^64 mod p  (== 2^32 - 1)
M32 = 0xFFFFFFFF
W_EXT = 7  # GF(p^2) = F[x]/(x^2 - W_EXT); 7 is a non-residue mod p
# multiplicative group generator and 2-adic subgroup data: p - 1 = 2^32 * (2^32 - 1)
GENERATOR = 7
TWO_ADICITY = 32

np.seterr(over="ignore")


def _xp(a):
    """Pick numpy or jax.numpy based on array type (duck-typed backend)."""
    if isinstance(a, np.ndarray) or np.isscalar(a):
        return np
    import jax.numpy as jnp

    return jnp


def _c(xp, v):
    return xp.uint64(v)


def to_gl(xp, values):
    """Convert python ints / arrays to canonical uint64 Goldilocks array."""
    arr = np.asarray([v % P for v in np.ravel(np.asarray(values, dtype=object))], dtype=np.uint64).reshape(
        np.shape(values)
    )
    if xp is np:
        return arr
    return xp.asarray(arr)


def gl_add(a, b):
    xp = _xp(a)
    s = a + b
    s = s + xp.where(s < a, _c(xp, NEG), _c(xp, 0))
    return xp.where(s >= _c(xp, P), s - _c(xp, P), s)


def gl_sub(a, b):
    xp = _xp(a)
    d = a - b
    return xp.where(a < b, d - _c(xp, NEG), d)


def gl_neg(a):
    xp = _xp(a)
    return xp.where(a == _c(xp, 0), a, _c(xp, P) - a)


def _reduce_hi_lo(hi, lo, xp):
    """(hi*2^64 + lo) mod p via 2^64 = 2^32 - 1, 2^96 = -1 (mod p).

    lo + hi_lo * (2^32 - 1) - hi_hi; the multiply is a shift-subtract
    (hi_lo < 2^32 so hi_lo<<32 and the difference are exact in u64),
    saving an emulated u64 multiply per reduction. Branchless.
    """
    c32, cNEG, cP, cM32 = _c(xp, 32), _c(xp, NEG), _c(xp, P), _c(xp, M32)
    hi_hi = hi >> c32
    hi_lo = hi & cM32
    t0 = lo - hi_hi
    t0 = xp.where(lo < hi_hi, t0 - cNEG, t0)
    t1 = (hi_lo << c32) - hi_lo  # hi_lo * (2^32 - 1), exact in u64
    res = t0 + t1
    res = res + xp.where(res < t0, cNEG, _c(xp, 0))
    return xp.where(res >= cP, res - cP, res)


def gl_mul(a, b):
    """Full 64x64 -> 128-bit product then Goldilocks reduction. Branchless."""
    xp = _xp(a)
    c32, cM32 = _c(xp, 32), _c(xp, M32)
    a_lo = a & cM32
    a_hi = a >> c32
    b_lo = b & cM32
    b_hi = b >> c32
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = lh + hl
    mid_over = mid < lh  # carry of 2^64 in mid (i.e. 2^96 overall)
    lo = ll + ((mid & cM32) << c32)
    lo_carry = lo < ll
    hi = hh + (mid >> c32) + xp.where(mid_over, _c(xp, 1 << 32), _c(xp, 0)) + xp.where(lo_carry, _c(xp, 1), _c(xp, 0))
    return _reduce_hi_lo(hi, lo, xp)


def gl_sqr(a):
    """a*a mod p: the square needs 3 32x32 partial products, not 4
    (lh == hl), so the cross term is a doubling instead of a second
    emulated multiply. Bit-identical to gl_mul(a, a)."""
    xp = _xp(a)
    c32, cM32 = _c(xp, 32), _c(xp, M32)
    a_lo = a & cM32
    a_hi = a >> c32
    ll = a_lo * a_lo
    cross = a_lo * a_hi
    hh = a_hi * a_hi
    mid = cross << _c(xp, 1)
    mid_over = cross >> _c(xp, 63)  # bit 64 of 2*cross
    lo = ll + ((mid & cM32) << c32)
    lo_carry = lo < ll
    hi = hh + (mid >> c32) + (mid_over << c32) + xp.where(lo_carry, _c(xp, 1), _c(xp, 0))
    return _reduce_hi_lo(hi, lo, xp)


def gl_pow(a, e: int):
    """Raise array to a fixed python-int power (statically unrolled)."""
    xp = _xp(a)
    result = xp.full_like(a, _c(xp, 1))
    base = a
    while e > 0:
        if e & 1:
            result = gl_mul(result, base)
        base = gl_sqr(base)
        e >>= 1
    return result


def gl_inv(a):
    """Inverse via Fermat: a^(p-2). a must be nonzero."""
    return gl_pow(a, P - 2)


def gl_powers_vec(alpha, count: int):
    """[1, a, a^2, ..., a^(count-1)] for a scalar (possibly traced) alpha,
    built in log2(count) doubling steps."""
    xp = _xp(alpha)
    p = xp.ones((1,), dtype=xp.uint64)
    a = alpha
    while p.shape[0] < count:
        p = xp.concatenate([p, gl_mul(p, a)])
        a = gl_mul(a, a)
    return p[:count]


def gl_sum(a, axis):
    """Modular sum along an axis via pairwise tree reduction (overflow-safe)."""
    xp = _xp(a)
    a = xp.moveaxis(a, axis, 0)
    n = a.shape[0]
    while n > 1:
        half = n // 2
        lo = gl_add(a[:half], a[half : 2 * half])
        if n % 2:
            lo = xp.concatenate([lo[: half - 1], gl_add(lo[half - 1 : half], a[n - 1 : n])], axis=0)
        a = lo
        n = half
    return a[0]


# ---------------------------------------------------------------------------
# Scalar (python int) ops — used by the host-side verifier and challenger.
# ---------------------------------------------------------------------------


def add_s(a: int, b: int) -> int:
    return (a + b) % P


def sub_s(a: int, b: int) -> int:
    return (a - b) % P


def mul_s(a: int, b: int) -> int:
    return (a * b) % P


def inv_s(a: int) -> int:
    return pow(a, P - 2, P)


def pow_s(a: int, e: int) -> int:
    return pow(a, e, P)


def primitive_root_of_unity(n_log: int) -> int:
    """Generator of the order-2^n_log subgroup."""
    assert n_log <= TWO_ADICITY
    return pow(GENERATOR, (P - 1) >> n_log, P)


# ---------------------------------------------------------------------------
# GF(p^2) scalar ops: elements are (a0, a1) meaning a0 + a1*x, x^2 = 7.
# ---------------------------------------------------------------------------

EXT_ZERO = (0, 0)
EXT_ONE = (1, 0)


def ext_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def ext_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def ext_neg(a):
    return ((-a[0]) % P, (-a[1]) % P)


def ext_mul(a, b):
    return ((a[0] * b[0] + W_EXT * a[1] * b[1]) % P, (a[0] * b[1] + a[1] * b[0]) % P)


def ext_scalar_mul(a, s: int):
    return ((a[0] * s) % P, (a[1] * s) % P)


def ext_inv(a):
    norm = (a[0] * a[0] - W_EXT * a[1] * a[1]) % P
    ninv = inv_s(norm)
    return ((a[0] * ninv) % P, ((-a[1]) * ninv) % P)


def ext_pow(a, e: int):
    result = EXT_ONE
    base = a
    while e > 0:
        if e & 1:
            result = ext_mul(result, base)
        base = ext_mul(base, base)
        e >>= 1
    return result


# ---------------------------------------------------------------------------
# GF(p^2) array ops: pairs of uint64 arrays (a0, a1).
# ---------------------------------------------------------------------------


def ext_add_v(a, b):
    return (gl_add(a[0], b[0]), gl_add(a[1], b[1]))


def ext_sub_v(a, b):
    return (gl_sub(a[0], b[0]), gl_sub(a[1], b[1]))


def ext_mul_v(a, b):
    xp = _xp(a[0])
    c0 = gl_add(gl_mul(a[0], b[0]), gl_mul(gl_mul(a[1], b[1]), _c(xp, W_EXT)))
    c1 = gl_add(gl_mul(a[0], b[1]), gl_mul(a[1], b[0]))
    return (c0, c1)


def ext_mul_base_v(a, b):
    """Extension array times base-field array."""
    return (gl_mul(a[0], b), gl_mul(a[1], b))


def ext_inv_v(a):
    xp = _xp(a[0])
    w = xp.full_like(a[0], _c(xp, W_EXT))
    norm = gl_sub(gl_mul(a[0], a[0]), gl_mul(w, gl_mul(a[1], a[1])))
    ninv = gl_inv(norm)
    return (gl_mul(a[0], ninv), gl_mul(gl_neg(a[1]), ninv))
