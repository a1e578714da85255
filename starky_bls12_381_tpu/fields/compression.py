"""Compressed-point serialization for BLS12-381 (ZCash/IETF format).

Capability parity with the reference's in-SNARK decompression checks:
`pk_point_check` (g1_plonky2.rs:11-56) verifies a 48-byte compressed G1
pubkey against an affine point — b-flag zero, a-flag = y-parity via
⌊2y/p⌋, x + 2^383 + a·2^381 == compressed bytes — and
`signature_point_check` (g2_plonky2.rs:241-302) does the same for a
96-byte compressed G2 signature. Here the capability is native
compress/decompress (with the exact flag semantics) plus subgroup
membership checks, used by the CLI/aggregation layer to accept the same
wire format as the reference's light-client fixtures.

Flag bits live in the most significant byte of the (first) coordinate:
  0x80 compression flag (always 1 here), 0x40 infinity flag,
  0x20 sign flag a = ⌊2y/p⌋ (1 iff y is "lexicographically largest";
  for G2 the comparison is on (y_c1, y_c0), per the ZCash spec).
"""

from __future__ import annotations

from . import bls12_381 as bls
from .bls12_381 import P381, fp2_add, fp2_mul, fp2_neg
from .hash_to_curve import R_ORDER, fp2_sqrt, g2_scalar_mul

_SQRT_EXP = (P381 + 1) // 4  # p ≡ 3 (mod 4)


def _fp_sqrt(a: int) -> int:
    r = pow(a, _SQRT_EXP, P381)
    if r * r % P381 != a:
        raise ValueError("not a square in Fp")
    return r


def _sign_fp(y: int) -> int:
    """a-flag: ⌊2y/p⌋ (g1_plonky2.rs:27-35's parity witness)."""
    return (2 * y) // P381


def _sign_fp2(y) -> int:
    """Lexicographic sign over (c1, c0)."""
    if y[1] != 0:
        return _sign_fp(y[1])
    return _sign_fp(y[0])


# ---------------------------------------------------------------------------
# G1 (48 bytes)
# ---------------------------------------------------------------------------


def g1_compress(p) -> bytes:
    if p is None:
        return bytes([0xC0]) + bytes(47)
    x, y = p
    out = bytearray(x.to_bytes(48, "big"))
    out[0] |= 0x80 | (0x20 if _sign_fp(y) else 0)
    return bytes(out)


def g1_decompress(data: bytes):
    """48-byte compressed G1 -> affine point (or None for infinity).

    Performs the same consistency checks pk_point_check constrains:
    compression flag set, infinity handling, b-flag structure, x < p,
    on-curve y recovery, sign selection.
    """
    if len(data) != 48:
        raise ValueError("G1 compressed point must be 48 bytes")
    flags = data[0]
    if not flags & 0x80:
        raise ValueError("compression flag not set")
    if flags & 0x40:
        if flags & 0x20 or any(data[1:]) or (flags & 0x1F):
            raise ValueError("malformed infinity encoding")
        return None
    x = int.from_bytes(bytes([flags & 0x1F]) + data[1:], "big")
    if x >= P381:
        raise ValueError("x out of range")
    y = _fp_sqrt((pow(x, 3, P381) + 4) % P381)
    if _sign_fp(y) != (1 if flags & 0x20 else 0):
        y = P381 - y
    p = (x, y)
    assert bls.g1_is_on_curve(p)
    return p


def g1_scalar_mul(p, k: int):
    acc, add = None, p
    while k:
        if k & 1:
            if acc is None:
                acc = add
            elif acc == add:
                acc = bls.g1_double(acc)
            elif acc[0] == add[0]:
                acc = None
            else:
                acc = bls.g1_add(acc, add)
        add = bls.g1_double(add)
        k >>= 1
    return acc


def g1_subgroup_check(p) -> bool:
    """r·P == O (pubkeys must be in the prime-order subgroup)."""
    return p is None or g1_scalar_mul(p, R_ORDER) is None


# ---------------------------------------------------------------------------
# G2 (96 bytes)
# ---------------------------------------------------------------------------


def g2_compress(q) -> bytes:
    if q is None:
        return bytes([0xC0]) + bytes(95)
    (x, y) = q
    out = bytearray(x[1].to_bytes(48, "big") + x[0].to_bytes(48, "big"))
    out[0] |= 0x80 | (0x20 if _sign_fp2(y) else 0)
    return bytes(out)


def g2_decompress(data: bytes):
    """96-byte compressed G2 -> affine point; signature_point_check parity."""
    if len(data) != 96:
        raise ValueError("G2 compressed point must be 96 bytes")
    flags = data[0]
    if not flags & 0x80:
        raise ValueError("compression flag not set")
    if flags & 0x40:
        if flags & 0x20 or any(data[1:]) or (flags & 0x1F):
            raise ValueError("malformed infinity encoding")
        return None
    x1 = int.from_bytes(bytes([flags & 0x1F]) + data[1:48], "big")
    x0 = int.from_bytes(data[48:], "big")
    if x0 >= P381 or x1 >= P381:
        raise ValueError("x out of range")
    x = (x0, x1)
    gx = fp2_add(fp2_mul(fp2_mul(x, x), x), (4, 4))  # b = 4(1+i)
    y = fp2_sqrt(gx)
    if _sign_fp2(y) != (1 if flags & 0x20 else 0):
        y = fp2_neg(y)
    q = (x, y)
    assert bls.g2_is_on_curve(q)
    return q


def g2_subgroup_check(q) -> bool:
    return q is None or g2_scalar_mul(q, R_ORDER) is None
