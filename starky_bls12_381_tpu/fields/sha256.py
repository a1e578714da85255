"""SHA-256 compression with per-block intermediates, from scratch.

The reference proves `expand_message_xmd` (hash_to_field.rs:82-169) inside
its plonky2 aggregation circuit via a SHA-256 gadget. This module is the
native side of the TPU equivalent: it exposes every compression call
(message block, chaining value in, chaining value out) that an XMD
expansion performs, so `starks/sha256_air.py` can prove all of them
in-STARK while the byte plumbing between compressions — padding, the
b0 xor b_i chaining, counters, DST suffixing — is re-checked by the
verifier natively over the same PUBLIC words (`check_xmd_pis`). The
plumbing operates only on public data (message, DST, published digests),
so checking it natively loses no soundness vs the reference's in-circuit
wiring; the expensive bit-level hashing is what the proof covers.

Self-contained implementation (FIPS 180-4); tests pin it against hashlib.
"""

from __future__ import annotations

import hashlib
from typing import List, Tuple

MASK32 = 0xFFFFFFFF

IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)

K = (
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
)


def _rotr(x: int, n: int) -> int:
    return ((x >> n) | (x << (32 - n))) & MASK32


def compress(h8, w16) -> Tuple[int, ...]:
    """One SHA-256 compression: chaining value h8 (8 words) + block w16
    (16 big-endian words) -> new chaining value."""
    w = list(w16) + [0] * 48
    for t in range(16, 64):
        s0 = _rotr(w[t - 15], 7) ^ _rotr(w[t - 15], 18) ^ (w[t - 15] >> 3)
        s1 = _rotr(w[t - 2], 17) ^ _rotr(w[t - 2], 19) ^ (w[t - 2] >> 10)
        w[t] = (w[t - 16] + s0 + w[t - 7] + s1) & MASK32
    a, b, c, d, e, f, g, h = h8
    for t in range(64):
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = (h + S1 + ch + K[t] + w[t]) & MASK32
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (S0 + maj) & MASK32
        h, g, f, e, d, c, b, a = g, f, e, (d + t1) & MASK32, c, b, a, (t1 + t2) & MASK32
    return tuple((x + y) & MASK32 for x, y in zip(h8, (a, b, c, d, e, f, g, h)))


def pad_blocks(data: bytes) -> List[List[int]]:
    """FIPS 180-4 padding -> list of 16-word blocks."""
    bitlen = 8 * len(data)
    data = data + b"\x80"
    data = data + bytes((-len(data) - 8) % 64)
    data = data + bitlen.to_bytes(8, "big")
    out = []
    for off in range(0, len(data), 64):
        blk = data[off : off + 64]
        out.append([int.from_bytes(blk[i : i + 4], "big") for i in range(0, 64, 4)])
    return out


def sha256_compressions(data: bytes):
    """Full hash as a list of (w16, h_in, h_out) compressions + digest."""
    comps = []
    h = IV
    for blk in pad_blocks(data):
        h_out = compress(h, blk)
        comps.append((blk, h, h_out))
        h = h_out
    digest = b"".join(x.to_bytes(4, "big") for x in h)
    return digest, comps


def sha256(data: bytes) -> bytes:
    return sha256_compressions(data)[0]


def _strxor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def expand_message_xmd_compressions(msg: bytes, dst: bytes, len_in_bytes: int):
    """RFC 9380 expand_message_xmd, recording every SHA-256 compression.

    Returns (uniform_bytes, comps) where comps is the ordered list of
    (block_words16, h_in8, h_out8) across b_0, b_1, ..., b_ell. Matches
    fields/hash_to_curve.py `expand_message_xmd` (hashlib) bit-for-bit.
    """
    ell = (len_in_bytes + 31) // 32
    assert ell <= 255 and len(dst) <= 255
    dst_prime = dst + bytes([len(dst)])
    z_pad = bytes(64)
    l_i_b = len_in_bytes.to_bytes(2, "big")
    comps: list = []

    def record(data: bytes) -> bytes:
        digest, cs = sha256_compressions(data)
        comps.extend(cs)
        return digest

    b0 = record(z_pad + msg + l_i_b + b"\x00" + dst_prime)
    bvals = [record(b0 + b"\x01" + dst_prime)]
    for i in range(2, ell + 1):
        bvals.append(record(_strxor(b0, bvals[-1]) + bytes([i]) + dst_prime))
    uniform = b"".join(bvals)[:len_in_bytes]
    assert hashlib.sha256(z_pad + msg + l_i_b + b"\x00" + dst_prime).digest() == b0
    return uniform, comps


def comps_to_pis(comps) -> List[int]:
    """Flatten compressions into the Sha256Air public-input layout:
    per block [w16 | h_in8 | h_out8] (32 words each)."""
    pis: List[int] = []
    for w16, h_in, h_out in comps:
        pis.extend(int(x) for x in w16)
        pis.extend(int(x) for x in h_in)
        pis.extend(int(x) for x in h_out)
    return pis


def check_xmd_pis(pis, msg: bytes, dst: bytes, len_in_bytes: int) -> bytes:
    """Native verifier glue: recompute the expected compression sequence
    for expand_message_xmd(msg, dst, len_in_bytes) and demand the proved
    public inputs match exactly. Returns the uniform bytes. Raises
    ValueError on any mismatch (wrong message, wrong padding, wrong
    chaining/xor plumbing, wrong digest)."""
    uniform, comps = expand_message_xmd_compressions(msg, dst, len_in_bytes)
    expect = comps_to_pis(comps)
    got = [int(x) for x in pis]
    if got != expect:
        raise ValueError("sha256 public inputs do not match expand_message_xmd(msg)")
    return uniform
