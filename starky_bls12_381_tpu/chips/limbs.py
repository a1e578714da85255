"""Vectorized 12/24-limb u32 arithmetic with explicit carry/borrow witnesses.

Re-creates the reference's limb layer (`big_arithmetic.rs`,
`native.rs:38-181`) with numpy batch semantics: every function accepts
arrays whose LAST axis is the limb axis and vectorizes over leading axes.
The carry/borrow outputs are not a by-product — they are witness columns in
the STARK traces, so the bit-level semantics match `native.rs` exactly:

* `multiply_by_slice`    — native.rs:55  (12-limb x 1-limb -> 13 limbs + 12 carries)
* `add_u32_slices`       — native.rs:71  (per-limb sum, carry in {0,1})
* `sub_u32_slices`       — native.rs:102 (per-limb diff, borrow in {0,1})
* `mul_u32_slice_u32`    — native.rs:140 (asserts no overflow out of 12 limbs)
* `get_bits_as_array`    — native.rs:154 (32-bit LE decomposition)
* `get_div_rem_modulus`  — native.rs:277 (x = div*p + rem against BLS12-381 p)

Values are stored as uint64 (each limb < 2^32) so products fit natively.
"""

from __future__ import annotations

import numpy as np

from ..fields.bls12_381 import P381

MASK32 = np.uint64(0xFFFFFFFF)
B32 = 1 << 32


def to_limbs(x: int, n: int = 12) -> np.ndarray:
    assert 0 <= x < (1 << (32 * n))
    return np.asarray([(x >> (32 * i)) & 0xFFFFFFFF for i in range(n)], dtype=np.uint64)


def from_limbs(limbs) -> int:
    out = 0
    for i, l in enumerate(limbs):
        out |= int(l) << (32 * i)
    return out


P381_LIMBS = to_limbs(P381)
P381_LIMBS_24 = to_limbs(P381, 24)


def multiply_by_slice(x: np.ndarray, y) -> tuple[np.ndarray, np.ndarray]:
    """x (..., 12) limbs times y (...,) single limb -> (res (..., 13),
    carries (..., 12)); res[i] = lo32(x[i]*y + carry[i-1])."""
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    lead = np.broadcast_shapes(x.shape[:-1], y.shape)
    res = np.zeros(lead + (13,), dtype=np.uint64)
    carries = np.zeros(lead + (12,), dtype=np.uint64)
    prev = np.zeros(lead, dtype=np.uint64)
    for i in range(12):
        t = x[..., i] * y + prev
        res[..., i] = t & MASK32
        prev = t >> np.uint64(32)
        carries[..., i] = prev
    res[..., 12] = prev
    return res, carries


def add_u32_slices(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-limb add with carry chain; works for any matching limb count."""
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    n = x.shape[-1]
    res = np.zeros(np.broadcast_shapes(x.shape, y.shape), dtype=np.uint64)
    carries = np.zeros_like(res)
    prev = np.zeros(res.shape[:-1], dtype=np.uint64)
    for i in range(n):
        s = x[..., i] + y[..., i] + prev
        res[..., i] = s & MASK32
        prev = s >> np.uint64(32)
        carries[..., i] = prev
    return res, carries


def sub_u32_slices(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-limb sub with borrow chain (assumes x >= y as integers)."""
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    n = x.shape[-1]
    res = np.zeros(np.broadcast_shapes(x.shape, y.shape), dtype=np.uint64)
    borrows = np.zeros_like(res)
    prev = np.zeros(res.shape[:-1], dtype=np.uint64)
    for i in range(n):
        need = y[..., i] + prev
        take = x[..., i] < need
        res[..., i] = np.where(take, np.uint64(B32) + x[..., i] - need, x[..., i] - need)
        prev = take.astype(np.uint64)
        borrows[..., i] = prev
    return res, borrows


def mul_u32_slice_u32(x: np.ndarray, y) -> tuple[np.ndarray, np.ndarray]:
    """12-limb x single-limb -> 12 limbs + 12 carries; result must fit."""
    res13, carries = multiply_by_slice(x, y)
    assert not res13[..., 12].any(), "mul_u32_slice_u32 overflow"
    return res13[..., :12], carries


def get_bits_as_array(x) -> np.ndarray:
    """(...,) u32 -> (..., 32) LE bits."""
    x = np.asarray(x, dtype=np.uint64)
    shifts = np.arange(32, dtype=np.uint64)
    return (x[..., None] >> shifts) & np.uint64(1)


def get_div_rem_modulus(x: int) -> tuple[int, int]:
    return divmod(x, P381)
