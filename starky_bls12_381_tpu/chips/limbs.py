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
All kernels are backend-agnostic (numpy or jax.numpy): loops over the
limb axis are static python loops building per-limb columns that stack at
the end, so the same code fills host traces eagerly and expands device
traces under jax.jit (on-device trace generation).
"""

from __future__ import annotations

import numpy as np

from ..fields.bls12_381 import P381
from ..fields.goldilocks import _xp as _gxp


def _xp(a):
    """numpy unless `a` is a jax array (lists/ints/np scalars -> numpy)."""
    if isinstance(a, (list, tuple, np.ndarray)) or np.isscalar(a):
        return np
    return _gxp(a)

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


def to_limbs_batch(ints, n: int = 12) -> np.ndarray:
    """(B,) python ints -> (B, n) uint64 limb array (via to_bytes: ~10x
    faster than per-int shift loops for wide batch fills)."""
    buf = b"".join(int(x).to_bytes(4 * n, "little") for x in ints)
    return np.frombuffer(buf, dtype="<u4").reshape(len(ints), n).astype(np.uint64)


P381_LIMBS = to_limbs(P381)
P381_LIMBS_24 = to_limbs(P381, 24)


def multiply_by_slice(x, y) -> tuple:
    """x (..., 12) limbs times y (...,) single limb -> (res (..., 13),
    carries (..., 12)); res[i] = lo32(x[i]*y + carry[i-1])."""
    xp = _xp(x)
    x = xp.asarray(x, dtype=xp.uint64)
    y = xp.asarray(y, dtype=xp.uint64)
    lead = np.broadcast_shapes(x.shape[:-1], y.shape)
    res_cols = []
    carry_cols = []
    prev = xp.zeros(lead, dtype=xp.uint64)
    for i in range(12):
        t = x[..., i] * y + prev
        res_cols.append(t & MASK32)
        prev = t >> np.uint64(32)
        carry_cols.append(prev)
    res_cols.append(prev)
    return xp.stack(res_cols, axis=-1), xp.stack(carry_cols, axis=-1)


def add_u32_slices(x, y) -> tuple:
    """Per-limb add with carry chain; works for any matching limb count."""
    xp = _xp(x)
    if xp is np:
        xp = _xp(y)
    x = xp.asarray(x, dtype=xp.uint64)
    y = xp.asarray(y, dtype=xp.uint64)
    n = x.shape[-1]
    lead = np.broadcast_shapes(x.shape, y.shape)[:-1]
    res_cols, carry_cols = [], []
    prev = xp.zeros(lead, dtype=xp.uint64)
    for i in range(n):
        s = x[..., i] + y[..., i] + prev
        res_cols.append(s & MASK32)
        prev = s >> np.uint64(32)
        carry_cols.append(prev)
    return xp.stack(res_cols, axis=-1), xp.stack(carry_cols, axis=-1)


def sub_u32_slices(x, y) -> tuple:
    """Per-limb sub with borrow chain (assumes x >= y as integers)."""
    xp = _xp(x)
    if xp is np:
        xp = _xp(y)
    x = xp.asarray(x, dtype=xp.uint64)
    y = xp.asarray(y, dtype=xp.uint64)
    n = x.shape[-1]
    lead = np.broadcast_shapes(x.shape, y.shape)[:-1]
    res_cols, borrow_cols = [], []
    prev = xp.zeros(lead, dtype=xp.uint64)
    for i in range(n):
        need = y[..., i] + prev
        take = x[..., i] < need
        res_cols.append(xp.where(take, xp.uint64(B32) + x[..., i] - need, x[..., i] - need))
        prev = take.astype(xp.uint64)
        borrow_cols.append(prev)
    return xp.stack(res_cols, axis=-1), xp.stack(borrow_cols, axis=-1)


def mul_u32_slice_u32(x, y) -> tuple:
    """12-limb x single-limb -> 12 limbs + 12 carries; result must fit."""
    res13, carries = multiply_by_slice(x, y)
    if isinstance(res13, np.ndarray):
        assert not res13[..., 12].any(), "mul_u32_slice_u32 overflow"
    return res13[..., :12], carries


def get_bits_as_array(x):
    """(...,) u32 -> (..., 32) LE bits."""
    xp = _xp(x)
    x = xp.asarray(x, dtype=xp.uint64)
    shifts = xp.arange(32, dtype=xp.uint64)
    return (x[..., None] >> shifts) & xp.uint64(1)


def get_div_rem_modulus(x: int) -> tuple[int, int]:
    return divmod(x, P381)
