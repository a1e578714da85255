"""Pallas TPU kernel for the Poseidon2-GL12 batched permutation.

The XLA path (`poseidon.permute`) runs the permutation as ~30 fused
uint64 vector ops per round; measured 4.3 Mperm/s on v5e — ~13% of the
VPU's u32-lane peak (docs/PERF.md roofline). This kernel attacks the
overhead XLA leaves on the table:

* state lives in VMEM registers for all 30 rounds (no relayouts from the
  (N, 12) stack/concat ops the XLA path emits per round);
* Goldilocks values are held as (lo32, hi32) u32 PAIRS in a
  structure-of-arrays layout (24, B) — every op is a plain elementwise
  u32 VPU op, no sublane shuffles;
* the 64x64->128 multiply is built from 16x16->32 partial products
  (Mosaic exposes no 32x32->hi32 multiply — this is the hard op-count
  floor that bounds the achievable speedup, see docs/PERF.md);
* values stay LOOSE (< 2^64, not canonical) between ops; one conditional
  subtract canonicalizes each lane at permutation exit. Bit-identical to
  `poseidon.permute_s`.

Opt-in: `STARKY_PALLAS=1` routes `poseidon.permute` through this kernel
on the TPU backend (tests exercise it via interpret mode on CPU).

Reference capability: the Poseidon-Goldilocks Merkle/transcript hashing
of the starky/plonky2 backend (SURVEY.md §2.2); the instance is this
repo's own Poseidon2-GL12 (backend/poseidon.py).
"""

from __future__ import annotations

import functools

import numpy as np

from . import poseidon as ps

B_TILE = 512  # batch lanes per grid step (4 sublane-tiles of u32x128)

_M16 = 0xFFFF
_M32 = 0xFFFFFFFF


def _u32(x):
    import jax.numpy as jnp

    return jnp.uint32(x)


# ---------------------------------------------------------------------------
# (lo, hi) u32-pair Goldilocks primitives (all shapes (1, B))
# ---------------------------------------------------------------------------


def _add_loose(a, b):
    """(a + b) mod 2^64-fold: inputs < 2^64, output < 2^64.

    A carry out of bit 64 folds as +2^32-1 (2^64 = 2^32 - 1 mod p); the
    fold itself can carry at most twice more, each strictly smaller —
    three masked fold passes are exact for all inputs."""
    import jax.numpy as jnp

    alo, ahi = a
    blo, bhi = b
    lo = alo + blo
    c0 = (lo < alo).astype(jnp.uint32)
    hi = ahi + bhi
    c1 = (hi < ahi).astype(jnp.uint32)
    hi = hi + c0
    c1 = c1 | ((hi == 0) & (c0 == 1)).astype(jnp.uint32)
    for _ in range(2):  # fold passes (second handles the wrap-again case)
        lo2 = lo - c1  # += c1 * 0xffffffff (mod 2^32)
        cf = ((lo != 0) & (c1 == 1)).astype(jnp.uint32)
        hi2 = hi + cf
        c1 = ((hi2 == 0) & (cf == 1)).astype(jnp.uint32)
        lo, hi = lo2, hi2
    return lo, hi


def _sub_loose(a, b):
    """(a - b) with b < 2^64: a - b mod 2^64, a borrow folds as -(2^32-1)."""
    import jax.numpy as jnp

    alo, ahi = a
    blo, bhi = b
    lo = alo - blo
    b0 = (alo < blo).astype(jnp.uint32)
    hi = ahi - bhi
    b1 = (ahi < bhi).astype(jnp.uint32)
    hi2 = hi - b0
    b1 = b1 | ((hi == 0) & (b0 == 1)).astype(jnp.uint32)
    hi = hi2
    for _ in range(2):
        lo2 = lo + b1  # -= b1 * 0xffffffff (mod 2^32)
        bf = ((lo2 != 0) & (b1 == 1)).astype(jnp.uint32)  # borrow unless lo wrapped
        hi2 = hi - bf
        b1 = ((hi == 0) & (bf == 1)).astype(jnp.uint32)
        lo, hi = lo2, hi2
    return lo, hi


def _mul(a, b):
    """(a * b) mod p, inputs loose < 2^64, output loose < 2^64.

    16 x (u16 x u16 -> u32) partial products, 16-bit column accumulation,
    then the 128-bit Goldilocks fold  L + H0*2^32 - H0 - H1  using
    2^64 = 2^32 - 1 and 2^96 = -1 (mod p)."""
    import jax.numpy as jnp

    alo, ahi = a
    blo, bhi = b
    al = [alo & _M16, alo >> 16, ahi & _M16, ahi >> 16]
    bl = [blo & _M16, blo >> 16, bhi & _M16, bhi >> 16]
    # column sums of split partial products: col[k] < 2^20 (u32-safe)
    col = [jnp.zeros_like(alo) for _ in range(8)]
    for i in range(4):
        for j in range(4):
            pij = al[i] * bl[j]
            col[i + j] = col[i + j] + (pij & _M16)
            col[i + j + 1] = col[i + j + 1] + (pij >> 16)
    # carry-normalize to strict u16 columns
    for k in range(7):
        col[k + 1] = col[k + 1] + (col[k] >> 16)
        col[k] = col[k] & _M16
    low = (col[0] | (col[1] << 16), col[2] | (col[3] << 16))
    h0 = col[4] | (col[5] << 16)
    h1 = col[6] | (col[7] << 16)
    z = jnp.zeros_like(alo)
    r = _add_loose(low, (z, h0))  # + H0 * 2^32
    r = _sub_loose(r, (h0, z))  # - H0
    r = _sub_loose(r, (h1, z))  # - H1
    return r


def _dbl(a):
    return _add_loose(a, a)


def _shl(a, e: int):
    """(a * 2^e) mod p for 1 <= e <= 63, loose in/out."""
    import jax.numpy as jnp

    lo, hi = a
    z = jnp.zeros_like(lo)
    if e < 32:
        w0 = lo << e
        w1 = (hi << e) | (lo >> (32 - e))
        w2 = hi >> (32 - e)
        w3 = z
    else:
        s = e - 32
        w0 = z
        w1 = lo << s if s else lo
        w2 = (hi << s) | (lo >> (32 - s)) if s else hi
        w3 = hi >> (32 - s) if s else z
    # value = (w0, w1) + w2*2^64 + w3*2^96 = (w0,w1) + w2*(2^32-1) - w3
    r = _add_loose((w0, w1), (z, w2))  # + w2 * 2^32
    r = _sub_loose(r, (w2, z))  # - w2
    if e >= 32:
        r = _sub_loose(r, (w3, z))  # - w3   (2^96 = -1)
    return r


def _canon(a):
    """loose < 2^64 -> canonical < p (one conditional subtract of p)."""
    import jax.numpy as jnp

    lo, hi = a
    ge = ((hi == _M32) & (lo >= 1)).astype(jnp.uint32)
    # value - p = (lo - 1, hi - 0xffffffff) when ge (no borrow: lo >= 1)
    return lo - ge, hi + ge  # hi + 1 == hi - 0xffffffff (mod 2^32)


def _sbox(x):
    x2 = _mul(x, x)
    x3 = _mul(x2, x)
    return _mul(_mul(x3, x3), x)


def _m4_block(a, b, c, d):
    t0 = _add_loose(a, b)
    t1 = _add_loose(c, d)
    t2 = _add_loose(_dbl(b), t1)
    t3 = _add_loose(_dbl(d), t0)
    t4 = _add_loose(_dbl(_dbl(t1)), t3)
    t5 = _add_loose(_dbl(_dbl(t0)), t2)
    t6 = _add_loose(t3, t5)
    t7 = _add_loose(t2, t4)
    return t6, t5, t7, t4


def _external_layer(lanes):
    blocks = [_m4_block(*lanes[4 * b : 4 * b + 4]) for b in range(3)]
    sums = [
        _add_loose(_add_loose(blocks[0][i], blocks[1][i]), blocks[2][i]) for i in range(4)
    ]
    return [_add_loose(blocks[b][i], sums[i]) for b in range(3) for i in range(4)]


def _internal_layer(lanes):
    total = lanes[0]
    for i in range(1, 12):
        total = _add_loose(total, lanes[i])
    return [_add_loose(total, _shl(lanes[i], ps.DIAG_EXP[i])) for i in range(12)]


def _permute_lanes(lanes, rc_pairs):
    """30 rounds over 12 (lo, hi) pairs; rc_pairs[r][i] = (lo, hi) consts."""
    lanes = _external_layer(lanes)
    for r in range(ps.N_ROUNDS):
        if ps.round_is_full(r):
            lanes = [
                _sbox(_add_loose(lanes[i], rc_pairs[r][i])) for i in range(12)
            ]
            lanes = _external_layer(lanes)
        else:
            lanes = [_sbox(_add_loose(lanes[0], rc_pairs[r][0]))] + lanes[1:]
            lanes = _internal_layer(lanes)
    return [_canon(l) for l in lanes]


def _kernel(x_ref, o_ref):
    import jax.numpy as jnp

    x = x_ref[:]  # (24, B_TILE) u32: rows 2i/2i+1 = lo/hi of lane i
    lanes = [(x[2 * i : 2 * i + 1, :], x[2 * i + 1 : 2 * i + 2, :]) for i in range(12)]
    rc = [
        [(jnp.uint32(c & _M32), jnp.uint32(c >> 32)) for c in row]
        for row in ps.ROUND_CONSTANTS
    ]
    out = _permute_lanes(lanes, rc)
    for i, (lo, hi) in enumerate(out):
        o_ref[2 * i : 2 * i + 1, :] = lo
        o_ref[2 * i + 1 : 2 * i + 2, :] = hi


@functools.lru_cache(maxsize=None)
def _permute_call(nblocks: int, interpret: bool):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # GRIDLESS kernel mapped over (nblocks, 24, B_TILE) chunks: the axon
    # remote-AOT Mosaic path rejects every grid/index_map formulation
    # ("failed to legalize func.return") but compiles full-array
    # gridless calls; lax.map over the chunk axis restores the batch.
    call = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((24, B_TILE), np.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    def run(chunks):  # (nblocks, 24, B_TILE)
        return jax.lax.map(call, chunks)

    return jax.jit(run)


def permute(states, interpret: bool = False):
    """Batched Poseidon2 permutation of an (N, 12) uint64 array via the
    Pallas kernel; bit-identical to `poseidon.permute`. Device-side
    (jax) arrays only; pads N up to a B_TILE multiple internally."""
    import jax.numpy as jnp

    n = states.shape[0]
    nblocks = max(1, -(-n // B_TILE))
    npad = nblocks * B_TILE
    x = jnp.asarray(states, dtype=jnp.uint64)
    if npad != n:
        x = jnp.concatenate([x, jnp.zeros((npad - n, 12), dtype=jnp.uint64)], axis=0)
    # (N, 12) u64 -> (nblocks, 24, B_TILE) u32 SoA: rows 2i (lo) / 2i+1 (hi)
    lo = (x & jnp.uint64(_M32)).astype(jnp.uint32)
    hi = (x >> jnp.uint64(32)).astype(jnp.uint32)
    packed = jnp.stack([lo, hi], axis=2).reshape(npad, 24).T  # (24, npad)
    chunks = packed.reshape(24, nblocks, B_TILE).transpose(1, 0, 2)
    out = _permute_call(nblocks, interpret)(chunks)  # (nblocks, 24, B_TILE)
    out = out.transpose(1, 0, 2).reshape(24, npad).T.reshape(npad, 12, 2)
    res = out[:, :, 0].astype(jnp.uint64) | (out[:, :, 1].astype(jnp.uint64) << jnp.uint64(32))
    return res[:n]
