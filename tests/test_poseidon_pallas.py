"""Pallas Poseidon2 kernel: bit-exactness vs the scalar oracle.

The (lo32, hi32) u32-pair arithmetic (`_permute_lanes`) is checked as
plain jnp ops on CPU (identical code path to the kernel body); the full
`pallas_call` plumbing runs in interpret mode on a tiny batch (slow —
gated) and natively on the TPU via bench_micro.py.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from starky_bls12_381_tpu.backend import poseidon as ps
from starky_bls12_381_tpu.backend import poseidon_pallas as pp


def _ref(states: np.ndarray) -> np.ndarray:
    return np.stack(
        [np.asarray(ps.permute_s([int(v) for v in row]), dtype=np.uint64) for row in states]
    )


def _lanes_roundtrip(states: np.ndarray) -> np.ndarray:
    lo = (states & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (states >> np.uint64(32)).astype(np.uint32)
    lanes = [(jnp.asarray(lo[:, i : i + 1].T), jnp.asarray(hi[:, i : i + 1].T)) for i in range(12)]
    rc = [
        [
            (
                jnp.full((1, 1), c & 0xFFFFFFFF, dtype=jnp.uint32),
                jnp.full((1, 1), c >> 32, dtype=jnp.uint32),
            )
            for c in row
        ]
        for row in ps.ROUND_CONSTANTS
    ]
    out_lanes = pp._permute_lanes(lanes, rc)
    out = np.zeros_like(states)
    for i, (l, h) in enumerate(out_lanes):
        out[:, i] = np.asarray(l)[0].astype(np.uint64) | (
            np.asarray(h)[0].astype(np.uint64) << np.uint64(32)
        )
    return out


def test_u32_pair_arithmetic_bit_exact():
    rng = np.random.default_rng(7)
    states = rng.integers(0, ps.P, size=(8, 12), dtype=np.uint64)
    states[0, :] = ps.P - 1  # boundary lanes
    states[1, :] = 0
    states[2, ::2] = ps.P - 1
    np.testing.assert_array_equal(_lanes_roundtrip(states), _ref(states))


def test_mul_loose_inputs():
    """The kernel's invariant is loose (< 2^64) operands: feed _mul
    non-canonical values and compare mod p."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 64, size=(1, 64), dtype=np.uint64)
    b = rng.integers(0, 1 << 64, size=(1, 64), dtype=np.uint64)
    a[0, 0], b[0, 0] = (1 << 64) - 1, (1 << 64) - 1
    a[0, 1], b[0, 1] = ps.P, ps.P  # exactly-p loose values
    pair = lambda x: (  # noqa: E731
        jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
    )
    lo, hi = pp._mul(pair(a), pair(b))
    got = np.asarray(lo).astype(np.uint64) | (np.asarray(hi).astype(np.uint64) << np.uint64(32))
    want = (a.astype(object) * b.astype(object)) % ps.P
    assert ((got.astype(object) - want) % ps.P == 0).all()


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"), reason="RUN_SLOW not set")
def test_pallas_call_interpret():
    """Full pallas_call in interpreter mode (very slow: unrolled kernel)."""
    rng = np.random.default_rng(11)
    states = rng.integers(0, ps.P, size=(4, 12), dtype=np.uint64)
    out = np.asarray(pp.permute(jnp.asarray(states), interpret=True))
    np.testing.assert_array_equal(out, _ref(states))
