"""Native C kernel paths: batch permutation (scalar + AVX-512 lanes +
remainder), witness-recording permutation, and the u32-shipped device
trace fill — all bit-identical to their python references."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from starky_bls12_381_tpu.backend import poseidon as ps
from starky_bls12_381_tpu.backend import poseidon_native as pn
from starky_bls12_381_tpu.fields.goldilocks import P

needs_native = pytest.mark.skipif(not pn.available(), reason="no C toolchain")


@needs_native
def test_permute_batch_matches_scalar_all_lanes():
    """Covers the 8-lane AVX blocks AND the scalar remainder (batch 21 =
    2 vector blocks + 5 remainder rows; batch 3 = pure remainder)."""
    rng = np.random.default_rng(7)
    for n in (3, 21, 256):
        st = rng.integers(0, P, size=(n, 12), dtype=np.uint64)
        out = pn.permute_batch(st)
        for i in (0, n // 2, n - 1):
            ref = ps.permute_s([int(x) for x in st[i]])
            assert [int(x) for x in out[i]] == [int(x) for x in ref]


@needs_native
def test_permute_record_batch_matches_numpy():
    from starky_bls12_381_tpu.starks import poseidon_block as pb

    rng = np.random.default_rng(8)
    st = rng.integers(0, P, size=(33, 12), dtype=np.uint64)
    b_native, o_native = pn.permute_record_batch(
        st, pb.ROWS_PER_PERM, pb.BLOCK_COLS, pb.S, pb.W3, pb.W6, pb.U
    )
    orig = pn.available
    pn.available = lambda: False  # force the numpy reference path
    try:
        b_ref, o_ref = pb.permute_record(st)
    finally:
        pn.available = orig
    np.testing.assert_array_equal(b_native, b_ref)
    np.testing.assert_array_equal(o_native, o_ref)


def test_device_fill_u32_shipping_bit_identical():
    """flush_device ships u32-ranged value arrays narrow; the expanded
    device trace must equal the host flush exactly."""
    import random

    from starky_bls12_381_tpu.fields.bls12_381 import P381
    from starky_bls12_381_tpu.starks.fp12_mul import FP12MulAir

    rng = random.Random(1)
    f = lambda: tuple(  # noqa: E731
        tuple((rng.randrange(P381), rng.randrange(P381)) for _ in range(3)) for _ in range(2)
    )
    air = FP12MulAir()
    a, b = f(), f()
    t_host, pis_h = air.generate_trace(a, b)
    t_dev, pis_d = air.generate_trace(a, b, device=True)
    np.testing.assert_array_equal(np.asarray(t_dev), t_host)
    assert pis_h == pis_d
