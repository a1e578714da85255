"""ECCAggregate stark tests (small NUM_POINTS instances)."""

import os
import random

import numpy as np
import pytest

from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.chips.testing import assert_zero_residuals
from starky_bls12_381_tpu.fields import bls12_381 as bls
from starky_bls12_381_tpu.starks.ecc_aggregate import ECCAggregateAir

rng = random.Random(123)


def _points(n):
    """n distinct points: [G, 2G, 4G, 8G, ...] so no partial sum ever
    equals the next selected point (keeps additions doubling-free)."""
    pts = [bls.G1_GEN]
    for _ in range(n - 1):
        pts.append(bls.g1_double(pts[-1]))
    return pts


@pytest.fixture(scope="module")
def air():
    return ECCAggregateAir(num_points=8)


def test_residuals_and_result(air):
    pts = _points(8)
    bits = [1, 0, 1, 1, 0, 1, 1, 1]
    trace, pis = air.generate_trace(pts, bits)
    expect = bls.g1_aggregate(pts, bits)
    assert pis[-24:] == [int(x) for x in
                         np.concatenate([__import__('starky_bls12_381_tpu.chips.limbs', fromlist=['to_limbs']).to_limbs(expect[0]),
                                         __import__('starky_bls12_381_tpu.chips.limbs', fromlist=['to_limbs']).to_limbs(expect[1])])]
    assert_zero_residuals(air, trace, pis)


def test_first_bit_zero_and_single_bit(air):
    pts = _points(8)
    bits = [0, 0, 1, 0, 0, 0, 0, 0]
    trace, pis = air.generate_trace(pts, bits)
    assert_zero_residuals(air, trace, pis)


def test_factor(air):
    assert air.quotient_degree_factor() == 2


def test_wrong_result_pi_caught(air):
    pts = _points(8)
    bits = [1, 1, 1, 0, 1, 0, 1, 1]
    trace, pis = air.generate_trace(pts, bits)
    bad = list(pis)
    bad[air.PIS_RES] = (bad[air.PIS_RES] + 1) % (1 << 32)
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, trace, bad)


def test_prove_verify(air):
    pts = _points(8)
    bits = [1, 0, 1, 1, 0, 1, 1, 1]
    trace, pis = air.generate_trace(pts, bits)
    config = StarkConfig(rate_bits=1, pow_bits=8, num_queries=28)
    proof = prove(air, trace, pis, config, xp=np)
    verify(air, proof, pis, config)
    bad = list(pis)
    bad[air.PIS_BITS] = 1 - bad[air.PIS_BITS]
    with pytest.raises(VerificationError):
        verify(air, proof, bad, config)


def test_duplicate_key_aggregates(air):
    """A committee containing the SAME pubkey twice (both selected)
    aggregates via the doubling window (u_d flag + G1DoubleGadget) —
    the reference cannot prove this statement at all (its chord
    identities are vacuous at x1 == x2, g1.rs)."""
    pts = _points(8)
    pts[1] = pts[0]  # duplicate: G appears twice
    bits = [1, 1, 0, 1, 0, 0, 1, 0]
    trace, pis = air.generate_trace(pts, bits)
    # expected: G + G + 8G + 64G (doubling on the second window)
    expect = bls.g1_add(bls.g1_add(bls.g1_double(pts[0]), pts[3]), pts[6])
    from starky_bls12_381_tpu.chips import limbs

    assert pis[-24:] == [int(x) for x in np.concatenate(
        [limbs.to_limbs(expect[0]), limbs.to_limbs(expect[1])])]
    assert_zero_residuals(air, trace, pis)
    config = StarkConfig(rate_bits=1, pow_bits=8, num_queries=28)
    proof = prove(air, trace, pis, config, xp=np)
    verify(air, proof, pis, config)


def test_malicious_doubling_flag_caught(air):
    """Setting u_d on a genuine chord window must violate the
    acc == point pinning (d1/d2 zero) constraints."""
    pts = _points(8)
    bits = [1, 1, 0, 0, 0, 0, 0, 0]
    trace, pis = air.generate_trace(pts, bits)
    bad = np.array(trace)
    bad[12:24, air.u_d] = 1  # claim window 1 (G + 2G) is a doubling
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, bad, pis)


def test_infinity_prefix_rejected(air):
    """acc + (-acc) cannot be represented: generate_trace raises."""
    pts = _points(8)
    g = pts[0]
    pts[1] = (g[0], (-g[1]) % bls.P381)  # -G right after G
    bits = [1, 1, 0, 0, 0, 0, 0, 0]
    with pytest.raises(ValueError):
        air.generate_trace(pts, bits)


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"), reason="RUN_SLOW not set")
def test_prove_verify_512_points():
    """The reference's production configuration: 512 pubkeys
    (ecc_aggregate.rs:7). 8192x3724 prove+verify on the numpy oracle;
    the TPU path is exercised by BENCH_STARK=ecc."""
    air512 = ECCAggregateAir(num_points=512)
    pts = _points(512)
    bits = [1 if i % 3 != 1 else 0 for i in range(512)]
    trace, pis = air512.generate_trace(pts, bits)
    assert trace.shape == (8192, air512.num_cols)
    assert_zero_residuals(air512, trace, pis)
    config = StarkConfig(rate_bits=1, pow_bits=8, num_queries=28)
    proof = prove(air512, trace, pis, config, xp=np)
    verify(air512, proof, pis, config)
