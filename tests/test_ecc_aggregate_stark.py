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
