"""FP12MulStark end-to-end: residuals, prove+verify, tamper (SURVEY.md §4)."""

import random

import numpy as np
import pytest

from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.chips.testing import assert_zero_residuals
from starky_bls12_381_tpu.fields import bls12_381 as bls
from starky_bls12_381_tpu.fields.bls12_381 import P381
from starky_bls12_381_tpu.starks.fp12_mul import FP12MulAir

rng = random.Random(99)


def _fp12():
    return (
        tuple(tuple(rng.randrange(P381) for _ in range(2)) for _ in range(3)),
        tuple(tuple(rng.randrange(P381) for _ in range(2)) for _ in range(3)),
    )


@pytest.fixture(scope="module")
def air():
    return FP12MulAir()


def test_trace_residuals(air):
    x, y = _fp12(), _fp12()
    trace, pis = air.generate_trace(x, y)
    assert_zero_residuals(air, trace, pis)


def test_factor_and_shape(air):
    assert air.quotient_degree_factor() == 2
    x, y = _fp12(), _fp12()
    trace, pis = air.generate_trace(x, y)
    assert trace.shape[0] == 16
    assert len(pis) == 432


def test_wrong_output_pi_caught(air):
    x, y = _fp12(), _fp12()
    trace, pis = air.generate_trace(x, y)
    bad = list(pis)
    bad[300] = (bad[300] + 1) % (1 << 32)
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, trace, bad)


def test_prove_verify(air):
    x, y = _fp12(), _fp12()
    trace, pis = air.generate_trace(x, y)
    config = StarkConfig(rate_bits=1, pow_bits=8, num_queries=28)
    proof = prove(air, trace, pis, config, xp=np)
    verify(air, proof, pis, config)
    # wrong claimed product must fail
    bad = list(pis)
    bad[288] = (bad[288] + 1) % (1 << 32)
    with pytest.raises(VerificationError):
        verify(air, proof, bad, config)
