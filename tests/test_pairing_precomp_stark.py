"""PairingPrecompStark tests (heavy cases behind RUN_SLOW)."""

import os

import numpy as np
import pytest

from starky_bls12_381_tpu.chips.testing import assert_zero_residuals
from starky_bls12_381_tpu.fields import bls12_381 as bls
from starky_bls12_381_tpu.starks.pairing_precomp import PairingPrecompAir

from test_bls_native import HM, SIG

slow = pytest.mark.skipif(not os.environ.get("RUN_SLOW"), reason="RUN_SLOW not set")


@pytest.fixture(scope="module")
def air():
    return PairingPrecompAir()


def test_residuals_on_hm(air):
    trace, pis = air.generate_trace(*HM)
    assert_zero_residuals(air, trace, pis)


def test_factor(air):
    assert air.quotient_degree_factor() == 2


def test_truncated_prove_verify():
    """End-to-end prove+verify of the PP machinery in CI: a 5-block
    truncated schedule (covers both doubling and addition block kinds)
    through the identical gadgets/wiring; the full 68-block air proves
    under RUN_SLOW and in the TPU bench."""
    from starky_bls12_381_tpu.backend.config import StarkConfig
    from starky_bls12_381_tpu.backend.prover import prove
    from starky_bls12_381_tpu.backend.verifier import VerificationError, verify

    air5 = PairingPrecompAir(num_blocks=5)
    assert air5.num_rows == 64
    assert {k for k, _ in air5.schedule} == {True, False}
    trace, pis = air5.generate_trace(*HM)
    assert_zero_residuals(air5, trace, pis)
    config = StarkConfig(rate_bits=1, pow_bits=8, num_queries=28)
    proof = prove(air5, trace, pis, config, xp=np)
    verify(air5, proof, pis, config)
    for pi_idx in (air5.PIS_ELL + 7, air5.PIS_X + 2):
        bad = list(pis)
        bad[pi_idx] = (bad[pi_idx] + 1) % (1 << 32)
        with pytest.raises(VerificationError):
            verify(air5, proof, bad, config)


@slow
def test_residuals_on_sig(air):
    trace, pis = air.generate_trace(*SIG)
    assert_zero_residuals(air, trace, pis)


@slow
def test_tampered_coeff_caught(air):
    trace, pis = air.generate_trace(*HM)
    bad = list(pis)
    bad[air.PIS_ELL + 7] = (bad[air.PIS_ELL + 7] + 1) % (1 << 32)
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, trace, bad)


@slow
def test_prove_verify(air):
    from starky_bls12_381_tpu.backend.config import StarkConfig
    from starky_bls12_381_tpu.backend.prover import prove
    from starky_bls12_381_tpu.backend.verifier import verify

    trace, pis = air.generate_trace(*HM)
    config = StarkConfig(rate_bits=1, pow_bits=8, num_queries=28)
    proof = prove(air, trace, pis, config, xp=np)
    verify(air, proof, pis, config)
