"""MillerLoopStark tests: residuals vs native, tamper, prove/verify.

The full-scale tamper/prove tests take minutes in numpy; they run only
with RUN_SLOW=1 (the TPU path is exercised by bench.py).
"""

import os

import numpy as np
import pytest

from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.chips.testing import assert_zero_residuals
from starky_bls12_381_tpu.fields import bls12_381 as bls
from starky_bls12_381_tpu.starks.fp12_mul import fp12_to_pis
from starky_bls12_381_tpu.starks.miller_loop import MillerLoopAir

from test_bls_native import HM, PK


@pytest.fixture(scope="module")
def air():
    return MillerLoopAir()


@pytest.fixture(scope="module")
def data():
    px, py = PK[0], (-PK[1]) % bls.P381  # -pk, as in verify_bls_signature
    coeffs = bls.calc_pairing_precomp(*HM)
    return px, py, coeffs


@pytest.mark.skipif(not os.environ.get('RUN_SLOW'), reason='RUN_SLOW not set')
def test_trace_residuals_and_result(air, data):
    """Full-width 1024x89018 residual sweep (minutes in numpy) — the
    truncated-schedule test below covers the machinery in CI."""
    px, py, coeffs = data
    trace, pis = air.generate_trace(px, py, coeffs)
    # the bound result equals the native miller loop
    expect = bls.miller_loop(px, py, *HM)
    assert pis[air.PIS_RES :] == fp12_to_pis(expect)
    assert_zero_residuals(air, trace, pis)


def test_factor_and_shape(air, data):
    assert air.quotient_degree_factor() == 2
    assert air.num_rows == 1024
    assert air.num_pis == 24 + 68 * 72 + 144


@pytest.mark.skipif(not os.environ.get('RUN_SLOW'), reason='RUN_SLOW not set')
def test_wrong_result_caught(air, data):
    px, py, coeffs = data
    trace, pis = air.generate_trace(px, py, coeffs)
    bad = list(pis)
    bad[air.PIS_RES + 5] = (bad[air.PIS_RES + 5] + 1) % (1 << 32)
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, trace, bad)


@pytest.mark.skipif(not os.environ.get('RUN_SLOW'), reason='RUN_SLOW not set')
def test_wrong_coeff_caught(air, data):
    px, py, coeffs = data
    trace, pis = air.generate_trace(px, py, coeffs)
    bad = list(pis)
    bad[air.PIS_ELL + 72 * 30 + 3] = (bad[air.PIS_ELL + 72 * 30 + 3] + 1) % (1 << 32)
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, trace, bad)


slow = pytest.mark.skipif(not os.environ.get("RUN_SLOW"), reason="RUN_SLOW not set")


def test_truncated_prove_verify(data):
    """End-to-end prove+verify of the ML machinery in CI: a 3-block
    truncated schedule through the identical gadgets/wiring (the full
    68-block air proves under RUN_SLOW and in the TPU bench)."""
    px, py, coeffs = data
    air2 = MillerLoopAir(num_blocks=3)  # 3 = smallest with full-density F12
    assert air2.num_rows == 64
    trace, pis = air2.generate_trace(px, py, coeffs[:3])
    assert_zero_residuals(air2, trace, pis)
    config = StarkConfig(rate_bits=1, pow_bits=8, num_queries=28)
    proof = prove(air2, trace, pis, config, xp=np)
    verify(air2, proof, pis, config)
    for pi_idx in (air2.PIS_RES + 7, air2.PIS_ELL + 3, air2.PIS_PX + 1):
        bad = list(pis)
        bad[pi_idx] = (bad[pi_idx] + 1) % (1 << 32)
        with pytest.raises(VerificationError):
            verify(air2, proof, bad, config)


@slow
def test_prove_verify(air, data):
    px, py, coeffs = data
    trace, pis = air.generate_trace(px, py, coeffs)
    config = StarkConfig(rate_bits=1, pow_bits=8, num_queries=28)
    proof = prove(air, trace, pis, config, xp=np)
    verify(air, proof, pis, config)
    bad = list(pis)
    bad[air.PIS_RES] = (bad[air.PIS_RES] + 1) % (1 << 32)
    with pytest.raises(VerificationError):
        verify(air, proof, bad, config)
