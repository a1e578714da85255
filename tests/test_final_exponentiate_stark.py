"""FinalExponentiateStark: residuals, tamper, prove+verify (SURVEY.md §4).

The full air (4096 x ~63k, matching final_exponentiate.rs:240-279's 32-step
chain) is exercised under RUN_SLOW plus by the TPU bench; CI runs a REDUCED
schedule through the identical gadget/overlay/wiring machinery (every op
kind: even+odd Frobenius, mul, witnessed division, conjugate, cyclotomic
square, and a cyclotomic exponent with sq/sq2/mul-chain windows).
"""

import os
import random

import numpy as np
import pytest

from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.chips.testing import assert_zero_residuals, residuals
from starky_bls12_381_tpu.fields import bls12_381 as bls
from starky_bls12_381_tpu.starks.final_exponentiate import FinalExponentiateAir

RUN_SLOW = os.environ.get("RUN_SLOW") == "1"
rng = random.Random(7)

# reduced schedule: every op kind, ~144 rows
MINI_STEPS = [
    ("frob", "t0", ("a",), 6),
    ("mulcheck", "t0", ("t1", "a"), None),  # witnessed division t1 = t0/a
    ("frob", "t2", ("t1",), 3),
    ("mul", "t3", ("t2", "t1"), None),
    ("cycexp", "t4", ("t3",), None),
    ("conj", "t5", ("t4",), None),
    ("cycsq", "t6", ("t5",), None),
    ("mul", "t7", ("t6", "t3"), None),
]
MINI_EXP, MINI_BITS = 0b1011, 4


def _fp12():
    return (
        tuple(tuple(rng.randrange(bls.P381) for _ in range(2)) for _ in range(3)),
        tuple(tuple(rng.randrange(bls.P381) for _ in range(2)) for _ in range(3)),
    )


@pytest.fixture(scope="module")
def mini_air():
    return FinalExponentiateAir(steps=MINI_STEPS, cyc_exp=MINI_EXP, cyc_bits=MINI_BITS)


@pytest.fixture(scope="module")
def mini_case(mini_air):
    a = _fp12()
    trace, pis = mini_air.generate_trace(a)
    return a, trace, pis


def _native_mini(a):
    """Independent native recomputation of the MINI_STEPS schedule."""
    t0 = bls.fp12_frobenius(a, 6)
    t1 = bls.fp12_mul(t0, bls.fp12_inv(a))
    t2 = bls.fp12_frobenius(t1, 3)
    t3 = bls.fp12_mul(t2, t1)
    t4 = bls.FP12_ONE
    for i in reversed(range(MINI_BITS)):
        t4 = bls.fp12_cyclotomic_square(t4)
        if (MINI_EXP >> i) & 1:
            t4 = bls.fp12_mul(t4, t3)
    t5 = bls.fp12_conjugate(t4)
    t6 = bls.fp12_cyclotomic_square(t5)
    return bls.fp12_mul(t6, t3)


def test_mini_output_matches_native(mini_air, mini_case):
    from starky_bls12_381_tpu.starks.fp12_mul import fp12_to_pis

    a, _trace, pis = mini_case
    assert pis[144:] == fp12_to_pis(_native_mini(a))
    assert pis[:144] == fp12_to_pis(a)


def test_mini_residuals(mini_air, mini_case):
    _a, trace, pis = mini_case
    assert_zero_residuals(mini_air, trace, pis)


def test_mini_quotient_degree(mini_air):
    assert mini_air.quotient_degree_factor() == 2


def test_mini_tamper_cells(mini_air, mini_case):
    """Flipping a register cell (pinned + wired) must violate a constraint.
    Op-region cells are window-gated, so tamper them at an ACTIVE row: the
    first mul window's result row (row 23 = second window's r0+11)."""
    _a, trace, pis = mini_case
    for row, col in ((5, 0), (5, 144 * 3 + 7), (23, mini_air.regs["t0"])):
        bad = trace.copy()
        bad[row, col] = (int(bad[row, col]) + 1) % (1 << 32)
        with pytest.raises(AssertionError):
            assert_zero_residuals(mini_air, bad, pis)


def test_mini_wrong_output_pi(mini_air, mini_case):
    _a, trace, pis = mini_case
    bad = list(pis)
    bad[200] = (bad[200] + 1) % (1 << 32)
    with pytest.raises(AssertionError):
        assert_zero_residuals(mini_air, trace, bad)


def test_tiny_prove_verify():
    """End-to-end prove+verify of the FE machinery on a 32-row schedule
    (Frobenius + witnessed division through the same overlay/wiring code);
    the 144-row MINI schedule gets residual coverage above and the full
    4096-row air proves under RUN_SLOW and in the TPU bench."""
    air = FinalExponentiateAir(steps=MINI_STEPS[:2])
    a = _fp12()
    trace, pis = air.generate_trace(a)
    assert air.num_rows == 32
    config = StarkConfig(rate_bits=1, pow_bits=8, num_queries=28)
    proof = prove(air, trace, pis, config, xp=np)
    verify(air, proof, pis, config)
    bad = list(pis)
    bad[150] = (bad[150] + 1) % (1 << 32)
    with pytest.raises(VerificationError):
        verify(air, proof, bad, config)


@pytest.mark.skipif(not RUN_SLOW, reason="144-row mini prove; RUN_SLOW=1")
def test_mini_prove_verify(mini_air, mini_case):
    _a, trace, pis = mini_case
    config = StarkConfig(rate_bits=1, pow_bits=8, num_queries=28)
    proof = prove(mini_air, trace, pis, config, xp=np)
    verify(mini_air, proof, pis, config)
    bad = list(pis)
    bad[150] = (bad[150] + 1) % (1 << 32)
    with pytest.raises(VerificationError):
        verify(mini_air, proof, bad, config)


# ---------------------------------------------------------------------------
# full 32-step air (the 92 s baseline target), RUN_SLOW
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not RUN_SLOW, reason="full 4096x63k air; RUN_SLOW=1")
def test_full_residuals_and_tamper():
    air = FinalExponentiateAir()
    a = _fp12()
    trace, pis = air.generate_trace(a)
    assert_zero_residuals(air, trace, pis)
    bad = trace.copy()
    bad[100, 144 * 5 + 3] = (int(bad[100, 144 * 5 + 3]) + 1) % (1 << 32)
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, bad, pis)


@pytest.mark.skipif(not RUN_SLOW, reason="full prove; RUN_SLOW=1")
def test_full_prove_verify():
    air = FinalExponentiateAir()
    a = _fp12()
    trace, pis = air.generate_trace(a)
    config = StarkConfig(rate_bits=1, pow_bits=8, num_queries=28)
    proof = prove(air, trace, pis, config, xp=np)
    verify(air, proof, pis, config)
