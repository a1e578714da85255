"""H2CAir: in-proof SSWU + isogeny + psi-cofactor map (hash_to_curve.rs:84-446
capability). CI runs a short-scalar variant end-to-end (residuals + prove +
tamper); the full BLS-x air proves under RUN_SLOW."""

import os

import numpy as np
import pytest

from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.chips.testing import assert_zero_residuals
from starky_bls12_381_tpu.fields import hash_to_curve as h2c
from starky_bls12_381_tpu.starks.hash_to_curve_air import H2CAir

RUN_SLOW = os.environ.get("RUN_SLOW", "0") == "1"

U0, U1 = h2c.hash_to_field(b"h2c air test vector", 2)


@pytest.fixture(scope="module")
def mini_air():
    return H2CAir(xparam=11)


@pytest.fixture(scope="module")
def mini_case(mini_air):
    trace, pis = mini_air.generate_trace(U0, U1)
    return trace, pis


def test_schedule_shape(mini_air):
    # 7 fixed windows + 2 x (3 dbl + 2 add for x=0b1011) + 5 combiners
    assert mini_air.n_windows == 7 + 2 * 5 + 5
    assert mini_air.num_rows == 512


def test_residuals(mini_air, mini_case):
    trace, pis = mini_case
    assert_zero_residuals(mini_air, trace, pis)


def test_native_formula_matches_clear_cofactor():
    """With the real BLS x, the air's statement IS hash-to-curve."""
    air = H2CAir.__new__(H2CAir)  # skip column construction: native only
    air.xparam = __import__("starky_bls12_381_tpu.fields.bls12_381", fromlist=["BLS_X"]).BLS_X
    expected = air.expected_native(U0, U1)
    q0 = h2c.iso_map(h2c.map_to_curve_sswu(U0))
    q1 = h2c.iso_map(h2c.map_to_curve_sswu(U1))
    assert expected == h2c.clear_cofactor(h2c.g2_add(q0, q1))
    assert expected == h2c.hash_to_curve_g2(b"h2c air test vector")


def test_tamper_cases(mini_air, mini_case):
    import starky_bls12_381_tpu.fields.goldilocks as gl

    trace, pis = mini_case
    # tamper the final Hm public input -> PI binding violated
    bad_pis = list(pis)
    bad_pis[mini_air.PI_HM] = (bad_pis[mini_air.PI_HM] + 1) % gl.P
    with pytest.raises(AssertionError):
        assert_zero_residuals(mini_air, trace, bad_pis)
    # tamper the claimed sgn0(u0) -> sign constraint violated
    bad_pis = list(pis)
    bad_pis[mini_air.PI_SGN0] ^= 1
    with pytest.raises(AssertionError):
        assert_zero_residuals(mini_air, trace, bad_pis)
    # tamper an ACC register cell mid-schedule -> chain violated
    bad = trace.copy()
    bad[40, mini_air.REGS] = (int(bad[40, mini_air.REGS]) + 1) % gl.P
    with pytest.raises(AssertionError):
        assert_zero_residuals(mini_air, trace := bad, pis)
    # tamper the SSWU branch flag -> select constraints violated
    bad = mini_case[0].copy()
    bad[11, mini_air.sswu.f] = 1 - int(bad[11, mini_air.sswu.f])
    with pytest.raises(AssertionError):
        assert_zero_residuals(mini_air, bad, pis)


def test_mini_prove_verify(mini_air, mini_case):
    trace, pis = mini_case
    config = StarkConfig(rate_bits=1, pow_bits=8, num_queries=28)
    proof = prove(mini_air, trace, pis, config, xp=np)
    verify(mini_air, proof, pis, config)
    bad = list(pis)
    bad[mini_air.PI_HM + 3] = (bad[mini_air.PI_HM + 3] + 1) % (1 << 32)
    with pytest.raises(VerificationError):
        verify(mini_air, proof, bad, config)


@pytest.mark.skipif(not RUN_SLOW, reason="full BLS-x H2C air (RUN_SLOW)")
def test_full_h2c_air_prove():
    air = H2CAir()
    trace, pis = air.generate_trace(U0, U1)
    assert_zero_residuals(air, trace, pis)
    # the proved Hm is the real hash-to-curve output
    hm = h2c.hash_to_curve_g2(b"h2c air test vector")
    got = [int(v) for v in pis[air.PI_HM : air.PI_HM + 48]]
    from starky_bls12_381_tpu.chips import limbs

    assert got[:12] == [int(x) for x in limbs.to_limbs(hm[0][0])]
    config = StarkConfig(rate_bits=1, pow_bits=8, num_queries=28)
    proof = prove(air, trace, pis, config)
    verify(air, proof, pis, config)
