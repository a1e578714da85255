"""XmdFieldAir: in-proof b0-xor chain + hash_to_field reduction
(hash_to_field.rs:82-203 parity)."""

import numpy as np
import pytest

from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.chips.testing import assert_zero_residuals
from starky_bls12_381_tpu.fields import hash_to_curve as h2c
from starky_bls12_381_tpu.fields import sha256 as sha
from starky_bls12_381_tpu.starks.xmd_field_air import XmdFieldAir

MSG = b"xmd field air test"
XMD_LEN = 4 * h2c.L


def _digests():
    _, comps = sha.expand_message_xmd_compressions(MSG, h2c.DST, XMD_LEN)
    # b0 = h_out of block 2; b_i = h_out of block 2i+2
    return [comps[2][2]] + [comps[2 * i + 2][2] for i in range(1, 9)]


@pytest.fixture(scope="module")
def case():
    air = XmdFieldAir()
    trace, pis = air.generate_trace(_digests())
    return air, trace, pis


def test_residuals_and_values(case):
    air, trace, pis = case
    assert_zero_residuals(air, trace, pis)
    # the proved u limbs ARE hash_to_field(msg)
    u0, u1 = h2c.hash_to_field(MSG, 2)
    from starky_bls12_381_tpu.chips import limbs

    got = pis[air.PI_U : air.PI_U + 48]
    exp = []
    for v in (u0[0], u0[1], u1[0], u1[1]):
        exp.extend(int(x) for x in limbs.to_limbs(v))
    assert got == exp


def test_tampered_xor_and_reduction(case):
    air, trace, pis = case
    # flipped xor output word -> xor identity violated
    bad = list(pis)
    bad[air.PI_X + 3] ^= 1
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, trace, bad)
    # tampered u limb -> reduction binding violated
    bad = list(pis)
    bad[air.PI_U + 5] = (bad[air.PI_U + 5] + 1) % (1 << 32)
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, trace, bad)
    # tampered input digest word -> val binding violated
    bad = list(pis)
    bad[air.PI_B + 2] ^= 1
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, trace, bad)


def test_prove_verify(case):
    air, trace, pis = case
    config = StarkConfig(rate_bits=1, pow_bits=8, num_queries=28)
    proof = prove(air, trace, pis, config, xp=np)
    verify(air, proof, pis, config)
    bad = list(pis)
    bad[air.PI_U] = (bad[air.PI_U] + 1) % (1 << 32)
    with pytest.raises(VerificationError):
        verify(air, proof, bad, config)
