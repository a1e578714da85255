"""Sha256Air: in-STARK SHA-256 compressions + native XMD plumbing checks
(parity target: the reference's in-circuit expand_message_xmd,
hash_to_field.rs:82-169)."""

import hashlib

import numpy as np
import pytest

from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.chips.testing import assert_zero_residuals, residuals
from starky_bls12_381_tpu.fields import sha256 as sh
from starky_bls12_381_tpu.fields.hash_to_curve import DST, expand_message_xmd
from starky_bls12_381_tpu.starks.sha256_air import Sha256Air

CFG = StarkConfig(pow_bits=4, num_queries=24)


def test_sha256_matches_hashlib():
    for data in (b"", b"abc", b"x" * 55, b"y" * 56, b"z" * 64, bytes(range(200))):
        assert sh.sha256(data) == hashlib.sha256(data).digest()


def test_xmd_matches_native():
    msg = bytes(range(32))
    uniform, comps = sh.expand_message_xmd_compressions(msg, DST, 256)
    assert uniform == expand_message_xmd(msg, DST, 256)
    # chaining values flow: every block's h_out feeds the next h_in or IV
    for w16, h_in, h_out in comps:
        assert sh.compress(h_in, w16) == tuple(h_out)


@pytest.fixture(scope="module")
def proven():
    _, comps = sh.sha256_compressions(bytes(range(100)))  # 2 blocks
    air = Sha256Air(num_blocks=len(comps))
    trace, pis = air.generate_trace(comps)
    proof = prove(air, trace, pis, CFG, xp=np)
    return air, trace, pis, proof, comps


def test_residuals_zero(proven):
    air, trace, pis, _, _ = proven
    assert_zero_residuals(air, trace, pis)


def test_digest_pis_match_hashlib(proven):
    air, trace, pis, _, comps = proven
    digest = b"".join(int(x).to_bytes(4, "big") for x in pis[-8:])
    assert digest == hashlib.sha256(bytes(range(100))).digest()


def test_degree_fits_rate_1(proven):
    air = proven[0]
    assert air.quotient_degree_factor() <= 2


def test_prove_verify(proven):
    air, _, pis, proof, _ = proven
    verify(air, proof, pis, CFG)


def test_tampered_digest_pi_rejected(proven):
    air, _, pis, proof, _ = proven
    bad = list(pis)
    bad[-1] = (int(bad[-1]) + 1) & 0xFFFFFFFF
    with pytest.raises(VerificationError):
        verify(air, proof, bad, CFG)


def test_tampered_round_rejected(proven):
    air, trace, pis, _, _ = proven
    t2 = trace.copy()
    from starky_bls12_381_tpu.starks import sha256_air as sa

    t2[30, sa.E + 7] ^= 1  # flip one state bit mid-compression
    bad = [
        (filt, r)
        for filt, r in residuals(air, t2, pis)
        if r.reshape(-1, air.num_rows)[:, :-1].any()
    ]
    assert bad, "bit flip must violate at least one constraint"
    proof2 = prove(air, t2, pis, CFG, xp=np)
    with pytest.raises(VerificationError):
        verify(air, proof2, pis, CFG)


def test_check_xmd_pis_roundtrip():
    msg = b"\x07" * 32
    uniform, comps = sh.expand_message_xmd_compressions(msg, DST, 256)
    pis = sh.comps_to_pis(comps)
    assert sh.check_xmd_pis(pis, msg, DST, 256) == uniform
    bad = list(pis)
    bad[3] ^= 1
    with pytest.raises(ValueError):
        sh.check_xmd_pis(bad, msg, DST, 256)
    with pytest.raises(ValueError):
        sh.check_xmd_pis(pis, b"\x08" * 32, DST, 256)
