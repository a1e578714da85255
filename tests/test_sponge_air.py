"""SpongeAir: in-STARK Poseidon sponge hashing (recursion chip #3)."""

import numpy as np
import pytest

from starky_bls12_381_tpu.backend import poseidon as ps
from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.starks.sponge_air import SpongeAir

CFG = StarkConfig(pow_bits=4, num_queries=24)


@pytest.fixture(scope="module")
def proven():
    air = SpongeAir(num_chunks=3)
    rng = np.random.default_rng(5)
    msg = [int(x) for x in rng.integers(0, 2**63, size=21, dtype=np.uint64)]
    trace, pis = air.generate_trace(msg)
    proof = prove(air, trace, pis, CFG, xp=np)
    return air, msg, pis, proof


def test_digest_matches_backend_sponge(proven):
    air, msg, pis, _ = proven
    padded = msg + [0] * (24 - len(msg))
    assert tuple(pis[air.PIS_DIGEST :]) == ps.hash_elements_s(padded)


def test_prove_verify(proven):
    air, _, pis, proof = proven
    verify(air, proof, pis, CFG)
    assert air.quotient_degree_factor() <= 2


def test_tampered_message_rejected(proven):
    air, _, pis, proof = proven
    bad = list(pis)
    bad[9] = (bad[9] + 1) % (2**63)
    with pytest.raises(VerificationError):
        verify(air, proof, bad, CFG)


def test_tampered_digest_rejected(proven):
    air, _, pis, proof = proven
    bad = list(pis)
    bad[air.PIS_DIGEST + 2] ^= 1
    with pytest.raises(VerificationError):
        verify(air, proof, bad, CFG)
