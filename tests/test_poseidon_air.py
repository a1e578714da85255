"""PoseidonAir: prove+verify batches of backend-hash permutations, with
tamper checks — the recursion-layer foundation chip."""

import numpy as np
import pytest

from starky_bls12_381_tpu.backend import poseidon as ps
from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.starks.poseidon_air import PoseidonAir

CFG = StarkConfig(pow_bits=4, num_queries=24)


@pytest.fixture(scope="module")
def proven():
    air = PoseidonAir(num_perms=4)
    rng = np.random.default_rng(3)
    inputs = [list(rng.integers(0, 2**63, size=12, dtype=np.uint64)) for _ in range(4)]
    trace, pis = air.generate_trace(inputs)
    proof = prove(air, trace, pis, CFG, xp=np)
    return air, trace, pis, proof, inputs


def test_outputs_match_reference_permutation(proven):
    air, trace, pis, proof, inputs = proven
    for p, state in enumerate(inputs):
        out = pis[p * 24 + 12 : p * 24 + 24]
        assert out == ps.permute_s([int(x) for x in state])


def test_prove_verify(proven):
    air, trace, pis, proof, _ = proven
    verify(air, proof, pis, CFG)


def test_degree_fits_rate_1(proven):
    air = proven[0]
    assert air.quotient_degree_factor() <= 2


def test_tampered_output_pi_rejected(proven):
    air, trace, pis, proof, _ = proven
    bad = list(pis)
    bad[12] = (bad[12] + 1) % (2**63)
    with pytest.raises(VerificationError):
        verify(air, proof, bad, CFG)


def test_tampered_trace_rejected(proven):
    air, trace, pis, _, _ = proven
    t2 = trace.copy()
    t2[5, 3] = (t2[5, 3] + 1) % 0xFFFFFFFF00000001  # corrupt a mid-round state
    proof2 = prove(air, t2, pis, CFG, xp=np)
    with pytest.raises(VerificationError):
        verify(air, proof2, pis, CFG)
