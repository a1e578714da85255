"""Wire-format proof serialization: round-trip + verify-after-decode."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.proof import proof_from_bytes, proof_to_bytes
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import verify
from starky_bls12_381_tpu.starks.poseidon_air import PoseidonAir

CFG = StarkConfig(pow_bits=4, num_queries=24)


@pytest.fixture(scope="module")
def proven():
    air = PoseidonAir(num_perms=2)
    rng = np.random.default_rng(9)
    trace, pis = air.generate_trace(
        [list(rng.integers(0, 2**63, 12, dtype=np.uint64)) for _ in range(2)]
    )
    proof = prove(air, trace, pis, CFG, xp=np)
    return air, pis, proof


def test_roundtrip_and_verify(proven):
    air, pis, proof = proven
    data = proof_to_bytes(proof)
    proof2 = proof_from_bytes(data)
    verify(air, proof2, pis, CFG)
    assert proof_to_bytes(proof2) == data  # deterministic


def test_size_accounting(proven):
    _, _, proof = proven
    data = proof_to_bytes(proof)
    # wire size ~= payload size + small framing overhead
    assert proof.size_bytes() <= len(data) <= int(proof.size_bytes() * 1.25) + 4096


def test_corrupt_magic_rejected(proven):
    _, _, proof = proven
    data = bytearray(proof_to_bytes(proof))
    data[0] ^= 1
    with pytest.raises(AssertionError):
        proof_from_bytes(bytes(data))
