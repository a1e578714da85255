"""MerklePathAir: prove+verify an authentication path in-STARK, consistent
with the backend Merkle tree (recursion-layer chip #2)."""

import numpy as np
import pytest

from starky_bls12_381_tpu.backend import merkle
from starky_bls12_381_tpu.backend import poseidon as ps
from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.starks.merkle_air import MerklePathAir

CFG = StarkConfig(pow_bits=4, num_queries=24)
DEPTH = 6


@pytest.fixture(scope="module")
def tree():
    rng = np.random.default_rng(11)
    leaves = rng.integers(0, 2**63, size=(1 << DEPTH, 4), dtype=np.uint64)
    layers = merkle.build_layers(leaves, 0)
    return leaves, [np.asarray(l) for l in layers]


@pytest.fixture(scope="module")
def proven(tree):
    leaves, layers = tree
    air = MerklePathAir(depth=DEPTH)
    index = 41
    path = merkle.prove_path(layers, index)
    trace, pis = air.generate_trace(list(leaves[index]), path, index)
    proof = prove(air, trace, pis, CFG, xp=np)
    return air, trace, pis, proof, layers, index


def test_root_matches_backend_tree(proven):
    air, _, pis, _, layers, _ = proven
    root = tuple(pis[air.PIS_ROOT : air.PIS_ROOT + 4])
    assert root == tuple(int(x) for x in layers[-1][0])


def test_bits_encode_index(proven):
    air, _, pis, _, _, index = proven
    bits = pis[air.PIS_BITS :]
    assert sum(b << i for i, b in enumerate(bits)) == index


def test_prove_verify(proven):
    air, _, pis, proof, _, _ = proven
    verify(air, proof, pis, CFG)


def test_degree_fits_rate_1(proven):
    assert proven[0].quotient_degree_factor() <= 2


def test_wrong_root_rejected(proven):
    air, _, pis, proof, _, _ = proven
    bad = list(pis)
    bad[air.PIS_ROOT] ^= 1
    with pytest.raises(VerificationError):
        verify(air, proof, bad, CFG)


def test_wrong_index_bits_rejected(proven):
    air, _, pis, proof, _, _ = proven
    bad = list(pis)
    bad[air.PIS_BITS] ^= 1  # claim the sibling order was flipped at level 0
    with pytest.raises(VerificationError):
        verify(air, proof, bad, CFG)


def test_forged_sibling_rejected(tree):
    """A prover substituting a wrong sibling cannot keep the same root."""
    leaves, layers = tree
    air = MerklePathAir(depth=DEPTH)
    index = 7
    path = merkle.prove_path(layers, index)
    path[2] = np.asarray([1, 2, 3, 4], dtype=np.uint64)  # forged
    trace, pis = air.generate_trace(list(leaves[index]), path, index)
    # the honest trace-gen recomputes the (now different) root; claiming the
    # original root must fail verification
    forged = list(pis)
    real_root = [int(x) for x in layers[-1][0]]
    forged[air.PIS_ROOT : air.PIS_ROOT + 4] = real_root
    proof = prove(air, trace, pis, CFG, xp=np)
    with pytest.raises(VerificationError):
        verify(air, proof, forged, CFG)


def test_trace_root_agrees_with_host_verify_path(tree):
    leaves, layers = tree
    air = MerklePathAir(depth=DEPTH)
    for index in (0, 1, 63):
        path = merkle.prove_path(layers, index)
        _, pis = air.generate_trace(list(leaves[index]), path, index)
        assert merkle.verify_path(
            leaves[index], index, path, layers[-1]
        ), "backend path check must accept"
        assert pis[air.PIS_ROOT : air.PIS_ROOT + 4] == [int(x) for x in layers[-1][0]]
