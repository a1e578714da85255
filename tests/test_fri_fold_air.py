"""FriFoldAir: in-STARK FRI fold-cascade verification (recursion chip #4)."""

import numpy as np
import pytest

from starky_bls12_381_tpu.backend import fri
from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.fields import goldilocks as gl
from starky_bls12_381_tpu.starks.fri_fold_air import FriFoldAir

CFG = StarkConfig(pow_bits=4, num_queries=24)
L = 6


def _chain(seed):
    """Build a consistent fold chain (layer inputs selected by bits)."""
    rng = np.random.default_rng(seed)

    def ext():
        return (int(rng.integers(0, gl.P, dtype=np.uint64)), int(rng.integers(0, gl.P, dtype=np.uint64)))

    init = ext()
    value = init
    pairs, betas, xs, bits = [], [], [], []
    for _ in range(L):
        bit = int(rng.integers(0, 2))
        other = ext()
        pair = (value, other) if bit == 0 else (other, value)
        beta = ext()
        x = int(rng.integers(1, gl.P, dtype=np.uint64))
        value = fri.fold_scalar(pair[0], pair[1], beta, x)
        pairs.append(pair)
        betas.append(beta)
        xs.append(x)
        bits.append(bit)
    return init, pairs, betas, xs, bits, value


@pytest.fixture(scope="module")
def proven():
    air = FriFoldAir(num_layers=L)
    init, pairs, betas, xs, bits, final = _chain(1)
    trace, pis = air.generate_trace(init, pairs, betas, xs, bits)
    proof = prove(air, trace, pis, CFG, xp=np)
    return air, pis, proof, final


def test_trace_matches_verifier_fold_scalar(proven):
    """The chip's fold output equals the host verifier's fold_scalar."""
    air, pis, _, final = proven
    assert tuple(pis[air.PIS_FINAL : air.PIS_FINAL + 2]) == final


def test_prove_verify(proven):
    air, pis, proof, _ = proven
    verify(air, proof, pis, CFG)
    assert air.quotient_degree_factor() <= 2


def test_tampered_beta_rejected(proven):
    air, pis, proof, _ = proven
    bad = list(pis)
    bad[0] = (bad[0] + 1) % gl.P
    with pytest.raises(VerificationError):
        verify(air, proof, bad, CFG)


def test_tampered_final_rejected(proven):
    air, pis, proof, _ = proven
    bad = list(pis)
    bad[air.PIS_FINAL] = (bad[air.PIS_FINAL] + 1) % gl.P
    with pytest.raises(VerificationError):
        verify(air, proof, bad, CFG)


def test_wrong_chain_refused_at_fill():
    air = FriFoldAir(num_layers=L)
    init, pairs, betas, xs, bits, _ = _chain(2)
    bits = list(bits)
    bits[3] ^= 1  # breaks pair[bit] == running value
    with pytest.raises(AssertionError):
        air.generate_trace(init, pairs, betas, xs, bits)
