"""RecursiveVerifierAir: proof-of-a-proof end-to-end (SURVEY.md §2.2
"recursive STARK verifier", aggregate_proof.rs:417-451 capability).

The outer STARK proves the inner verifier's query phase (leaf hashing,
Merkle paths, DEEP composition, FRI folds); verify_recursive checks the
native scalar parts (transcript, grinding, quotient identity) plus the
outer proof. Tests run a PoseidonAir inner statement with a reduced query
count; every binding (inner PIs, witness rows, registers, caps) has a
tamper case.
"""

import copy

import numpy as np
import pytest

from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.proof import proof_to_bytes
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.chips.testing import assert_zero_residuals
from starky_bls12_381_tpu.fields import goldilocks as gl
from starky_bls12_381_tpu.starks.poseidon_air import PoseidonAir
from starky_bls12_381_tpu.starks.recursive_verifier import (
    RecursiveVerifierAir,
    prove_recursive,
    strip_queries,
    verify_recursive,
)

ICFG = StarkConfig(pow_bits=4, num_queries=2, cap_height=2, final_poly_len=8)
OCFG = StarkConfig(pow_bits=4, num_queries=8, cap_height=2)


@pytest.fixture(scope="module")
def inner_case():
    rng = np.random.default_rng(0)
    air = PoseidonAir(num_perms=2)
    inputs = [list(rng.integers(0, gl.P, size=12, dtype=np.uint64)) for _ in range(2)]
    trace, pis = air.generate_trace(inputs)
    proof = prove(air, trace, pis, ICFG, xp=np)
    verify(air, proof, pis, ICFG)
    return air, proof, pis


@pytest.fixture(scope="module")
def rair(inner_case):
    air, _proof, _pis = inner_case
    return RecursiveVerifierAir(air, ICFG)


@pytest.fixture(scope="module")
def rec_case(inner_case, rair):
    _air, proof, pis = inner_case
    trace, rpis = rair.generate_trace(proof, pis)
    return trace, rpis


def test_shape_and_degree(rair):
    assert rair.quotient_degree_factor() == 2  # rate-1 FRI config suffices
    assert rair.Q == ICFG.num_queries


def test_residuals(rair, rec_case):
    trace, rpis = rec_case
    assert_zero_residuals(rair, trace, rpis)


def test_tamper_witness_cells(rair, rec_case):
    """Flipping witness cells must violate constraints: a sponge absorb
    lane (row value), a DEEP register, a fold output register, and a
    Merkle sibling digest."""
    trace, rpis = rec_case
    p = rair.plan
    cases = [
        (p["t_absorb"][0], 0),  # first absorbed trace-row value
        (0, rair.R_VAL),  # DEEP value register (bound at region row 0)
        (0, rair.R_FV[-1]),  # final fold output register
        (p["t_path"][0], 48),  # level-0 sibling digest (SIB col)
    ]
    for row, col in cases:
        bad = trace.copy()
        bad[row, col] = (int(bad[row, col]) + 1) % gl.P
        with pytest.raises(AssertionError):
            assert_zero_residuals(rair, bad, rpis)


def test_tamper_inner_query_data_rejected(inner_case, rair):
    """A corrupted opened row can't produce a valid recursive witness:
    the fill either fails its own asserts or leaves nonzero residuals."""
    _air, proof, pis = inner_case
    bad = copy.deepcopy(proof)
    bad.fri.query_rounds[0].trace_row[5] = (int(bad.fri.query_rounds[0].trace_row[5]) + 1) % gl.P
    with pytest.raises(AssertionError):
        trace, rpis = rair.generate_trace(bad, pis)
        assert_zero_residuals(rair, trace, rpis)


def test_prove_verify_compressed(inner_case, rair):
    air, proof, pis = inner_case
    _rair, comp = prove_recursive(air, proof, pis, ICFG, OCFG, xp=np, rair=rair)
    verify_recursive(air, pis, ICFG, comp, OCFG, rair=rair)
    # the compressed object carries no query rounds
    assert comp.inner_public.fri.query_rounds == []
    assert len(proof_to_bytes(comp.inner_public)) < len(proof_to_bytes(proof))

    # wrong inner statement must fail the native re-derivation
    bad_pis = list(pis)
    bad_pis[3] = (bad_pis[3] + 1) % gl.P
    with pytest.raises(VerificationError):
        verify_recursive(air, bad_pis, ICFG, comp, OCFG, rair=rair)

    # tampered inner public part (cap) must fail
    bad = copy.deepcopy(comp)
    bad.inner_public.trace_cap = bad.inner_public.trace_cap.copy()
    bad.inner_public.trace_cap[0, 0] = (int(bad.inner_public.trace_cap[0, 0]) + 1) % gl.P
    with pytest.raises(VerificationError):
        verify_recursive(air, pis, ICFG, bad, OCFG, rair=rair)

    # tampered outer proof must fail
    bad = copy.deepcopy(comp)
    bad.outer_proof.trace_local = bad.outer_proof.trace_local.copy()
    bad.outer_proof.trace_local[7, 0] = (int(bad.outer_proof.trace_local[7, 0]) + 1) % gl.P
    with pytest.raises(VerificationError):
        verify_recursive(air, pis, ICFG, bad, OCFG, rair=rair)


def test_strip_queries_roundtrip(inner_case):
    _air, proof, _pis = inner_case
    pub = strip_queries(proof)
    data = proof_to_bytes(pub)
    from starky_bls12_381_tpu.backend.proof import proof_from_bytes

    back = proof_from_bytes(data)
    assert proof_to_bytes(back) == data


# -- query-sharded DAG recursion ----------------------------------------------


def test_sharded_dag_prove_verify(inner_case):
    """Wrap a 5-query inner proof as 3 shards of 2 (last padded by
    repetition); the DAG must verify, and coverage/tamper cases reject."""
    from starky_bls12_381_tpu.starks.recursive_verifier import (
        CompressedProofDag,
        prove_recursive_dag,
        verify_recursive_dag,
    )

    air, _, pis = inner_case
    icfg = StarkConfig(pow_bits=4, num_queries=5, cap_height=2, final_poly_len=8)
    rng = np.random.default_rng(0)
    inputs = [list(rng.integers(0, gl.P, size=12, dtype=np.uint64)) for _ in range(2)]
    trace, pis5 = air.generate_trace(inputs)
    proof5 = prove(air, trace, pis5, icfg, xp=np)

    rair, dag = prove_recursive_dag(air, proof5, pis5, icfg, OCFG, shard=2, xp=np)
    assert len(dag.outer_proofs) == 3
    assert rair.Q == 2
    verify_recursive_dag(air, pis5, icfg, dag, OCFG)

    # dropping a shard must fail coverage
    bad = CompressedProofDag(dag.inner_public, dag.outer_proofs[:2], dag.shard)
    with pytest.raises(VerificationError):
        verify_recursive_dag(air, pis5, icfg, bad, OCFG)

    # a shard proof swapped for another shard's must fail its PI binding
    swapped = CompressedProofDag(
        dag.inner_public,
        [dag.outer_proofs[1], dag.outer_proofs[0], dag.outer_proofs[2]],
        dag.shard,
    )
    with pytest.raises(VerificationError):
        verify_recursive_dag(air, pis5, icfg, swapped, OCFG)

    # tampered inner cap must fail the native re-derivation
    bad_pub = copy.deepcopy(dag.inner_public)
    bad_pub.trace_cap = bad_pub.trace_cap.copy()
    bad_pub.trace_cap[0, 0] = (int(bad_pub.trace_cap[0, 0]) + 1) % gl.P
    with pytest.raises(VerificationError):
        verify_recursive_dag(air, pis5, icfg, CompressedProofDag(bad_pub, dag.outer_proofs, 2), OCFG)
