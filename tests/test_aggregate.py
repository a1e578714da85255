"""Aggregate pipeline tests: native link checks fast; trace/prove slow."""

import os
import random

import numpy as np
import pytest

from starky_bls12_381_tpu.aggregate import (
    AggregatePipeline,
    check_aggregate_links,
    native_publics,
)
from starky_bls12_381_tpu.backend.verifier import VerificationError
from starky_bls12_381_tpu.fields import bls12_381 as bls
from starky_bls12_381_tpu.fields import hash_to_curve as h2c
from starky_bls12_381_tpu.starks.ecc_aggregate import ECCAggregateAir
from starky_bls12_381_tpu.starks.final_exponentiate import FinalExponentiateAir
from starky_bls12_381_tpu.starks.fp12_mul import FP12MulAir
from starky_bls12_381_tpu.starks.miller_loop import MillerLoopAir
from starky_bls12_381_tpu.starks.pairing_precomp import PairingPrecompAir

slow = pytest.mark.skipif(not os.environ.get("RUN_SLOW"), reason="RUN_SLOW not set")

N = 8


def _g1_mul(p, k):
    acc, add = None, p
    while k:
        if k & 1:
            acc = add if acc is None else (bls.g1_double(acc) if acc == add else bls.g1_add(acc, add))
        add = bls.g1_double(add)
        k >>= 1
    return acc


@pytest.fixture(scope="module")
def committee():
    rng = random.Random(11)
    sks = [rng.randrange(1, h2c.R_ORDER) for _ in range(N)]
    pubkeys = [_g1_mul(bls.G1_GEN, sk) for sk in sks]
    bits = [1, 1, 0, 1, 1, 1, 0, 1]
    message = b"aggregate pipeline test msg"
    hm = h2c.hash_to_curve_g2(message)
    agg_sk = sum(sk for sk, b in zip(sks, bits) if b) % h2c.R_ORDER
    signature = h2c.g2_scalar_mul(hm, agg_sk)
    return pubkeys, bits, message, signature


@pytest.fixture(scope="module")
def airs():
    from starky_bls12_381_tpu.starks.hash_to_curve_air import H2CAir
    from starky_bls12_381_tpu.starks.xmd_field_air import XmdFieldAir

    return {
        "ecc": ECCAggregateAir(num_points=N),
        "pp": PairingPrecompAir(),
        "ml": MillerLoopAir(),
        "fp12mul": FP12MulAir(),
        "finalexp": FinalExponentiateAir(),
        "h2c": H2CAir(),
        "h2fr": XmdFieldAir(),
    }


def test_native_links_pass(committee, airs):
    pubkeys, bits, message, signature = committee
    publics = native_publics(pubkeys, bits, message, signature)
    check_aggregate_links(airs, publics, pubkeys, bits, message, signature, N)
    # final exp of a valid signature is one (the last link asserts it)


def test_links_reject_wrong_message(committee, airs):
    pubkeys, bits, message, signature = committee
    publics = native_publics(pubkeys, bits, message, signature)
    with pytest.raises(VerificationError):
        check_aggregate_links(airs, publics, pubkeys, bits, b"other msg", signature, N)


def test_links_reject_tampered_result(committee, airs):
    pubkeys, bits, message, signature = committee
    publics = native_publics(pubkeys, bits, message, signature)
    bad = dict(publics)
    bad["fp12mul"] = list(publics["fp12mul"])
    bad["fp12mul"][300] ^= 1
    with pytest.raises(VerificationError):
        check_aggregate_links(airs, bad, pubkeys, bits, message, signature, N)


def test_links_reject_wrong_bits(committee, airs):
    pubkeys, bits, message, signature = committee
    publics = native_publics(pubkeys, bits, message, signature)
    flipped = list(bits)
    flipped[0] ^= 1
    with pytest.raises(VerificationError):
        check_aggregate_links(airs, publics, pubkeys, flipped, message, signature, N)


def test_invalid_signature_rejected_at_prove(committee):
    pubkeys, bits, message, signature = committee
    bad_sig = ((signature[0][0] + 1, signature[0][1]), signature[1])
    pipeline = AggregatePipeline(num_points=N, xp=np)
    with pytest.raises(Exception):
        pipeline.prove_aggregate(pubkeys, bits, message, bad_sig)


@slow
def test_full_trace_residuals(committee):
    from starky_bls12_381_tpu.chips.testing import assert_zero_residuals

    pubkeys, bits, message, signature = committee
    pipeline = AggregatePipeline(num_points=N, xp=np)
    traces, summary = pipeline.build_traces(pubkeys, bits, message, signature)
    assert summary["mu_is_one"]
    for stage, (trace, pis) in traces.items():
        assert_zero_residuals(pipeline._air_for(stage), trace, pis)


@slow
def test_compress_single_stage(committee):
    """Compress one stage proof (sigc: the cheapest air) and verify it
    through verify_compressed_bundle's per-stage path: the recursive DAG
    replaces the query rounds; tamper cases reject."""
    from starky_bls12_381_tpu.aggregate import (
        AggregateBundle,
        compress_bundle,
        verify_compressed_bundle,
    )
    from starky_bls12_381_tpu.backend.config import StarkConfig
    from starky_bls12_381_tpu.backend.proof import proof_to_bytes

    pubkeys, bits, message, signature = committee
    icfg = StarkConfig(rate_bits=1, pow_bits=4, num_queries=2, cap_height=2)
    pipeline = AggregatePipeline(num_points=N, config=icfg, xp=np)
    builders, _ = pipeline._trace_builders(pubkeys, bits, message, signature)
    trace, pis = builders["sigc"]()
    proof = pipeline._prove("sigc", trace, pis)
    bundle = AggregateBundle(proofs={"sigc": proof}, publics={"sigc": pis}, num_points=N)

    ocfg = StarkConfig(rate_bits=1, pow_bits=4, num_queries=8, cap_height=2)
    cb = compress_bundle(pipeline, bundle, shard=2, outer_config=ocfg, stages=["sigc"])
    # no query rounds anywhere in the compressed object
    assert cb.dags["sigc"].inner_public.fri.query_rounds == []
    assert len(proof_to_bytes(cb.dags["sigc"].inner_public)) < len(proof_to_bytes(proof))
    verify_compressed_bundle(pipeline, cb, pubkeys, bits, message, signature, stages=["sigc"])

    # tampered stage public input -> the native re-derivation rejects
    import copy

    bad = copy.deepcopy(cb)
    bad.publics["sigc"][0] ^= 1
    with pytest.raises(VerificationError):
        verify_compressed_bundle(pipeline, bad, pubkeys, bits, message, signature, stages=["sigc"])
    # dropped shard -> coverage rejects
    bad = copy.deepcopy(cb)
    bad.dags["sigc"].outer_proofs.pop()
    with pytest.raises(VerificationError):
        verify_compressed_bundle(pipeline, bad, pubkeys, bits, message, signature, stages=["sigc"])


def test_compress_single_stage_ext_op(committee):
    """ext_op=True: the stage's quotient identity rides an ExtOpAir proof —
    verify_compressed_bundle runs NO native stage `air.eval` (the second
    recursion level's identity half; reference parity:
    aggregate_proof.rs:417-451 re-runs eval_ext_circuit in-SNARK)."""
    from unittest import mock

    from starky_bls12_381_tpu.aggregate import (
        AggregateBundle,
        compress_bundle,
        compressed_bundle_from_bytes,
        compressed_bundle_to_bytes,
        verify_compressed_bundle,
    )
    from starky_bls12_381_tpu.backend.config import StarkConfig

    pubkeys, bits, message, signature = committee
    icfg = StarkConfig(rate_bits=1, pow_bits=4, num_queries=2, cap_height=2)
    pipeline = AggregatePipeline(num_points=N, config=icfg, xp=np)
    builders, _ = pipeline._trace_builders(pubkeys, bits, message, signature)
    trace, pis = builders["sigc"]()
    proof = pipeline._prove("sigc", trace, pis)
    bundle = AggregateBundle(proofs={"sigc": proof}, publics={"sigc": pis}, num_points=N)

    ocfg = StarkConfig(rate_bits=1, pow_bits=4, num_queries=8, cap_height=2)
    cb = compress_bundle(pipeline, bundle, shard=2, outer_config=ocfg, stages=["sigc"],
                         ext_op=True)
    assert cb.dags["sigc"].ext_op_proof is not None
    # the stage identity must NOT be checked natively
    with mock.patch(
        "starky_bls12_381_tpu.starks.recursive_verifier.check_quotient_identity",
        side_effect=AssertionError("native inner eval used"),
    ):
        verify_compressed_bundle(pipeline, cb, pubkeys, bits, message, signature, stages=["sigc"])
    # serde roundtrip carries the ext-op proof
    cb2 = compressed_bundle_from_bytes(compressed_bundle_to_bytes_single(cb))
    verify_compressed_bundle(pipeline, cb2, pubkeys, bits, message, signature, stages=["sigc"])
    # tampered ext-op proof rejects
    import copy

    bad = copy.deepcopy(cb)
    bad.dags["sigc"].ext_op_proof.trace_local = bad.dags["sigc"].ext_op_proof.trace_local.copy()
    bad.dags["sigc"].ext_op_proof.trace_local[0, 0] ^= 1
    with pytest.raises(VerificationError):
        verify_compressed_bundle(pipeline, bad, pubkeys, bits, message, signature, stages=["sigc"])


def compressed_bundle_to_bytes_single(cb):
    """Serialize a single-stage compressed bundle by padding the missing
    stages with the sigc dag (serde covers all STAGES)."""
    import copy

    from starky_bls12_381_tpu.aggregate import STAGES, compressed_bundle_to_bytes

    full = copy.copy(cb)
    full.publics = dict(cb.publics)
    full.dags = dict(cb.dags)
    for s in STAGES:
        full.publics.setdefault(s, cb.publics["sigc"])
        full.dags.setdefault(s, cb.dags["sigc"])
    return compressed_bundle_to_bytes(full)


@slow
def test_compress_full_bundle_roundtrip(committee):
    """Full 12-stage prove -> compress -> serialize -> verify: ONE object,
    one verify call, no per-stage handling by the caller (the reference's
    aggregate_recursive_proof capability, aggregate_proof.rs:459-671)."""
    from starky_bls12_381_tpu.aggregate import (
        compress_bundle,
        compressed_bundle_from_bytes,
        compressed_bundle_to_bytes,
        bundle_to_bytes,
        verify_compressed_bundle,
    )
    from starky_bls12_381_tpu.backend.config import StarkConfig

    pubkeys, bits, message, signature = committee
    icfg = StarkConfig(rate_bits=1, pow_bits=4, num_queries=2, cap_height=2)
    pipeline = AggregatePipeline(num_points=N, config=icfg)
    bundle = pipeline.prove_aggregate(pubkeys, bits, message, signature)
    ocfg = StarkConfig(rate_bits=1, pow_bits=4, num_queries=8, cap_height=2)
    cb = compress_bundle(pipeline, bundle, shard=2, outer_config=ocfg)
    data = compressed_bundle_to_bytes(cb)
    assert len(data) < len(bundle_to_bytes(bundle))
    cb2 = compressed_bundle_from_bytes(data)
    verify_compressed_bundle(pipeline, cb2, pubkeys, bits, message, signature)


def test_pipelined_prove_schedule(committee):
    """The pipelined prover overlaps trace builds with proving but must
    still prove every stage, in DAG order, each with its own trace."""
    from starky_bls12_381_tpu.aggregate import STAGES

    pubkeys, bits, message, signature = committee
    events = []

    class StubPipeline(AggregatePipeline):
        def _trace_builders(self, *a):
            builders, summary = super()._trace_builders(*a)

            def wrap(stage):
                def build():
                    events.append(("build", stage))
                    return (stage, ["pi", stage])

                return build

            return {s: wrap(s) for s in builders}, summary

        def _prove(self, stage, trace, pis):
            events.append(("prove", stage))
            assert trace == stage and pis == ["pi", stage]
            return f"proof:{stage}"

    pipeline = StubPipeline(num_points=N, xp=np)
    bundle = pipeline.prove_aggregate(pubkeys, bits, message, signature)
    assert [s for kind, s in events if kind == "prove"] == STAGES
    assert [s for kind, s in events if kind == "build"] == STAGES
    assert bundle.proofs == {s: f"proof:{s}" for s in STAGES}
    assert bundle.publics == {s: ["pi", s] for s in STAGES}
    # look-ahead bound: at no point are more than _PIPELINE_AHEAD builds
    # outstanding beyond the proves completed
    builds = proves = 0
    for kind, _ in events:
        builds += kind == "build"
        proves += kind == "prove"
        assert builds - proves <= pipeline._PIPELINE_AHEAD + 1
