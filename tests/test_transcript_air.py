"""TranscriptAir: in-STARK Fiat-Shamir duplex replay vs the real
Challenger (recursion chip #5)."""

import numpy as np
import pytest

from starky_bls12_381_tpu.backend.challenger import Challenger
from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.fields import goldilocks as gl
from starky_bls12_381_tpu.starks.transcript_air import (
    TranscriptAir,
    schedule_and_inputs_from_events,
)

CFG = StarkConfig(pow_bits=4, num_queries=24)

# a protocol-shaped event log: observe PIs digest, observe cap, draw
# alphas, observe more, draw zeta, partial buffers included
EVENTS_SPEC = [
    ("observe", 4),
    ("observe", 16),
    ("challenge", 2),
    ("observe", 4),
    ("challenge", 2),
    ("challenge", 2),
    ("observe", 11),
    ("challenge", 5),
]


@pytest.fixture(scope="module")
def logged():
    rng = np.random.default_rng(17)
    events = []
    for kind, n in EVENTS_SPEC:
        if kind == "observe":
            events.append(("observe", [int(x) for x in rng.integers(0, gl.P, n, dtype=np.uint64)]))
        else:
            events.append(("challenge", n))
    ch = Challenger()
    expected = []
    for kind, payload in events:
        if kind == "observe":
            ch.observe_many(payload)
        else:
            expected.extend(ch.get_challenges(payload))
    return events, expected


@pytest.fixture(scope="module")
def proven(logged):
    events, expected = logged
    schedule, absorbed = schedule_and_inputs_from_events(events)
    air = TranscriptAir(schedule)
    trace, pis = air.generate_trace(absorbed)
    proof = prove(air, trace, pis, CFG, xp=np)
    return air, pis, proof, expected


def test_squeezed_match_real_challenger(proven):
    air, pis, _, expected = proven
    assert pis[air.PIS_SQUEEZED :] == expected


def test_prove_verify(proven):
    air, pis, proof, _ = proven
    verify(air, proof, pis, CFG)
    assert air.quotient_degree_factor() <= 2


def test_tampered_challenge_rejected(proven):
    air, pis, proof, _ = proven
    bad = list(pis)
    bad[air.PIS_SQUEEZED] = (bad[air.PIS_SQUEEZED] + 1) % gl.P
    with pytest.raises(VerificationError):
        verify(air, proof, bad, CFG)


def test_tampered_observation_rejected(proven):
    air, pis, proof, _ = proven
    bad = list(pis)
    bad[3] = (bad[3] + 1) % gl.P
    with pytest.raises(VerificationError):
        verify(air, proof, bad, CFG)
