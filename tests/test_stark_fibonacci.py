"""End-to-end prover/verifier shakedown on a toy Fibonacci AIR.

Mirrors the reference's STARK test pattern (`ecc_aggregate.rs:488-554`:
build a real trace, prove, verify) plus tamper tests the reference lacks
(SURVEY.md §4 notes the rebuild should add them).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from starky_bls12_381_tpu.backend import air as air_mod
from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.fields import goldilocks as gl


class FibAir(air_mod.Air):
    num_cols = 2
    num_rows = 32
    num_pis = 3  # a0, b0, a_last

    def eval(self, ctx):
        a, b = ctx.local(0), ctx.local(1)
        an, bn = ctx.next(0), ctx.next(1)
        ctx.constraint_transition(an - b)
        ctx.constraint_transition(bn - (a + b))
        ctx.constraint_first_row(a - ctx.pi(0))
        ctx.constraint_first_row(b - ctx.pi(1))
        ctx.constraint(a - ctx.pi(2), air_mod.LAST(self.num_rows))
        # exercise a mid-trace boundary constraint (row 3 holds fib(3)=a3)
        ctx.constraint_row(a - self._a3, 3)

    def __init__(self):
        a, b = 1, 1
        rows = []
        for _ in range(self.num_rows):
            rows.append((a, b))
            a, b = b, (a + b) % gl.P
        self._rows = rows
        self._a3 = rows[3][0]

    def trace_and_pis(self):
        trace = np.asarray(self._rows, dtype=np.uint64)
        pis = [trace[0, 0], trace[0, 1], trace[-1, 0]]
        return trace, [int(x) for x in pis]


@pytest.fixture(scope="module")
def fib_setup():
    air = FibAir()
    trace, pis = air.trace_and_pis()
    config = StarkConfig(rate_bits=1, final_poly_len=8, pow_bits=8)
    proof = prove(air, trace, pis, config, xp=np)
    return air, trace, pis, config, proof


def test_prove_verify_roundtrip(fib_setup):
    air, trace, pis, config, proof = fib_setup
    verify(air, proof, pis, config)


def test_tampered_merkle_paths_rejected(fib_setup):
    """The batched per-level path authentication must reject a flipped
    sibling digest in each of the three path families."""
    import copy

    air, trace, pis, config, proof = fib_setup
    for mutate, name in [
        (lambda p: p.fri.query_rounds[0].trace_path[0].__setitem__(0, 12345), "trace"),
        (lambda p: p.fri.query_rounds[1].quotient_path[-1].__setitem__(1, 7), "quotient"),
        (lambda p: p.fri.query_rounds[0].steps[0].path[0].__setitem__(2, 99), "fri-layer"),
    ]:
        bad = copy.deepcopy(proof)
        mutate(bad)
        with pytest.raises(VerificationError):
            verify(air, bad, pis, config)


def test_tampered_opened_row_rejected(fib_setup):
    import copy

    air, trace, pis, config, proof = fib_setup
    bad = copy.deepcopy(proof)
    bad.fri.query_rounds[0].trace_row[0] ^= 1
    with pytest.raises(VerificationError):
        verify(air, bad, pis, config)


def test_quotient_degree_factor(fib_setup):
    air = fib_setup[0]
    assert air.quotient_degree_factor() == 1


def test_wrong_pi_rejected(fib_setup):
    air, trace, pis, config, proof = fib_setup
    bad = list(pis)
    bad[2] = (bad[2] + 1) % gl.P
    with pytest.raises(VerificationError):
        verify(air, proof, bad, config)


def test_tampered_opening_rejected(fib_setup):
    import copy

    air, trace, pis, config, proof = fib_setup
    p2 = copy.deepcopy(proof)
    p2.trace_local[0, 0] = (int(p2.trace_local[0, 0]) + 1) % gl.P
    with pytest.raises(VerificationError):
        verify(air, p2, pis, config)


def test_tampered_fri_value_rejected(fib_setup):
    import copy

    air, trace, pis, config, proof = fib_setup
    p2 = copy.deepcopy(proof)
    p2.fri.query_rounds[0].trace_row[0] = (int(p2.fri.query_rounds[0].trace_row[0]) + 1) % gl.P
    with pytest.raises(VerificationError):
        verify(air, p2, pis, config)


def test_invalid_trace_rejected():
    air = FibAir()
    trace, pis = air.trace_and_pis()
    trace = trace.copy()
    trace[7, 0] = (int(trace[7, 0]) + 1) % gl.P  # break the recurrence
    config = StarkConfig(rate_bits=1, final_poly_len=8, pow_bits=8)
    proof = prove(air, trace, pis, config, xp=np)
    with pytest.raises(VerificationError):
        verify(air, proof, pis, config)


def test_jax_prover_matches(fib_setup):
    import jax.numpy as jnp

    air, trace, pis, config, proof = fib_setup
    proof_j = prove(air, trace, pis, config, xp=jnp)
    verify(air, proof_j, pis, config)
    np.testing.assert_array_equal(proof_j.trace_cap, proof.trace_cap)
    np.testing.assert_array_equal(proof_j.fri.final_coeffs, proof.fri.final_coeffs)


class ParityAir(air_mod.Air):
    """Exercises public constant columns: constrain even rows to hold
    double the previous value, odd rows to hold value + 1, gated by a
    constant parity selector (a fixed public pattern, not witness)."""

    num_cols = 1
    num_rows = 16
    num_pis = 1

    def constant_columns(self):
        odd = np.arange(self.num_rows, dtype=np.uint64) % 2
        return odd.reshape(-1, 1)

    def eval(self, ctx):
        v, vn = ctx.local(0), ctx.next(0)
        odd_next = ctx.const_next(0)
        # next value = odd_row_next ? v + 1 : 2*v
        ctx.constraint_transition(odd_next * (vn - v - 1) + (1 - odd_next) * (vn - v * 2))
        ctx.constraint_first_row(v - 3)
        ctx.constraint(v - ctx.pi(0), air_mod.LAST(self.num_rows))


def _parity_trace():
    vals = [3]
    for i in range(1, 16):
        vals.append((vals[-1] + 1) if i % 2 else (vals[-1] * 2))
    return np.asarray(vals, dtype=np.uint64).reshape(-1, 1)


def test_constant_columns_air():
    air = ParityAir()
    trace = _parity_trace()
    pis = [int(trace[-1, 0])]
    config = StarkConfig(rate_bits=1, final_poly_len=4, pow_bits=8)
    proof = prove(air, trace, pis, config, xp=np)
    verify(air, proof, pis, config)
    # breaking the constant-gated rule must be caught
    bad = trace.copy()
    bad[5, 0] += 1
    bad_pis = [int(bad[-1, 0])] if False else pis
    proof2 = prove(air, bad, bad_pis, config, xp=np)
    with pytest.raises(VerificationError):
        verify(air, proof2, bad_pis, config)
