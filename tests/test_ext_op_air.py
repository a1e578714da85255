"""ExtOpAir: the inner quotient identity proved as an op tape.

The capability the reference gets from its per-stark plonky2 wrap's
`eval_ext_circuit` re-execution (aggregate_proof.rs:417-451), rebuilt on
the two-phase backend: prove_ext_op/verify_ext_op replace the native
`check_quotient_identity` for an inner proof with one outer STARK."""

import numpy as np
import pytest

import starky_bls12_381_tpu  # noqa: F401
from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.optape import (
    eval_tape,
    extract_identity_tape,
    tape_leaf_values,
)
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import (
    VerificationError,
    derive_challenges,
)
from starky_bls12_381_tpu.fields import goldilocks as gl
from starky_bls12_381_tpu.starks.ext_op_air import ExtOpAir, prove_ext_op, verify_ext_op
from starky_bls12_381_tpu.starks.poseidon_air import PoseidonAir

ICFG = StarkConfig(pow_bits=4, num_queries=8)
OCFG = StarkConfig(pow_bits=4, num_queries=8)


def _inner():
    rng = np.random.default_rng(0)
    air = PoseidonAir(num_perms=2)
    inputs = [list(rng.integers(0, gl.P, size=12, dtype=np.uint64)) for _ in range(2)]
    trace, pis = air.generate_trace(inputs)
    proof = prove(air, trace, pis, ICFG, xp=np)
    return air, proof, pis


def test_tape_matches_identity():
    air, proof, pis = _inner()
    tape, filts = extract_identity_tape(air, ICFG)
    d = derive_challenges(air, proof, pis, ICFG)
    leaves = tape_leaf_values(air, proof, pis, ICFG, d, filts)
    outs = eval_tape(tape, leaves)
    n = air.num_rows
    zeta = d["zeta"]
    zh = gl.ext_sub(gl.ext_pow(zeta, n), gl.EXT_ONE)
    factor = air.quotient_degree_factor()
    for ci in range(ICFG.num_challenges):
        zn = gl.ext_pow(zeta, n)
        q_sum, zpow = gl.EXT_ZERO, gl.EXT_ONE
        for k in range(factor):
            q_k = (int(proof.quotient_open[ci * factor + k, 0]),
                   int(proof.quotient_open[ci * factor + k, 1]))
            q_sum = gl.ext_add(q_sum, gl.ext_mul(zpow, q_k))
            zpow = gl.ext_mul(zpow, zn)
        assert gl.ext_mul(q_sum, zh) == outs[ci]


def test_native_tape_eval_matches_python():
    from starky_bls12_381_tpu.backend import tape_native as tn

    if not tn.available():
        pytest.skip("no C compiler")
    air, proof, pis = _inner()
    tape, filts = extract_identity_tape(air, ICFG)
    d = derive_challenges(air, proof, pis, ICFG)
    leaves = tape_leaf_values(air, proof, pis, ICFG, d, filts)
    vals_c = tn.eval_tape(tape, leaves)
    outs_py = eval_tape(tape, leaves)
    for k, o in enumerate(tape.outputs):
        assert (int(vals_c[o, 0]), int(vals_c[o, 1])) == outs_py[k]


def test_ext_op_roundtrip():
    air, proof, pis = _inner()
    eair = ExtOpAir(air, ICFG)
    outer = prove_ext_op(eair, proof, pis, OCFG, xp=np)
    verify_ext_op(eair, proof, pis, outer, OCFG)


def test_ext_op_rejects_tampered_inner():
    """A tampered inner quotient opening must fail: the outer proof binds
    the TRUE acc values, which no longer match q_sum * Z_H."""
    air, proof, pis = _inner()
    eair = ExtOpAir(air, ICFG)
    outer = prove_ext_op(eair, proof, pis, OCFG, xp=np)
    proof.quotient_open = proof.quotient_open.copy()
    proof.quotient_open[0, 0] = (int(proof.quotient_open[0, 0]) + 1) % gl.P
    with pytest.raises(VerificationError):
        verify_ext_op(eair, proof, pis, outer, OCFG)


def test_ext_op_rejects_tampered_leaf_column():
    """An outer trace whose LV column disagrees with the public leaves must
    fail the zeta-evaluation binding."""
    air, proof, pis = _inner()
    eair = ExtOpAir(air, ICFG)
    outer = prove_ext_op(eair, proof, pis, OCFG, xp=np)
    outer.trace_local = outer.trace_local.copy()
    from starky_bls12_381_tpu.starks.ext_op_air import LV0

    outer.trace_local[LV0, 0] = (int(outer.trace_local[LV0, 0]) + 1) % gl.P
    with pytest.raises(VerificationError):
        verify_ext_op(eair, proof, pis, outer, OCFG)


def test_ext_op_rejects_wrong_wiring_value():
    """Forging an operand value (breaking a copy class) must be caught by
    the permutation argument: prove with a corrupted trace and expect a
    prover-side FRI overflow or a verification failure."""
    air, proof, pis = _inner()
    eair = ExtOpAir(air, ICFG)
    trace, outer_pis = eair.generate_trace(proof, pis)
    # first op row: bump its A operand (still satisfies the op constraint
    # by bumping O accordingly -> only the copy argument can catch it)
    from starky_bls12_381_tpu.backend.optape import LEAF
    from starky_bls12_381_tpu.starks.ext_op_air import A0, O0, B0

    rows = np.nonzero(eair._ops_arr == 0)[0]  # ADD rows
    r = int(rows[0])
    trace[r, A0] = (int(trace[r, A0]) + 1) % gl.P
    trace[r, O0] = (int(trace[r, O0]) + 1) % gl.P
    try:
        bad = prove(eair, trace, outer_pis, OCFG, xp=np)
    except AssertionError:
        return  # honest trace2 builder refuses (product does not close)
    with pytest.raises(VerificationError):
        verify_ext_op(eair, proof, pis, bad, OCFG)
