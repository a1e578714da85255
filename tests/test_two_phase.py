"""Two-phase commitment + grand-product permutation argument.

Covers the backend extension of docs/RECURSION.md item 2: a second
commitment round whose columns depend on challenges drawn from the phase-1
cap, and the copy-constraint argument built on it. The reference gets this
capability from plonky2's permutation argument; here it is proved by a
CopyAir binding column b to a rotation of column a purely through copy
classes (no direct wiring constraint)."""

import numpy as np
import pytest

import starky_bls12_381_tpu  # noqa: F401
from starky_bls12_381_tpu.backend.air import Air
from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.permutation import CopyConstraintSystem, batch_inv
from starky_bls12_381_tpu.backend.proof import proof_from_bytes, proof_to_bytes
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.fields import goldilocks as gl

ROT = 5


class CopyAir(Air):
    """b[i] == a[(i + ROT) % n], enforced ONLY via copy classes."""

    num_rows = 32
    num_cols = 2
    num_pis = 0

    def __init__(self, check_z: bool = True):
        self.check_z = check_z
        self.ccs = CopyConstraintSystem(self.num_rows, [0, 1], num_sets=2)
        for i in range(self.num_rows):
            self.ccs.connect([(0, (i + ROT) % self.num_rows), (1, i)])
        self.num_cols2 = self.ccs.num_cols2
        self.num_phase_challenges = self.ccs.num_phase_challenges
        self._labels = self.ccs.label_columns()

    def constant_columns(self):
        return self._labels

    def generate_trace2(self, trace, challenges):
        if self.check_z:
            return self.ccs.generate_trace2(trace, challenges)
        # dishonest-prover path for soundness tests: build Z without the
        # closing-product check (the wrap constraint must then fail)
        import starky_bls12_381_tpu.backend.permutation as pm

        n, K = self.ccs.n, self.ccs.K
        vals = np.stack([trace[:, c].astype(np.uint64) for c in self.ccs.slot_cols])
        out = np.zeros((n, self.num_cols2), dtype=np.uint64)
        for s in range(self.ccs.num_sets):
            beta = np.uint64(int(challenges[2 * s]) % gl.P)
            gamma = np.uint64(int(challenges[2 * s + 1]) % gl.P)
            t_num = gl.gl_add(vals, gl.gl_add(gl.gl_mul(np.broadcast_to(beta, vals.shape), self.ccs._ids), gamma))
            t_den = gl.gl_add(vals, gl.gl_add(gl.gl_mul(np.broadcast_to(beta, vals.shape), self.ccs._sigma), gamma))
            base = s * self.ccs.per_set
            pn, pd = t_num[0], t_den[0]
            for j in range(1, K):
                pn = np.asarray(gl.gl_mul(pn, t_num[j]))
                pd = np.asarray(gl.gl_mul(pd, t_den[j]))
                out[:, base + (j - 1)] = pn
                out[:, base + (K - 1) + (j - 1)] = pd
            ratio = np.asarray(gl.gl_mul(pn, pm.batch_inv(pd)))
            acc = 1
            z = np.empty(n, dtype=np.uint64)
            for i in range(n):
                z[i] = acc
                acc = acc * int(ratio[i]) % gl.P
            out[:, base + 2 * (K - 1)] = z
        return out

    def eval(self, ctx):
        self.ccs.eval(ctx, const_base=0)

    def generate_trace(self, seed=0):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, gl.P, size=self.num_rows, dtype=np.uint64)
        b = np.roll(a, -ROT)
        return np.stack([a, b], axis=1), []


CFG = StarkConfig(pow_bits=4, num_queries=8)


def test_batch_inv():
    rng = np.random.default_rng(3)
    v = rng.integers(1, gl.P, size=100, dtype=np.uint64)
    inv = batch_inv(v)
    assert all(int(a) * int(b) % gl.P == 1 for a, b in zip(v, inv))


def test_copy_roundtrip():
    air = CopyAir()
    trace, pis = air.generate_trace()
    proof = prove(air, trace, pis, CFG, xp=np)
    assert proof.trace2_cap is not None
    verify(air, proof, pis, CFG)


def test_copy_proof_serde():
    air = CopyAir()
    trace, pis = air.generate_trace()
    proof = prove(air, trace, pis, CFG, xp=np)
    blob = proof_to_bytes(proof)
    proof2 = proof_from_bytes(blob)
    assert proof_to_bytes(proof2) == blob
    verify(air, proof2, pis, CFG)


def test_copy_tampered_opening_rejected():
    air = CopyAir()
    trace, pis = air.generate_trace()
    proof = prove(air, trace, pis, CFG, xp=np)
    proof.trace2_local = proof.trace2_local.copy()
    proof.trace2_local[0, 0] = (int(proof.trace2_local[0, 0]) + 1) % gl.P
    with pytest.raises(VerificationError):
        verify(air, proof, pis, CFG)


def test_copy_violation_rejected():
    """A trace where b is NOT the rotation of a must not produce a valid
    proof: the honest trace2 builder refuses (closing product != 1), and a
    dishonest Z column fails either in-prover (FRI degree overflow: the
    quotient is not a polynomial) or at verification."""
    air = CopyAir(check_z=True)
    trace, pis = air.generate_trace()
    trace = trace.copy()
    trace[3, 1] = (int(trace[3, 1]) + 1) % gl.P
    with pytest.raises(AssertionError):
        prove(air, trace, pis, CFG, xp=np)
    air2 = CopyAir(check_z=False)
    try:
        proof = prove(air2, trace, pis, CFG, xp=np)
    except AssertionError:
        return  # FRI degree overflow in the prover: proof impossible
    with pytest.raises(VerificationError):
        verify(air2, proof, pis, CFG)


def test_copy_wrong_statement_rejected():
    """A valid proof for trace A must not verify against a different
    transcript (different pow config ~ different challenges)."""
    air = CopyAir()
    trace, pis = air.generate_trace()
    proof = prove(air, trace, pis, CFG, xp=np)
    # tamper the phase-2 cap: transcript diverges -> query indices mismatch
    proof.trace2_cap = proof.trace2_cap.copy()
    proof.trace2_cap[0, 0] = (int(proof.trace2_cap[0, 0]) + 1) % gl.P
    with pytest.raises(VerificationError):
        verify(air, proof, pis, CFG)
