"""Poseidon-permutation AIR: proves batches of backend-hash permutations.

This is the foundation of the recursive-verification layer (the reference
wraps each STARK in a plonky2 SNARK whose dominant cost is re-hashing
Merkle paths and the Fiat-Shamir transcript in-circuit,
aggregate_proof.rs:417-451). A recursive STARK verifier needs the backend's
own hash — Poseidon2-GL12 (backend/poseidon.py) — provable inside an AIR;
this chip provides exactly that: N permutations per trace, one round per
row, 32-row blocks (pre row + 30 rounds + result row), inputs/outputs
bound to public inputs. Shared block structure/constraints:
poseidon_block.py.
"""

from __future__ import annotations

import numpy as np

from ..backend import poseidon as ps
from ..backend.air import Air
from . import poseidon_block as pb

ROWS_PER_PERM = pb.ROWS_PER_PERM  # 32: pre row + 30 round rows + result row
N_ROUNDS = pb.N_ROUNDS
WIDTH = pb.WIDTH
TOTAL_COLS = pb.BLOCK_COLS
C_TOTAL = pb.C_TOTAL


class PoseidonAir(Air):
    """num_perms Poseidon2-GL12 permutations; PIs = [in(12) out(12)] each."""

    def __init__(self, num_perms: int = 8):
        self.num_perms = num_perms
        self.num_rows = max(64, pb.next_pow2(num_perms * ROWS_PER_PERM))
        self.num_cols = TOTAL_COLS
        self.num_pis = num_perms * 2 * WIDTH

    def constant_columns(self):
        out = np.zeros((self.num_rows, C_TOTAL), dtype=np.uint64)
        for p in range(self.num_perms):
            pb.write_round_constants(out, p * ROWS_PER_PERM)
        return out

    def generate_trace(self, inputs):
        """inputs: list of num_perms states (each 12 ints) -> (trace, pis)."""
        assert len(inputs) == self.num_perms
        trace = np.zeros((self.num_rows, TOTAL_COLS), dtype=np.uint64)
        consts = self.constant_columns()
        pis = []
        for p, state in enumerate(inputs):
            s_in = [int(x) % pb.gl.P for x in state]
            pis.extend(s_in)
            out = pb.fill_permutation(trace, p * ROWS_PER_PERM, s_in)
            pis.extend(out)
            assert out == [int(x) for x in ps.permute_s(s_in)], "poseidon trace fill mismatch"
        pb.fill_nonround_witnesses(trace, consts)
        return trace, pis

    def eval(self, ctx):
        s, _ = pb.eval_block(ctx)
        for p in range(self.num_perms):
            base = p * ROWS_PER_PERM
            pin = ctx.pi(p * 2 * WIDTH, WIDTH)
            pout = ctx.pi(p * 2 * WIDTH + WIDTH, WIDTH)
            ctx.constraint(s - pin, ("row", base))
            ctx.constraint(s - pout, ("row", base + pb.RESULT_OFF))
