"""Poseidon sponge AIR: proves digest = hash of a message (absorb chain).

Third chip of the recursive-verification layer (with PoseidonAir and
MerklePathAir): Merkle LEAF digests and the Fiat-Shamir transcript are
sponge hashes (backend/poseidon.py hash_elements_s / hash_rows — overwrite
mode, rate 8), so a recursive STARK verifier must be able to prove long
absorb chains. One permutation per 32-row block (as merkle_air); the
chaining constraint at each block boundary overwrites the rate lanes with
the next message chunk (from PIs) and carries the capacity lanes.

PIs: message (num_chunks * 8, zero-padded) || digest (4).

Shared permutation structure/constraints: poseidon_block.py (degree <= 3,
rate-1 FRI config; boundary overwrite is degree 1 on row filters).
"""

from __future__ import annotations

import numpy as np

from ..backend import poseidon as ps
from ..backend.air import Air
from ..fields import goldilocks as gl
from . import poseidon_block as pb

N_ROUNDS = pb.N_ROUNDS
WIDTH = pb.WIDTH
RATE = ps.RATE
CAP = ps.CAP
ROWS_PER_PERM = pb.ROWS_PER_PERM

S = pb.S
TOTAL_COLS = pb.BLOCK_COLS
C_TOTAL = pb.C_TOTAL


class SpongeAir(Air):
    """hash_elements over num_chunks rate-sized chunks (overwrite mode)."""

    def __init__(self, num_chunks: int = 4):
        self.num_chunks = num_chunks
        self.num_rows = pb.next_pow2(ROWS_PER_PERM * num_chunks + 1)
        self.num_cols = TOTAL_COLS
        self.num_pis = num_chunks * RATE + CAP
        self.PIS_MSG = 0
        self.PIS_DIGEST = num_chunks * RATE

    def _block_base(self, k: int) -> int:
        return ROWS_PER_PERM * k

    def constant_columns(self):
        out = np.zeros((self.num_rows, C_TOTAL), dtype=np.uint64)
        for k in range(self.num_chunks):
            pb.write_round_constants(out, self._block_base(k))
        return out

    def generate_trace(self, elements):
        """elements: list of ints, length <= num_chunks*RATE (zero-padded
        to full chunks). Returns (trace, pis)."""
        P = gl.P
        msg = [int(x) % P for x in elements]
        assert len(msg) <= self.num_chunks * RATE
        msg = msg + [0] * (self.num_chunks * RATE - len(msg))
        trace = np.zeros((self.num_rows, TOTAL_COLS), dtype=np.uint64)
        consts = self.constant_columns()
        state = [0] * WIDTH
        for k in range(self.num_chunks):
            state = msg[k * RATE : (k + 1) * RATE] + state[RATE:]
            state = pb.fill_permutation(trace, self._block_base(k), state)
        digest = state[:CAP]
        assert tuple(digest) == ps.hash_elements_s(msg), "sponge trace fill mismatch"
        pb.fill_nonround_witnesses(trace, consts)
        return trace, msg + digest

    def eval(self, ctx):
        s, _ = pb.eval_block(ctx)
        # absorb bindings: block k's input = [chunk_k (PI), carry capacity]
        for k in range(self.num_chunks):
            base = self._block_base(k)
            chunk = ctx.pi(self.PIS_MSG + k * RATE, RATE)
            ctx.constraint(s[:RATE] - chunk, ("row", base))
            if k == 0:
                ctx.constraint(s[RATE:], ("row", 0))
        # capacity carry: previous result row's tail lanes == next input's
        for k in range(1, self.num_chunks):
            brow = self._block_base(k) - 1  # result row of block k-1
            ctx.constraint(ctx.next(S + RATE, WIDTH - RATE) - s[RATE:], ("row", brow))
        digest = ctx.pi(self.PIS_DIGEST, CAP)
        last_res = self._block_base(self.num_chunks - 1) + pb.RESULT_OFF
        ctx.constraint(s[:CAP] - digest, ("row", last_res))
