"""Merkle-path verification AIR: proves leaf-digest membership under a root.

Second chip of the recursive-verification layer (with PoseidonAir): the
dominant in-circuit cost of the reference's recursive STARK wrap is
verifying Merkle authentication paths with the backend hash
(plonky2's FRI verifier inside `recursive_proof`, aggregate_proof.rs:439).
This AIR proves: "digest LEAF at index given by the per-level direction
bits hashes through the provided siblings to ROOT" using the backend's
Poseidon2-GL12 2-to-1 compression (backend/poseidon.py compress_s).

Layout: each tree level occupies 32 rows — a pre row (raw digest-pair
input), 30 Poseidon2 round rows, and a result row that doubles as the
chaining boundary; the next level's window starts immediately after, so
a depth-d path uses 32*d + 1 rows. The
chaining constraint (gated by the c_chain constant column on result rows)
rebuilds the next permutation input from the current digest, the sibling
witness, and the direction bit:

  bit = 0 (current node is the left child):  state = [cur, sib, 0^4]
  bit = 1 (right child):                     state = [sib, cur, 0^4]

PIs: leaf digest (4) || root digest (4) || direction bits (depth,
level 0 first — little-endian bits of the leaf index).

Shared permutation structure/constraints: poseidon_block.py (degree <= 3,
rate-1 FRI config); the chaining select is (trace bit, deg 1) x (digest,
deg 1) gated by a constant column.
"""

from __future__ import annotations

import numpy as np

from ..backend import poseidon as ps
from ..backend.air import Air
from ..fields import goldilocks as gl
from . import poseidon_block as pb

N_ROUNDS = pb.N_ROUNDS
WIDTH = pb.WIDTH
CAP = ps.CAP
ROWS_PER_LEVEL = pb.ROWS_PER_PERM  # 32: pre + rounds + result row

# trace columns: poseidon block + sibling digest + direction bit
S = pb.S
SIB = pb.BLOCK_COLS
BIT = pb.BLOCK_COLS + CAP
TOTAL_COLS = pb.BLOCK_COLS + CAP + 1

# constant columns: shared block constants + chain flag
C_CHAIN = pb.C_TOTAL
C_TOTAL = pb.C_TOTAL + 1


class MerklePathAir(Air):
    """One authentication path of fixed depth."""

    def __init__(self, depth: int = 12):
        self.depth = depth
        self.num_rows = pb.next_pow2(ROWS_PER_LEVEL * depth + 1)
        self.num_cols = TOTAL_COLS
        self.num_pis = 2 * CAP + depth
        self.PIS_LEAF = 0
        self.PIS_ROOT = CAP
        self.PIS_BITS = 2 * CAP

    def _level_base(self, lvl: int) -> int:
        return ROWS_PER_LEVEL * lvl

    def constant_columns(self):
        out = np.zeros((self.num_rows, C_TOTAL), dtype=np.uint64)
        for lvl in range(self.depth):
            base = self._level_base(lvl)
            pb.write_round_constants(out, base)
            if lvl:  # result row of the previous level chains into this one
                out[base - 1, C_CHAIN] = 1
        return out

    # -- trace ------------------------------------------------------------
    def generate_trace(self, leaf, siblings, index: int):
        """leaf: 4 ints; siblings: depth digests (4 ints each); index: leaf
        position. Returns (trace, pis); root is computed and exposed."""
        assert len(siblings) == self.depth
        P = gl.P
        trace = np.zeros((self.num_rows, TOTAL_COLS), dtype=np.uint64)
        consts = self.constant_columns()
        cur = [int(x) % P for x in leaf]
        bits = [(index >> lvl) & 1 for lvl in range(self.depth)]
        for lvl in range(self.depth):
            sib = [int(x) % P for x in siblings[lvl]]
            bit = bits[lvl]
            pair = (sib, cur) if bit else (cur, sib)
            state = pair[0] + pair[1] + [0] * (WIDTH - 2 * CAP)
            base = self._level_base(lvl)
            if lvl:  # boundary witnesses live on the previous result row
                trace[base - 1, SIB : SIB + CAP] = sib
                trace[base - 1, BIT] = bit
            else:  # level-0 sibling witness lives on row 0 (bit comes
                # straight from the PI in the row-0 binding constraint)
                trace[0, SIB : SIB + CAP] = sib
            out = pb.fill_permutation(trace, base, state)
            cur = out[:CAP]
            assert tuple(cur) == ps.compress_s(*pair), "merkle trace fill mismatch"
        root = cur
        pb.fill_nonround_witnesses(trace, consts)
        pis = [int(x) % P for x in leaf] + root + bits
        return trace, pis

    # -- constraints -------------------------------------------------------
    def eval(self, ctx):
        s, s_next = pb.eval_block(ctx)
        c_chain = ctx.const(C_CHAIN)

        # chaining: result row -> next level's input state
        sib = ctx.local(SIB, CAP)
        bit = ctx.local(BIT)
        cur = s[:CAP]
        ctx.constraint(c_chain * bit * (1 - bit))  # bit boolean
        left = s_next[:CAP] - (bit[None] * sib + (1 - bit)[None] * cur)
        right = s_next[CAP : 2 * CAP] - (bit[None] * cur + (1 - bit)[None] * sib)
        ctx.constraint_transition(c_chain[None] * left)
        ctx.constraint_transition(c_chain[None] * right)
        ctx.constraint_transition(c_chain[None] * s_next[2 * CAP :])

        # PI binding: leaf into level-0 input, bits at boundary rows, root
        leaf = ctx.pi(self.PIS_LEAF, CAP)
        root = ctx.pi(self.PIS_ROOT, CAP)
        bit0 = ctx.pi(self.PIS_BITS)
        ctx.constraint(s[:CAP] - (bit0 * ctx.local(SIB, CAP) + (1 - bit0) * leaf), ("row", 0))
        ctx.constraint(
            s[CAP : 2 * CAP] - (bit0 * leaf + (1 - bit0) * ctx.local(SIB, CAP)), ("row", 0)
        )
        ctx.constraint(s[2 * CAP :], ("row", 0))
        last_res = self._level_base(self.depth - 1) + pb.RESULT_OFF
        ctx.constraint(s[:CAP] - root, ("row", last_res))
        for lvl in range(1, self.depth):
            brow = self._level_base(lvl) - 1
            ctx.constraint(bit - ctx.pi(self.PIS_BITS + lvl), ("row", brow))
