"""Merkle-path verification AIR: proves leaf-digest membership under a root.

Second chip of the recursive-verification layer (with PoseidonAir): the
dominant in-circuit cost of the reference's recursive STARK wrap is
verifying Merkle authentication paths with the backend hash
(plonky2's FRI verifier inside `recursive_proof`, aggregate_proof.rs:439).
This AIR proves: "digest LEAF at index given by the per-level direction
bits hashes through the provided siblings to ROOT" using the backend's
Poseidon-GL12 2-to-1 compression (backend/poseidon.py compress_s).

Layout: each tree level occupies 31 rows — 30 Poseidon round rows plus a
result row that doubles as the chaining boundary; the next level's round
rows start immediately after, so a depth-d path uses 31*d + 1 rows. The
chaining constraint (gated by the c_chain constant column on result rows)
rebuilds the next permutation input from the current digest, the sibling
witness, and the direction bit:

  bit = 0 (current node is the left child):  state = [cur, sib, 0^4]
  bit = 1 (right child):                     state = [sib, cur, 0^4]

PIs: leaf digest (4) || root digest (4) || direction bits (depth,
level 0 first — little-endian bits of the leaf index).

All constraints are degree <= 3 (same rate-1 FRI config as everything
else): witness-factored x^7 sbox exactly as PoseidonAir, and the chaining
select is (trace bit, deg 1) x (digest, deg 1) gated by a constant column.
"""

from __future__ import annotations

import numpy as np

from ..backend import poseidon as ps
from ..backend.air import Air
from ..fields import goldilocks as gl

N_ROUNDS = ps.N_ROUNDS  # 30
WIDTH = ps.WIDTH  # 12
CAP = ps.CAP  # 4
ROWS_PER_LEVEL = N_ROUNDS + 1  # result row is shared with the next level

# trace columns: poseidon block + sibling digest + direction bit
S = 0
W3 = WIDTH
W6 = 2 * WIDTH
U = 3 * WIDTH
SIB = 4 * WIDTH  # 4 cols: sibling digest, live on result rows
BIT = 4 * WIDTH + CAP  # 1 col: direction bit, live on result rows
TOTAL_COLS = 4 * WIDTH + CAP + 1

# constant columns
C_RC = 0
C_ROUND = WIDTH
C_FULL = WIDTH + 1
C_PARTIAL = WIDTH + 2
C_CHAIN = WIDTH + 3  # 1 on every level's result row except the last
C_TOTAL = WIDTH + 4

_HALF = ps.N_FULL // 2


def _round_is_full(r: int) -> bool:
    return not (_HALF <= r < _HALF + ps.N_PARTIAL)


class MerklePathAir(Air):
    """One authentication path of fixed depth."""

    def __init__(self, depth: int = 12):
        self.depth = depth
        self.num_rows = _next_pow2(ROWS_PER_LEVEL * depth + 1)
        self.num_cols = TOTAL_COLS
        self.num_pis = 2 * CAP + depth
        # PI offsets
        self.PIS_LEAF = 0
        self.PIS_ROOT = CAP
        self.PIS_BITS = 2 * CAP

    def _level_base(self, lvl: int) -> int:
        return ROWS_PER_LEVEL * lvl

    def constant_columns(self):
        out = np.zeros((self.num_rows, C_TOTAL), dtype=np.uint64)
        for lvl in range(self.depth):
            base = self._level_base(lvl)
            for r in range(N_ROUNDS):
                out[base + r, C_RC : C_RC + WIDTH] = ps._RC_NP[r]
                out[base + r, C_ROUND] = 1
                out[base + r, C_FULL if _round_is_full(r) else C_PARTIAL] = 1
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
            for r in range(N_ROUNDS):
                row = base + r
                trace[row, S : S + WIDTH] = state
                tmp = [(state[i] + ps.ROUND_CONSTANTS[r][i]) % P for i in range(WIDTH)]
                u = []
                for i in range(WIDTH):
                    w3 = tmp[i] * tmp[i] % P * tmp[i] % P
                    w6 = w3 * w3 % P
                    trace[row, W3 + i] = w3
                    trace[row, W6 + i] = w6
                    u.append(w6 * tmp[i] % P if (i == 0 or _round_is_full(r)) else tmp[i])
                trace[row, U : U + WIDTH] = u
                state = [
                    sum(ps.MDS[j][i] * u[i] for i in range(WIDTH)) % P for j in range(WIDTH)
                ]
            res_row = base + N_ROUNDS
            trace[res_row, S : S + WIDTH] = state
            cur = state[:CAP]
            assert tuple(cur) == ps.compress_s(*pair), "merkle trace fill mismatch"
        root = cur
        # ungated witness identities on non-round rows
        for row in range(self.num_rows):
            if consts[row, C_ROUND]:
                continue
            for i in range(WIDTH):
                t = int(trace[row, S + i])
                w3 = t * t % P * t % P
                trace[row, W3 + i] = w3
                trace[row, W6 + i] = w3 * w3 % P
                if i == 0:
                    trace[row, U] = (w3 * w3 % P) * t % P
        pis = [int(x) % P for x in leaf] + root + bits
        return trace, pis

    # -- constraints -------------------------------------------------------
    def eval(self, ctx):
        s = ctx.local(S, WIDTH)
        s_next = ctx.next(S, WIDTH)
        w3 = ctx.local(W3, WIDTH)
        w6 = ctx.local(W6, WIDTH)
        u = ctx.local(U, WIDTH)
        rc = ctx.const(C_RC, WIDTH)
        c_round = ctx.const(C_ROUND)
        c_full = ctx.const(C_FULL)
        c_partial = ctx.const(C_PARTIAL)
        c_chain = ctx.const(C_CHAIN)

        tmp = s + rc
        ctx.constraint(w3 - tmp * tmp * tmp)
        ctx.constraint(w6 - w3 * w3)
        ctx.constraint(u[0] - w6[0] * tmp[0])
        ctx.constraint(c_full[None] * (u[1:] - w6[1:] * tmp[1:]))
        ctx.constraint(c_partial[None] * (u[1:] - tmp[1:]))
        mds = ctx.lift(np.asarray(ps.MDS, dtype=np.uint64))
        acc = None
        for i in range(WIDTH):
            term = mds[:, i] * u[i][None]
            acc = term if acc is None else acc + term
        ctx.constraint_transition(c_round[None] * (s_next - acc))

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
        # level-0 input: [cur,sib,0] or [sib,cur,0] selected by bit 0 of PI
        ctx.constraint(s[:CAP] - (bit0 * ctx.local(SIB, CAP) + (1 - bit0) * leaf), ("row", 0))
        ctx.constraint(
            s[CAP : 2 * CAP] - (bit0 * leaf + (1 - bit0) * ctx.local(SIB, CAP)), ("row", 0)
        )
        ctx.constraint(s[2 * CAP :], ("row", 0))
        last_res = self._level_base(self.depth - 1) + N_ROUNDS
        ctx.constraint(s[:CAP] - root, ("row", last_res))
        for lvl in range(1, self.depth):
            brow = self._level_base(lvl) - 1
            ctx.constraint(bit - ctx.pi(self.PIS_BITS + lvl), ("row", brow))

def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()
