"""Poseidon sponge AIR: proves digest = hash of a message (absorb chain).

Third chip of the recursive-verification layer (with PoseidonAir and
MerklePathAir): Merkle LEAF digests and the Fiat-Shamir transcript are
sponge hashes (backend/poseidon.py hash_elements_s / hash_rows — overwrite
mode, rate 8), so a recursive STARK verifier must be able to prove long
absorb chains. One permutation per 31-row block (as merkle_air); the
chaining constraint at each block boundary overwrites the rate lanes with
the next message chunk (from PIs) and carries the capacity lanes.

PIs: message (num_chunks * 8, zero-padded) || digest (4).

Degree <= 3 throughout (witness-factored sbox; boundary overwrite is
degree 1 on row filters), so the rate-1 FRI config applies.
"""

from __future__ import annotations

import numpy as np

from ..backend import poseidon as ps
from ..backend.air import Air
from ..fields import goldilocks as gl

N_ROUNDS = ps.N_ROUNDS
WIDTH = ps.WIDTH
RATE = ps.RATE
CAP = ps.CAP
ROWS_PER_PERM = N_ROUNDS + 1

S = 0
W3 = WIDTH
W6 = 2 * WIDTH
U = 3 * WIDTH
TOTAL_COLS = 4 * WIDTH

C_RC = 0
C_ROUND = WIDTH
C_FULL = WIDTH + 1
C_PARTIAL = WIDTH + 2
C_TOTAL = WIDTH + 3

_HALF = ps.N_FULL // 2


def _round_is_full(r: int) -> bool:
    return not (_HALF <= r < _HALF + ps.N_PARTIAL)


class SpongeAir(Air):
    """hash_elements over num_chunks rate-sized chunks (overwrite mode)."""

    def __init__(self, num_chunks: int = 4):
        self.num_chunks = num_chunks
        self.num_rows = _next_pow2(ROWS_PER_PERM * num_chunks + 1)
        self.num_cols = TOTAL_COLS
        self.num_pis = num_chunks * RATE + CAP
        self.PIS_MSG = 0
        self.PIS_DIGEST = num_chunks * RATE

    def _block_base(self, k: int) -> int:
        return ROWS_PER_PERM * k

    def constant_columns(self):
        out = np.zeros((self.num_rows, C_TOTAL), dtype=np.uint64)
        for k in range(self.num_chunks):
            base = self._block_base(k)
            for r in range(N_ROUNDS):
                out[base + r, C_RC : C_RC + WIDTH] = ps._RC_NP[r]
                out[base + r, C_ROUND] = 1
                out[base + r, C_FULL if _round_is_full(r) else C_PARTIAL] = 1
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
            chunk = msg[k * RATE : (k + 1) * RATE]
            state = chunk + state[RATE:]
            base = self._block_base(k)
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
            trace[base + N_ROUNDS, S : S + WIDTH] = state
        digest = state[:CAP]
        assert tuple(digest) == ps.hash_elements_s(msg), "sponge trace fill mismatch"
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
        pis = msg + digest
        return trace, pis

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

        # absorb bindings: block k's input = [chunk_k (PI), carry capacity]
        for k in range(self.num_chunks):
            base = self._block_base(k)
            chunk = ctx.pi(self.PIS_MSG + k * RATE, RATE)
            ctx.constraint(s[:RATE] - chunk, ("row", base))
            if k == 0:
                ctx.constraint(s[RATE:], ("row", 0))
        # capacity carry: previous result row's tail lanes == next input's.
        # the result row of block k IS row base(k+1)-1, so this is a plain
        # transition relation on those rows; reuse a row filter per block.
        for k in range(1, self.num_chunks):
            brow = self._block_base(k) - 1  # result row of block k-1
            ctx.constraint(ctx.next(S + RATE, WIDTH - RATE) - s[RATE:], ("row", brow))
        digest = ctx.pi(self.PIS_DIGEST, CAP)
        last_res = self._block_base(self.num_chunks - 1) + N_ROUNDS
        ctx.constraint(s[:CAP] - digest, ("row", last_res))


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()
