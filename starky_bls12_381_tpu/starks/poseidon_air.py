"""Poseidon-permutation AIR: proves batches of backend-hash permutations.

This is the foundation of the recursive-verification layer (the reference
wraps each STARK in a plonky2 SNARK whose dominant cost is re-hashing
Merkle paths and the Fiat-Shamir transcript in-circuit,
aggregate_proof.rs:417-451). A recursive STARK verifier needs the backend's
own hash — Poseidon-GL12 (backend/poseidon.py) — provable inside an AIR;
this chip provides exactly that: N permutations per trace, one round per
row, 32-row blocks (30 rounds + result row + pad), inputs/outputs bound to
public inputs.

Degree discipline (rate_bits=1 => max constraint degree 3):
  tmp_i = s_i + rc_i            (rc from constant columns; 0 on non-round
                                 rows so the witness identities below hold
                                 everywhere and need no gating)
  w3_i  = tmp_i^3               witness, deg-3, every row
  w6_i  = w3_i^2                witness, deg-2, every row
  u_0   = w6_0*tmp_0            lane 0 is sboxed in every round, deg-2
  u_i   (i>0): c_full*(u_i - w6_i*tmp_i) and c_partial*(u_i - tmp_i),
        where c_full / c_partial are precombined 0/1 CONSTANT columns
        (round-active AND full / partial) so each gate adds only degree 1
  next s = MDS @ u              gated by c_round (deg 2, transition)

The x^7 sbox factored through witness columns keeps every constraint at
degree <= 3, so the same rate-1 FRI config as the five BLS starks applies.
"""

from __future__ import annotations

import numpy as np

from ..backend import poseidon as ps
from ..backend.air import Air
from ..fields import goldilocks as gl

ROWS_PER_PERM = 32  # 30 round-transition rows + result row + 1 pad row
N_ROUNDS = ps.N_ROUNDS
WIDTH = ps.WIDTH

# trace column layout
S = 0  # state, 12 cols
W3 = WIDTH  # tmp^3 witnesses, 12 cols
W6 = 2 * WIDTH  # w3^2 witnesses, 12 cols
U = 3 * WIDTH  # sbox outputs, 12 cols
TOTAL_COLS = 4 * WIDTH

# constant columns: rc[12], c_round, c_full, c_partial
C_RC = 0
C_ROUND = WIDTH
C_FULL = WIDTH + 1
C_PARTIAL = WIDTH + 2
C_TOTAL = WIDTH + 3

_HALF = ps.N_FULL // 2


def _round_is_full(r: int) -> bool:
    return not (_HALF <= r < _HALF + ps.N_PARTIAL)


class PoseidonAir(Air):
    """num_perms Poseidon-GL12 permutations; PIs = [in(12) out(12)] each."""

    def __init__(self, num_perms: int = 8):
        self.num_perms = num_perms
        self.num_rows = max(64, _next_pow2(num_perms * ROWS_PER_PERM))
        self.num_cols = TOTAL_COLS
        self.num_pis = num_perms * 2 * WIDTH

    # -- constant schedule ------------------------------------------------
    def constant_columns(self):
        out = np.zeros((self.num_rows, C_TOTAL), dtype=np.uint64)
        for p in range(self.num_perms):
            base = p * ROWS_PER_PERM
            for r in range(N_ROUNDS):
                out[base + r, C_RC : C_RC + WIDTH] = ps._RC_NP[r]
                out[base + r, C_ROUND] = 1
                out[base + r, C_FULL if _round_is_full(r) else C_PARTIAL] = 1
        return out

    # -- trace ------------------------------------------------------------
    def generate_trace(self, inputs):
        """inputs: list of num_perms states (each 12 ints) -> (trace, pis)."""
        assert len(inputs) == self.num_perms
        trace = np.zeros((self.num_rows, TOTAL_COLS), dtype=np.uint64)
        pis = []
        P = gl.P
        consts = self.constant_columns()
        for p, state in enumerate(inputs):
            base = p * ROWS_PER_PERM
            s = [int(x) % P for x in state]
            pis.extend(s)
            for r in range(N_ROUNDS):
                row = base + r
                trace[row, S : S + WIDTH] = s
                tmp = [(s[i] + ps.ROUND_CONSTANTS[r][i]) % P for i in range(WIDTH)]
                u = []
                for i in range(WIDTH):
                    w3 = tmp[i] * tmp[i] % P * tmp[i] % P
                    w6 = w3 * w3 % P
                    trace[row, W3 + i] = w3
                    trace[row, W6 + i] = w6
                    if i == 0 or _round_is_full(r):
                        u.append(w6 * tmp[i] % P)
                    else:
                        u.append(tmp[i])
                trace[row, U : U + WIDTH] = u
                s = [sum(ps.MDS[j][i] * u[i] for i in range(WIDTH)) % P for j in range(WIDTH)]
            res_row = base + N_ROUNDS
            trace[res_row, S : S + WIDTH] = s
            pis.extend(s)
            expect = ps.permute_s([int(x) % P for x in inputs[p]])
            assert s == [int(x) for x in expect], "poseidon trace fill mismatch"
        # witness identities are ungated: fill w3/w6/u0 on non-round rows too
        for row in range(self.num_rows):
            if consts[row, C_ROUND]:
                continue
            for i in range(WIDTH):
                t = int(trace[row, S + i])  # rc is 0 here
                w3 = t * t % P * t % P
                w6 = w3 * w3 % P
                trace[row, W3 + i] = w3
                trace[row, W6 + i] = w6
                if i == 0:
                    trace[row, U] = w6 * t % P
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

        tmp = s + rc
        # witness well-formedness: ungated (rc = 0 on non-round rows, so
        # the identities hold everywhere by fill)
        ctx.constraint(w3 - tmp * tmp * tmp)
        ctx.constraint(w6 - w3 * w3)
        ctx.constraint(u[0] - w6[0] * tmp[0])
        # lanes >0: full rounds sbox, partial rounds pass through
        ctx.constraint(c_full[None] * (u[1:] - w6[1:] * tmp[1:]))
        ctx.constraint(c_partial[None] * (u[1:] - tmp[1:]))
        # MDS transition
        mds = ctx.lift(np.asarray(ps.MDS, dtype=np.uint64))  # (12, 12)
        acc = None
        for i in range(WIDTH):
            term = mds[:, i] * u[i][None]
            acc = term if acc is None else acc + term
        ctx.constraint_transition(c_round[None] * (s_next - acc))
        # PI binding
        for p in range(self.num_perms):
            base = p * ROWS_PER_PERM
            pin = ctx.pi(p * 2 * WIDTH, WIDTH)
            pout = ctx.pi(p * 2 * WIDTH + WIDTH, WIDTH)
            ctx.constraint(s - pin, ("row", base))
            ctx.constraint(s - pout, ("row", base + N_ROUNDS))


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()
