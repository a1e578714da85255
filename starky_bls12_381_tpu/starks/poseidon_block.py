"""Shared Poseidon-GL12 in-AIR block: layout, fill, constraints.

The recursion-layer chips (PoseidonAir, MerklePathAir, SpongeAir,
TranscriptAir) all prove permutations with the same structure: 30 round
rows + a result row, witness columns factoring the x^7 sbox so every
constraint is degree <= 3 (rate-1 FRI config):

  tmp_i = s_i + rc_i        rc from constant columns (0 on non-round rows)
  w3_i  = tmp_i^3           witness, deg-3, every row (ungated: identities
  w6_i  = w3_i^2            hold on non-round rows too because rc=0 there
  u_0   = w6_0*tmp_0        and the fill writes them from s directly)
  u_i>0 full:    u_i = w6_i*tmp_i   gated by the c_full constant column
        partial: u_i = tmp_i        gated by c_partial
  next s = MDS @ u          gated by c_round on the transition

This module owns the column block [S, W3, W6, U] (4*WIDTH columns at a
base offset) and the constant columns [rc(12), c_round, c_full,
c_partial]; chips add their own boundary/chaining constraints on top.
"""

from __future__ import annotations

import numpy as np

from ..backend import poseidon as ps
from ..fields import goldilocks as gl

N_ROUNDS = ps.N_ROUNDS
WIDTH = ps.WIDTH
ROWS_PER_PERM = N_ROUNDS + 1  # result row doubles as the chaining boundary

# column-block offsets (relative)
S = 0
W3 = WIDTH
W6 = 2 * WIDTH
U = 3 * WIDTH
BLOCK_COLS = 4 * WIDTH

# constant-column offsets (relative)
C_RC = 0
C_ROUND = WIDTH
C_FULL = WIDTH + 1
C_PARTIAL = WIDTH + 2
C_TOTAL = WIDTH + 3

_HALF = ps.N_FULL // 2


def round_is_full(r: int) -> bool:
    return not (_HALF <= r < _HALF + ps.N_PARTIAL)


def write_round_constants(consts: np.ndarray, base_row: int) -> None:
    """Mark one permutation's 30 round rows in the constant matrix."""
    for r in range(N_ROUNDS):
        consts[base_row + r, C_RC : C_RC + WIDTH] = ps._RC_NP[r]
        consts[base_row + r, C_ROUND] = 1
        consts[base_row + r, C_FULL if round_is_full(r) else C_PARTIAL] = 1


def fill_permutation(trace: np.ndarray, base_row: int, state):
    """Fill rounds base_row..base_row+29 and the result row; returns the
    output state (list of ints)."""
    P = gl.P
    s = [int(x) % P for x in state]
    for r in range(N_ROUNDS):
        row = base_row + r
        trace[row, S : S + WIDTH] = s
        tmp = [(s[i] + ps.ROUND_CONSTANTS[r][i]) % P for i in range(WIDTH)]
        u = []
        for i in range(WIDTH):
            w3 = tmp[i] * tmp[i] % P * tmp[i] % P
            w6 = w3 * w3 % P
            trace[row, W3 + i] = w3
            trace[row, W6 + i] = w6
            u.append(w6 * tmp[i] % P if (i == 0 or round_is_full(r)) else tmp[i])
        trace[row, U : U + WIDTH] = u
        s = [sum(ps.MDS[j][i] * u[i] for i in range(WIDTH)) % P for j in range(WIDTH)]
    trace[base_row + N_ROUNDS, S : S + WIDTH] = s
    return s


def fill_nonround_witnesses(trace: np.ndarray, consts: np.ndarray) -> None:
    """Satisfy the ungated witness identities on non-round rows (rc = 0
    there, so w3 = s^3 etc. hold by fill). Vectorized over all rows."""
    rows = np.nonzero(consts[: trace.shape[0], C_ROUND] == 0)[0]
    if rows.shape[0] == 0:
        return
    t = trace[rows, S : S + WIDTH]
    w3 = gl.gl_mul(gl.gl_mul(t, t), t)
    w6 = gl.gl_mul(w3, w3)
    trace[rows[:, None], np.arange(W3, W3 + WIDTH)[None, :]] = w3
    trace[rows[:, None], np.arange(W6, W6 + WIDTH)[None, :]] = w6
    trace[rows, U] = gl.gl_mul(w6[:, 0], t[:, 0])


def permute_record(states: np.ndarray):
    """Batched textbook-form permutation with full witness capture.

    `states`: (B, 12) uint64. Returns `(blocks, out)` where `blocks` is a
    (B, ROWS_PER_PERM, BLOCK_COLS) uint64 tensor holding each permutation
    window's [S | W3 | W6 | U] column block (result row: S only; its
    ungated witness lanes are later satisfied by
    `fill_nonround_witnesses`) and `out` is the (B, 12) output state.
    Bit-identical to `fill_permutation` row by row."""
    xp = gl._xp(states)
    B = states.shape[0]
    blocks = xp.zeros((B, ROWS_PER_PERM, BLOCK_COLS), dtype=xp.uint64)
    s = states
    mds = ps._MDS_NP if xp is np else xp.asarray(ps._MDS_NP)
    rc = ps._RC_NP if xp is np else xp.asarray(ps._RC_NP)
    for r in range(N_ROUNDS):
        tmp = gl.gl_add(s, rc[r][None, :])
        w3 = gl.gl_mul(gl.gl_mul(tmp, tmp), tmp)
        w6 = gl.gl_mul(w3, w3)
        if round_is_full(r):
            u = gl.gl_mul(w6, tmp)
        else:
            u = xp.concatenate([gl.gl_mul(w6[:, :1], tmp[:, :1]), tmp[:, 1:]], axis=1)
        blocks[:, r, S : S + WIDTH] = s
        blocks[:, r, W3 : W3 + WIDTH] = w3
        blocks[:, r, W6 : W6 + WIDTH] = w6
        blocks[:, r, U : U + WIDTH] = u
        # s' = MDS @ u (MDS is symmetric: mds[j, i] == mds[i, j])
        s = gl.gl_sum(gl.gl_mul(u[:, None, :], mds[None, :, :]), axis=-1)
    blocks[:, N_ROUNDS, S : S + WIDTH] = s
    return blocks, s


def scatter_blocks(trace: np.ndarray, base_rows: np.ndarray, blocks: np.ndarray) -> None:
    """Write (B, ROWS_PER_PERM, BLOCK_COLS) permutation windows at
    `base_rows` (B,) into the trace's poseidon block columns. Windows are
    31-row aligned and never overlap, so plain fancy-index assignment is a
    unique-index scatter."""
    rows = (np.asarray(base_rows, dtype=np.int64)[:, None] + np.arange(ROWS_PER_PERM)[None, :]).reshape(-1)
    trace[rows[:, None], np.arange(BLOCK_COLS)[None, :]] = blocks.reshape(-1, BLOCK_COLS)


def eval_block(ctx):
    """Emit the shared permutation constraints; returns (s, s_next) for the
    chip's boundary constraints."""
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
    return s, s_next


def next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()
