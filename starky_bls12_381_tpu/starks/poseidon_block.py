"""Shared Poseidon2-GL12 in-AIR block: layout, fill, constraints.

The recursion-layer chips (PoseidonAir, MerklePathAir, SpongeAir,
TranscriptAir, RecursiveVerifierAir) all prove permutations with the same
structure — a 32-row window per permutation:

  row 0         PRE row: S holds the RAW input state (absorb chunks,
                digest pairs, carried capacity lanes — everything the
                chips' wiring constraints read stays untransformed here);
                the transition applies the initial external layer
                  next s = M_E @ s            gated by c_pre
  rows 1..30    round rows, witness columns factoring the x^7 sbox so
                every constraint is degree <= 3 (rate-1 FRI config):
                  tmp_i = s_i + rc_i    rc from constant columns (0 on
                  w3_i  = tmp_i^3       non-round rows; internal rounds
                  w6_i  = w3_i^2        only carry rc_0 per the spec)
                  u_0   = w6_0*tmp_0    witness identities ungated (they
                                        hold on non-round rows: rc=0 and
                                        the fill writes them from s)
                  full:     u_i = w6_i*tmp_i   gated by c_full
                  internal: u_i = tmp_i        gated by c_partial
                  next s = M_E @ u             gated by c_full
                  next s = M_I @ u             gated by c_partial
  row 31        result row: S = output (doubles as chaining boundary)

This module owns the column block [S, W3, W6, U] (4*WIDTH columns at a
base offset) and the constant columns [rc(12), c_round, c_full,
c_partial, c_pre]; chips add their own boundary/chaining constraints on
top. Windows are laid back-to-back, so a window's pre row is one past the
previous window's result row — the `base - 1` chaining idiom the chips
use is unchanged from the classic-Poseidon layout.
"""

from __future__ import annotations

import numpy as np

from ..backend import poseidon as ps
from ..fields import goldilocks as gl

N_ROUNDS = ps.N_ROUNDS
WIDTH = ps.WIDTH
ROWS_PER_PERM = N_ROUNDS + 2  # pre row + 30 round rows + result row
RESULT_OFF = N_ROUNDS + 1  # result-row offset within a window

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
C_PRE = WIDTH + 3
C_TOTAL = WIDTH + 4

round_is_full = ps.round_is_full


def write_round_constants(consts: np.ndarray, base_row: int) -> None:
    """Mark one permutation window's pre + 30 round rows."""
    consts[base_row, C_PRE] = 1
    for r in range(N_ROUNDS):
        row = base_row + 1 + r
        consts[row, C_RC : C_RC + WIDTH] = ps._RC_NP[r]
        consts[row, C_ROUND] = 1
        consts[row, C_FULL if round_is_full(r) else C_PARTIAL] = 1


def perm_const_template() -> np.ndarray:
    """One window's (ROWS_PER_PERM, C_TOTAL) constant template (for
    vectorized tiling over many windows)."""
    tpl = np.zeros((ROWS_PER_PERM, C_TOTAL), dtype=np.uint64)
    write_round_constants(tpl, 0)
    return tpl


def fill_permutation(trace: np.ndarray, base_row: int, state):
    """Fill one window (pre row, rounds, result row); returns the output
    state (list of ints)."""
    P = gl.P
    s = [int(x) % P for x in state]
    trace[base_row, S : S + WIDTH] = s  # pre row: raw input
    s = ps._mat_s(ps.M_EXTERNAL, s)
    for r in range(N_ROUNDS):
        row = base_row + 1 + r
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
        s = ps._mat_s(ps.M_EXTERNAL if round_is_full(r) else ps.M_INTERNAL, u)
    trace[base_row + RESULT_OFF, S : S + WIDTH] = s
    return s


def fill_nonround_witnesses(trace: np.ndarray, consts: np.ndarray) -> None:
    """Satisfy the ungated witness identities on non-round rows (pre,
    result, padding: rc = 0 there, so w3 = s^3 etc. hold by fill).
    Vectorized over all rows."""
    rows = np.nonzero(consts[: trace.shape[0], C_ROUND] == 0)[0]
    if rows.shape[0] == 0:
        return
    t = trace[rows, S : S + WIDTH]
    w3 = gl.gl_mul(gl.gl_sqr(t), t)
    w6 = gl.gl_sqr(w3)
    trace[rows[:, None], np.arange(W3, W3 + WIDTH)[None, :]] = w3
    trace[rows[:, None], np.arange(W6, W6 + WIDTH)[None, :]] = w6
    trace[rows, U] = gl.gl_mul(w6[:, 0], t[:, 0])


def permute_record(states: np.ndarray):
    """Batched permutation with full witness capture.

    `states`: (B, 12) uint64. Returns `(blocks, out)` where `blocks` is a
    (B, ROWS_PER_PERM, BLOCK_COLS) uint64 tensor holding each window's
    [S | W3 | W6 | U] column block (pre/result rows: S only; their
    ungated witness lanes are later satisfied by
    `fill_nonround_witnesses`) and `out` is the (B, 12) output state.
    Bit-identical to `fill_permutation` row by row."""
    xp = gl._xp(states)
    B = states.shape[0]
    if xp is np and B >= 32:
        # host bulk fill: the native witness-recording kernel is ~100x the
        # numpy per-round path (the recursive wrap's fill hot loop)
        from ..backend import poseidon_native as pn

        if pn.available():
            return pn.permute_record_batch(states, ROWS_PER_PERM, BLOCK_COLS, S, W3, W6, U)
    blocks = xp.zeros((B, ROWS_PER_PERM, BLOCK_COLS), dtype=xp.uint64)
    blocks[:, 0, S : S + WIDTH] = states  # pre row: raw input
    rc = ps._RC_NP if xp is np else xp.asarray(ps._RC_NP)
    s = ps._external_layer(states, xp)
    for r in range(N_ROUNDS):
        tmp = gl.gl_add(s, rc[r][None, :])
        w3 = gl.gl_mul(gl.gl_mul(tmp, tmp), tmp)
        w6 = gl.gl_mul(w3, w3)
        if round_is_full(r):
            u = gl.gl_mul(w6, tmp)
        else:
            u = xp.concatenate([gl.gl_mul(w6[:, :1], tmp[:, :1]), tmp[:, 1:]], axis=1)
        row = 1 + r
        blocks[:, row, S : S + WIDTH] = s
        blocks[:, row, W3 : W3 + WIDTH] = w3
        blocks[:, row, W6 : W6 + WIDTH] = w6
        blocks[:, row, U : U + WIDTH] = u
        s = (ps._external_layer if round_is_full(r) else ps._internal_layer)(u, xp)
    blocks[:, RESULT_OFF, S : S + WIDTH] = s
    return blocks, s


def scatter_blocks(trace: np.ndarray, base_rows: np.ndarray, blocks: np.ndarray) -> None:
    """Write (B, ROWS_PER_PERM, BLOCK_COLS) permutation windows at
    `base_rows` (B,) into the trace's poseidon block columns. Windows are
    32-row aligned and never overlap, so plain fancy-index assignment is a
    unique-index scatter."""
    rows = (np.asarray(base_rows, dtype=np.int64)[:, None] + np.arange(ROWS_PER_PERM)[None, :]).reshape(-1)
    trace[rows[:, None], np.arange(BLOCK_COLS)[None, :]] = blocks.reshape(-1, BLOCK_COLS)


def _mat_emit(ctx, mat: np.ndarray, vec):
    """Emit sum_i mat[:, i] * vec[i] over the ctx algebra."""
    m = ctx.lift(np.asarray(mat, dtype=np.uint64))
    acc = None
    for i in range(WIDTH):
        term = m[:, i] * vec[i][None]
        acc = term if acc is None else acc + term
    return acc


def eval_block(ctx):
    """Emit the shared permutation constraints; returns (s, s_next) for the
    chip's boundary constraints."""
    s = ctx.local(S, WIDTH)
    s_next = ctx.next(S, WIDTH)
    w3 = ctx.local(W3, WIDTH)
    w6 = ctx.local(W6, WIDTH)
    u = ctx.local(U, WIDTH)
    rc = ctx.const(C_RC, WIDTH)
    c_full = ctx.const(C_FULL)
    c_partial = ctx.const(C_PARTIAL)
    c_pre = ctx.const(C_PRE)

    tmp = s + rc
    ctx.constraint(w3 - tmp * tmp * tmp)
    ctx.constraint(w6 - w3 * w3)
    ctx.constraint(u[0] - w6[0] * tmp[0])
    ctx.constraint(c_full[None] * (u[1:] - w6[1:] * tmp[1:]))
    ctx.constraint(c_partial[None] * (u[1:] - tmp[1:]))
    # three gated linear-layer transitions (each degree 2)
    ctx.constraint_transition(c_pre[None] * (s_next - _mat_emit(ctx, ps._ME_NP, s)))
    ctx.constraint_transition(c_full[None] * (s_next - _mat_emit(ctx, ps._ME_NP, u)))
    ctx.constraint_transition(c_partial[None] * (s_next - _mat_emit(ctx, ps._MI_NP, u)))
    return s, s_next


def next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()
