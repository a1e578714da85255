"""Transcript AIR: replays a Fiat-Shamir duplex schedule in-STARK.

Fifth chip of the recursive-verification layer: proves that a sequence of
Poseidon duplex operations — exactly the backend Challenger's protocol
(backend/challenger.py: overwrite absorbs of <=RATE elements, squeezes
popping from the end of the rate window) — maps the observed values to
the claimed challenges. The schedule is part of the AIR instance, i.e.
public protocol structure, so lane selection is STATIC per block: no
selector columns, just per-block row-filter constraints.

Each schedule entry is one duplex permutation, written (k, m):
  k (0..RATE) — elements absorbed into lanes 0..k before the permute
                (k=0 is the empty-buffer duplex of Challenger._duplex);
                lanes k..12 carry over from the previous block's result
  m (0..RATE) — challenges read from the permute's result, popped from
                the END of the rate window: lanes RATE-1, RATE-2, ...
                (Challenger.get_challenge pops output_buf)

This covers every Challenger behavior: a full 8-element chunk flush is
(8, 0); a partial absorb folded into a challenge request is (k, m) in a
single permute, exactly like Challenger._duplex; consecutive pops from
one buffer are a single block's m > 1.

PIs: absorbed elements (schedule order) then squeezed challenges
(schedule order). Shared permutation structure/constraints:
poseidon_block.py (32 rows per permutation, degree <= 3, rate-1 config).
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
ROWS_PER_PERM = pb.ROWS_PER_PERM

S = pb.S
TOTAL_COLS = pb.BLOCK_COLS
C_TOTAL = pb.C_TOTAL


class TranscriptAir(Air):
    """One duplex permutation per (k_absorb, m_squeeze) schedule entry."""

    def __init__(self, schedule):
        self.schedule = [(int(k), int(m)) for k, m in schedule]
        assert self.schedule, "empty schedule"
        for k, m in self.schedule:
            assert 0 <= k <= RATE and 0 <= m <= RATE
        self.num_blocks = len(self.schedule)
        self.num_rows = pb.next_pow2(ROWS_PER_PERM * self.num_blocks + 1)
        self.num_cols = TOTAL_COLS
        self.n_absorbed = sum(k for k, _m in self.schedule)
        self.n_squeezed = sum(m for _k, m in self.schedule)
        self.PIS_ABSORBED = 0
        self.PIS_SQUEEZED = self.n_absorbed
        self.num_pis = self.n_absorbed + self.n_squeezed

    def _block_base(self, b: int) -> int:
        return ROWS_PER_PERM * b

    def constant_columns(self):
        out = np.zeros((self.num_rows, C_TOTAL), dtype=np.uint64)
        for b in range(self.num_blocks):
            pb.write_round_constants(out, self._block_base(b))
        return out

    # -- trace ------------------------------------------------------------
    def generate_trace(self, absorbed):
        """absorbed: the n_absorbed observed elements, in schedule order.
        Returns (trace, pis) with the squeezed challenges computed."""
        P = gl.P
        vals = [int(x) % P for x in absorbed]
        assert len(vals) == self.n_absorbed
        trace = np.zeros((self.num_rows, TOTAL_COLS), dtype=np.uint64)
        consts = self.constant_columns()
        state = [0] * WIDTH
        ai = 0
        squeezed = []
        for b, (k, m) in enumerate(self.schedule):
            if k:
                state = vals[ai : ai + k] + state[k:]
                ai += k
            state = pb.fill_permutation(trace, self._block_base(b), state)
            squeezed.extend(state[RATE - 1 - j] for j in range(m))
        pb.fill_nonround_witnesses(trace, consts)
        return trace, vals + squeezed

    # -- constraints -------------------------------------------------------
    def eval(self, ctx):
        s, _s_next = pb.eval_block(ctx)

        ai = 0
        si = 0
        for b, (k, m) in enumerate(self.schedule):
            base = self._block_base(b)
            if k:
                chunk = ctx.pi(self.PIS_ABSORBED + ai, k)
                ctx.constraint(s[:k] - chunk, ("row", base))
                ai += k
            if b == 0:
                if k < WIDTH:
                    ctx.constraint(s[k:], ("row", 0))
            elif k < WIDTH:
                # carried lanes k..12: next block's input (row base = one
                # past the previous result row base-1) equals the result
                ctx.constraint(
                    ctx.next(S + k, WIDTH - k) - ctx.local(S + k, WIDTH - k), ("row", base - 1)
                )
            res_row = base + pb.RESULT_OFF
            for j in range(m):
                pi = ctx.pi(self.PIS_SQUEEZED + si + j)
                ctx.constraint(ctx.local(S + RATE - 1 - j) - pi, ("row", res_row))
            si += m


def schedule_and_inputs_from_events(events):
    """Translate a Challenger event log into (schedule, absorbed_elements).

    events: sequence of ("observe", [values...]) / ("challenge", count)
    exactly as the protocol executes them. Mirrors Challenger's buffering:
    observes accumulate; every full RATE chunk flushes as a (8, 0) block;
    a challenge request flushes the partial buffer (k, m) — or (0, m) with
    an empty buffer — and consecutive challenge requests drain the same
    output buffer (merged into the open block's m while it lasts).
    """
    schedule: list[tuple[int, int]] = []
    absorbed: list[int] = []
    buf: list[int] = []
    avail = 0  # challenges poppable from the open output buffer
    for kind, payload in events:
        if kind == "observe":
            vals = [int(v) for v in payload]
            avail = 0
            for v in vals:
                buf.append(v)
                if len(buf) == RATE:
                    absorbed.extend(buf)
                    schedule.append((RATE, 0))
                    buf = []
        elif kind == "challenge":
            need = int(payload)
            while need:
                if avail == 0:
                    k = len(buf)
                    absorbed.extend(buf)
                    schedule.append((k, 0))
                    buf = []
                    avail = RATE
                take = min(need, avail)
                k, m = schedule[-1]
                schedule[-1] = (k, m + take)
                avail -= take
                need -= take
        else:
            raise ValueError(kind)
    return schedule, absorbed
