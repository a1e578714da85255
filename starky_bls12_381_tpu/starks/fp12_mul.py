"""FP12MulStark: proves one Fp12 multiplication against public inputs.

Capability-parity with the reference's `fp12_mul.rs` (16 rows; PIs = X, Y,
OUT as 144 u32 limbs each, `fp12_mul.rs:24-27`; PI binding gated on the
mul window, `:70-97`). Differences by design: selectors are public constant
columns (the reference's FP12_MUL_SELECTOR_OFFSET is unconstrained witness)
and the constraint system is degree <= 3, so this stark runs at
rate_bits=1 (the reference uses the default config here too).
"""

from __future__ import annotations

import numpy as np

from ..backend.air import Air
from ..chips import limbs
from ..chips.core import ChipBuilder
from ..chips.fp12 import Fp12MulGadget

NUM_ROWS = 16


def fp12_iter(v):
    """Flatten an Fp12 value into 12 Fp ints (c0 first, fp2-major order)."""
    for fp6 in v:
        for fp2 in fp6:
            yield fp2[0]
            yield fp2[1]


def fp12_to_pis(v):
    out = []
    for fp in fp12_iter(v):
        out.extend(int(x) for x in limbs.to_limbs(fp))
    return out


def fp12_ref_cols(ref):
    """Flatten an Fp12Ref into 12 column offsets (same order as fp12_iter)."""
    cols = []
    for fp6 in ref:
        for fp2 in fp6:
            cols.extend([fp2[0], fp2[1]])
    return cols


class FP12MulAir(Air):
    num_rows = NUM_ROWS
    num_pis = 3 * 144  # X, Y, OUT

    PIS_X = 0
    PIS_Y = 144
    PIS_OUT = 288

    def __init__(self):
        cb = ChipBuilder(self.num_rows)
        self.cb = cb
        self.mul = Fp12MulGadget(cb, [0])
        # bind inputs at row 0 (registers pinned across the window) and the
        # output at row 11 (where the single-row tail ops live)
        for k, col in enumerate(fp12_ref_cols(self.mul.a)):
            cb.bind_pi({0}, col, self.PIS_X + 12 * k, 12)
        for k, col in enumerate(fp12_ref_cols(self.mul.b)):
            cb.bind_pi({0}, col, self.PIS_Y + 12 * k, 12)
        for k, col in enumerate(fp12_ref_cols(self.mul.out)):
            cb.bind_pi({11}, col, self.PIS_OUT + 12 * k, 12)
        cb.finalize_wiring_patterns()
        self._const = cb.build_const_matrix()
        self.num_cols = cb.wit.n

    def constant_columns(self):
        return self._const

    def eval(self, ctx):
        self.cb.eval_all(ctx)

    # -- trace generation ----------------------------------------------
    def generate_trace(self, x, y, device: bool = False):
        """x, y: Fp12 values (nested tuples). Returns (trace, pis)."""
        from ..chips.core import FillRecorder

        trace = FillRecorder(self.num_rows, self.num_cols)
        out = self.mul.fill(trace, 0, x, y)
        pis = fp12_to_pis(x) + fp12_to_pis(y) + fp12_to_pis(out)
        from ..chips.core import finish_trace

        return finish_trace(self, trace, device), pis
