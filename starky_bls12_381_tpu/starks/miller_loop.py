"""MillerLoopStark: proves the full Miller loop against public inputs.

Capability-parity with the reference's `miller_loop.rs` (1024 rows, PIs =
Px, Py, 68 ell-coefficient triples, result; layout `:48-63`, fill
`:87-146`, constraints `:180-411`): each of the 68 coefficient blocks (12
rows) computes O1 = c1*Px, O4 = c2*Py, F12' = F12.multiply_by_014(c0, O1,
O4) and F12'^2; the running F12 chains into the next block either squared
(bit-0 step) or unsquared (bit-1 insertion), per the fixed bit schedule of
the BLS x-parameter; the final block's conjugate is bound to the result.

Differences by design (all schedule structure is PUBLIC constant columns):
* no 68 one-hot coefficient-index columns — coefficients bind straight to
  PIs at each block's first row;
* no F12 register — the next block's multiply-by-014 input port is chained
  directly to the current block's output through constant-selector-gated
  boundary constraints;
* degree <= 3 constraints => rate_bits=1 (the reference runs rate 1 here
  too, but with degree-3 selector gating and ~97330 columns; this layout
  is ~25% narrower).
"""

from __future__ import annotations

import numpy as np

from ..backend.air import Air
from ..chips import limbs
from ..chips.core import ChipBuilder, put_rows
from ..chips.fp import RegPinGadget, _rows_of
from ..chips.fp2 import Fp2FpMulGadget
from ..chips.fp6 import Fp6NegGadget, wire_fp2, wire_fp6
from ..chips.fp12 import Fp12MulGadget, Fp12MultiplyBy014Gadget
from ..fields import bls12_381 as bls
from .fp12_mul import fp12_ref_cols, fp12_to_pis

NUM_BLOCKS = 68  # 63 doubling steps + 5 addition steps (SURVEY.md §2.1)


def _block_schedule():
    """Per-block (bitone, i) mirroring fill_trace_miller_loop's control flow
    (miller_loop.rs:95-137): bitone marks blocks that consume the extra
    coefficient of a set bit (no squaring carried into them)."""
    sched = []
    i = bls.BLS_X_BITS - 2
    bitone = False
    for j in range(NUM_BLOCKS):
        sched.append((bitone, i))
        if (bls.BLS_X >> i) & 1 and not bitone:
            bitone = True
        elif j < NUM_BLOCKS - 1:
            i -= 1
            bitone = False
    assert i == 0
    return sched


def _ref12_colmat(ref12):
    """Fp12Ref -> (12, 12) column index matrix."""
    return np.asarray([[c + k for k in range(12)] for c in fp12_ref_cols(ref12)])


class MillerLoopAir(Air):
    num_rows = 1024

    PIS_PX = 0
    PIS_PY = 12
    PIS_ELL = 24

    def __init__(self, num_blocks: int = NUM_BLOCKS):
        """Default: the full 68-block Miller loop (miller_loop.rs:87-146).
        A smaller `num_blocks` builds a truncated-schedule variant through
        the identical gadgets/wiring on a small row count, so CI can
        prove+verify this air fast (the full air proves under RUN_SLOW
        and in the TPU bench)."""
        self.nb = num_blocks
        self.PIS_RES = 24 + num_blocks * 72
        self.num_pis = self.PIS_RES + 144
        if num_blocks != NUM_BLOCKS:
            self.num_rows = 1 << max(5, (12 * num_blocks - 1).bit_length())
        cb = ChipBuilder(self.num_rows)
        self.cb = cb
        self.schedule = _block_schedule()[:num_blocks]
        row0s = [12 * j for j in range(num_blocks)]
        self.row0s = row0s
        last_r11 = 12 * (num_blocks - 1) + 11

        # Px / Py registers, constant across the active region
        self.px = cb.wit.take(12)
        self.py = cb.wit.take(12)
        active_rows = frozenset(range(12 * num_blocks - 1))
        RegPinGadget(cb, self.px, 12, active_rows)
        RegPinGadget(cb, self.py, 12, active_rows)
        cb.bind_pi({0}, self.px, self.PIS_PX, 12)
        cb.bind_pi({0}, self.py, self.PIS_PY, 12)

        r11s = _rows_of(row0s, 11)
        self.o1 = Fp2FpMulGadget(cb, row0s)  # ell[1] * Px
        self.o4 = Fp2FpMulGadget(cb, row0s)  # ell[2] * Py
        cb.wire(r11s, self.o1.s, self.px, 12)
        cb.wire(r11s, self.o4.s, self.py, 12)
        self.mul014 = Fp12MultiplyBy014Gadget(cb, row0s)
        wire_fp2(cb, r11s, self.mul014.o1, (self.o1.c0, self.o1.c1))
        wire_fp2(cb, r11s, self.mul014.o4, (self.o4.c0, self.o4.c1))
        self.sq = Fp12MulGadget(cb, row0s)
        for d, s in zip(fp12_ref_cols(self.sq.a) + fp12_ref_cols(self.sq.b),
                        fp12_ref_cols(self.mul014.out) * 2):
            cb.wire(r11s, d, s, 12)

        # per-block coefficient PI bindings (a0/a1 of O1, O4 and o0 of 014)
        for j in range(num_blocks):
            base = self.PIS_ELL + 72 * j
            cb.bind_pi({12 * j}, self.mul014.o0[0], base, 12)
            cb.bind_pi({12 * j}, self.mul014.o0[1], base + 12, 12)
            cb.bind_pi({12 * j}, self.o1.a0, base + 24, 12)
            cb.bind_pi({12 * j}, self.o1.a1, base + 36, 12)
            cb.bind_pi({12 * j}, self.o4.a0, base + 48, 12)
            cb.bind_pi({12 * j}, self.o4.a1, base + 60, 12)

        # first block starts from F12 = 1
        one_limbs = fp12_to_pis(bls.FP12_ONE)
        for k, col in enumerate(fp12_ref_cols(self.mul014.a)):
            cb.bind_const({0}, col, one_limbs[12 * k : 12 * (k + 1)])

        # boundary chaining: next block's F12 input = mul014 out (bit-1
        # continuation) or square out (bit advance)
        rows_b1 = frozenset(
            12 * j + 11 for j in range(num_blocks - 1) if self.schedule[j + 1][0]
        )
        rows_sq = frozenset(
            12 * j + 11 for j in range(num_blocks - 1) if not self.schedule[j + 1][0]
        )
        self.sel_b1 = cb.indicator(rows_b1)
        self.sel_sq = cb.indicator(rows_sq)
        self._a_cols = _ref12_colmat(self.mul014.a)
        self._out014_cols = _ref12_colmat(self.mul014.out)
        self._outsq_cols = _ref12_colmat(self.sq.out)

        # result: conjugate of the final mul014 output, bound to PIs
        self.neg = Fp6NegGadget(cb, {last_r11})
        wire_fp6(cb, {last_r11}, self.neg.a, self.mul014.out[1])
        for k, ref in enumerate(self.mul014.out[0]):
            cb.bind_pi({last_r11}, ref[0], self.PIS_RES + 24 * k, 12)
            cb.bind_pi({last_r11}, ref[1], self.PIS_RES + 24 * k + 12, 12)
        for k, pair in enumerate(self.neg.out):
            cb.bind_pi({last_r11}, pair[0], self.PIS_RES + 72 + 24 * k, 12)
            cb.bind_pi({last_r11}, pair[1], self.PIS_RES + 72 + 24 * k + 12, 12)

        cb.finalize_wiring_patterns()
        self._const = cb.build_const_matrix()
        self.num_cols = cb.wit.n

    def constant_columns(self):
        return self._const

    def eval(self, ctx):
        self.cb.eval_all(ctx)
        a_next = ctx.next_g(self._a_cols)
        sel_b1 = ctx.const(self.sel_b1)
        sel_sq = ctx.const(self.sel_sq)
        ctx.constraint(sel_b1 * (a_next - ctx.local_g(self._out014_cols)))
        ctx.constraint(sel_sq * (a_next - ctx.local_g(self._outsq_cols)))

    # -- trace generation ----------------------------------------------
    def generate_trace(self, px: int, py: int, ell_coeffs, device: bool = False):
        """px, py: G1 point; ell_coeffs: 68 [c0, c1, c2] Fp2 triples.
        Returns (trace, pis)."""
        assert len(ell_coeffs) == self.nb
        from ..chips.core import FillRecorder

        trace = FillRecorder(self.num_rows, self.num_cols)
        put_rows(trace, 0, self.px,
                 np.broadcast_to(limbs.to_limbs(px), (12 * self.nb, 12)))
        put_rows(trace, 0, self.py,
                 np.broadcast_to(limbs.to_limbs(py), (12 * self.nb, 12)))
        f12 = bls.FP12_ONE
        for j, e in enumerate(ell_coeffs):
            r0 = 12 * j
            o1v = self.o1.fill(trace, r0, e[1], px)
            o4v = self.o4.fill(trace, r0, e[2], py)
            f12 = self.mul014.fill(trace, r0, f12, e[0], o1v, o4v)
            sqv = self.sq.fill(trace, r0, f12, f12)
            if j < self.nb - 1 and not self.schedule[j + 1][0]:
                f12 = sqv
        assert all(x != 0 for fp2 in f12[1] for x in fp2), "zero c1 component"
        self.neg.fill(trace, 12 * (self.nb - 1) + 11, f12[1])
        res = bls.fp12_conjugate(f12)
        pis = (
            [int(x) for x in limbs.to_limbs(px)]
            + [int(x) for x in limbs.to_limbs(py)]
            + [int(x) for e in ell_coeffs for c in e for fp in c for x in limbs.to_limbs(fp)]
            + fp12_to_pis(res)
        )
        from ..chips.core import finish_trace

        return finish_trace(self, trace, device), pis
