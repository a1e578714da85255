"""Fp12 gadgets: arithmetic over Fp6[w]/(w^2 - v) as Fp6 column pairs.

Capability-parity with the reference's `fp12.rs` (multiplication layout
`:30-42`, fill `:186`, constraints `:1025-1552`). Witnesses the exact
t0..t6 chain of native.rs:1009-1027.

    Fp12Ref = (Fp6Ref, Fp6Ref)
"""

from __future__ import annotations

from ..fields import bls12_381 as bls
from .core import ChipBuilder
from .fp import _rows_of
from .fp6 import (
    Fp6AddGadget,
    Fp6MulGadget,
    Fp6NonResidueGadget,
    Fp6SubGadget,
    wire_fp6,
)


class Fp12MulGadget:
    """Fp12 x Fp12 (native.rs:1009-1027): t0 = a0*b0, t1 = a1*b1,
    x = t0 + v*t1, y = (a0+a1)(b0+b1) - t0 - t1.

    Ports: `a` / `b` Fp12Refs (wire sources to them); output `out`."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.cb = cb
        self.row0s = list(row0s)
        r11 = _rows_of(self.row0s, 11)
        self.t0 = Fp6MulGadget(cb, row0s)
        self.t1 = Fp6MulGadget(cb, row0s)
        self.t2 = Fp6NonResidueGadget(cb, r11)
        self.x_out = Fp6AddGadget(cb, r11)
        self.t3 = Fp6AddGadget(cb, r11)
        self.t4 = Fp6AddGadget(cb, r11)
        self.t5 = Fp6MulGadget(cb, row0s)
        self.t6 = Fp6SubGadget(cb, r11)
        self.y_out = Fp6SubGadget(cb, r11)

        self.a = (self.t0.a, self.t1.a)
        self.b = (self.t0.b, self.t1.b)
        a0, a1 = self.a
        b0, b1 = self.b
        # t2 = v * t1 ; x = t0 + t2
        cb.wire(r11, self.t2.a2[0], self.t1.out[2][0], 12)
        cb.wire(r11, self.t2.a2[1], self.t1.out[2][1], 12)
        t2_out = self.t2.out(self.t1.out)
        wire_fp6(cb, r11, self.x_out.a, self.t0.out)
        wire_fp6(cb, r11, self.x_out.b, t2_out)
        # t3 = a0 + a1 ; t4 = b0 + b1 ; t5 = t3 * t4
        wire_fp6(cb, r11, self.t3.a, a0)
        wire_fp6(cb, r11, self.t3.b, a1)
        wire_fp6(cb, r11, self.t4.a, b0)
        wire_fp6(cb, r11, self.t4.b, b1)
        wire_fp6(cb, r11, self.t5.a, self.t3.out)
        wire_fp6(cb, r11, self.t5.b, self.t4.out)
        # t6 = t5 - t0 ; y = t6 - t1
        wire_fp6(cb, r11, self.t6.a, self.t5.out)
        wire_fp6(cb, r11, self.t6.b, self.t0.out)
        wire_fp6(cb, r11, self.y_out.a, self.t6.out)
        wire_fp6(cb, r11, self.y_out.b, self.t1.out)

        self.out = (self.x_out.out, self.y_out.out)
        self._subs = [
            self.t0, self.t1, self.t2, self.x_out, self.t3, self.t4, self.t5,
            self.t6, self.y_out,
        ]

    def fill(self, trace, row0, a, b):
        c0, c1 = a
        r0, r1 = b
        r11 = row0 + 11
        t0 = self.t0.fill(trace, row0, c0, r0)
        t1 = self.t1.fill(trace, row0, c1, r1)
        t2 = self.t2.fill(trace, r11, t1)
        x = self.x_out.fill(trace, r11, t0, t2)
        t3 = self.t3.fill(trace, r11, c0, c1)
        t4 = self.t4.fill(trace, r11, r0, r1)
        t5 = self.t5.fill(trace, row0, t3, t4)
        t6 = self.t6.fill(trace, r11, t5, t0)
        y = self.y_out.fill(trace, r11, t6, t1)
        out = (x, y)
        assert out == bls.fp12_mul(a, b)
        return out


class Fp12MultiplyBy014Gadget:
    """Sparse Fp12 multiplication by (o0, o1, 0, 0, o4, 0) — the Miller
    loop line-function update (native.rs:1225-1241, fp12.rs:10-24).
    Ports: a (Fp12Ref), o0/o1/o4 (Fp2Refs); output `out` (Fp12Ref)."""

    def __init__(self, cb: ChipBuilder, row0s):
        from .fp import _rows_of
        from .fp2 import Fp2AddReduceGadget
        from .fp6 import (
            Fp6MultiplyBy01Gadget,
            Fp6MultiplyBy1Gadget,
            wire_fp2,
        )

        self.cb = cb
        r11 = _rows_of(list(row0s), 11)
        self.t0 = Fp6MultiplyBy01Gadget(cb, row0s)  # c0 * (o0, o1)
        self.t1 = Fp6MultiplyBy1Gadget(cb, row0s)  # c1 * o4
        self.t2 = Fp6NonResidueGadget(cb, r11)
        self.x_out = Fp6AddGadget(cb, r11)
        self.t3 = Fp6AddGadget(cb, r11)  # c1 + c0
        self.t4 = Fp2AddReduceGadget(cb, r11)  # o1 + o4
        self.t5 = Fp6MultiplyBy01Gadget(cb, row0s)  # t3 * (o0, t4)
        self.t6 = Fp6SubGadget(cb, r11)
        self.y_out = Fp6SubGadget(cb, r11)

        self.a = (self.t0.c, self.t1.c)
        self.o0 = self.t0.b0
        self.o1 = self.t0.b1
        self.o4 = self.t1.b1
        c0, c1 = self.a
        # t2 = v * t1 ; x = t2 + t0
        cb.wire(r11, self.t2.a2[0], self.t1.out[2][0], 12)
        cb.wire(r11, self.t2.a2[1], self.t1.out[2][1], 12)
        t2_out = self.t2.out(self.t1.out)
        wire_fp6(cb, r11, self.x_out.a, t2_out)
        wire_fp6(cb, r11, self.x_out.b, self.t0.out)
        # t3 = c1 + c0 ; t4 = o1 + o4 ; t5 = t3.multiply_by_01(o0, t4)
        wire_fp6(cb, r11, self.t3.a, c1)
        wire_fp6(cb, r11, self.t3.b, c0)
        wire_fp2(cb, r11, (self.t4.g0.x, self.t4.g1.x), self.o1)
        wire_fp2(cb, r11, (self.t4.g0.y, self.t4.g1.y), self.o4)
        wire_fp6(cb, r11, self.t5.c, self.t3.out)
        wire_fp2(cb, r11, self.t5.b0, self.o0)
        wire_fp2(cb, r11, self.t5.b1, (self.t4.c0, self.t4.c1))
        # t6 = t5 - t0 ; y = t6 - t1
        wire_fp6(cb, r11, self.t6.a, self.t5.out)
        wire_fp6(cb, r11, self.t6.b, self.t0.out)
        wire_fp6(cb, r11, self.y_out.a, self.t6.out)
        wire_fp6(cb, r11, self.y_out.b, self.t1.out)
        self.out = (self.x_out.out, self.y_out.out)

    def fill(self, trace, row0, a, o0, o1, o4):
        r11 = row0 + 11
        c0, c1 = a
        t0 = self.t0.fill(trace, row0, c0, o0, o1)
        t1 = self.t1.fill(trace, row0, c1, o4)
        t2 = self.t2.fill(trace, r11, t1)
        x = self.x_out.fill(trace, r11, t2, t0)
        t3 = self.t3.fill(trace, r11, c1, c0)
        t4 = self.t4.fill(trace, r11, o1, o4)
        t5 = self.t5.fill(trace, row0, t3, o0, t4)
        t6 = self.t6.fill(trace, r11, t5, t0)
        y = self.y_out.fill(trace, r11, t6, t1)
        out = (x, y)
        assert out == bls.fp12_multiply_by_014(a, o0, o1, o4)
        return out
