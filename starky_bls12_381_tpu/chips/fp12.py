"""Fp12 gadgets: arithmetic over Fp6[w]/(w^2 - v) as Fp6 column pairs.

Capability-parity with the reference's `fp12.rs` (multiplication layout
`:30-42`, fill `:186`, constraints `:1025-1552`). Witnesses the exact
t0..t6 chain of native.rs:1009-1027.

    Fp12Ref = (Fp6Ref, Fp6Ref)
"""

from __future__ import annotations

from ..fields import bls12_381 as bls
from . import limbs
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


class Fp4SquareGadget:
    """fp4_square(a, b) = (nr(b^2) + a^2, (a+b)^2 - a^2 - b^2)
    (native.rs:225-232). Ports a/b Fp2Refs; outputs out0/out1."""

    def __init__(self, cb: ChipBuilder, row0s):
        from .fp import _rows_of
        from .fp2 import (
            Fp2AddReduceGadget,
            Fp2MulGadget,
            Fp2NonResidueGadget,
            Fp2SubReduceGadget,
        )

        r11 = _rows_of(list(row0s), 11)
        self.m_a2 = Fp2MulGadget(cb, row0s)  # a^2
        self.m_b2 = Fp2MulGadget(cb, row0s)  # b^2
        self.add_ab = Fp2AddReduceGadget(cb, r11)  # a + b
        self.m_ab2 = Fp2MulGadget(cb, row0s)  # (a+b)^2
        self.nr = Fp2NonResidueGadget(cb, r11)
        self.add0 = Fp2AddReduceGadget(cb, r11)  # nr(b2) + a2
        self.sub1 = Fp2SubReduceGadget(cb, r11)  # ab2 - a2
        self.sub2 = Fp2SubReduceGadget(cb, r11)  # ... - b2
        self.a = (self.m_a2.a0, self.m_a2.a1)
        self.b = (self.m_b2.a0, self.m_b2.a1)
        from .fp6 import wire_fp2

        wire_fp2(cb, r11, (self.m_a2.b0, self.m_a2.b1), self.a)
        wire_fp2(cb, r11, (self.m_b2.b0, self.m_b2.b1), self.b)
        wire_fp2(cb, r11, (self.add_ab.g0.x, self.add_ab.g1.x), self.a)
        wire_fp2(cb, r11, (self.add_ab.g0.y, self.add_ab.g1.y), self.b)
        wire_fp2(cb, r11, (self.m_ab2.a0, self.m_ab2.a1), (self.add_ab.c0, self.add_ab.c1))
        wire_fp2(cb, r11, (self.m_ab2.b0, self.m_ab2.b1), (self.add_ab.c0, self.add_ab.c1))
        wire_fp2(cb, r11, (self.nr.a0, self.nr.a1), (self.m_b2.c0, self.m_b2.c1))
        wire_fp2(cb, r11, (self.add0.g0.x, self.add0.g1.x), (self.nr.c0, self.nr.c1))
        wire_fp2(cb, r11, (self.add0.g0.y, self.add0.g1.y), (self.m_a2.c0, self.m_a2.c1))
        wire_fp2(cb, r11, (self.sub1.g0.x, self.sub1.g1.x), (self.m_ab2.c0, self.m_ab2.c1))
        wire_fp2(cb, r11, (self.sub1.g0.y, self.sub1.g1.y), (self.m_a2.c0, self.m_a2.c1))
        wire_fp2(cb, r11, (self.sub2.g0.x, self.sub2.g1.x), (self.sub1.c0, self.sub1.c1))
        wire_fp2(cb, r11, (self.sub2.g0.y, self.sub2.g1.y), (self.m_b2.c0, self.m_b2.c1))
        self.out0 = (self.add0.c0, self.add0.c1)
        self.out1 = (self.sub2.c0, self.sub2.c1)

    def fill(self, trace, row0, a, b):
        r11 = row0 + 11
        a2 = self.m_a2.fill(trace, row0, a, a)
        b2 = self.m_b2.fill(trace, row0, b, b)
        ab = self.add_ab.fill(trace, r11, a, b)
        ab2 = self.m_ab2.fill(trace, row0, ab, ab)
        nrb2 = self.nr.fill(trace, r11, b2)
        o0 = self.add0.fill(trace, r11, nrb2, a2)
        s1 = self.sub1.fill(trace, r11, ab2, a2)
        o1 = self.sub2.fill(trace, r11, s1, b2)
        assert (o0, o1) == bls.fp4_square(a, b)
        return (o0, o1)


class CyclotomicSquareGadget:
    """Fp12 cyclotomic square (native.rs:1251-1298, fp12.rs:48-72):
    three fp4-squares plus the (t -/+ c)*2 + t recombination chains.
    Port: `a` Fp12Ref; output `out` Fp12Ref."""

    def __init__(self, cb: ChipBuilder, row0s):
        from .fp import _rows_of
        from .fp2 import (
            Fp2AddReduceGadget,
            Fp2NonResidueGadget,
            Fp2SmallScalarGadget,
            Fp2SubReduceGadget,
        )
        from .fp6 import wire_fp2

        r11 = _rows_of(list(row0s), 11)
        self.f0 = Fp4SquareGadget(cb, row0s)  # (c0c0, c1c1)
        self.f1 = Fp4SquareGadget(cb, row0s)  # (c1c0, c0c2)
        self.f2 = Fp4SquareGadget(cb, row0s)  # (c0c1, c1c2)
        self.nr3 = Fp2NonResidueGadget(cb, r11)  # t3 = nr(f2.out1)
        wire_fp2(cb, r11, (self.nr3.a0, self.nr3.a1), self.f2.out1)
        # input component refs
        c0c0, c1c1 = self.f0.a, self.f0.b
        c1c0, c0c2 = self.f1.a, self.f1.b
        c0c1, c1c2 = self.f2.a, self.f2.b
        self.a = ((c0c0, c0c1, c0c2), (c1c0, c1c1, c1c2))

        def step(t_ref, c_ref, is_sub):
            d = (Fp2SubReduceGadget if is_sub else Fp2AddReduceGadget)(cb, r11)
            wire_fp2(cb, r11, (d.g0.x, d.g1.x), t_ref)
            wire_fp2(cb, r11, (d.g0.y, d.g1.y), c_ref)
            dbl = Fp2SmallScalarGadget(cb, r11, 2)
            wire_fp2(cb, r11, (dbl.a0, dbl.a1), (d.c0, d.c1))
            fin = Fp2AddReduceGadget(cb, r11)
            wire_fp2(cb, r11, (fin.g0.x, fin.g1.x), (dbl.c0, dbl.c1))
            wire_fp2(cb, r11, (fin.g0.y, fin.g1.y), t_ref)
            return (d, dbl, fin)

        self.s0 = step(self.f0.out0, c0c0, True)
        self.s1 = step(self.f1.out0, c0c1, True)
        self.s2 = step(self.f2.out0, c0c2, True)
        self.s3 = step((self.nr3.c0, self.nr3.c1), c1c0, False)
        self.s4 = step(self.f0.out1, c1c1, False)
        self.s5 = step(self.f1.out1, c1c2, False)
        o = lambda s: (s[2].c0, s[2].c1)  # noqa: E731
        self.out = ((o(self.s0), o(self.s1), o(self.s2)),
                    (o(self.s3), o(self.s4), o(self.s5)))

    def fill(self, trace, row0, a):
        r11 = row0 + 11
        (c0c0, c0c1, c0c2), (c1c0, c1c1, c1c2) = a
        t0 = self.f0.fill(trace, row0, c0c0, c1c1)
        t1 = self.f1.fill(trace, row0, c1c0, c0c2)
        t2 = self.f2.fill(trace, row0, c0c1, c1c2)
        t3 = self.nr3.fill(trace, r11, t2[1])

        def fill_step(s, t, c):
            d, dbl, fin = s
            dv = d.fill(trace, r11, t, c)
            dd = dbl.fill(trace, r11, dv)
            return fin.fill(trace, r11, dd, t)

        out = (
            (fill_step(self.s0, t0[0], c0c0),
             fill_step(self.s1, t1[0], c0c1),
             fill_step(self.s2, t2[0], c0c2)),
            (fill_step(self.s3, t3, c1c0),
             fill_step(self.s4, t0[1], c1c1),
             fill_step(self.s5, t1[1], c1c2)),
        )
        assert out == bls.fp12_cyclotomic_square(a)
        return out


class Fp12FrobeniusGadget:
    """Fp12 Frobenius map x -> x^(p^pow) (native.rs:1201-1221).

    One instance serves windows with DIFFERENT powers of the SAME parity:
    the five constant multipliers per window (C1, C2 for the c0 half;
    w*1, w*C1, w*C2 for the c1 half, w = FP12_FROB[pow]) are bound via
    per-window bind_const. Odd powers conjugate each Fp2 component first
    (witnessed imaginary-part negations); even powers pass components
    through. Ports: `a` Fp12Ref; call `out(...)`? -> `self.out` Fp12Ref.
    """

    def __init__(self, cb: ChipBuilder, windows):
        """windows: list of (row0, pow) with all pows of equal parity."""
        from .fp import _rows_of
        from .fp2 import Fp2MulGadget, FpNegGadget
        from .fp6 import wire_fp2

        self.cb = cb
        self.windows = list(windows)
        pows = [p for _, p in self.windows]
        self.odd = pows[0] % 2 == 1
        assert all((p % 2 == 1) == self.odd for p in pows)
        row0s = [r for r, _ in self.windows]
        r11 = _rows_of(row0s, 11)

        w_in = cb.wit
        # input ports: 12 fp component registers (24 cols per fp2)
        self.in_cols = [w_in.take(12) for _ in range(12)]  # fp-major order
        in_fp2 = [(self.in_cols[2 * k], self.in_cols[2 * k + 1]) for k in range(6)]
        self.a = ((in_fp2[0], in_fp2[1], in_fp2[2]), (in_fp2[3], in_fp2[4], in_fp2[5]))

        if self.odd:
            self.negs = [FpNegGadget(cb, r11) for _ in range(6)]
            for k, n in enumerate(self.negs):
                cb.wire(r11, n.x, self.in_cols[2 * k + 1], 12)
            conj_fp2 = [(self.in_cols[2 * k], self.negs[k].out) for k in range(6)]
        else:
            self.negs = []
            conj_fp2 = in_fp2

        # five constant multiplications (component 0 of c0 passes through)
        self.muls = [Fp2MulGadget(cb, row0s) for _ in range(5)]
        for mk, src in zip(self.muls, conj_fp2[1:]):
            wire_fp2(cb, r11, (mk.a0, mk.a1), src)
        # per-window constant tables
        for row0, p in self.windows:
            coeffs = self._window_coeffs(p)
            for mk, cval in zip(self.muls, coeffs):
                cb.bind_const({row0}, mk.b0, limbs.to_limbs(cval[0]))
                cb.bind_const({row0}, mk.b1, limbs.to_limbs(cval[1]))
        mo = [(m.c0, m.c1) for m in self.muls]
        self.out = ((conj_fp2[0], mo[0], mo[1]), (mo[2], mo[3], mo[4]))

    @staticmethod
    def _window_coeffs(p):
        w = bls.FP12_FROB[p % 12]
        c1 = bls.FP6_FROB_C1[p % 6]
        c2 = bls.FP6_FROB_C2[p % 6]
        return [c1, c2, w, bls.fp2_mul(c1, w), bls.fp2_mul(c2, w)]

    def fill(self, trace, row0, a, p):
        from .core import put_rows
        import numpy as np

        r11 = row0 + 11
        flat = [fp for fp6 in a for fp2 in fp6 for fp in fp2]
        regs = np.concatenate([limbs.to_limbs(v) for v in flat])
        put_rows(trace, row0, self.in_cols[0], np.broadcast_to(regs, (12, 144)))
        comps = [a[0][0], a[0][1], a[0][2], a[1][0], a[1][1], a[1][2]]
        if self.odd:
            conj = []
            for k, c in enumerate(comps):
                m = self.negs[k].fill(trace, r11, c[1])
                conj.append((c[0], m % bls.P381))
        else:
            conj = comps
        coeffs = self._window_coeffs(p)
        outs = []
        for mk, src, cv in zip(self.muls, conj[1:], coeffs):
            outs.append(mk.fill(trace, row0, src, cv))
        out = ((conj[0], outs[0], outs[1]), (outs[2], outs[3], outs[4]))
        expect = bls.fp12_frobenius(a, p)
        assert out == expect, "frobenius mismatch"
        return out
