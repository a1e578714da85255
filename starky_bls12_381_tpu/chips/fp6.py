"""Fp6 gadgets: arithmetic over Fp2[v]/(v^3 - (1+u)) as Fp2 column triples.

Capability-parity with the reference's `fp6.rs` (layout `:11-121`, fills
`:123-441`, constraints `:443-3277`). The multiplication witnesses the
exact t0..t19 intermediate chain of native.rs:824-861 (same values the
reference's FP6_MUL block holds).

Conventions (see chips/fp2.py): 12-row products span a window [r0, r0+12);
single-row ops sit at row r0+11; all wiring binds at r0+11. Values are
passed between gadgets as column-offset references:

    Fp2Ref = (c0_col, c1_col); Fp6Ref = (Fp2Ref, Fp2Ref, Fp2Ref)
"""

from __future__ import annotations

from ..fields import bls12_381 as bls
from .core import ChipBuilder
from .fp import _rows_of
from .fp2 import (
    Fp2AddReduceGadget,
    Fp2MulGadget,
    Fp2NegGadget,
    Fp2NonResidueGadget,
    Fp2Pair,
    Fp2SubReduceGadget,
)


def wire_fp2(cb, rows, dst_pair, src_pair):
    cb.wire(rows, dst_pair[0], src_pair[0], 12)
    cb.wire(rows, dst_pair[1], src_pair[1], 12)


def wire_fp6(cb, rows, dst, src):
    for d, s in zip(dst, src):
        wire_fp2(cb, rows, d, s)


def _ref(g):
    """Fp2Ref of a pairing gadget's output columns."""
    return (g.c0, g.c1)


def _pair_in_x(g: Fp2Pair):
    return (g.g0.x, g.g1.x)


def _pair_in_y(g: Fp2Pair):
    return (g.g0.y, g.g1.y)


class Fp6MulGadget:
    """Fp6 x Fp6 via the native.rs:824-861 chain (6 Fp2 products plus the
    Karatsuba-style cross terms). Ports: `a` / `b` Fp6Refs of input columns
    (consumer wires its sources to them); output `out` Fp6Ref."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.cb = cb
        self.row0s = list(row0s)
        r11 = _rows_of(self.row0s, 11)
        m = lambda: Fp2MulGadget(cb, row0s)  # noqa: E731
        add = lambda: Fp2AddReduceGadget(cb, r11)  # noqa: E731
        sub = lambda: Fp2SubReduceGadget(cb, r11)  # noqa: E731
        self.t0, self.t1, self.t2 = m(), m(), m()
        self.t3, self.t4 = add(), add()
        self.t5 = m()
        self.t6, self.t7 = sub(), sub()
        self.t8 = Fp2NonResidueGadget(cb, r11)
        self.x_out = add()
        self.t9, self.t10 = add(), add()
        self.t11 = m()
        self.t12, self.t13 = sub(), sub()
        self.t14 = Fp2NonResidueGadget(cb, r11)
        self.y_out = add()
        self.t15, self.t16 = add(), add()
        self.t17 = m()
        self.t18, self.t19 = sub(), sub()
        self.z_out = add()

        # input ports: the product inputs of t0/t1/t2 hold (c0,c1,c2)/(r0,r1,r2)
        self.a = ((self.t0.a0, self.t0.a1), (self.t1.a0, self.t1.a1), (self.t2.a0, self.t2.a1))
        self.b = ((self.t0.b0, self.t0.b1), (self.t1.b0, self.t1.b1), (self.t2.b0, self.t2.b1))
        a0, a1, a2 = self.a
        b0, b1, b2 = self.b
        # t3 = c1 + c2 ; t4 = r1 + r2 ; t5 = t3*t4
        wire_fp2(cb, r11, _pair_in_x(self.t3), a1)
        wire_fp2(cb, r11, _pair_in_y(self.t3), a2)
        wire_fp2(cb, r11, _pair_in_x(self.t4), b1)
        wire_fp2(cb, r11, _pair_in_y(self.t4), b2)
        wire_fp2(cb, r11, (self.t5.a0, self.t5.a1), _ref_pair(self.t3))
        wire_fp2(cb, r11, (self.t5.b0, self.t5.b1), _ref_pair(self.t4))
        # t6 = t5 - t1 ; t7 = t6 - t2 ; t8 = nr(t7) ; x = t8 + t0
        wire_fp2(cb, r11, _pair_in_x(self.t6), (self.t5.c0, self.t5.c1))
        wire_fp2(cb, r11, _pair_in_y(self.t6), (self.t1.c0, self.t1.c1))
        wire_fp2(cb, r11, _pair_in_x(self.t7), _ref_pair(self.t6))
        wire_fp2(cb, r11, _pair_in_y(self.t7), (self.t2.c0, self.t2.c1))
        wire_fp2(cb, r11, (self.t8.a0, self.t8.a1), _ref_pair(self.t7))
        wire_fp2(cb, r11, _pair_in_x(self.x_out), (self.t8.c0, self.t8.c1))
        wire_fp2(cb, r11, _pair_in_y(self.x_out), (self.t0.c0, self.t0.c1))
        # t9 = c0 + c1 ; t10 = r0 + r1 ; t11 = t9*t10
        wire_fp2(cb, r11, _pair_in_x(self.t9), a0)
        wire_fp2(cb, r11, _pair_in_y(self.t9), a1)
        wire_fp2(cb, r11, _pair_in_x(self.t10), b0)
        wire_fp2(cb, r11, _pair_in_y(self.t10), b1)
        wire_fp2(cb, r11, (self.t11.a0, self.t11.a1), _ref_pair(self.t9))
        wire_fp2(cb, r11, (self.t11.b0, self.t11.b1), _ref_pair(self.t10))
        # t12 = t11 - t0 ; t13 = t12 - t1 ; t14 = nr(t2) ; y = t13 + t14
        wire_fp2(cb, r11, _pair_in_x(self.t12), (self.t11.c0, self.t11.c1))
        wire_fp2(cb, r11, _pair_in_y(self.t12), (self.t0.c0, self.t0.c1))
        wire_fp2(cb, r11, _pair_in_x(self.t13), _ref_pair(self.t12))
        wire_fp2(cb, r11, _pair_in_y(self.t13), (self.t1.c0, self.t1.c1))
        wire_fp2(cb, r11, (self.t14.a0, self.t14.a1), (self.t2.c0, self.t2.c1))
        wire_fp2(cb, r11, _pair_in_x(self.y_out), _ref_pair(self.t13))
        wire_fp2(cb, r11, _pair_in_y(self.y_out), (self.t14.c0, self.t14.c1))
        # t15 = c0 + c2 ; t16 = r0 + r2 ; t17 = t15*t16
        wire_fp2(cb, r11, _pair_in_x(self.t15), a0)
        wire_fp2(cb, r11, _pair_in_y(self.t15), a2)
        wire_fp2(cb, r11, _pair_in_x(self.t16), b0)
        wire_fp2(cb, r11, _pair_in_y(self.t16), b2)
        wire_fp2(cb, r11, (self.t17.a0, self.t17.a1), _ref_pair(self.t15))
        wire_fp2(cb, r11, (self.t17.b0, self.t17.b1), _ref_pair(self.t16))
        # t18 = t17 - t0 ; t19 = t18 - t2 ; z = t19 + t1
        wire_fp2(cb, r11, _pair_in_x(self.t18), (self.t17.c0, self.t17.c1))
        wire_fp2(cb, r11, _pair_in_y(self.t18), (self.t0.c0, self.t0.c1))
        wire_fp2(cb, r11, _pair_in_x(self.t19), _ref_pair(self.t18))
        wire_fp2(cb, r11, _pair_in_y(self.t19), (self.t2.c0, self.t2.c1))
        wire_fp2(cb, r11, _pair_in_x(self.z_out), _ref_pair(self.t19))
        wire_fp2(cb, r11, _pair_in_y(self.z_out), (self.t1.c0, self.t1.c1))

        self.out = (_ref_pair(self.x_out), _ref_pair(self.y_out), _ref_pair(self.z_out))
        self._subs = [
            self.t0, self.t1, self.t2, self.t3, self.t4, self.t5, self.t6, self.t7,
            self.t8, self.x_out, self.t9, self.t10, self.t11, self.t12, self.t13,
            self.t14, self.y_out, self.t15, self.t16, self.t17, self.t18, self.t19,
            self.z_out,
        ]

    def fill(self, trace, row0, a, b):
        c0, c1, c2 = a
        r0, r1, r2 = b
        r11 = row0 + 11
        t0 = self.t0.fill(trace, row0, c0, r0)
        t1 = self.t1.fill(trace, row0, c1, r1)
        t2 = self.t2.fill(trace, row0, c2, r2)
        t3 = self.t3.fill(trace, r11, c1, c2)
        t4 = self.t4.fill(trace, r11, r1, r2)
        t5 = self.t5.fill(trace, row0, t3, t4)
        t6 = self.t6.fill(trace, r11, t5, t1)
        t7 = self.t7.fill(trace, r11, t6, t2)
        t8 = self.t8.fill(trace, r11, t7)
        x = self.x_out.fill(trace, r11, t8, t0)
        t9 = self.t9.fill(trace, r11, c0, c1)
        t10 = self.t10.fill(trace, r11, r0, r1)
        t11 = self.t11.fill(trace, row0, t9, t10)
        t12 = self.t12.fill(trace, r11, t11, t0)
        t13 = self.t13.fill(trace, r11, t12, t1)
        t14 = self.t14.fill(trace, r11, t2)
        y = self.y_out.fill(trace, r11, t13, t14)
        t15 = self.t15.fill(trace, r11, c0, c2)
        t16 = self.t16.fill(trace, r11, r0, r2)
        t17 = self.t17.fill(trace, row0, t15, t16)
        t18 = self.t18.fill(trace, r11, t17, t0)
        t19 = self.t19.fill(trace, r11, t18, t2)
        z = self.z_out.fill(trace, r11, t19, t1)
        out = (x, y, z)
        assert out == bls.fp6_mul(a, b)
        return out

def _ref_pair(g):
    """Fp2Ref for either an Fp2Pair (rem outputs) or a gadget with c0/c1."""
    if isinstance(g, Fp2Pair):
        return (g.c0, g.c1)
    return (g.c0, g.c1)


class Fp6AddGadget:
    """Component-wise Fp6 addition, single row (fp6.rs:52-56)."""

    def __init__(self, cb: ChipBuilder, rows):
        self.parts = [Fp2AddReduceGadget(cb, rows) for _ in range(3)]
        self.a = tuple(_pair_in_x(p) for p in self.parts)
        self.b = tuple(_pair_in_y(p) for p in self.parts)
        self.out = tuple(_ref_pair(p) for p in self.parts)

    def fill(self, trace, row, a, b):
        return tuple(p.fill(trace, row, x, y) for p, x, y in zip(self.parts, a, b))

class Fp6SubGadget:
    """Component-wise Fp6 subtraction, single row (fp6.rs:58-61)."""

    def __init__(self, cb: ChipBuilder, rows):
        self.parts = [Fp2SubReduceGadget(cb, rows) for _ in range(3)]
        self.a = tuple(_pair_in_x(p) for p in self.parts)
        self.b = tuple(_pair_in_y(p) for p in self.parts)
        self.out = tuple(_ref_pair(p) for p in self.parts)

    def fill(self, trace, row, a, b):
        return tuple(p.fill(trace, row, x, y) for p, x, y in zip(self.parts, a, b))

class Fp6NegGadget:
    """Component-wise Fp6 negation (fp6.rs:63-64)."""

    def __init__(self, cb: ChipBuilder, rows):
        self.parts = [Fp2NegGadget(cb, rows) for _ in range(3)]
        self.a = tuple(_pair_in_x(p) for p in self.parts)
        self.out = tuple((p.g0.out, p.g1.out) for p in self.parts)

    def fill(self, trace, row, a):
        return tuple(p.fill(trace, row, x) for p, x in zip(self.parts, a))

class Fp6NonResidueGadget:
    """v * (c0,c1,c2) = (xi*c2, c0, c1): one Fp2 non-residue op; the other
    two components are pure column re-references (fp6.rs:43-46)."""

    def __init__(self, cb: ChipBuilder, rows):
        self.nr = Fp2NonResidueGadget(cb, rows)
        self.a2 = (self.nr.a0, self.nr.a1)  # wire c2 here

    def out(self, a_ref):
        """Fp6Ref given the source Fp6Ref `a_ref` (c0/c1 pass through)."""
        return ((self.nr.c0, self.nr.c1), a_ref[0], a_ref[1])

    def fill(self, trace, row, a):
        c = self.nr.fill(trace, row, a[2])
        return (c, a[0], a[1])


class Fp6MultiplyBy01Gadget:
    """c * (b0 + b1 v): the sparse Fp6 multiplication of native.rs:876-899
    (fp6.rs:70-86, :2314-2937). Ports: c (Fp6Ref), b0/b1 (Fp2Refs)."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.cb = cb
        r11 = _rows_of(list(row0s), 11)
        self.m_t0 = Fp2MulGadget(cb, row0s)  # c0 * b0
        self.m_t1 = Fp2MulGadget(cb, row0s)  # c1 * b1
        self.m_t2 = Fp2MulGadget(cb, row0s)  # c2 * b1
        self.nr_t3 = Fp2NonResidueGadget(cb, r11)
        self.add_x = Fp2AddReduceGadget(cb, r11)
        self.add_t4 = Fp2AddReduceGadget(cb, r11)  # b0 + b1
        self.add_t5 = Fp2AddReduceGadget(cb, r11)  # c0 + c1
        self.m_t6 = Fp2MulGadget(cb, row0s)  # t4 * t5
        self.sub_t7 = Fp2SubReduceGadget(cb, r11)
        self.sub_y = Fp2SubReduceGadget(cb, r11)
        self.m_t8 = Fp2MulGadget(cb, row0s)  # c2 * b0
        self.add_z = Fp2AddReduceGadget(cb, r11)

        self.c = (
            (self.m_t0.a0, self.m_t0.a1),
            (self.m_t1.a0, self.m_t1.a1),
            (self.m_t2.a0, self.m_t2.a1),
        )
        self.b0 = (self.m_t0.b0, self.m_t0.b1)
        self.b1 = (self.m_t1.b0, self.m_t1.b1)
        wire_fp2(cb, r11, (self.m_t2.b0, self.m_t2.b1), self.b1)
        wire_fp2(cb, r11, (self.m_t8.a0, self.m_t8.a1), self.c[2])
        wire_fp2(cb, r11, (self.m_t8.b0, self.m_t8.b1), self.b0)
        wire_fp2(cb, r11, (self.nr_t3.a0, self.nr_t3.a1), (self.m_t2.c0, self.m_t2.c1))
        wire_fp2(cb, r11, _pair_in_x(self.add_x), _ref_pair(self.nr_t3))
        wire_fp2(cb, r11, _pair_in_y(self.add_x), (self.m_t0.c0, self.m_t0.c1))
        wire_fp2(cb, r11, _pair_in_x(self.add_t4), self.b0)
        wire_fp2(cb, r11, _pair_in_y(self.add_t4), self.b1)
        wire_fp2(cb, r11, _pair_in_x(self.add_t5), self.c[0])
        wire_fp2(cb, r11, _pair_in_y(self.add_t5), self.c[1])
        wire_fp2(cb, r11, (self.m_t6.a0, self.m_t6.a1), _ref_pair(self.add_t4))
        wire_fp2(cb, r11, (self.m_t6.b0, self.m_t6.b1), _ref_pair(self.add_t5))
        wire_fp2(cb, r11, _pair_in_x(self.sub_t7), (self.m_t6.c0, self.m_t6.c1))
        wire_fp2(cb, r11, _pair_in_y(self.sub_t7), (self.m_t0.c0, self.m_t0.c1))
        wire_fp2(cb, r11, _pair_in_x(self.sub_y), _ref_pair(self.sub_t7))
        wire_fp2(cb, r11, _pair_in_y(self.sub_y), (self.m_t1.c0, self.m_t1.c1))
        wire_fp2(cb, r11, _pair_in_x(self.add_z), (self.m_t8.c0, self.m_t8.c1))
        wire_fp2(cb, r11, _pair_in_y(self.add_z), (self.m_t1.c0, self.m_t1.c1))
        self.out = (_ref_pair(self.add_x), _ref_pair(self.sub_y), _ref_pair(self.add_z))

    def fill(self, trace, row0, c, b0, b1):
        r11 = row0 + 11
        t0 = self.m_t0.fill(trace, row0, c[0], b0)
        t1 = self.m_t1.fill(trace, row0, c[1], b1)
        t2 = self.m_t2.fill(trace, row0, c[2], b1)
        t3 = self.nr_t3.fill(trace, r11, t2)
        x = self.add_x.fill(trace, r11, t3, t0)
        t4 = self.add_t4.fill(trace, r11, b0, b1)
        t5 = self.add_t5.fill(trace, r11, c[0], c[1])
        t6 = self.m_t6.fill(trace, row0, t4, t5)
        t7 = self.sub_t7.fill(trace, r11, t6, t0)
        y = self.sub_y.fill(trace, r11, t7, t1)
        t8 = self.m_t8.fill(trace, row0, c[2], b0)
        z = self.add_z.fill(trace, r11, t8, t1)
        out = (x, y, z)
        assert out == bls.fp6_multiply_by_01(c, b0, b1)
        return out


class Fp6MultiplyBy1Gadget:
    """c * (b1 v): native.rs:901-917 (fp6.rs:92-99). Ports: c, b1."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.cb = cb
        r11 = _rows_of(list(row0s), 11)
        self.m_t0 = Fp2MulGadget(cb, row0s)  # c2 * b1
        self.nr_x = Fp2NonResidueGadget(cb, r11)
        self.m_y = Fp2MulGadget(cb, row0s)  # c0 * b1
        self.m_z = Fp2MulGadget(cb, row0s)  # c1 * b1
        self.c = (
            (self.m_y.a0, self.m_y.a1),
            (self.m_z.a0, self.m_z.a1),
            (self.m_t0.a0, self.m_t0.a1),
        )
        self.b1 = (self.m_t0.b0, self.m_t0.b1)
        wire_fp2(cb, r11, (self.m_y.b0, self.m_y.b1), self.b1)
        wire_fp2(cb, r11, (self.m_z.b0, self.m_z.b1), self.b1)
        wire_fp2(cb, r11, (self.nr_x.a0, self.nr_x.a1), (self.m_t0.c0, self.m_t0.c1))
        self.out = (_ref_pair(self.nr_x), (self.m_y.c0, self.m_y.c1), (self.m_z.c0, self.m_z.c1))

    def fill(self, trace, row0, c, b1):
        r11 = row0 + 11
        t0 = self.m_t0.fill(trace, row0, c[2], b1)
        x = self.nr_x.fill(trace, r11, t0)
        y = self.m_y.fill(trace, row0, c[0], b1)
        z = self.m_z.fill(trace, row0, c[1], b1)
        out = (x, y, z)
        assert out == bls.fp6_multiply_by_1(c, b1)
        return out
