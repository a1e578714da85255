"""Fp2 gadgets: arithmetic over Fp[u]/(u^2+1) as paired Fp column blocks.

Capability-parity with the reference's `fp2.rs` (layouts `:26-184`, fills
`:186-522`, constraints `:524-2415`). Value flow per op mirrors
native.rs' Fp2 semantics (chips are witnesses of those exact intermediate
values); columns and selectors follow this backend's design (constant
selector patterns, wiring bindings — see chips/core.py).

Ops provided (consumer wires inputs; outputs are `rem`-register pairs
pinned across the 12-row window):

* Fp2MulGadget        — fp2.rs:26-48: 4 unreduced FpMuls, c0 via +p^2
                        offset subtraction, one Reduce24 + RC per component
* Fp2AddReduceGadget  — fp2.rs:344-355: per-component add + single reduce
* Fp2SubReduceGadget  — fp2.rs:356-368: x + p - y per component + reduce
* Fp2NegGadget        — fp.rs:222-234 pattern: witness -x with x + (-x) = p
* Fp2NonResidueGadget — fp2.rs:128-136: * (1+u) = (c0-c1, c0+c1), reduced
* Fp2FpMulGadget      — fp2.rs:60-69: (c0*s, c1*s) via two FpMulReduce
* Fp2MulByBGadget     — fp2.rs:81-92: * 4(1+u)
"""

from __future__ import annotations

from ..fields import bls12_381 as bls
from ..fields.bls12_381 import P381
from . import limbs
from .core import ChipBuilder
from .fp import (
    AddNGadget,
    FpMulGadget,
    FpMulReduceGadget,
    MulSingleGadget,
    RangeCheckGadget,
    Reduce24Gadget,
    SingleReduceGadget,
    SubNGadget,
    _rows_of,
)

P_LIMBS = limbs.P381_LIMBS
P2_LIMBS = limbs.to_limbs(P381 * P381, 24)


class Fp2MulGadget:
    """(a0 + a1 u)(b0 + b1 u) = (a0b0 - a1b1) + (a0b1 + a1b0) u.

    c0 computed as (a0b0 + p^2 - a1b1) then one 24-limb reduction; c1 as
    (a0b1 + a1b0) then one reduction. Input ports: a0/a1/b0/b1 (the x/y
    registers of the products, internally tied); outputs c0/c1 (rem)."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.cb = cb
        self.row0s = list(row0s)
        self.t1 = FpMulGadget(cb, row0s)  # a0*b0
        self.t2 = FpMulGadget(cb, row0s)  # a1*b1
        self.t3 = FpMulGadget(cb, row0s)  # a0*b1
        self.t4 = FpMulGadget(cb, row0s)  # a1*b0
        r0 = _rows_of(self.row0s, 0)
        r11 = _rows_of(self.row0s, 11)
        # tie shared inputs: a0 = t1.x = t3.x; a1 = t2.x = t4.x;
        # b0 = t1.y = t4.y; b1 = t2.y = t3.y
        cb.wire(r0, self.t3.x, self.t1.x, 12)
        cb.wire(r0, self.t4.x, self.t2.x, 12)
        cb.wire(r0, self.t4.y, self.t1.y, 12)
        cb.wire(r0, self.t3.y, self.t2.y, 12)
        # c0 = reduce(t1 + p^2 - t2)
        self.add_off = AddNGadget(cb, r11, 24)
        cb.wire(r11, self.add_off.x, self.t1.sum, 24)
        cb.bind_const(r11, self.add_off.y, P2_LIMBS)
        self.sub0 = SubNGadget(cb, r11, 24)
        cb.wire(r11, self.sub0.x, self.add_off.sum, 24)
        cb.wire(r11, self.sub0.y, self.t2.sum, 24)
        self.red0 = Reduce24Gadget(cb, row0s)
        self.red0.wire_input(self.sub0.diff)
        self.rc0 = RangeCheckGadget(cb, r11)
        cb.wire(r11, self.rc0.x, self.red0.rem, 12)
        # c1 = reduce(t3 + t4)
        self.add1 = AddNGadget(cb, r11, 24)
        cb.wire(r11, self.add1.x, self.t3.sum, 24)
        cb.wire(r11, self.add1.y, self.t4.sum, 24)
        self.red1 = Reduce24Gadget(cb, row0s)
        self.red1.wire_input(self.add1.sum)
        self.rc1 = RangeCheckGadget(cb, r11)
        cb.wire(r11, self.rc1.x, self.red1.rem, 12)
        # ports
        self.a0, self.a1 = self.t1.x, self.t2.x
        self.b0, self.b1 = self.t1.y, self.t2.y
        self.c0, self.c1 = self.red0.rem, self.red1.rem

    def fill(self, trace, row0, a, b):
        a0, a1 = a
        b0, b1 = b
        p1 = self.t1.fill(trace, row0, a0, b0)
        p2 = self.t2.fill(trace, row0, a1, b1)
        p3 = self.t3.fill(trace, row0, a0, b1)
        p4 = self.t4.fill(trace, row0, a1, b0)
        off = self.add_off.fill(trace, row0 + 11, limbs.to_limbs(p1, 24), P2_LIMBS)
        self.sub0.fill(trace, row0 + 11, off, limbs.to_limbs(p2, 24))
        c0 = self.red0.fill(trace, row0, p1 + P381 * P381 - p2)
        self.rc0.fill(trace, row0 + 11, limbs.to_limbs(c0))
        self.add1.fill(trace, row0 + 11, limbs.to_limbs(p3, 24), limbs.to_limbs(p4, 24))
        c1 = self.red1.fill(trace, row0, p3 + p4)
        self.rc1.fill(trace, row0 + 11, limbs.to_limbs(c1))
        out = bls.fp2_mul(a, b)
        assert out == (c0, c1)
        return out

class FpAddReduceGadget:
    """Single-row x + y mod p: Add12 then SingleReduce (+ its RC)."""

    def __init__(self, cb: ChipBuilder, rows):
        self.cb = cb
        self.add = AddNGadget(cb, rows, 12)
        self.red = SingleReduceGadget(cb, rows)
        # reduce input = the 13-limb sum: SingleReduce.add.sum is 12 limbs;
        # the carry out of limb 11 must be folded in. Use a dedicated wire:
        # reduce checks div*p + rem == x where x is 12 limbs + carry*2^384.
        # Since x + y < 2p < 2^382, the top carry is always 0: pin it.
        cb.bind_const(rows, self.add.carry + 11, [0])
        self.red.wire_input(self.add.sum)
        self.x, self.y, self.rem = self.add.x, self.add.y, self.red.rem

    def fill(self, trace, row, x_int: int, y_int: int) -> int:
        self.add.fill(trace, row, limbs.to_limbs(x_int), limbs.to_limbs(y_int))
        return self.red.fill(trace, row, x_int + y_int)

class FpSubReduceGadget:
    """Single-row x - y mod p as (x + p) - y then reduce (fp2.rs:344-368)."""

    def __init__(self, cb: ChipBuilder, rows):
        self.cb = cb
        self.add = AddNGadget(cb, rows, 12)  # x + p (13 bits of headroom: fine)
        cb.bind_const(rows, self.add.y, P_LIMBS)
        cb.bind_const(rows, self.add.carry + 11, [0])
        self.sub = SubNGadget(cb, rows, 12)
        cb.wire(rows, self.sub.x, self.add.sum, 12)
        cb.bind_const(rows, self.sub.borrow + 11, [0])
        self.red = SingleReduceGadget(cb, rows)
        self.red.wire_input(self.sub.diff)
        self.x, self.y, self.rem = self.add.x, self.sub.y, self.red.rem

    def fill(self, trace, row, x_int: int, y_int: int) -> int:
        s = self.add.fill(trace, row, limbs.to_limbs(x_int), P_LIMBS)
        self.sub.fill(trace, row, s, limbs.to_limbs(y_int))
        return self.red.fill(trace, row, x_int + P381 - y_int)

class FpNegGadget:
    """Single-row negation: witness m with x + m == p (m = p - x; for
    x = 0 this yields the non-canonical m = p, exactly as the reference's
    fill_trace_negate_fp / native.rs:24-28 does)."""

    def __init__(self, cb: ChipBuilder, rows):
        self.add = AddNGadget(cb, rows, 12)
        cb.bind_const(rows, self.add.sum, P_LIMBS)
        self.x, self.out = self.add.x, self.add.y

    def fill(self, trace, row, x_int: int) -> int:
        m = P381 - x_int
        self.add.fill(trace, row, limbs.to_limbs(x_int), limbs.to_limbs(m))
        return m % P381

class Fp2Pair:
    """Helper bundling two single-component gadgets into an Fp2 op."""

    def __init__(self, g0, g1):
        self.g0, self.g1 = g0, g1
        self.c0 = getattr(g0, "rem", getattr(g0, "out", None))
        self.c1 = getattr(g1, "rem", getattr(g1, "out", None))

    def fill(self, trace, row, a, b=None):
        if b is None:
            r0 = self.g0.fill(trace, row, a[0])
            r1 = self.g1.fill(trace, row, a[1])
        else:
            r0 = self.g0.fill(trace, row, a[0], b[0])
            r1 = self.g1.fill(trace, row, a[1], b[1])
        return (r0, r1)

def Fp2AddReduceGadget(cb, rows):
    return Fp2Pair(FpAddReduceGadget(cb, rows), FpAddReduceGadget(cb, rows))


def Fp2SubReduceGadget(cb, rows):
    return Fp2Pair(FpSubReduceGadget(cb, rows), FpSubReduceGadget(cb, rows))


def Fp2NegGadget(cb, rows):
    return Fp2Pair(FpNegGadget(cb, rows), FpNegGadget(cb, rows))


class Fp2NonResidueGadget:
    """* (1 + u): (c0 - c1, c0 + c1), both reduced (fp2.rs:128-136)."""

    def __init__(self, cb: ChipBuilder, rows):
        self.sub = FpSubReduceGadget(cb, rows)
        self.add = FpAddReduceGadget(cb, rows)
        cb.wire(rows, self.add.x, self.sub.x, 12)  # shared c0 input
        cb.wire(rows, self.add.y, self.sub.y, 12)  # shared c1 input
        self.a0, self.a1 = self.sub.x, self.sub.y
        self.c0, self.c1 = self.sub.rem, self.add.rem

    def fill(self, trace, row, a):
        r0 = self.sub.fill(trace, row, a[0], a[1])
        r1 = self.add.fill(trace, row, a[0], a[1])
        assert (r0, r1) == bls.fp2_mul_by_nonresidue(a)
        return (r0, r1)

class Fp2FpMulGadget:
    """(c0*s, c1*s) for fp scalar s: two FpMulReduce sharing y (fp2.rs:60-69)."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.m0 = FpMulReduceGadget(cb, row0s)
        self.m1 = FpMulReduceGadget(cb, row0s)
        cb.wire(_rows_of(row0s, 0), self.m1.y, self.m0.y, 12)
        self.a0, self.a1, self.s = self.m0.x, self.m1.x, self.m0.y
        self.c0, self.c1 = self.m0.rem, self.m1.rem

    def fill(self, trace, row0, a, s: int):
        r0 = self.m0.fill(trace, row0, a[0], s)
        r1 = self.m1.fill(trace, row0, a[1], s)
        return (r0, r1)

class Fp2MulByBGadget:
    """* 4(1+u): t0 = 4c0, t1 = 4c1 (single-limb muls + reduce), output
    (t0 - t1, t0 + t1) reduced (fp2.rs:81-92, native.rs:539-543)."""

    def __init__(self, cb: ChipBuilder, rows):
        self.mul0 = MulSingleGadget(cb, rows)
        self.mul1 = MulSingleGadget(cb, rows)
        cb.bind_const(rows, self.mul0.y, [4])
        cb.bind_const(rows, self.mul1.y, [4])
        self.red0 = SingleReduceGadget(cb, rows)
        self.red0.wire_input(self.mul0.res)
        self.red1 = SingleReduceGadget(cb, rows)
        self.red1.wire_input(self.mul1.res)
        self.sub = FpSubReduceGadget(cb, rows)
        cb.wire(rows, self.sub.x, self.red0.rem, 12)
        cb.wire(rows, self.sub.y, self.red1.rem, 12)
        self.addg = FpAddReduceGadget(cb, rows)
        cb.wire(rows, self.addg.x, self.red0.rem, 12)
        cb.wire(rows, self.addg.y, self.red1.rem, 12)
        self.a0, self.a1 = self.mul0.x, self.mul1.x
        self.c0, self.c1 = self.sub.rem, self.addg.rem

    def fill(self, trace, row, a):
        self.mul0.fill(trace, row, limbs.to_limbs(a[0]), 4)
        self.mul1.fill(trace, row, limbs.to_limbs(a[1]), 4)
        t0 = self.red0.fill(trace, row, 4 * a[0])
        t1 = self.red1.fill(trace, row, 4 * a[1])
        r0 = self.sub.fill(trace, row, t0, t1)
        r1 = self.addg.fill(trace, row, t0, t1)
        assert (r0, r1) == bls.fp2_multiply_by_b(a)
        return (r0, r1)


class FpSmallScalarGadget:
    """Single-row x * c mod p for a small public constant c (c*p < 2^384):
    MulSingle with bound multiplier + SingleReduce. Used for the *2 / *3
    steps of the pairing-precomp doubling formulas (native.rs:293-326)."""

    def __init__(self, cb: ChipBuilder, rows, c: int):
        assert 0 < c < (1 << 32)
        self.c = c
        self.mul = MulSingleGadget(cb, rows)
        cb.bind_const(rows, self.mul.y, [c])
        self.red = SingleReduceGadget(cb, rows)
        self.red.wire_input(self.mul.res)
        self.x, self.rem = self.mul.x, self.red.rem

    def fill(self, trace, row, x_int: int) -> int:
        self.mul.fill(trace, row, limbs.to_limbs(x_int), self.c)
        return self.red.fill(trace, row, x_int * self.c)


class Fp2SmallScalarGadget:
    """Component-wise small-constant scalar multiple of an Fp2 value."""

    def __init__(self, cb: ChipBuilder, rows, c: int):
        self.g0 = FpSmallScalarGadget(cb, rows, c)
        self.g1 = FpSmallScalarGadget(cb, rows, c)
        self.a0, self.a1 = self.g0.x, self.g1.x
        self.c0, self.c1 = self.g0.rem, self.g1.rem

    def fill(self, trace, row, a):
        return (self.g0.fill(trace, row, a[0]), self.g1.fill(trace, row, a[1]))


class Fp2ConstMulGadget:
    """Full Fp2 multiplication by a PUBLIC Fp2 constant (b bound via
    bind_const): used for Frobenius coefficient multiplications
    (native.rs:1050-1222) and the 1/2 scalar of the doubling step."""

    def __init__(self, cb: ChipBuilder, row0s, b=None):
        self.mul = Fp2MulGadget(cb, row0s)
        if b is not None:
            r0 = _rows_of(list(row0s), 0)
            cb.bind_const(r0, self.mul.b0, limbs.to_limbs(b[0]))
            cb.bind_const(r0, self.mul.b1, limbs.to_limbs(b[1]))
        self.b = b
        self.a0, self.a1 = self.mul.a0, self.mul.a1
        self.c0, self.c1 = self.mul.c0, self.mul.c1

    def fill(self, trace, row0, a, b=None):
        return self.mul.fill(trace, row0, a, b if b is not None else self.b)


class FpConstMulGadget:
    """12-row x * k mod p for a PUBLIC full-width constant k (e.g. 1/2):
    FpMulReduce with the y register bound to k."""

    def __init__(self, cb: ChipBuilder, row0s, k: int):
        self.k = k
        self.mulred = FpMulReduceGadget(cb, row0s)
        cb.bind_const(_rows_of(list(row0s), 0), self.mulred.y, limbs.to_limbs(k))
        self.x, self.rem = self.mulred.x, self.mulred.rem

    def fill(self, trace, row0, x_int: int) -> int:
        return self.mulred.fill(trace, row0, x_int, self.k)


class Fp2ConstFpMulGadget:
    """Component-wise multiplication of an Fp2 by a public Fp constant."""

    def __init__(self, cb: ChipBuilder, row0s, k: int):
        self.g0 = FpConstMulGadget(cb, row0s, k)
        self.g1 = FpConstMulGadget(cb, row0s, k)
        self.a0, self.a1 = self.g0.x, self.g1.x
        self.c0, self.c1 = self.g0.rem, self.g1.rem

    def fill(self, trace, row0, a):
        return (self.g0.fill(trace, row0, a[0]), self.g1.fill(trace, row0, a[1]))
