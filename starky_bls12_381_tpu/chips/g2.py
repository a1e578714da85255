"""G2 curve-arithmetic gadgets over Fp2 column pairs.

Capability-parity with the reference's SNARK-side G2 ops
(`g2_plonky2.rs:11-239`: g2_add_unequal, g2_double, scalar-mul building
blocks) re-expressed as STARK chips: the point outputs are witnessed,
range-checked, and bound by slope-free identities (no in-proof division),
with an explicit non-degeneracy inverse witness where the identities
would otherwise degenerate.

* `G2AddGadget` — unequal affine addition on any short-Weierstrass curve
  over Fp2 (the chord identities are independent of the curve's a/b):

      (y2 - y1)^2           == (x1 + x2 + x3) * (x2 - x1)^2
      (y1 + y3) * (x2 - x1) == (y2 - y1) * (x1 - x3)

  plus the guard (x2 - x1) * winv == 1 (witnessed Fp2 inverse), without
  which x1 == x2 would make both identities vacuous.

* `G2DoubleGadget` — affine doubling on E2 (y^2 = x^3 + 4(1+u), a = 0):

      (3 x1^2)^2        == (2 y1)^2 * (x3 + 2 x1)
      (y1 + y3) * 2 y1  == 3 x1^2 * (x1 - x3)

  No y1 != 0 guard is needed: E2(Fp2)'s order is odd (no 2-torsion), so
  an on-curve input never has y1 = 0, and for y1 = 0 the first identity
  forces 3 x1^2 = 0 -> x1 = 0, which is not on E2.

* `Fp2NegCanonGadget` — canonical negation (p - y) mod p per component
  (unlike chips/fp2.FpNegGadget, which may emit the non-canonical p).

* `PsiGadget` / `Psi2Gadget` — the untwist-Frobenius-twist endomorphism
  psi(x, y) = (c_x * conj(x), c_y * conj(y)) and psi^2(x, y) =
  (c_x2 * x, -y) (constants derived in fields/hash_to_curve.py), used by
  the fast cofactor clearing the reference proves in-circuit
  (`hash_to_curve.rs:250-319`).

* `ParityGadget` — b = v mod 2 for a 12-limb value via v = 2h + b: the
  witnessed double is even mod 2^384, so b is forced. RFC 9380 sgn0's
  component parity (`fp2_plonky2.rs:44-58` capability).

* `Fp2ZeroFlagGadget` — z = (v == 0) for a 12-limb value via the
  Goldilocks limb-sum zero test (z*s == 0, s*sinv == 1-z; 12 u32 limbs
  cannot wrap the Goldilocks modulus).
"""

from __future__ import annotations

import numpy as np

from ..fields import bls12_381 as bls
from ..fields import goldilocks as gl
from ..fields import hash_to_curve as h2c
from . import limbs
from .core import ChipBuilder, FillRecorder, put
from .fp import AddNGadget, MulSingleGadget, RangeCheckGadget, _rows_of, c1
from .fp2 import (
    Fp2AddReduceGadget,
    Fp2ConstMulGadget,
    Fp2MulGadget,
    Fp2SmallScalarGadget,
    Fp2SubReduceGadget,
    FpSubReduceGadget,
)

ONE_LIMBS = limbs.to_limbs(1)
ZERO_LIMBS = limbs.to_limbs(0)


def wire_fp2(cb: ChipBuilder, rows, dst, src):
    """Wire an Fp2 port pair dst = (c0_col, c1_col) to src likewise."""
    cb.wire(rows, dst[0], src[0], 12)
    cb.wire(rows, dst[1], src[1], 12)


def bind_fp2_const(cb: ChipBuilder, rows, dst, value):
    cb.bind_const(rows, dst[0], limbs.to_limbs(value[0]))
    cb.bind_const(rows, dst[1], limbs.to_limbs(value[1]))


class Fp2InvWitnessGadget:
    """Witness winv with v * winv == 1 (proves v != 0). Port: `a` (wire
    the value being inverted); the inverse limbs are internal witness."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.mul = Fp2MulGadget(cb, row0s)
        r11 = _rows_of(list(row0s), 11)
        cb.bind_const(r11, self.mul.c0, ONE_LIMBS)
        cb.bind_const(r11, self.mul.c1, ZERO_LIMBS)
        self.a = (self.mul.a0, self.mul.a1)

    def fill(self, trace, row0, v):
        winv = bls.fp2_inv(v)
        out = self.mul.fill(trace, row0, v, winv)
        assert out == (1, 0)


class Fp2NegCanonGadget:
    """Canonical component-wise negation: out = ((p - c0) mod p, (p - c1) mod p)."""

    def __init__(self, cb: ChipBuilder, rows):
        self.g0 = FpSubReduceGadget(cb, rows)
        self.g1 = FpSubReduceGadget(cb, rows)
        cb.bind_const(rows, self.g0.x, ZERO_LIMBS)
        cb.bind_const(rows, self.g1.x, ZERO_LIMBS)
        self.a0, self.a1 = self.g0.y, self.g1.y
        self.c0, self.c1 = self.g0.rem, self.g1.rem

    def fill(self, trace, row, a):
        r0 = self.g0.fill(trace, row, 0, a[0])
        r1 = self.g1.fill(trace, row, 0, a[1])
        assert (r0, r1) == bls.fp2_neg(a)
        return (r0, r1)


class G2AddGadget:
    """Ports: x1/y1/x2/y2 Fp2 pairs (wire at window row r0+11); outputs
    x3/y3 witnessed + range-checked (readable any row of the window)."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.cb = cb
        self.row0s = list(row0s)
        r11 = _rows_of(self.row0s, 11)
        w = cb.wit
        self.x3 = (w.take(12), w.take(12))
        self.y3 = (w.take(12), w.take(12))
        from .fp import RegPinGadget, _all_rows

        for col in (*self.x3, *self.y3):
            RegPinGadget(cb, col, 12, _all_rows(self.row0s, 11))
        self.d1 = Fp2SubReduceGadget(cb, r11)  # y2 - y1
        self.d2 = Fp2SubReduceGadget(cb, r11)  # x2 - x1
        self.s1 = Fp2AddReduceGadget(cb, r11)  # x1 + x2
        self.s2 = Fp2AddReduceGadget(cb, r11)  # s1 + x3
        self.q1 = Fp2MulGadget(cb, self.row0s)  # d1 * d1
        self.q2 = Fp2MulGadget(cb, self.row0s)  # d2 * d2
        self.q3 = Fp2MulGadget(cb, self.row0s)  # s2 * q2
        self.s3 = Fp2AddReduceGadget(cb, r11)  # y1 + y3
        self.d3 = Fp2SubReduceGadget(cb, r11)  # x1 - x3
        self.l1 = Fp2MulGadget(cb, self.row0s)  # s3 * d2
        self.l2 = Fp2MulGadget(cb, self.row0s)  # d1 * d3
        self.guard = Fp2InvWitnessGadget(cb, self.row0s)  # d2 != 0
        self.rc = [RangeCheckGadget(cb, r11) for _ in range(4)]

        # ports
        self.x1 = (self.d2.g0.y, self.d2.g1.y)
        self.y1 = (self.d1.g0.y, self.d1.g1.y)
        self.x2 = (self.d2.g0.x, self.d2.g1.x)
        self.y2 = (self.d1.g0.x, self.d1.g1.x)
        d1 = (self.d1.g0.rem, self.d1.g1.rem)
        d2 = (self.d2.g0.rem, self.d2.g1.rem)
        s1 = (self.s1.g0.rem, self.s1.g1.rem)
        s2 = (self.s2.g0.rem, self.s2.g1.rem)
        s3 = (self.s3.g0.rem, self.s3.g1.rem)
        d3 = (self.d3.g0.rem, self.d3.g1.rem)
        wire_fp2(cb, r11, (self.s1.g0.x, self.s1.g1.x), self.x1)
        wire_fp2(cb, r11, (self.s1.g0.y, self.s1.g1.y), self.x2)
        wire_fp2(cb, r11, (self.s2.g0.x, self.s2.g1.x), s1)
        wire_fp2(cb, r11, (self.s2.g0.y, self.s2.g1.y), self.x3)
        wire_fp2(cb, r11, (self.q1.a0, self.q1.a1), d1)
        wire_fp2(cb, r11, (self.q1.b0, self.q1.b1), d1)
        wire_fp2(cb, r11, (self.q2.a0, self.q2.a1), d2)
        wire_fp2(cb, r11, (self.q2.b0, self.q2.b1), d2)
        wire_fp2(cb, r11, (self.q3.a0, self.q3.a1), s2)
        wire_fp2(cb, r11, (self.q3.b0, self.q3.b1), (self.q2.c0, self.q2.c1))
        wire_fp2(cb, r11, (self.q1.c0, self.q1.c1), (self.q3.c0, self.q3.c1))  # identity 1
        wire_fp2(cb, r11, (self.s3.g0.x, self.s3.g1.x), self.y1)
        wire_fp2(cb, r11, (self.s3.g0.y, self.s3.g1.y), self.y3)
        wire_fp2(cb, r11, (self.d3.g0.x, self.d3.g1.x), self.x1)
        wire_fp2(cb, r11, (self.d3.g0.y, self.d3.g1.y), self.x3)
        wire_fp2(cb, r11, (self.l1.a0, self.l1.a1), s3)
        wire_fp2(cb, r11, (self.l1.b0, self.l1.b1), d2)
        wire_fp2(cb, r11, (self.l2.a0, self.l2.a1), d1)
        wire_fp2(cb, r11, (self.l2.b0, self.l2.b1), d3)
        wire_fp2(cb, r11, (self.l1.c0, self.l1.c1), (self.l2.c0, self.l2.c1))  # identity 2
        wire_fp2(cb, r11, self.guard.a, d2)
        cb.wire(r11, self.rc[0].x, self.x3[0], 12)
        cb.wire(r11, self.rc[1].x, self.x3[1], 12)
        cb.wire(r11, self.rc[2].x, self.y3[0], 12)
        cb.wire(r11, self.rc[3].x, self.y3[1], 12)

    def fill(self, trace, row0, p1, p2):
        (x1, y1), (x2, y2) = p1, p2
        assert x1 != x2, "G2AddGadget requires x1 != x2"
        x3, y3 = h2c.g2_add(p1, p2)
        r11 = row0 + 11
        from .core import put_rows

        for col, v in zip((*self.x3, *self.y3), (x3[0], x3[1], y3[0], y3[1])):
            put_rows(trace, row0, col, np.broadcast_to(limbs.to_limbs(v), (12, 12)))
        d1 = self.d1.fill(trace, r11, y2, y1)
        d2 = self.d2.fill(trace, r11, x2, x1)
        s1 = self.s1.fill(trace, r11, x1, x2)
        s2 = self.s2.fill(trace, r11, s1, x3)
        q1 = self.q1.fill(trace, row0, d1, d1)
        q2 = self.q2.fill(trace, row0, d2, d2)
        q3 = self.q3.fill(trace, row0, s2, q2)
        assert q1 == q3
        s3 = self.s3.fill(trace, r11, y1, y3)
        d3 = self.d3.fill(trace, r11, x1, x3)
        l1 = self.l1.fill(trace, row0, s3, d2)
        l2 = self.l2.fill(trace, row0, d1, d3)
        assert l1 == l2
        self.guard.fill(trace, row0, d2)
        for rc, v in zip(self.rc, (x3[0], x3[1], y3[0], y3[1])):
            rc.fill(trace, r11, limbs.to_limbs(v))
        return (x3, y3)


class G2DoubleGadget:
    """Ports: x1/y1 Fp2 pairs (wire at r0+11); outputs x3/y3 witnessed +
    range-checked. Sound for on-curve inputs on E2 (a = 0; see module doc)."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.cb = cb
        self.row0s = list(row0s)
        r11 = _rows_of(self.row0s, 11)
        w = cb.wit
        self.x3 = (w.take(12), w.take(12))
        self.y3 = (w.take(12), w.take(12))
        from .fp import RegPinGadget, _all_rows

        for col in (*self.x3, *self.y3):
            RegPinGadget(cb, col, 12, _all_rows(self.row0s, 11))
        self.xx = Fp2MulGadget(cb, self.row0s)  # x1^2
        self.t3 = Fp2SmallScalarGadget(cb, r11, 3)  # 3 x1^2
        self.u2 = Fp2SmallScalarGadget(cb, r11, 2)  # 2 y1
        self.s2x = Fp2SmallScalarGadget(cb, r11, 2)  # 2 x1
        self.lhs1 = Fp2MulGadget(cb, self.row0s)  # (3x1^2)^2
        self.usq = Fp2MulGadget(cb, self.row0s)  # (2y1)^2
        self.xs = Fp2AddReduceGadget(cb, r11)  # x3 + 2x1
        self.rhs1 = Fp2MulGadget(cb, self.row0s)  # usq * xs
        self.sy = Fp2AddReduceGadget(cb, r11)  # y1 + y3
        self.lhs2 = Fp2MulGadget(cb, self.row0s)  # sy * 2y1
        self.dx = Fp2SubReduceGadget(cb, r11)  # x1 - x3
        self.rhs2 = Fp2MulGadget(cb, self.row0s)  # 3x1^2 * dx
        self.rc = [RangeCheckGadget(cb, r11) for _ in range(4)]

        # ports
        self.x1 = (self.xx.a0, self.xx.a1)
        self.y1 = (self.u2.g0.x, self.u2.g1.x)
        t3 = (self.t3.c0, self.t3.c1)
        u2 = (self.u2.c0, self.u2.c1)
        wire_fp2(cb, r11, (self.xx.b0, self.xx.b1), self.x1)
        wire_fp2(cb, r11, (self.t3.g0.x, self.t3.g1.x), (self.xx.c0, self.xx.c1))
        wire_fp2(cb, r11, (self.s2x.g0.x, self.s2x.g1.x), self.x1)
        wire_fp2(cb, r11, (self.lhs1.a0, self.lhs1.a1), t3)
        wire_fp2(cb, r11, (self.lhs1.b0, self.lhs1.b1), t3)
        wire_fp2(cb, r11, (self.usq.a0, self.usq.a1), u2)
        wire_fp2(cb, r11, (self.usq.b0, self.usq.b1), u2)
        wire_fp2(cb, r11, (self.xs.g0.x, self.xs.g1.x), self.x3)
        wire_fp2(cb, r11, (self.xs.g0.y, self.xs.g1.y), (self.s2x.c0, self.s2x.c1))
        wire_fp2(cb, r11, (self.rhs1.a0, self.rhs1.a1), (self.usq.c0, self.usq.c1))
        wire_fp2(cb, r11, (self.rhs1.b0, self.rhs1.b1), (self.xs.g0.rem, self.xs.g1.rem))
        wire_fp2(cb, r11, (self.lhs1.c0, self.lhs1.c1), (self.rhs1.c0, self.rhs1.c1))  # id 1
        wire_fp2(cb, r11, (self.sy.g0.x, self.sy.g1.x), self.y1)
        wire_fp2(cb, r11, (self.sy.g0.y, self.sy.g1.y), self.y3)
        wire_fp2(cb, r11, (self.lhs2.a0, self.lhs2.a1), (self.sy.g0.rem, self.sy.g1.rem))
        wire_fp2(cb, r11, (self.lhs2.b0, self.lhs2.b1), u2)
        wire_fp2(cb, r11, (self.dx.g0.x, self.dx.g1.x), self.x1)
        wire_fp2(cb, r11, (self.dx.g0.y, self.dx.g1.y), self.x3)
        wire_fp2(cb, r11, (self.rhs2.a0, self.rhs2.a1), t3)
        wire_fp2(cb, r11, (self.rhs2.b0, self.rhs2.b1), (self.dx.g0.rem, self.dx.g1.rem))
        wire_fp2(cb, r11, (self.lhs2.c0, self.lhs2.c1), (self.rhs2.c0, self.rhs2.c1))  # id 2
        cb.wire(r11, self.rc[0].x, self.x3[0], 12)
        cb.wire(r11, self.rc[1].x, self.x3[1], 12)
        cb.wire(r11, self.rc[2].x, self.y3[0], 12)
        cb.wire(r11, self.rc[3].x, self.y3[1], 12)

    def fill(self, trace, row0, p1):
        x1, y1 = p1
        assert y1 != bls.FP2_ZERO
        x3, y3 = h2c.g2_double(p1)
        r11 = row0 + 11
        from .core import put_rows

        for col, v in zip((*self.x3, *self.y3), (x3[0], x3[1], y3[0], y3[1])):
            put_rows(trace, row0, col, np.broadcast_to(limbs.to_limbs(v), (12, 12)))
        xx = self.xx.fill(trace, row0, x1, x1)
        t3 = self.t3.fill(trace, r11, xx)
        u2 = self.u2.fill(trace, r11, y1)
        s2x = self.s2x.fill(trace, r11, x1)
        lhs1 = self.lhs1.fill(trace, row0, t3, t3)
        usq = self.usq.fill(trace, row0, u2, u2)
        xs = self.xs.fill(trace, r11, x3, s2x)
        rhs1 = self.rhs1.fill(trace, row0, usq, xs)
        assert lhs1 == rhs1
        sy = self.sy.fill(trace, r11, y1, y3)
        lhs2 = self.lhs2.fill(trace, row0, sy, u2)
        dx = self.dx.fill(trace, r11, x1, x3)
        rhs2 = self.rhs2.fill(trace, row0, t3, dx)
        assert lhs2 == rhs2
        for rc, v in zip(self.rc, (x3[0], x3[1], y3[0], y3[1])):
            rc.fill(trace, r11, limbs.to_limbs(v))
        return (x3, y3)


class PsiGadget:
    """psi(x, y) = (CX * conj(x), CY * conj(y)): two canonical c1
    negations + two Fp2 constant multiplications. Ports x/y; outputs
    ox/oy (= the const-muls' rem pairs)."""

    def __init__(self, cb: ChipBuilder, row0s):
        r11 = _rows_of(list(row0s), 11)
        self.negx = FpSubReduceGadget(cb, r11)  # -x.c1
        self.negy = FpSubReduceGadget(cb, r11)  # -y.c1
        cb.bind_const(r11, self.negx.x, ZERO_LIMBS)
        cb.bind_const(r11, self.negy.x, ZERO_LIMBS)
        self.mx = Fp2ConstMulGadget(cb, row0s, h2c.PSI_CX)
        self.my = Fp2ConstMulGadget(cb, row0s, h2c.PSI_CY)
        # conj(x) = (x.c0, -x.c1) feeds the const mul's a-ports
        cb.wire(r11, self.mx.a1, self.negx.rem, 12)
        cb.wire(r11, self.my.a1, self.negy.rem, 12)
        self.x = (self.mx.a0, self.negx.y)
        self.y = (self.my.a0, self.negy.y)
        self.ox = (self.mx.c0, self.mx.c1)
        self.oy = (self.my.c0, self.my.c1)

    def fill(self, trace, row0, p):
        (x, y) = p
        r11 = row0 + 11
        nx = self.negx.fill(trace, r11, 0, x[1])
        ny = self.negy.fill(trace, r11, 0, y[1])
        ox = self.mx.fill(trace, row0, (x[0], nx))
        oy = self.my.fill(trace, row0, (y[0], ny))
        assert (ox, oy) == h2c.psi(p)
        return (ox, oy)


class Psi2Gadget:
    """psi^2(x, y) = (CX2 * x, -y) with CX2 in Fp: two FpConstMul (12-row)
    for the x components + canonical negation of y."""

    def __init__(self, cb: ChipBuilder, row0s):
        from .fp2 import Fp2ConstFpMulGadget

        r11 = _rows_of(list(row0s), 11)
        self.mx = Fp2ConstFpMulGadget(cb, row0s, h2c.PSI2_CX[0])
        self.ny = Fp2NegCanonGadget(cb, r11)
        self.x = (self.mx.a0, self.mx.a1)
        self.y = (self.ny.a0, self.ny.a1)
        self.ox = (self.mx.c0, self.mx.c1)
        self.oy = (self.ny.c0, self.ny.c1)

    def fill(self, trace, row0, p):
        (x, y) = p
        ox = self.mx.fill(trace, row0, x)
        oy = self.ny.fill(trace, row0 + 11, y)
        assert (ox, oy) == h2c.psi2(p)
        return (ox, oy)


class ParityGadget:
    """b = v mod 2 via v = 2h + b: h witnessed, double = MulSingle(h, 2)
    (even mod 2^384), AddN(double, [b,0..]) == v, b boolean. Port: `v`
    (= add.sum; wire the checked value there); flag column `b`."""

    def __init__(self, cb: ChipBuilder, rows):
        self.rows = frozenset(rows)
        self.b = cb.wit.take(1)
        self.mul = MulSingleGadget(cb, rows)
        cb.bind_const(rows, self.mul.y, [2])
        self.add = AddNGadget(cb, rows, 12)
        cb.wire(rows, self.add.x, self.mul.res, 12)
        cb.wire(rows, self.add.y, self.b, 1)
        cb.bind_const(rows, self.add.y + 1, [0] * 11)
        self.v = self.add.sum
        self.sel = cb.indicator(self.rows)
        cb.register("g2parity", self)

    def fill(self, trace, row, v_int: int) -> int:
        b = v_int & 1
        h = v_int >> 1
        self.mul.fill(trace, row, limbs.to_limbs(h), 2)
        self.add.fill(trace, row, limbs.to_limbs(2 * h), limbs.to_limbs(b))
        put(trace, row, self.b, np.asarray([b], dtype=np.uint64))
        return b

    @staticmethod
    def eval_batched(ctx, insts):
        sel = ctx.const_g(c1([i.sel for i in insts]))
        b = ctx.local_g(c1([i.b for i in insts]))
        ctx.constraint(sel * b * (b - 1))


class Fp2ZeroFlagGadget:
    """z = (v == 0) for a 12-limb register at column `vcol` (value < p
    assumed range-checked by the producer): Goldilocks limb-sum zero test."""

    def __init__(self, cb: ChipBuilder, rows, vcol: int):
        self.rows = frozenset(rows)
        self.vcol = vcol
        self.z = cb.wit.take(1)
        self.sinv = cb.wit.take(1)
        self.sel = cb.indicator(self.rows)
        cb.register("g2zeroflag", self)

    def fill(self, trace, row, v_int: int) -> int:
        z = 1 if v_int == 0 else 0
        s = sum(int(x) for x in limbs.to_limbs(v_int)) % gl.P
        sinv = pow(s, gl.P - 2, gl.P) if s else 0
        put(trace, row, self.z, np.asarray([z], dtype=np.uint64))
        put(trace, row, self.sinv, np.asarray([sinv], dtype=np.uint64))
        return z

    @staticmethod
    def eval_batched(ctx, insts):
        # few instances; per-instance emission keeps the limb-sum on the
        # limb axis (sum0 of a grouped gather would sum across instances)
        for i in insts:
            sel = ctx.const(i.sel)
            z = ctx.local(i.z)
            sinv = ctx.local(i.sinv)
            s = ctx.local(i.vcol, 12).sum0()
            ctx.constraint(sel * z * (z - 1))
            ctx.constraint(sel * (z * s))
            ctx.constraint(sel * (s * sinv - (1 - z)))
