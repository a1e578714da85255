"""H2CAir: in-proof map-to-curve — SSWU + 3-isogeny + psi-based cofactor.

Capability-parity with the reference's in-circuit `hash_to_curve`
(`hash_to_curve.rs:84-446`: map_to_curve_simple_swu_9mod16 with the
SqrtGenerator witness, isogeny_map, psi/psi2, clear_cofactor_g2). The
statement proved here:

    PIs: u0, u1 (two Fp2 field elements, the hash_to_field outputs),
         sgn0(u0), sgn0(u1) (public bits, recomputable from u natively),
         Hm = (x, y) (the resulting G2 point).

    Hm == clear_cofactor(iso_map(sswu(u0) + sswu(u1)))

with the cofactor cleared by the x-scalar-mul / psi decomposition
([h_eff]P = [x]([x]P - P + psi(P)) - P - psi(P) + psi^2([2]P), exactly
the combination the reference proves at hash_to_curve.rs:290-319).

Layout: a static schedule of 12-row windows — 2 SSWU, 1 E2' addition,
1 isogeny, 1 psi, 1 psi^2, and two 64-bit double-and-add scalar-mul
chains of G2 doubles/adds — communicating through six pinned G2-point
registers (ACC/BASE/Q0/P0/PSIP/D2P) whose boundary writes are gated by
PUBLIC constant row selectors (no witness selectors: the schedule is a
compile-time constant of the air). All window families occupy disjoint
windows, so their gadget columns OVERLAY (chips/core.py begin_overlay):
the trace is max(family)-wide, not sum(family)-wide.

Exceptional cases (tv = 0 in SSWU, equal-x additions, doubling the
infinity point) are outside the soundness domain by witnessed-inverse
guards: a statement hitting one is unprovable (probability ~2^-381 over
the message hash; the reference's select-logic circuits instead carry
every branch).

The SSWU square-root branch needs no is-square witness beyond the flag:
g(x2) = Z^3 u^6 g(x1) with Z a non-residue, so exactly one branch has a
root and `y^2 == gx_selected` self-enforces the choice (the reference
witnesses the same fact through its SqrtGenerator candidates,
hash_to_curve.rs:346-446).
"""

from __future__ import annotations

import numpy as np

from ..backend.air import Air
from ..chips import limbs
from ..chips.core import ChipBuilder, FillRecorder, finish_trace, put_rows
from ..chips.fp import RangeCheckGadget, RegPinGadget, _rows_of
from ..chips.fp2 import (
    Fp2AddReduceGadget,
    Fp2ConstMulGadget,
    Fp2MulGadget,
)
from ..chips.g2 import (
    Fp2InvWitnessGadget,
    Fp2NegCanonGadget,
    Fp2ZeroFlagGadget,
    G2AddGadget,
    G2DoubleGadget,
    ParityGadget,
    PsiGadget,
    Psi2Gadget,
    wire_fp2,
)
from ..fields import bls12_381 as bls
from ..fields import hash_to_curve as h2c
from ..fields.bls12_381 import FP2_ONE, FP2_ZERO, fp2_inv, fp2_mul, fp2_neg

NEG_B = fp2_neg(h2c.SSWU_B)


def _fp2_add_const(cb: ChipBuilder, rows, c):
    """Fp2AddReduce with the second operand bound to a public constant."""
    g = Fp2AddReduceGadget(cb, rows)
    cb.bind_const(rows, g.g0.y, limbs.to_limbs(c[0]))
    cb.bind_const(rows, g.g1.y, limbs.to_limbs(c[1]))
    return g


def _reg_pair(cb: ChipBuilder, pin_rows):
    """A pinned Fp2 witness register (c0, c1)."""
    c0, c1 = cb.wit.take(12), cb.wit.take(12)
    RegPinGadget(cb, c0, 12, pin_rows)
    RegPinGadget(cb, c1, 12, pin_rows)
    return (c0, c1)


class SSWUGadget:
    """One simplified-SWU map window (active at every row0 in row0s; the
    air binds a different u / sgn0(u) public input per window).

    Ports: `u` (Fp2 pair, wire/bind at r0+11). Outputs: XO / YO pinned
    witness registers (range-checked). The air emits the select and sign
    constraints via `eval_extra`."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.cb = cb
        self.row0s = list(row0s)
        r11 = _rows_of(self.row0s, 11)
        from ..chips.fp import _all_rows

        pin = _all_rows(self.row0s, 11)
        self.x1 = _reg_pair(cb, pin)
        self.XO = _reg_pair(cb, pin)
        self.YO = _reg_pair(cb, pin)
        self.f = cb.wit.take(1)  # square branch flag
        self.w_aux = cb.wit.take(1)  # z0 * b1 (sgn0 helper)

        self.u2m = Fp2MulGadget(cb, self.row0s)  # u * u
        wire_fp2(cb, r11, (self.u2m.b0, self.u2m.b1), (self.u2m.a0, self.u2m.a1))
        self.u = (self.u2m.a0, self.u2m.a1)
        self.zu2m = Fp2ConstMulGadget(cb, self.row0s, h2c.SSWU_Z)
        wire_fp2(cb, r11, (self.zu2m.a0, self.zu2m.a1), (self.u2m.c0, self.u2m.c1))
        zu2 = (self.zu2m.c0, self.zu2m.c1)
        self.zu4m = Fp2MulGadget(cb, self.row0s)  # zu2^2
        wire_fp2(cb, r11, (self.zu4m.a0, self.zu4m.a1), zu2)
        wire_fp2(cb, r11, (self.zu4m.b0, self.zu4m.b1), zu2)
        self.tvs = Fp2AddReduceGadget(cb, r11)  # tv = zu4 + zu2
        wire_fp2(cb, r11, (self.tvs.g0.x, self.tvs.g1.x), (self.zu4m.c0, self.zu4m.c1))
        wire_fp2(cb, r11, (self.tvs.g0.y, self.tvs.g1.y), zu2)
        tv = (self.tvs.g0.rem, self.tvs.g1.rem)
        self.guard_tv = Fp2InvWitnessGadget(cb, self.row0s)  # tv != 0
        wire_fp2(cb, r11, self.guard_tv.a, tv)
        self.one_tv = _fp2_add_const(cb, r11, FP2_ONE)  # 1 + tv
        wire_fp2(cb, r11, (self.one_tv.g0.x, self.one_tv.g1.x), tv)
        self.numm = Fp2ConstMulGadget(cb, self.row0s, NEG_B)  # -B (1+tv)
        wire_fp2(cb, r11, (self.numm.a0, self.numm.a1), (self.one_tv.g0.rem, self.one_tv.g1.rem))
        self.denm = Fp2ConstMulGadget(cb, self.row0s, h2c.SSWU_A)  # A tv
        wire_fp2(cb, r11, (self.denm.a0, self.denm.a1), tv)
        # x1 * den == num (x1 witnessed; den != 0 since tv != 0, A != 0)
        self.xdm = Fp2MulGadget(cb, self.row0s)
        wire_fp2(cb, r11, (self.xdm.a0, self.xdm.a1), self.x1)
        wire_fp2(cb, r11, (self.xdm.b0, self.xdm.b1), (self.denm.c0, self.denm.c1))
        wire_fp2(cb, r11, (self.xdm.c0, self.xdm.c1), (self.numm.c0, self.numm.c1))
        # gx1 = x1^3 + A x1 + B
        self.x1sq = Fp2MulGadget(cb, self.row0s)
        wire_fp2(cb, r11, (self.x1sq.a0, self.x1sq.a1), self.x1)
        wire_fp2(cb, r11, (self.x1sq.b0, self.x1sq.b1), self.x1)
        self.x1cu = Fp2MulGadget(cb, self.row0s)
        wire_fp2(cb, r11, (self.x1cu.a0, self.x1cu.a1), (self.x1sq.c0, self.x1sq.c1))
        wire_fp2(cb, r11, (self.x1cu.b0, self.x1cu.b1), self.x1)
        self.ax1 = Fp2ConstMulGadget(cb, self.row0s, h2c.SSWU_A)
        wire_fp2(cb, r11, (self.ax1.a0, self.ax1.a1), self.x1)
        self.gx1s = Fp2AddReduceGadget(cb, r11)
        wire_fp2(cb, r11, (self.gx1s.g0.x, self.gx1s.g1.x), (self.x1cu.c0, self.x1cu.c1))
        wire_fp2(cb, r11, (self.gx1s.g0.y, self.gx1s.g1.y), (self.ax1.c0, self.ax1.c1))
        self.gx1 = _fp2_add_const(cb, r11, h2c.SSWU_B)
        wire_fp2(cb, r11, (self.gx1.g0.x, self.gx1.g1.x), (self.gx1s.g0.rem, self.gx1s.g1.rem))
        # x2 = zu2 * x1, gx2 = x2^3 + A x2 + B
        self.x2m = Fp2MulGadget(cb, self.row0s)
        wire_fp2(cb, r11, (self.x2m.a0, self.x2m.a1), zu2)
        wire_fp2(cb, r11, (self.x2m.b0, self.x2m.b1), self.x1)
        x2 = (self.x2m.c0, self.x2m.c1)
        self.x2sq = Fp2MulGadget(cb, self.row0s)
        wire_fp2(cb, r11, (self.x2sq.a0, self.x2sq.a1), x2)
        wire_fp2(cb, r11, (self.x2sq.b0, self.x2sq.b1), x2)
        self.x2cu = Fp2MulGadget(cb, self.row0s)
        wire_fp2(cb, r11, (self.x2cu.a0, self.x2cu.a1), (self.x2sq.c0, self.x2sq.c1))
        wire_fp2(cb, r11, (self.x2cu.b0, self.x2cu.b1), x2)
        self.ax2 = Fp2ConstMulGadget(cb, self.row0s, h2c.SSWU_A)
        wire_fp2(cb, r11, (self.ax2.a0, self.ax2.a1), x2)
        self.gx2s = Fp2AddReduceGadget(cb, r11)
        wire_fp2(cb, r11, (self.gx2s.g0.x, self.gx2s.g1.x), (self.x2cu.c0, self.x2cu.c1))
        wire_fp2(cb, r11, (self.gx2s.g0.y, self.gx2s.g1.y), (self.ax2.c0, self.ax2.c1))
        self.gx2 = _fp2_add_const(cb, r11, h2c.SSWU_B)
        wire_fp2(cb, r11, (self.gx2.g0.x, self.gx2.g1.x), (self.gx2s.g0.rem, self.gx2s.g1.rem))
        # y^2
        self.ysqm = Fp2MulGadget(cb, self.row0s)
        wire_fp2(cb, r11, (self.ysqm.a0, self.ysqm.a1), self.YO)
        wire_fp2(cb, r11, (self.ysqm.b0, self.ysqm.b1), self.YO)
        # outputs range-checked
        self.rc = [RangeCheckGadget(cb, r11) for _ in range(4)]
        cb.wire(r11, self.rc[0].x, self.XO[0], 12)
        cb.wire(r11, self.rc[1].x, self.XO[1], 12)
        cb.wire(r11, self.rc[2].x, self.YO[0], 12)
        cb.wire(r11, self.rc[3].x, self.YO[1], 12)
        # sgn0 machinery on YO
        self.p0 = ParityGadget(cb, r11)
        cb.wire(r11, self.p0.v, self.YO[0], 12)
        self.p1 = ParityGadget(cb, r11)
        cb.wire(r11, self.p1.v, self.YO[1], 12)
        self.z0 = Fp2ZeroFlagGadget(cb, r11, self.YO[0])
        self.sel = cb.indicator(r11)

    def eval_extra(self, ctx):
        """Branch select + sgn0 helper constraints (shared across windows;
        the per-window sgn0-vs-PI binding is emitted by the air)."""
        sel = ctx.const(self.sel)
        f = ctx.local(self.f)
        ctx.constraint(sel * f * (f - 1))
        for k in range(2):
            xo = ctx.local(self.XO[k], 12)
            x1 = ctx.local(self.x1[k], 12)
            x2 = ctx.local((self.x2m.c0, self.x2m.c1)[k], 12)
            ctx.constraint(sel * f * (xo - x1))
            ctx.constraint(sel * (1 - f) * (xo - x2))
            ysq = ctx.local((self.ysqm.c0, self.ysqm.c1)[k], 12)
            g1 = ctx.local((self.gx1.g0.rem, self.gx1.g1.rem)[k], 12)
            g2 = ctx.local((self.gx2.g0.rem, self.gx2.g1.rem)[k], 12)
            ctx.constraint(sel * f * (ysq - g1))
            ctx.constraint(sel * (1 - f) * (ysq - g2))
        # w_aux = z0 * b1 (degree-3 budget helper for the sgn0 formula)
        w = ctx.local(self.w_aux)
        ctx.constraint(sel * (w - ctx.local(self.z0.z) * ctx.local(self.p1.b)))

    def sgn_value(self, ctx):
        """sgn0(YO) = b0 + (1 - b0) * z0 * b1 as a degree-2 expression."""
        b0 = ctx.local(self.p0.b)
        w = ctx.local(self.w_aux)
        return b0 + w - b0 * w

    def fill(self, trace, row0, u):
        r11 = row0 + 11
        u2 = self.u2m.fill(trace, row0, u, u)
        zu2 = self.zu2m.fill(trace, row0, u2)
        zu4 = self.zu4m.fill(trace, row0, zu2, zu2)
        tv = self.tvs.fill(trace, r11, zu4, zu2)
        assert tv != FP2_ZERO, "exceptional SSWU input (tv = 0)"
        self.guard_tv.fill(trace, row0, tv)
        one_tv = self.one_tv.fill(trace, r11, tv, FP2_ONE)
        num = self.numm.fill(trace, row0, one_tv)
        den = self.denm.fill(trace, row0, tv)
        x1 = fp2_mul(num, fp2_inv(den))
        self.xdm.fill(trace, row0, x1, den)
        x1sq = self.x1sq.fill(trace, row0, x1, x1)
        x1cu = self.x1cu.fill(trace, row0, x1sq, x1)
        ax1 = self.ax1.fill(trace, row0, x1)
        gx1s = self.gx1s.fill(trace, r11, x1cu, ax1)
        gx1 = self.gx1.fill(trace, r11, gx1s, h2c.SSWU_B)
        x2 = self.x2m.fill(trace, row0, zu2, x1)
        x2sq = self.x2sq.fill(trace, row0, x2, x2)
        x2cu = self.x2cu.fill(trace, row0, x2sq, x2)
        ax2 = self.ax2.fill(trace, row0, x2)
        gx2s = self.gx2s.fill(trace, r11, x2cu, ax2)
        gx2 = self.gx2.fill(trace, r11, gx2s, h2c.SSWU_B)
        f = 1 if h2c.fp2_is_square(gx1) else 0
        y = h2c.fp2_sqrt(gx1 if f else gx2)
        if h2c.fp2_sgn0(u) != h2c.fp2_sgn0(y):
            y = fp2_neg(y)
        xo = x1 if f else x2
        assert (xo, y) == h2c.map_to_curve_sswu(u)
        self.ysqm.fill(trace, row0, y, y)
        for reg, v in ((self.x1, x1), (self.XO, xo), (self.YO, y)):
            for col, c in zip(reg, v):
                put_rows(trace, row0, col, np.broadcast_to(limbs.to_limbs(c), (12, 12)))
        for rc, v in zip(self.rc, (xo[0], xo[1], y[0], y[1])):
            rc.fill(trace, r11, limbs.to_limbs(v))
        b0 = self.p0.fill(trace, r11, y[0])
        b1 = self.p1.fill(trace, r11, y[1])
        z0 = self.z0.fill(trace, r11, y[0])
        put_rows(trace, r11, self.f, np.asarray([[f]], dtype=np.uint64))
        put_rows(trace, r11, self.w_aux, np.asarray([[z0 * b1]], dtype=np.uint64))
        assert (b0 | (z0 & b1)) == h2c.fp2_sgn0(u)
        return (xo, y)


class IsoGadget:
    """3-isogeny E2' -> E2 (hash_to_curve.rs:203-248 capability): Horner
    evaluation of the four coefficient polynomials + witnessed divisions.
    Ports: x / y (wire at r0+11). Outputs: xo (witnessed, RC'd), yo (the
    final product's reduced output)."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.cb = cb
        self.row0s = list(row0s)
        r11 = _rows_of(self.row0s, 11)
        from ..chips.fp import _all_rows

        pin = _all_rows(self.row0s, 11)
        self.xo = _reg_pair(cb, pin)
        self.t = _reg_pair(cb, pin)  # yn / yd

        def horner(coeffs, xport_hook, monic: bool):
            """Builds gadgets evaluating sum coeffs[i] x^i; returns the
            output rem pair and a fill closure taking (trace, row0, x)."""
            gadgets = []
            cs = list(coeffs)
            if monic:
                assert cs[-1] == FP2_ONE
                acc_add = _fp2_add_const(cb, r11, cs[-2])
                xport_hook(r11, (acc_add.g0.x, acc_add.g1.x))
                out = (acc_add.g0.rem, acc_add.g1.rem)
                gadgets.append(("addx", acc_add, cs[-2]))
                rest = cs[:-2]
            else:
                m = Fp2ConstMulGadget(cb, self.row0s, cs[-1])
                xport_hook(r11, (m.a0, m.a1))
                a = _fp2_add_const(cb, r11, cs[-2])
                wire_fp2(cb, r11, (a.g0.x, a.g1.x), (m.c0, m.c1))
                out = (a.g0.rem, a.g1.rem)
                gadgets.append(("mulc", m, cs[-1]))
                gadgets.append(("add", a, cs[-2]))
                rest = cs[:-2]
            for c in reversed(rest):
                m = Fp2MulGadget(cb, self.row0s)
                wire_fp2(cb, r11, (m.a0, m.a1), out)
                xport_hook(r11, (m.b0, m.b1))
                a = _fp2_add_const(cb, r11, c)
                wire_fp2(cb, r11, (a.g0.x, a.g1.x), (m.c0, m.c1))
                out = (a.g0.rem, a.g1.rem)
                gadgets.append(("mulx", m, None))
                gadgets.append(("add", a, c))
            return out, gadgets

        # x port: every consumer of x registers a wire through this hook
        self._xw = []

        def xhook(rows, dst):
            self._xw.append(dst)

        xn, self.g_xn = horner(h2c.ISO_XNUM, xhook, monic=False)
        xd, self.g_xd = horner(h2c.ISO_XDEN, xhook, monic=True)
        yn, self.g_yn = horner(h2c.ISO_YNUM, xhook, monic=False)
        yd, self.g_yd = horner(h2c.ISO_YDEN, xhook, monic=True)
        # xo * xd == xn, xd != 0
        self.xom = Fp2MulGadget(cb, self.row0s)
        wire_fp2(cb, r11, (self.xom.a0, self.xom.a1), self.xo)
        wire_fp2(cb, r11, (self.xom.b0, self.xom.b1), xd)
        wire_fp2(cb, r11, (self.xom.c0, self.xom.c1), xn)
        self.guard_xd = Fp2InvWitnessGadget(cb, self.row0s)
        wire_fp2(cb, r11, self.guard_xd.a, xd)
        # t * yd == yn, yd != 0; yo = y * t
        self.tm = Fp2MulGadget(cb, self.row0s)
        wire_fp2(cb, r11, (self.tm.a0, self.tm.a1), self.t)
        wire_fp2(cb, r11, (self.tm.b0, self.tm.b1), yd)
        wire_fp2(cb, r11, (self.tm.c0, self.tm.c1), yn)
        self.guard_yd = Fp2InvWitnessGadget(cb, self.row0s)
        wire_fp2(cb, r11, self.guard_yd.a, yd)
        self.yom = Fp2MulGadget(cb, self.row0s)
        wire_fp2(cb, r11, (self.yom.b0, self.yom.b1), self.t)
        self.y = (self.yom.a0, self.yom.a1)
        self.oy = (self.yom.c0, self.yom.c1)
        self.ox = self.xo
        # wire the shared x port: first consumer's columns are canonical
        self.xport = self._xw[0]
        for dst in self._xw[1:]:
            wire_fp2(cb, r11, dst, self.xport)
        self.x = self.xport
        self.rc = [RangeCheckGadget(cb, r11) for _ in range(4)]
        cb.wire(r11, self.rc[0].x, self.xo[0], 12)
        cb.wire(r11, self.rc[1].x, self.xo[1], 12)
        cb.wire(r11, self.rc[2].x, self.t[0], 12)
        cb.wire(r11, self.rc[3].x, self.t[1], 12)

    def _fill_horner(self, trace, row0, gadgets, x):
        r11 = row0 + 11
        acc = None
        for kind, g, c in gadgets:
            if kind == "addx":
                acc = g.fill(trace, r11, x, c)
            elif kind == "mulc":
                acc = g.fill(trace, row0, x)
            elif kind == "add":
                acc = g.fill(trace, r11, acc, c)
            else:  # mulx
                acc = g.fill(trace, row0, acc, x)
        return acc

    def fill(self, trace, row0, p):
        x, y = p
        r11 = row0 + 11
        xn = self._fill_horner(trace, row0, self.g_xn, x)
        xd = self._fill_horner(trace, row0, self.g_xd, x)
        yn = self._fill_horner(trace, row0, self.g_yn, x)
        yd = self._fill_horner(trace, row0, self.g_yd, x)
        xo = fp2_mul(xn, fp2_inv(xd))
        t = fp2_mul(yn, fp2_inv(yd))
        self.xom.fill(trace, row0, xo, xd)
        self.guard_xd.fill(trace, row0, xd)
        self.tm.fill(trace, row0, t, yd)
        self.guard_yd.fill(trace, row0, yd)
        yo = self.yom.fill(trace, row0, y, t)
        for reg, v in ((self.xo, xo), (self.t, t)):
            for col, c in zip(reg, v):
                put_rows(trace, row0, col, np.broadcast_to(limbs.to_limbs(c), (12, 12)))
        for rc, v in zip(self.rc, (xo[0], xo[1], t[0], t[1])):
            rc.fill(trace, r11, limbs.to_limbs(v))
        out = (xo, yo)
        assert out == h2c.iso_map(p)
        return out


# register ids
ACC, BASE, Q0, P0, PSIP, D2P = range(6)
_REG_NAMES = ("ACC", "BASE", "Q0", "P0", "PSIP", "D2P")


class H2CAir(Air):
    """PIs: [u0(24) | u1(24) | sgn0(u0) | sgn0(u1) | hm_x(24) | hm_y(24)].

    `xparam`: the scalar for the two scalar-mul chains (default: the BLS
    x-parameter; tests use a small value for a short schedule — the
    statement becomes the same formula with that scalar)."""

    def __init__(self, xparam: int = bls.BLS_X):
        self.xparam = xparam
        bits = [int(b) for b in bin(xparam)[3:]]  # below the MSB
        # schedule: (kind, ...) per 12-row window
        sched = [("sswu", 0), ("sswu", 1), ("addQ",), ("iso",), ("psi",), ("dbl",), ("psi2",)]
        for _ in range(2):
            for b in bits:
                sched.append(("dbl",))
                if b:
                    sched.append(("addB",))
            sched.append(("addPNA",) if _ == 0 else ("addNN",))
            if _ == 0:
                sched.append(("addNP0",))
            else:
                sched.append(("addNPsi",))
                sched.append(("addD2P",))
        self.sched = sched
        self.n_windows = len(sched)
        self.final_row = 12 * self.n_windows
        self.num_rows = 1 << (self.final_row + 1 - 1).bit_length()
        self.num_pis = 24 + 24 + 2 + 48
        self.PI_U0, self.PI_U1, self.PI_SGN0, self.PI_SGN1 = 0, 24, 48, 49
        self.PI_HM = 50

        cb = ChipBuilder(self.num_rows)
        self.cb = cb
        w = cb.wit
        self.REGS = w.take(6 * 48)  # ACC BASE Q0 P0 PSIP D2P, 48 cols each

        rows_of = {}
        for i, s in enumerate(sched):
            rows_of.setdefault(s[0], []).append(12 * i)
        sswu_rows = rows_of["sswu"]
        dbl_rows = rows_of["dbl"]
        addB_rows = rows_of.get("addB", [])

        # ---- overlaid window families --------------------------------
        cb.begin_overlay()
        self.sswu = SSWUGadget(cb, sswu_rows)
        cb.next_variant()
        self.iso = IsoGadget(cb, rows_of["iso"])
        cb.next_variant()
        self.dbl = G2DoubleGadget(cb, dbl_rows)
        cb.next_variant()
        self.psi = PsiGadget(cb, rows_of["psi"])
        self.psi2 = Psi2Gadget(cb, rows_of["psi2"])
        cb.next_variant()
        self.addQ = G2AddGadget(cb, rows_of["addQ"])
        cb.next_variant()
        self.addB = G2AddGadget(cb, addB_rows) if addB_rows else None
        cb.next_variant()
        # single-window add variants with input negation units
        self.addPNA = self._neg_add(cb, rows_of["addPNA"], neg2=True)  # PSIP + (-ACC)
        cb.next_variant()
        self.addNP0 = self._neg_add(cb, rows_of["addNP0"], neg2=True)  # ACC + (-P0)
        cb.next_variant()
        self.addNN = self._neg_add(cb, rows_of["addNN"], neg1=True, neg2=True)  # (-ACC)+(-P0)
        cb.next_variant()
        self.addNPsi = self._neg_add(cb, rows_of["addNPsi"], neg2=True)  # ACC + (-PSIP)
        cb.next_variant()
        self.addD2P = G2AddGadget(cb, rows_of["addD2P"])  # ACC + D2P
        cb.end_overlay()

        # ---- register wiring: reads ----------------------------------
        def reg(i):
            b = self.REGS + 48 * i
            return ((b, b + 12), (b + 24, b + 36))  # ((x0,x1),(y0,y1))

        self._reg = reg
        r11 = lambda rows: frozenset(r + 11 for r in rows)  # noqa: E731
        wire_fp2(cb, r11(rows_of["addQ"]), self.addQ.x1, reg(Q0)[0])
        wire_fp2(cb, r11(rows_of["addQ"]), self.addQ.y1, reg(Q0)[1])
        wire_fp2(cb, r11(rows_of["addQ"]), self.addQ.x2, reg(ACC)[0])
        wire_fp2(cb, r11(rows_of["addQ"]), self.addQ.y2, reg(ACC)[1])
        wire_fp2(cb, r11(rows_of["iso"]), self.iso.x, reg(ACC)[0])
        wire_fp2(cb, r11(rows_of["iso"]), self.iso.y, reg(ACC)[1])
        wire_fp2(cb, r11(rows_of["psi"]), self.psi.x, reg(P0)[0])
        wire_fp2(cb, r11(rows_of["psi"]), self.psi.y, reg(P0)[1])
        wire_fp2(cb, r11(dbl_rows), self.dbl.x1, reg(ACC)[0])
        wire_fp2(cb, r11(dbl_rows), self.dbl.y1, reg(ACC)[1])
        wire_fp2(cb, r11(rows_of["psi2"]), self.psi2.x, reg(ACC)[0])
        wire_fp2(cb, r11(rows_of["psi2"]), self.psi2.y, reg(ACC)[1])
        if self.addB is not None:
            wire_fp2(cb, r11(addB_rows), self.addB.x1, reg(ACC)[0])
            wire_fp2(cb, r11(addB_rows), self.addB.y1, reg(ACC)[1])
            wire_fp2(cb, r11(addB_rows), self.addB.x2, reg(BASE)[0])
            wire_fp2(cb, r11(addB_rows), self.addB.y2, reg(BASE)[1])
        self._wire_neg_add(cb, rows_of["addPNA"], self.addPNA, PSIP, ACC)
        self._wire_neg_add(cb, rows_of["addNP0"], self.addNP0, ACC, P0)
        self._wire_neg_add(cb, rows_of["addNN"], self.addNN, ACC, P0)
        self._wire_neg_add(cb, rows_of["addNPsi"], self.addNPsi, ACC, PSIP)
        wire_fp2(cb, r11(rows_of["addD2P"]), self.addD2P.x1, reg(ACC)[0])
        wire_fp2(cb, r11(rows_of["addD2P"]), self.addD2P.y1, reg(ACC)[1])
        wire_fp2(cb, r11(rows_of["addD2P"]), self.addD2P.x2, reg(D2P)[0])
        wire_fp2(cb, r11(rows_of["addD2P"]), self.addD2P.y2, reg(D2P)[1])

        # u public-input bindings (per SSWU window)
        cb.bind_pi({sswu_rows[0] + 11}, self.sswu.u[0], self.PI_U0, 12)
        cb.bind_pi({sswu_rows[0] + 11}, self.sswu.u[1], self.PI_U0 + 12, 12)
        cb.bind_pi({sswu_rows[1] + 11}, self.sswu.u[0], self.PI_U1, 12)
        cb.bind_pi({sswu_rows[1] + 11}, self.sswu.u[1], self.PI_U1 + 12, 12)
        # result binding
        cb.bind_pi({self.final_row}, self.REGS, self.PI_HM, 24)
        cb.bind_pi({self.final_row}, self.REGS + 24, self.PI_HM + 24, 24)

        # ---- register write rules (boundary transitions) -------------
        # (rows, reg_id, src column 4-tuple)
        self.write_rules = []
        writes_at: dict = {i: set() for i in range(6)}

        def rule(widx, reg_id, src):
            row = 12 * widx + 11
            self.write_rules.append(({row}, reg_id, src))
            writes_at[reg_id].add(row)

        def copy_rule(widx, reg_id, src_reg):
            (x0, x1), (y0, y1) = reg(src_reg)
            rule(widx, reg_id, (x0, x1, y0, y1))

        def out_cols(g):
            return (g.x3[0], g.x3[1], g.y3[0], g.y3[1])

        sswu_seen = 0
        for i, s in enumerate(sched):
            kind = s[0]
            if kind == "sswu":
                dst = Q0 if sswu_seen == 0 else ACC
                rule(i, dst, (*self.sswu.XO, *self.sswu.YO))
                sswu_seen += 1
            elif kind == "addQ":
                rule(i, ACC, out_cols(self.addQ))
            elif kind == "iso":
                src = (*self.iso.ox, *self.iso.oy)
                rule(i, ACC, src)
                rule(i, P0, src)
            elif kind == "psi":
                rule(i, PSIP, (*self.psi.ox, *self.psi.oy))
            elif kind == "dbl":
                rule(i, ACC, out_cols(self.dbl))
            elif kind == "psi2":
                rule(i, D2P, (*self.psi2.ox, *self.psi2.oy))
                copy_rule(i, ACC, P0)
                copy_rule(i, BASE, P0)
            elif kind == "addB":
                rule(i, ACC, out_cols(self.addB))
            elif kind == "addPNA":
                rule(i, ACC, out_cols(self.addPNA[0]))
            elif kind == "addNP0":
                rule(i, ACC, out_cols(self.addNP0[0]))
                rule(i, BASE, out_cols(self.addNP0[0]))
            elif kind == "addNN":
                rule(i, ACC, out_cols(self.addNN[0]))
            elif kind == "addNPsi":
                rule(i, ACC, out_cols(self.addNPsi[0]))
            elif kind == "addD2P":
                rule(i, ACC, out_cols(self.addD2P))
        # register pinning outside write boundaries
        for rid in range(6):
            pin = frozenset(range(self.final_row)) - writes_at[rid]
            RegPinGadget(cb, self.REGS + 48 * rid, 48, pin)
        self._write_sels = [
            (cb.indicator(rows), reg_id, src) for rows, reg_id, src in self.write_rules
        ]

        cb.finalize_wiring_patterns()
        self._const = cb.build_const_matrix()
        self.num_cols = cb.wit.n

    def _neg_add(self, cb, rows, neg1=False, neg2=False):
        """G2AddGadget + canonical negation units on the selected inputs'
        y components. Returns (add, neg_y1 | None, neg_y2 | None)."""
        g = G2AddGadget(cb, rows)
        r11 = _rows_of(list(rows), 11)
        n1 = n2 = None
        if neg1:
            n1 = Fp2NegCanonGadget(cb, r11)
            wire_fp2(cb, r11, g.y1, (n1.c0, n1.c1))
        if neg2:
            n2 = Fp2NegCanonGadget(cb, r11)
            wire_fp2(cb, r11, g.y2, (n2.c0, n2.c1))
        return (g, n1, n2)

    def _wire_neg_add(self, cb, rows, triple, reg1, reg2):
        g, n1, n2 = triple
        r11 = _rows_of(list(rows), 11)
        (x0a, x1a), (y0a, y1a) = self._reg(reg1)
        (x0b, x1b), (y0b, y1b) = self._reg(reg2)
        wire_fp2(cb, r11, g.x1, (x0a, x1a))
        wire_fp2(cb, r11, g.x2, (x0b, x1b))
        if n1 is None:
            wire_fp2(cb, r11, g.y1, (y0a, y1a))
        else:
            wire_fp2(cb, r11, (n1.a0, n1.a1), (y0a, y1a))
        if n2 is None:
            wire_fp2(cb, r11, g.y2, (y0b, y1b))
        else:
            wire_fp2(cb, r11, (n2.a0, n2.a1), (y0b, y1b))

    def constant_columns(self):
        return self._const

    def eval(self, ctx):
        self.cb.eval_all(ctx)
        self.sswu.eval_extra(ctx)
        # per-window sgn0(u) binding
        for w, pi_idx in ((0, self.PI_SGN0), (12, self.PI_SGN1)):
            sgn = self.sswu.sgn_value(ctx)
            ctx.constraint(sgn - ctx.pi(pi_idx), ("row", w + 11))
        # register write transitions
        for sel_col, reg_id, src in self._write_sels:
            sel = ctx.const(sel_col)
            base = self.REGS + 48 * reg_id
            for k in range(4):
                ctx.constraint_transition(
                    sel[None] * (ctx.next(base + 12 * k, 12) - ctx.local(src[k], 12))
                )

    # ------------------------------------------------------------------
    def generate_trace(self, u0, u1, device: bool = False):
        """u0/u1: Fp2 pairs (hash_to_field outputs). Returns (trace, pis)."""
        trace = FillRecorder(self.num_rows, self.num_cols)
        regs = [None] * 6
        regvals = np.zeros((self.final_row + 1, 288), dtype=np.uint64)

        def set_reg(rid, val):
            regs[rid] = val

        def reg_limbs():
            out = np.zeros(288, dtype=np.uint64)
            for rid, v in enumerate(regs):
                if v is None:
                    continue
                (x, y) = v
                out[48 * rid : 48 * rid + 12] = limbs.to_limbs(x[0])
                out[48 * rid + 12 : 48 * rid + 24] = limbs.to_limbs(x[1])
                out[48 * rid + 24 : 48 * rid + 36] = limbs.to_limbs(y[0])
                out[48 * rid + 36 : 48 * rid + 48] = limbs.to_limbs(y[1])
            return out

        sswu_seen = 0
        for i, s in enumerate(self.sched):
            r0 = 12 * i
            regvals[r0 : r0 + 12] = reg_limbs()
            kind = s[0]
            if kind == "sswu":
                u = u0 if sswu_seen == 0 else u1
                out = self.sswu.fill(trace, r0, u)
                set_reg(Q0 if sswu_seen == 0 else ACC, out)
                sswu_seen += 1
            elif kind == "addQ":
                set_reg(ACC, self.addQ.fill(trace, r0, regs[Q0], regs[ACC]))
            elif kind == "iso":
                out = self.iso.fill(trace, r0, regs[ACC])
                set_reg(ACC, out)
                set_reg(P0, out)
            elif kind == "psi":
                set_reg(PSIP, self.psi.fill(trace, r0, regs[P0]))
            elif kind == "dbl":
                set_reg(ACC, self.dbl.fill(trace, r0, regs[ACC]))
            elif kind == "psi2":
                set_reg(D2P, self.psi2.fill(trace, r0, regs[ACC]))
                set_reg(ACC, regs[P0])
                set_reg(BASE, regs[P0])
            elif kind == "addB":
                set_reg(ACC, self.addB.fill(trace, r0, regs[ACC], regs[BASE]))
            elif kind == "addPNA":
                out = self._fill_neg_add(trace, r0, self.addPNA, regs[PSIP], regs[ACC])
                set_reg(ACC, out)
            elif kind == "addNP0":
                out = self._fill_neg_add(trace, r0, self.addNP0, regs[ACC], regs[P0])
                set_reg(ACC, out)
                set_reg(BASE, out)
            elif kind == "addNN":
                out = self._fill_neg_add(trace, r0, self.addNN, regs[ACC], regs[P0])
                set_reg(ACC, out)
            elif kind == "addNPsi":
                out = self._fill_neg_add(trace, r0, self.addNPsi, regs[ACC], regs[PSIP])
                set_reg(ACC, out)
            elif kind == "addD2P":
                set_reg(ACC, self.addD2P.fill(trace, r0, regs[ACC], regs[D2P]))
        regvals[self.final_row] = reg_limbs()
        put_rows(trace, 0, self.REGS, regvals)
        hm = regs[ACC]
        assert hm == self.expected_native(u0, u1)
        pis = []
        for v in (u0[0], u0[1], u1[0], u1[1]):
            pis.extend(int(x) for x in limbs.to_limbs(v))
        pis.append(h2c.fp2_sgn0(u0))
        pis.append(h2c.fp2_sgn0(u1))
        for v in (hm[0][0], hm[0][1], hm[1][0], hm[1][1]):
            pis.extend(int(x) for x in limbs.to_limbs(v))
        return finish_trace(self, trace, device), pis

    def _fill_neg_add(self, trace, r0, triple, p1, p2):
        g, n1, n2 = triple
        r11 = r0 + 11
        if n1 is not None:
            n1.fill(trace, r11, p1[1])
            p1 = (p1[0], fp2_neg(p1[1]))
        if n2 is not None:
            n2.fill(trace, r11, p2[1])
            p2 = (p2[0], fp2_neg(p2[1]))
        return g.fill(trace, r0, p1, p2)

    def expected_native(self, u0, u1):
        """The statement's native value: the clear-cofactor formula with
        this air's xparam over iso(sswu(u0) + sswu(u1))."""
        p = h2c.iso_map(h2c.g2_add(h2c.map_to_curve_sswu(u0), h2c.map_to_curve_sswu(u1)))
        x = self.xparam
        xp_ = h2c.g2_neg(h2c.g2_scalar_mul(p, x))
        psip = h2c.psi(p)
        t1 = h2c.g2_add(h2c.g2_add(xp_, h2c.g2_neg(p)), psip)
        t2 = h2c.g2_neg(h2c.g2_scalar_mul(t1, x))
        res = h2c.g2_add(h2c.g2_add(t2, h2c.g2_neg(p)), h2c.g2_neg(psip))
        return h2c.g2_add(res, h2c.psi2(h2c.g2_double(p)))
