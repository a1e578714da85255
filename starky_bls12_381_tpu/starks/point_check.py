"""Point-decompression check STARKs: pk_point_check / signature_point_check.

Parity targets: the reference proves, inside its aggregation SNARK, that
each of the 512 compressed G1 pubkeys decompresses to the affine point fed
to the ECC stark (`g1_plonky2.rs:11-56`: b-flag zero, a-flag = floor(2y/p),
x-limbs match the compressed bytes) and likewise the 96-byte G2 signature
(`g2_plonky2.rs:241-302`). Here the same statements are proved as two
STARKs at rate 1 / degree <= 3:

* `PkPointCheckAir(num_points)` — one 12-row window per pubkey proving
  y^2 = x^3 + 4 (mod p) via three mul-reduce gadgets, plus the sign
  witness a = floor(2y/p) via `SignGadget` (conditional subtraction by
  (p+1)/2 with a range-checked remainder). PIs per point: [x12 | y12 | a].
* `SigPointCheckAir` — a single window proving the G2 on-curve identity
  y^2 = x^3 + 4(1+u) over Fp2 plus the ZCash lexicographic sign
  a = sgn(y.c1) if y.c1 != 0 else sgn(y.c0), with an in-proof zero test
  (z * u = 0, u * uinv = 1 - z over the Goldilocks sum of y.c1's limbs).
  PIs: [x0 | x1 | y0 | y1 | a].

The byte-level plumbing (x limbs <-> compressed bytes, flag bit
extraction) is linear over PUBLIC data and re-checked natively by the
aggregate link layer — the proof carries all the field arithmetic, so a
verifier holding compressed inputs does no curve math per point.
"""

from __future__ import annotations

import numpy as np

from ..backend.air import Air
from ..chips import limbs
from ..chips.core import ChipBuilder, FillRecorder, finish_trace, put
from ..chips.fp import FpMulReduceGadget, SignGadget, _rows_of
from ..chips.fp2 import Fp2MulGadget, FpAddReduceGadget
from ..fields import bls12_381 as bls
from ..fields import goldilocks as gl


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


class PkPointCheckAir(Air):
    """num_points G1 decompression checks; PIs = [x12 y12 a] per point."""

    def __init__(self, num_points: int = 512):
        self.num_points = num_points
        self.num_rows = max(64, _next_pow2(12 * num_points))
        self.num_pis = 25 * num_points

        cb = ChipBuilder(self.num_rows)
        self.cb = cb
        row0s = [12 * i for i in range(num_points)]
        self.row0s = row0s
        r0 = _rows_of(row0s, 0)
        r11 = _rows_of(row0s, 11)

        self.ysq = FpMulReduceGadget(cb, row0s)  # y * y
        cb.wire(r0, self.ysq.y, self.ysq.x, 12)
        self.xsq = FpMulReduceGadget(cb, row0s)  # x * x
        cb.wire(r0, self.xsq.y, self.xsq.x, 12)
        self.xcu = FpMulReduceGadget(cb, row0s)  # x^2 * x
        cb.wire(r0, self.xcu.x, self.xsq.rem, 12)
        cb.wire(r0, self.xcu.y, self.xsq.x, 12)
        self.rhs = FpAddReduceGadget(cb, r11)  # x^3 + 4
        cb.bind_const(r11, self.rhs.y, limbs.to_limbs(4))
        cb.wire(r11, self.rhs.x, self.xcu.rem, 12)
        # on-curve: y^2 == x^3 + 4 (both reduced+range-checked)
        cb.wire(r11, self.rhs.rem, self.ysq.rem, 12)
        self.sign = SignGadget(cb, r0)
        cb.wire(r0, self.sign.y, self.ysq.x, 12)

        for i in range(num_points):
            rows = {12 * i}
            cb.bind_pi(rows, self.xsq.x, 25 * i, 12)
            cb.bind_pi(rows, self.ysq.x, 25 * i + 12, 12)
            cb.bind_pi(rows, self.sign.f, 25 * i + 24, 1)

        cb.finalize_wiring_patterns()
        self._const = cb.build_const_matrix()
        self.num_cols = cb.wit.n

    def constant_columns(self):
        return self._const

    def eval(self, ctx):
        self.cb.eval_all(ctx)

    def generate_trace(self, points, device: bool = False):
        """points: [(x, y)] affine, on-curve, y canonical (< p)."""
        assert len(points) == self.num_points
        trace = FillRecorder(self.num_rows, self.num_cols)
        pis = []
        for i, (x, y) in enumerate(points):
            r0 = 12 * i
            assert 0 <= x < bls.P381 and 0 <= y < bls.P381
            assert (y * y - x * x * x - 4) % bls.P381 == 0, "point not on curve"
            self.ysq.fill(trace, r0, y, y)
            x2 = self.xsq.fill(trace, r0, x, x)
            x3 = self.xcu.fill(trace, r0, x2, x)
            self.rhs.fill(trace, r0 + 11, x3, 4)
            a = self.sign.fill(trace, r0, y)
            pis.extend(int(v) for v in limbs.to_limbs(x))
            pis.extend(int(v) for v in limbs.to_limbs(y))
            pis.append(a)
        return finish_trace(self, trace, device), pis


class SigPointCheckAir(Air):
    """One G2 decompression check; PIs = [x0(12) x1(12) y0(12) y1(12) a]."""

    def __init__(self):
        self.num_rows = 16
        self.num_pis = 49

        cb = ChipBuilder(self.num_rows)
        self.cb = cb
        row0s = [0]
        r0 = _rows_of(row0s, 0)
        r11 = _rows_of(row0s, 11)

        self.ysq = Fp2MulGadget(cb, row0s)  # y * y
        cb.wire(r0, self.ysq.b0, self.ysq.a0, 12)
        cb.wire(r0, self.ysq.b1, self.ysq.a1, 12)
        self.xsq = Fp2MulGadget(cb, row0s)  # x * x
        cb.wire(r0, self.xsq.b0, self.xsq.a0, 12)
        cb.wire(r0, self.xsq.b1, self.xsq.a1, 12)
        self.xcu = Fp2MulGadget(cb, row0s)  # x^2 * x
        cb.wire(r0, self.xcu.a0, self.xsq.c0, 12)
        cb.wire(r0, self.xcu.a1, self.xsq.c1, 12)
        cb.wire(r0, self.xcu.b0, self.xsq.a0, 12)
        cb.wire(r0, self.xcu.b1, self.xsq.a1, 12)
        # rhs = x^3 + (4 + 4u)  (B for the G2 curve)
        self.rhs0 = FpAddReduceGadget(cb, r11)
        self.rhs1 = FpAddReduceGadget(cb, r11)
        cb.bind_const(r11, self.rhs0.y, limbs.to_limbs(4))
        cb.bind_const(r11, self.rhs1.y, limbs.to_limbs(4))
        cb.wire(r11, self.rhs0.x, self.xcu.c0, 12)
        cb.wire(r11, self.rhs1.x, self.xcu.c1, 12)
        cb.wire(r11, self.rhs0.rem, self.ysq.c0, 12)
        cb.wire(r11, self.rhs1.rem, self.ysq.c1, 12)
        # lexicographic sign: a = z ? sgn(y0) : sgn(y1), z = (y.c1 == 0)
        self.sign0 = SignGadget(cb, r0)
        self.sign1 = SignGadget(cb, r0)
        cb.wire(r0, self.sign0.y, self.ysq.a0, 12)
        cb.wire(r0, self.sign1.y, self.ysq.a1, 12)
        self.z = cb.wit.take(1)
        self.uinv = cb.wit.take(1)
        self.sel0 = cb.indicator(frozenset({0}))

        cb.bind_pi({0}, self.xsq.a0, 0, 12)
        cb.bind_pi({0}, self.xsq.a1, 12, 12)
        cb.bind_pi({0}, self.ysq.a0, 24, 12)
        cb.bind_pi({0}, self.ysq.a1, 36, 12)

        cb.finalize_wiring_patterns()
        self._const = cb.build_const_matrix()
        self.num_cols = cb.wit.n

    def constant_columns(self):
        return self._const

    def eval(self, ctx):
        self.cb.eval_all(ctx)
        sel = ctx.const(self.sel0)
        z = ctx.local(self.z)
        uinv = ctx.local(self.uinv)
        # u = Goldilocks sum of y.c1's limbs: zero iff y.c1 == 0 (12 * 2^32
        # cannot wrap the Goldilocks modulus)
        u = ctx.local(self.ysq.a1, 12).sum0()
        ctx.constraint(sel * z * (z - 1))
        ctx.constraint(sel * (z * u))
        ctx.constraint(sel * (u * uinv - (1 - z)))
        f0 = ctx.local(self.sign0.f)
        f1 = ctx.local(self.sign1.f)
        ctx.constraint(sel * (ctx.pi(48) - z * f0 - (1 - z) * f1))

    def generate_trace(self, x, y, device: bool = False):
        """x, y: Fp2 pairs (c0, c1) of the affine signature point."""
        rhs = bls.fp2_add(bls.fp2_mul(bls.fp2_mul(x, x), x), (4, 4))
        assert bls.fp2_mul(y, y) == tuple(c % bls.P381 for c in rhs), "not on G2 curve"
        trace = FillRecorder(self.num_rows, self.num_cols)
        self.ysq.fill(trace, 0, y, y)
        x2 = self.xsq.fill(trace, 0, x, x)
        x3 = self.xcu.fill(trace, 0, x2, x)
        self.rhs0.fill(trace, 11, x3[0], 4)
        self.rhs1.fill(trace, 11, x3[1], 4)
        f0 = self.sign0.fill(trace, 0, y[0])
        f1 = self.sign1.fill(trace, 0, y[1])
        z = 1 if y[1] == 0 else 0
        u = sum(int(v) for v in limbs.to_limbs(y[1])) % gl.P
        uinv = pow(u, gl.P - 2, gl.P) if u else 0
        put(trace, 0, self.z, np.asarray([z], dtype=np.uint64))
        put(trace, 0, self.uinv, np.asarray([uinv], dtype=np.uint64))
        a = f0 if z else f1
        pis = []
        for v in (x[0], x[1], y[0], y[1]):
            pis.extend(int(w) for w in limbs.to_limbs(v))
        pis.append(int(a))
        return finish_trace(self, trace, device), pis
