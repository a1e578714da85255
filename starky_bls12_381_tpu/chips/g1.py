"""G1 affine-addition gadget over 12-row windows.

Capability-parity with the reference's `g1.rs` (fill `:26-254`, constraints
`:257-604`): verifies P3 = P1 + P2 without computing the slope, via the two
identities it asserts at `g1.rs:181,252`:

    (y2 - y1)^2           == (x1 + x2 + x3) * (x2 - x1)^2
    (y1 + y3) * (x2 - x1) == (y2 - y1) * (x1 - x3)

decomposed into this backend's fp gadgets. x3/y3 are witnessed and
range-checked. NOTE (same as the reference): the identities degenerate when
x1 == x2 (point doubling / inverse) — the aggregation stark's selection
logic must only consume outputs for genuine unequal additions.
"""

from __future__ import annotations

from ..fields import bls12_381 as bls
from . import limbs
from .core import ChipBuilder
from .fp import FpMulReduceGadget, RangeCheckGadget, _rows_of
from .fp2 import FpAddReduceGadget, FpSubReduceGadget


class G1AddGadget:
    """Ports: x1/y1/x2/y2 (wire inputs at window row r0+11), outputs
    x3/y3 = witness registers (range-checked, available at r0+11)."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.cb = cb
        self.row0s = list(row0s)
        r11 = _rows_of(self.row0s, 11)
        w = cb.wit
        self.x3 = w.take(12)
        self.y3 = w.take(12)
        self.d1 = FpSubReduceGadget(cb, r11)  # y2 - y1
        self.d2 = FpSubReduceGadget(cb, r11)  # x2 - x1
        self.s1 = FpAddReduceGadget(cb, r11)  # x1 + x2
        self.s2 = FpAddReduceGadget(cb, r11)  # s1 + x3
        self.q1 = FpMulReduceGadget(cb, self.row0s)  # d1 * d1
        self.q2 = FpMulReduceGadget(cb, self.row0s)  # d2 * d2
        self.q3 = FpMulReduceGadget(cb, self.row0s)  # s2 * q2
        self.s3 = FpAddReduceGadget(cb, r11)  # y1 + y3
        self.d3 = FpSubReduceGadget(cb, r11)  # x1 - x3
        self.l1 = FpMulReduceGadget(cb, self.row0s)  # s3 * d2
        self.l2 = FpMulReduceGadget(cb, self.row0s)  # d1 * d3
        self.rc_x3 = RangeCheckGadget(cb, r11)
        self.rc_y3 = RangeCheckGadget(cb, r11)

        # ports (wire your sources to these at r11)
        self.x1, self.y1 = self.d2.y, self.d1.y
        self.x2, self.y2 = self.d2.x, self.d1.x
        # internal ties
        cb.wire(r11, self.s1.x, self.x1, 12)
        cb.wire(r11, self.s1.y, self.x2, 12)
        cb.wire(r11, self.s2.x, self.s1.rem, 12)
        cb.wire(r11, self.s2.y, self.x3, 12)
        cb.wire(r11, self.q1.x, self.d1.rem, 12)
        cb.wire(r11, self.q1.y, self.d1.rem, 12)
        cb.wire(r11, self.q2.x, self.d2.rem, 12)
        cb.wire(r11, self.q2.y, self.d2.rem, 12)
        cb.wire(r11, self.q3.x, self.s2.rem, 12)
        cb.wire(r11, self.q3.y, self.q2.rem, 12)
        cb.wire(r11, self.q1.rem, self.q3.rem, 12)  # identity 1
        cb.wire(r11, self.s3.x, self.y1, 12)
        cb.wire(r11, self.s3.y, self.y3, 12)
        cb.wire(r11, self.d3.x, self.x1, 12)
        cb.wire(r11, self.d3.y, self.x3, 12)
        cb.wire(r11, self.l1.x, self.s3.rem, 12)
        cb.wire(r11, self.l1.y, self.d2.rem, 12)
        cb.wire(r11, self.l2.x, self.d1.rem, 12)
        cb.wire(r11, self.l2.y, self.d3.rem, 12)
        cb.wire(r11, self.l1.rem, self.l2.rem, 12)  # identity 2
        cb.wire(r11, self.rc_x3.x, self.x3, 12)
        cb.wire(r11, self.rc_y3.x, self.y3, 12)

    def fill(self, trace, row0, p1, p2):
        """Fill one window with the addition p1 + p2 (x1 != x2 required)."""
        (x1, y1), (x2, y2) = p1, p2
        x3, y3 = bls.g1_add(p1, p2)
        r11 = row0 + 11
        from .core import put

        put(trace, r11, self.x3, limbs.to_limbs(x3))
        put(trace, r11, self.y3, limbs.to_limbs(y3))
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
        self.rc_x3.fill(trace, r11, limbs.to_limbs(x3))
        self.rc_y3.fill(trace, r11, limbs.to_limbs(y3))
        return (x3, y3)
