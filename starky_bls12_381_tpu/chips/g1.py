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

    def fill_degenerate(self, trace, row0, p):
        """Fill one window with BOTH inputs equal to p (x2 == x1): the two
        chord identities hold vacuously ((y2-y1)^2 = 0 = (x1+x2+x3)*0 and
        0 = 0), so x3/y3 are filled as 0 and the aggregation air's
        selection flags route the result from the DOUBLING gadget instead
        (the chord output is gated off by u - u_d)."""
        (x1, y1) = p
        r11 = row0 + 11
        from .core import put

        put(trace, r11, self.x3, limbs.to_limbs(0))
        put(trace, r11, self.y3, limbs.to_limbs(0))
        d1 = self.d1.fill(trace, r11, y1, y1)
        d2 = self.d2.fill(trace, r11, x1, x1)
        s1 = self.s1.fill(trace, r11, x1, x1)
        s2 = self.s2.fill(trace, r11, s1, 0)
        q1 = self.q1.fill(trace, row0, d1, d1)
        q2 = self.q2.fill(trace, row0, d2, d2)
        q3 = self.q3.fill(trace, row0, s2, q2)
        assert q1 == 0 and q3 == 0
        s3 = self.s3.fill(trace, r11, y1, 0)
        l1 = self.l1.fill(trace, row0, s3, d2)
        l2 = self.l2.fill(trace, row0, d1, self.d3.fill(trace, r11, x1, 0))
        assert l1 == 0 and l2 == 0
        self.rc_x3.fill(trace, r11, limbs.to_limbs(0))
        self.rc_y3.fill(trace, r11, limbs.to_limbs(0))


class G1DoubleGadget:
    """P3 = 2*P1 over a 12-row window, slope-free like G1AddGadget, via
    the tangent identities (cf. the reference's SNARK-side `g2_double`,
    g2_plonky2.rs:57-110 — the reference has no STARK-side doubling, which
    is exactly why its ECC aggregation cannot aggregate a committee with a
    duplicate pubkey):

        (3*x1^2)^2        == (2*y1)^2 * (2*x1 + x3)
        3*x1^2 * (x1-x3)  == 2*y1 * (y3 + y1)

    Complete for every affine point of G1: y1 = 0 would be a 2-torsion
    point, and |E(Fp)| = h*r is odd for BLS12-381, so no such point
    exists. SOUNDNESS ASSUMPTION: identity 1 uniquely determines x3 only
    when y1 != 0, and the no-2-torsion argument covers ON-CURVE points
    only — an off-curve input with y1 = 0 (e.g. (0,0)) would leave x3/y3
    unconstrained. The aggregation air does not constrain its inputs
    on-curve; like the reference (aggregate_proof.rs pk_point_check),
    soundness relies on the companion PkPointCheck STARK proving every
    pubkey on-curve, with the ECC stark's point PIs bound to the same
    statement bytes (aggregate.check_aggregate_links). Ports: x1/y1
    (wire at r0+11); outputs x3/y3 (range-checked witnesses at r0+11)."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.cb = cb
        self.row0s = list(row0s)
        r11 = _rows_of(self.row0s, 11)
        w = cb.wit
        self.x3 = w.take(12)
        self.y3 = w.take(12)
        self.t1 = FpMulReduceGadget(cb, self.row0s)  # x1 * x1
        self.sa = FpAddReduceGadget(cb, r11)  # t1 + t1
        self.t2 = FpAddReduceGadget(cb, r11)  # sa + t1 = 3*x1^2
        self.t3 = FpAddReduceGadget(cb, r11)  # y1 + y1
        self.q1 = FpMulReduceGadget(cb, self.row0s)  # t2 * t2
        self.s1 = FpAddReduceGadget(cb, r11)  # x1 + x1
        self.s2 = FpAddReduceGadget(cb, r11)  # s1 + x3
        self.q2 = FpMulReduceGadget(cb, self.row0s)  # t3 * t3
        self.q3 = FpMulReduceGadget(cb, self.row0s)  # q2 * s2
        self.d = FpSubReduceGadget(cb, r11)  # x1 - x3
        self.l1 = FpMulReduceGadget(cb, self.row0s)  # t2 * d
        self.s3 = FpAddReduceGadget(cb, r11)  # y3 + y1
        self.l2 = FpMulReduceGadget(cb, self.row0s)  # t3 * s3
        self.rc_x3 = RangeCheckGadget(cb, r11)
        self.rc_y3 = RangeCheckGadget(cb, r11)

        # ports
        self.x1 = self.t1.x
        self.y1 = self.t3.x
        # internal ties
        cb.wire(r11, self.t1.y, self.x1, 12)
        cb.wire(r11, self.sa.x, self.t1.rem, 12)
        cb.wire(r11, self.sa.y, self.t1.rem, 12)
        cb.wire(r11, self.t2.x, self.sa.rem, 12)
        cb.wire(r11, self.t2.y, self.t1.rem, 12)
        cb.wire(r11, self.t3.y, self.y1, 12)
        cb.wire(r11, self.q1.x, self.t2.rem, 12)
        cb.wire(r11, self.q1.y, self.t2.rem, 12)
        cb.wire(r11, self.s1.x, self.x1, 12)
        cb.wire(r11, self.s1.y, self.x1, 12)
        cb.wire(r11, self.s2.x, self.s1.rem, 12)
        cb.wire(r11, self.s2.y, self.x3, 12)
        cb.wire(r11, self.q2.x, self.t3.rem, 12)
        cb.wire(r11, self.q2.y, self.t3.rem, 12)
        cb.wire(r11, self.q3.x, self.q2.rem, 12)
        cb.wire(r11, self.q3.y, self.s2.rem, 12)
        cb.wire(r11, self.q1.rem, self.q3.rem, 12)  # identity 1
        cb.wire(r11, self.d.x, self.x1, 12)
        cb.wire(r11, self.d.y, self.x3, 12)
        cb.wire(r11, self.l1.x, self.t2.rem, 12)
        cb.wire(r11, self.l1.y, self.d.rem, 12)
        cb.wire(r11, self.s3.x, self.y3, 12)
        cb.wire(r11, self.s3.y, self.y1, 12)
        cb.wire(r11, self.l2.x, self.t3.rem, 12)
        cb.wire(r11, self.l2.y, self.s3.rem, 12)
        cb.wire(r11, self.l1.rem, self.l2.rem, 12)  # identity 2
        cb.wire(r11, self.rc_x3.x, self.x3, 12)
        cb.wire(r11, self.rc_y3.x, self.y3, 12)

    def fill(self, trace, row0, p):
        """Fill one window with the doubling of p."""
        (x1, y1) = p
        x3, y3 = bls.g1_double(p)
        r11 = row0 + 11
        from .core import put

        put(trace, r11, self.x3, limbs.to_limbs(x3))
        put(trace, r11, self.y3, limbs.to_limbs(y3))
        t1 = self.t1.fill(trace, row0, x1, x1)
        sa = self.sa.fill(trace, r11, t1, t1)
        t2 = self.t2.fill(trace, r11, sa, t1)
        t3 = self.t3.fill(trace, r11, y1, y1)
        q1 = self.q1.fill(trace, row0, t2, t2)
        s1 = self.s1.fill(trace, r11, x1, x1)
        s2 = self.s2.fill(trace, r11, s1, x3)
        q2 = self.q2.fill(trace, row0, t3, t3)
        q3 = self.q3.fill(trace, row0, q2, s2)
        assert q1 == q3
        d = self.d.fill(trace, r11, x1, x3)
        l1 = self.l1.fill(trace, row0, t2, d)
        s3 = self.s3.fill(trace, r11, y3, y1)
        l2 = self.l2.fill(trace, row0, t3, s3)
        assert l1 == l2
        self.rc_x3.fill(trace, r11, limbs.to_limbs(x3))
        self.rc_y3.fill(trace, r11, limbs.to_limbs(y3))
        return (x3, y3)
