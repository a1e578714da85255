"""ECCAggregateStark: aggregates NUM_POINTS G1 public keys by selected bits.

Capability-parity with the reference's `ecc_aggregate.rs` (NUM_POINTS=512
sequential additions, 12 rows each, skip logic for bit=0 points and
infinity-accumulator bootstrap, PIs = all points + bits + result;
`ecc_aggregate.rs:7-20, 37-82, 92-268`). Differences by design:

* ONE shared G1-addition block + one accumulator register set active over
  all windows (the reference also overlays one block, but gates with
  witness one-hot columns; here all schedule selectors are public constant
  columns);
* selection logic uses constrained helper flags u = b*(1-inf), l = b*inf
  to keep every constraint at degree <= 3 => rate_bits=1 (the reference is
  degree 4 => rate 2);
* accumulator updates: acc' = (1-b)*acc + l*point + (u-u_d)*add(acc, point)
  + u_d*double(acc);
* COMPLETE addition (beyond the reference, whose chord identities are
  vacuous at x1 == x2 so a committee containing a duplicate pubkey is
  unprovable, ecc_aggregate.rs/g1.rs): a witness flag u_d selects a
  G1DoubleGadget tangent window when acc == point. u_d = 1 forces
  acc == point (both reduced differences of the chord window pinned to
  zero); u_d = 0 (with u = 1) forces acc.x != point.x via an inverse
  witness (inv * (x2 - x1) == 1), so a malicious prover cannot route a
  degenerate chord result into the accumulator.

Remaining (documented) completeness gap, shared with the reference: a
prefix sum hitting the point at infinity (acc == -point mid-stream)
cannot be represented by the affine accumulator. For real pubkeys this
requires a hash collision onto the accumulator's negation.
"""

from __future__ import annotations

import numpy as np

from ..backend.air import Air
from ..chips import limbs
from ..chips.core import ChipBuilder, put, put_rows
from ..chips.fp import FpMulReduceGadget, RegPinGadget, _rows_of
from ..chips.g1 import G1AddGadget, G1DoubleGadget
from ..fields import bls12_381 as bls

DUMMY_P1 = bls.G1_GEN
DUMMY_P2 = bls.g1_double(bls.G1_GEN)


class ECCAggregateAir(Air):
    def __init__(self, num_points: int = 512):
        self.num_points = num_points
        need = 12 * num_points + 2
        self.num_rows = 1 << (need - 1).bit_length()
        self.num_pis = num_points * 24 + num_points + 24
        self.PIS_POINTS = 0
        self.PIS_BITS = num_points * 24
        self.PIS_RES = num_points * 24 + num_points

        cb = ChipBuilder(self.num_rows)
        self.cb = cb
        row0s = [12 * i for i in range(num_points)]
        self.row0s = row0s
        w = cb.wit
        self.acc_x = w.take(12)
        self.acc_y = w.take(12)
        self.acc_inf = w.take(1)
        self.b = w.take(1)
        self.u = w.take(1)
        self.l = w.take(1)
        self.u_d = w.take(1)  # doubling flag: acc == point, use tangent window
        self.px = w.take(12)
        self.py = w.take(12)
        self.add = G1AddGadget(cb, row0s)
        self.dbl = G1DoubleGadget(cb, row0s)
        # chord-distinctness witness: inv * (x2 - x1) == 1 when u - u_d = 1
        self.inv_chk = FpMulReduceGadget(cb, row0s)
        cb.wire(_rows_of(row0s, 11), self.inv_chk.y, self.add.d2.rem, 12)

        pin_rows = frozenset(r + i for r in row0s for i in range(11))
        for col, width in [
            (self.acc_x, 12), (self.acc_y, 12), (self.acc_inf, 1), (self.b, 1),
            (self.u, 1), (self.l, 1), (self.u_d, 1), (self.px, 12), (self.py, 12),
        ]:
            RegPinGadget(cb, col, width, pin_rows)

        # PI bindings: per-window point/bit at the window's first row
        for i in range(num_points):
            cb.bind_pi({12 * i}, self.px, self.PIS_POINTS + 24 * i, 12)
            cb.bind_pi({12 * i}, self.py, self.PIS_POINTS + 24 * i + 12, 12)
            cb.bind_pi({12 * i}, self.b, self.PIS_BITS + i, 1)
        # final accumulator -> RES at the row after the last window
        cb.bind_pi({12 * num_points}, self.acc_x, self.PIS_RES, 12)
        cb.bind_pi({12 * num_points}, self.acc_y, self.PIS_RES + 12, 12)
        # bootstrap: accumulator starts at infinity
        cb.bind_const({0}, self.acc_inf, [1])
        cb.bind_const({0}, self.acc_x, [0] * 12)
        cb.bind_const({0}, self.acc_y, [0] * 12)

        self.sel_r11 = cb.indicator(_rows_of(row0s, 11))
        cb.finalize_wiring_patterns()
        self._const = cb.build_const_matrix()
        self.num_cols = cb.wit.n

    def constant_columns(self):
        return self._const

    def eval(self, ctx):
        self.cb.eval_all(ctx)
        sel = ctx.const(self.sel_r11)
        b = ctx.local(self.b)
        inf = ctx.local(self.acc_inf)
        u, low = ctx.local(self.u), ctx.local(self.l)
        ud = ctx.local(self.u_d)
        # flag definitions + booleanity
        ctx.constraint(sel * (u - b * (1 - inf)))
        ctx.constraint(sel * (low - b * inf))
        ctx.constraint(sel * b * (1 - b))
        ctx.constraint(sel * inf * (1 - inf))
        ctx.constraint(sel * ud * (1 - ud))
        ctx.constraint(sel * ud * (1 - u))  # u_d => u
        # gated addition-input wiring: whenever an addition window is live
        # (chord or doubling — the doubling case needs the chord window's
        # reduced differences to witness acc == point)
        ax, ay = ctx.local(self.acc_x, 12), ctx.local(self.acc_y, 12)
        px, py = ctx.local(self.px, 12), ctx.local(self.py, 12)
        ctx.constraint(sel * u * (ctx.local(self.add.x1, 12) - ax))
        ctx.constraint(sel * u * (ctx.local(self.add.y1, 12) - ay))
        ctx.constraint(sel * u * (ctx.local(self.add.x2, 12) - px))
        ctx.constraint(sel * u * (ctx.local(self.add.y2, 12) - py))
        # doubling-input wiring + case analysis:
        #   u_d = 1 -> acc == point (chord diffs pinned to 0), tangent window
        #   u_d = 0, u = 1 -> acc.x != point.x (inverse witness hits 1)
        ctx.constraint(sel * ud * (ctx.local(self.dbl.x1, 12) - ax))
        ctx.constraint(sel * ud * (ctx.local(self.dbl.y1, 12) - ay))
        ctx.constraint(sel * ud * ctx.local(self.add.d1.rem, 12))
        ctx.constraint(sel * ud * ctx.local(self.add.d2.rem, 12))
        ua = u - ud
        ctx.constraint(sel * ua * (ctx.local(self.inv_chk.rem, 1) - 1))
        ctx.constraint(sel * ua * ctx.local(self.inv_chk.rem + 1, 11))
        # accumulator chaining into the next window
        nax, nay = ctx.next(self.acc_x, 12), ctx.next(self.acc_y, 12)
        x3, y3 = ctx.local(self.add.x3, 12), ctx.local(self.add.y3, 12)
        dx3, dy3 = ctx.local(self.dbl.x3, 12), ctx.local(self.dbl.y3, 12)
        ctx.constraint(sel * (nax - ((1 - b) * ax + low * px + ua * x3 + ud * dx3)))
        ctx.constraint(sel * (nay - ((1 - b) * ay + low * py + ua * y3 + ud * dy3)))
        ctx.constraint(sel * (ctx.next(self.acc_inf) - inf * (1 - b)))

    # -- trace generation ----------------------------------------------
    def generate_trace(self, points, bits, device: bool = False):
        """points: [(x, y)] of len num_points; bits: 0/1 list. Returns
        (trace, pis). Mirrors the skip logic of ecc_aggregate.rs:37-82."""
        assert len(points) == self.num_points and len(bits) == self.num_points
        assert any(bits), "aggregate of zero points is the identity (unsupported)"
        from ..chips.core import FillRecorder

        trace = FillRecorder(self.num_rows, self.num_cols)
        dummy_inv = pow((DUMMY_P2[0] - DUMMY_P1[0]) % bls.P381, -1, bls.P381)
        acc = None
        for i, (p, bit) in enumerate(zip(points, bits)):
            r0 = 12 * i
            ax, ay, inf = (acc if acc else (0, 0)) + ((0,) if acc else (1,))
            p = (int(p[0]), int(p[1]))
            b = int(bit)
            u = b and not inf
            low = b and inf
            dbl = bool(u and acc == p)
            regs = np.concatenate(
                [
                    limbs.to_limbs(ax),
                    limbs.to_limbs(ay),
                    [inf, b, int(u), int(low), int(dbl)],
                    limbs.to_limbs(p[0]),
                    limbs.to_limbs(p[1]),
                ]
            ).astype(np.uint64)
            put_rows(trace, r0, self.acc_x, np.broadcast_to(regs, (12, regs.shape[0])))
            if u and dbl:
                self.add.fill_degenerate(trace, r0, acc)
                self.inv_chk.fill(trace, r0, 0, 0)
                acc = self.dbl.fill(trace, r0, acc)
            elif u:
                if acc[0] == p[0]:
                    raise ValueError(
                        "accumulator hits the point at infinity (acc == -point): "
                        "outside the affine accumulator's domain"
                    )
                diff = (p[0] - acc[0]) % bls.P381
                self.inv_chk.fill(trace, r0, pow(diff, -1, bls.P381), diff)
                self.dbl.fill(trace, r0, DUMMY_P1)
                acc = self.add.fill(trace, r0, acc, p)
            else:
                self.add.fill(trace, r0, DUMMY_P1, DUMMY_P2)
                self.dbl.fill(trace, r0, DUMMY_P1)
                self.inv_chk.fill(trace, r0, dummy_inv, (DUMMY_P2[0] - DUMMY_P1[0]) % bls.P381)
                if low:
                    acc = (p[0], p[1])
        # final accumulator row
        final_row = 12 * self.num_points
        put(trace, final_row, self.acc_x, limbs.to_limbs(acc[0]))
        put(trace, final_row, self.acc_y, limbs.to_limbs(acc[1]))
        pis = []
        for p in points:
            pis.extend(int(x) for x in limbs.to_limbs(p[0]))
            pis.extend(int(x) for x in limbs.to_limbs(p[1]))
        pis.extend(int(b) for b in bits)
        pis.extend(int(x) for x in limbs.to_limbs(acc[0]))
        pis.extend(int(x) for x in limbs.to_limbs(acc[1]))
        from ..chips.core import finish_trace

        return finish_trace(self, trace, device), pis
