"""Fp (BLS12-381 base field) STARK gadgets: 12x32-bit limb arithmetic.

Capability-parity with the reference's `fp.rs` gadget set (layouts
`fp.rs:25-163`, fills `:185-428`, constraints `:443-1553`), re-designed for
this backend:

* activity selectors are PUBLIC constant columns (interned row-set
  patterns, see chips/core.py) instead of witness columns — column blocks
  may be overlaid across alternative schedules (as the reference does in
  calc_pairing_precomp.rs:46) and every constraint stays degree <= 3, so
  every stark runs at rate_bits=1 (the reference needs 2 for some);
* constraints are emitted as stacked (limb x domain) tensors — a handful
  of wide vector ops per gadget on the TPU VPU;
* carries/borrows of additive chains carry explicit booleanity constraints
  (the reference leaves them unconstrained);
* shifted-product cells outside the active window are pinned to zero
  (`fp.rs:516-528` leaves 11 of 24 cells per row unconstrained).

Witness values match `native.rs` limb semantics bit-for-bit (chips/limbs).
"""

from __future__ import annotations

import numpy as np

from ..fields.bls12_381 import P381
from . import limbs
from .core import ChipBuilder, put, put_rows

B32 = 1 << 32
RC_OFFSET = (1 << 382) - P381  # range-check additive constant (fp.rs:319)
RC_OFFSET_LIMBS = limbs.to_limbs(RC_OFFSET)
P_SQUARED_LIMBS = limbs.to_limbs(P381 * P381, 24)


def _rows_of(row0s, phase):
    return frozenset(r + phase for r in row0s)


def _all_rows(row0s, nrows=12):
    return frozenset(r + i for r in row0s for i in range(nrows))


class FpMulGadget:
    """12-row schoolbook multiplication of two 12-limb values.

    Row r0+i multiplies X by Y[i] (13-limb partial + 12 carries), shifts it
    by i limbs, and accumulates into a running 24-limb sum with carries.
    Mirrors fp.rs:333-383 / :443-574; the X/Y registers are pinned across
    the window, the result lives in `sum` at row r0+11.
    """

    def __init__(self, cb: ChipBuilder, row0s):
        self.cb = cb
        self.row0s = list(row0s)
        w = cb.wit
        self.x = w.take(12)
        self.y = w.take(12)
        self.xy = w.take(13)
        self.xy_c = w.take(12)
        self.shift = w.take(24)
        self.sum = w.take(24)
        self.sum_c = w.take(24)
        self.s_phase = cb.indicator_group([_rows_of(self.row0s, i) for i in range(12)])
        self.s_pin = cb.indicator(_all_rows(self.row0s, 11))
        self.s_first = cb.indicator(_rows_of(self.row0s, 0))
        self.s_all = cb.indicator(_all_rows(self.row0s, 12))
        self.out_row_off = 11  # result row offset within the window

    def fill(self, trace, row0, x_int: int, y_int: int) -> int:
        x = limbs.to_limbs(x_int)
        y = limbs.to_limbs(y_int)
        put_rows(trace, row0, self.x, np.broadcast_to(x, (12, 12)))
        put_rows(trace, row0, self.y, np.broadcast_to(y, (12, 12)))
        xy, xy_c = limbs.multiply_by_slice(np.broadcast_to(x, (12, 12)), y)  # (12, 13/12)
        put_rows(trace, row0, self.xy, xy)
        put_rows(trace, row0, self.xy_c, xy_c)
        shifted = np.zeros((12, 24), dtype=np.uint64)
        for i in range(12):
            shifted[i, i : i + 13] = xy[i]
        put_rows(trace, row0, self.shift, shifted)
        run = np.zeros(24, dtype=np.uint64)
        for i in range(12):
            run, carries = limbs.add_u32_slices(shifted[i], run)
            put(trace, row0 + i, self.sum, run)
            put(trace, row0 + i, self.sum_c, carries)
        return x_int * y_int

    def eval(self, ctx):
        x, y = ctx.local(self.x, 12), ctx.local(self.y, 12)
        xn, yn = ctx.next(self.x, 12), ctx.next(self.y, 12)
        xy, c = ctx.local(self.xy, 13), ctx.local(self.xy_c, 12)
        s = ctx.const(self.s_phase, 12)
        pin = ctx.const(self.s_pin)
        first = ctx.const(self.s_first)
        s_all = ctx.const(self.s_all)

        # X/Y registers constant across the window
        ctx.constraint_transition(pin * (x - xn))
        ctx.constraint_transition(pin * (y - yn))

        # partial products with carry chain: row r0+i uses y-limb i
        # j = 0: x[0]*y[i] == xy[0] + c[0]*2^32
        ctx.constraint(s * (x[0] * y - xy[0] - c[0] * B32))
        # j >= 1: x[j]*y[i] + c[j-1] == xy[j] + c[j]*2^32, stacked (12i, 11j)
        ctx.constraint(
            s[:, None] * (x[1:][None] * y[:, None] + c[:11][None] - xy[1:12][None] - c[1:][None] * B32)
        )
        # top limb
        ctx.constraint(s_all * (xy[12] - c[11]))

        # shifted partials: shifted[i + j] == xy[j], remainder pinned to 0
        for i in range(12):
            ctx.constraint(s[i] * (ctx.local(self.shift + i, 13) - xy))
            if i:
                ctx.constraint(s[i] * ctx.local(self.shift, i))
            if i < 11:
                ctx.constraint(s[i] * ctx.local(self.shift + i + 13, 11 - i))

        # running sum: first row copies shifted, then chains with carries
        sm, smc = ctx.local(self.sum, 24), ctx.local(self.sum_c, 24)
        sh_n = ctx.next(self.shift, 24)
        sm_n, smc_n = ctx.next(self.sum, 24), ctx.next(self.sum_c, 24)
        ctx.constraint(first * (sm - ctx.local(self.shift, 24)))
        ctx.constraint(first * smc)
        ctx.constraint_transition(pin * (sm_n[0] + smc_n[0] * B32 - sh_n[0] - sm[0]))
        ctx.constraint_transition(
            pin * (sm_n[1:] + smc_n[1:] * B32 - sh_n[1:] - sm[1:] - smc_n[:23])
        )
        # sum carries are boolean
        ctx.constraint(s_all * smc * (smc - 1))


class AddNGadget:
    """Single-row N-limb addition x + y = sum with boolean carries
    (fp.rs:185-201 / :694-737 for N=24, :204-220 for N=12)."""

    def __init__(self, cb: ChipBuilder, rows, n: int):
        self.n = n
        self.rows = frozenset(rows)
        w = cb.wit
        self.x = w.take(n)
        self.y = w.take(n)
        self.sum = w.take(n)
        self.carry = w.take(n)
        self.sel = cb.indicator(self.rows)

    def fill(self, trace, row, x_limbs, y_limbs):
        x = np.asarray(x_limbs, dtype=np.uint64)
        y = np.asarray(y_limbs, dtype=np.uint64)
        s, c = limbs.add_u32_slices(x, y)
        put(trace, row, self.x, x)
        put(trace, row, self.y, y)
        put(trace, row, self.sum, s)
        put(trace, row, self.carry, c)
        return s

    def eval(self, ctx):
        sel = ctx.const(self.sel)
        x, y = ctx.local(self.x, self.n), ctx.local(self.y, self.n)
        s, c = ctx.local(self.sum, self.n), ctx.local(self.carry, self.n)
        ctx.constraint(sel * (x[0] + y[0] - s[0] - c[0] * B32))
        ctx.constraint(sel * (x[1:] + y[1:] + c[: self.n - 1] - s[1:] - c[1:] * B32))
        ctx.constraint(sel * c * (c - 1))


class SubNGadget:
    """Single-row N-limb subtraction x - y = diff with boolean borrows,
    assuming x >= y (fp.rs:237-253 / :1239-1323)."""

    def __init__(self, cb: ChipBuilder, rows, n: int):
        self.n = n
        self.rows = frozenset(rows)
        w = cb.wit
        self.x = w.take(n)
        self.y = w.take(n)
        self.diff = w.take(n)
        self.borrow = w.take(n)
        self.sel = cb.indicator(self.rows)

    def fill(self, trace, row, x_limbs, y_limbs):
        x = np.asarray(x_limbs, dtype=np.uint64)
        y = np.asarray(y_limbs, dtype=np.uint64)
        d, b = limbs.sub_u32_slices(x, y)
        put(trace, row, self.x, x)
        put(trace, row, self.y, y)
        put(trace, row, self.diff, d)
        put(trace, row, self.borrow, b)
        return d

    def eval(self, ctx):
        sel = ctx.const(self.sel)
        x, y = ctx.local(self.x, self.n), ctx.local(self.y, self.n)
        d, b = ctx.local(self.diff, self.n), ctx.local(self.borrow, self.n)
        ctx.constraint(sel * (x[0] + b[0] * B32 - y[0] - d[0]))
        ctx.constraint(sel * (x[1:] + b[1:] * B32 - y[1:] - b[: self.n - 1] - d[1:]))
        ctx.constraint(sel * b * (b - 1))


class MulSingleGadget:
    """Single-row 12-limb x single-limb product (fp.rs:274-291)."""

    def __init__(self, cb: ChipBuilder, rows):
        self.rows = frozenset(rows)
        w = cb.wit
        self.x = w.take(12)
        self.y = w.take(1)
        self.res = w.take(12)
        self.carry = w.take(12)
        self.sel = cb.indicator(self.rows)

    def fill(self, trace, row, x_limbs, y_limb: int):
        x = np.asarray(x_limbs, dtype=np.uint64)
        r, c = limbs.mul_u32_slice_u32(x, np.uint64(y_limb))
        put(trace, row, self.x, x)
        trace[row, self.y] = np.uint64(y_limb)
        put(trace, row, self.res, r)
        put(trace, row, self.carry, c)
        return r

    def eval(self, ctx):
        sel = ctx.const(self.sel)
        x, y = ctx.local(self.x, 12), ctx.local(self.y)
        r, c = ctx.local(self.res, 12), ctx.local(self.carry, 12)
        ctx.constraint(sel * (x[0] * y - r[0] - c[0] * B32))
        ctx.constraint(sel * (x[1:] * y + c[:11] - r[1:] - c[1:] * B32))


class RangeCheckGadget:
    """x < p check: y = x + (2^382 - p) must have bits 382/383 clear
    (fp.rs:315-330 / :1326-1441; we also pin bit 383, which the honest
    filler never sets but a malicious one could)."""

    def __init__(self, cb: ChipBuilder, rows):
        self.rows = frozenset(rows)
        w = cb.wit
        self.x = w.take(12)
        self.sum = w.take(12)
        self.carry = w.take(12)
        self.bits = w.take(32)
        self.sel = cb.indicator(self.rows)

    def fill(self, trace, row, x_limbs):
        x = np.asarray(x_limbs, dtype=np.uint64)
        s, c = limbs.add_u32_slices(x, RC_OFFSET_LIMBS)
        put(trace, row, self.x, x)
        put(trace, row, self.sum, s)
        put(trace, row, self.carry, c)
        put(trace, row, self.bits, limbs.get_bits_as_array(s[11]))

    def eval(self, ctx):
        from .core import _const_vec

        sel = ctx.const(self.sel)
        x = ctx.local(self.x, 12)
        s, c = ctx.local(self.sum, 12), ctx.local(self.carry, 12)
        b = ctx.local(self.bits, 32)
        k = _const_vec(ctx, [int(v) for v in RC_OFFSET_LIMBS])
        ctx.constraint(sel * (x[0] + k[0] - s[0] - c[0] * B32))
        ctx.constraint(sel * (x[1:] + k[1:] + c[:11] - s[1:] - c[1:] * B32))
        ctx.constraint(sel * c * (c - 1))
        ctx.constraint(sel * b * (b - 1))
        recomposed = b[0]
        for k_ in range(1, 32):
            recomposed = recomposed + b[k_] * (1 << k_)
        ctx.constraint(sel * (recomposed - s[11]))
        ctx.constraint(sel * (b[30] + b[31]))


class Reduce24Gadget:
    """24-limb mod-p reduction: input == div * p + rem (fp.rs:386-428 /
    :1447-1553). Contains a 12-row div*p multiplication (Y pinned to p), a
    24-limb addition at the result row, and a `rem` register pinned across
    the window. The consumer wires `add.sum` to its 24-limb input at row
    r0+11 via `wire_input`."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.cb = cb
        self.row0s = list(row0s)
        self.mul = FpMulGadget(cb, row0s)
        cb.bind_const(_rows_of(self.row0s, 0), self.mul.y, limbs.P381_LIMBS)
        self.rem = cb.wit.take(12)
        self.add = AddNGadget(cb, _rows_of(self.row0s, 11), 24)
        out_rows = _rows_of(self.row0s, 11)
        cb.wire(out_rows, self.add.x, self.mul.sum, 24)
        cb.wire(out_rows, self.add.y, self.rem, 12)
        cb.bind_const(out_rows, self.add.y + 12, [0] * 12)
        self.s_pin = cb.indicator(_all_rows(self.row0s, 11))

    def wire_input(self, col24: int):
        """Bind the value being reduced (24 limbs at row r0+11)."""
        self.cb.wire(_rows_of(self.row0s, 11), self.add.sum, col24, 24)

    def fill(self, trace, row0, x_int: int) -> int:
        div, rem = limbs.get_div_rem_modulus(x_int)
        assert div < (1 << 384)
        self.mul.fill(trace, row0, div, P381)
        put_rows(trace, row0, self.rem, np.broadcast_to(limbs.to_limbs(rem), (12, 12)))
        self.add.fill(trace, row0 + 11, limbs.to_limbs(div * P381, 24), limbs.to_limbs(rem, 24))
        return rem

    def eval(self, ctx):
        self.mul.eval(ctx)
        self.add.eval(ctx)
        pin = ctx.const(self.s_pin)
        ctx.constraint_transition(pin * (ctx.local(self.rem, 12) - ctx.next(self.rem, 12)))


class SingleReduceGadget:
    """12-limb mod-p reduction (div fits one limb): input == div*p + rem
    (fp.rs:293-312, FP_SINGLE_REDUCE). Single row. Consumer wires `add.sum`
    to its 12-limb input via `wire_input`."""

    def __init__(self, cb: ChipBuilder, rows):
        self.cb = cb
        self.rows = frozenset(rows)
        self.mul = MulSingleGadget(cb, rows)
        cb.bind_const(rows, self.mul.x, limbs.P381_LIMBS)
        self.rem = cb.wit.take(12)
        self.add = AddNGadget(cb, rows, 12)
        cb.wire(rows, self.add.x, self.mul.res, 12)
        cb.wire(rows, self.add.y, self.rem, 12)
        self.rc = RangeCheckGadget(cb, rows)
        cb.wire(rows, self.rc.x, self.rem, 12)

    def wire_input(self, col12: int):
        self.cb.wire(self.rows, self.add.sum, col12, 12)

    def fill(self, trace, row, x_int: int) -> int:
        div, rem = limbs.get_div_rem_modulus(x_int)
        assert div < B32
        self.mul.fill(trace, row, limbs.P381_LIMBS, div)
        put(trace, row, self.rem, limbs.to_limbs(rem))
        self.add.fill(trace, row, limbs.to_limbs(div * P381), limbs.to_limbs(rem))
        self.rc.fill(trace, row, limbs.to_limbs(rem))
        return rem

    def eval(self, ctx):
        self.mul.eval(ctx)
        self.add.eval(ctx)
        self.rc.eval(ctx)


class FpMulReduceGadget:
    """x * y mod p with range check: the workhorse (mul + reduce + rc).

    Inputs: wire `mul.x` / `mul.y` (pinned across the window). Output:
    `rem` (= self.reduce.rem), pinned across the window."""

    def __init__(self, cb: ChipBuilder, row0s):
        self.cb = cb
        self.row0s = list(row0s)
        self.mul = FpMulGadget(cb, row0s)
        self.reduce = Reduce24Gadget(cb, row0s)
        self.reduce.wire_input(self.mul.sum)
        out_rows = _rows_of(self.row0s, 11)
        self.rc = RangeCheckGadget(cb, out_rows)
        cb.wire(out_rows, self.rc.x, self.reduce.rem, 12)
        self.x = self.mul.x
        self.y = self.mul.y
        self.rem = self.reduce.rem

    def fill(self, trace, row0, x_int: int, y_int: int) -> int:
        prod = self.mul.fill(trace, row0, x_int, y_int)
        rem = self.reduce.fill(trace, row0, prod)
        self.rc.fill(trace, row0 + 11, limbs.to_limbs(rem))
        return rem

    def eval(self, ctx):
        self.mul.eval(ctx)
        self.reduce.eval(ctx)
        self.rc.eval(ctx)
