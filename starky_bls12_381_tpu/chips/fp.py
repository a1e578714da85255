"""Fp (BLS12-381 base field) STARK gadgets: 12x32-bit limb arithmetic.

Capability-parity with the reference's `fp.rs` gadget set (layouts
`fp.rs:25-163`, fills `:185-428`, constraints `:443-1553`), re-designed for
this backend:

* activity selectors are PUBLIC constant columns (interned row-set
  patterns, see chips/core.py) instead of witness columns — column blocks
  may be overlaid across alternative schedules (as the reference does in
  calc_pairing_precomp.rs:46) and every constraint stays degree <= 3, so
  every stark runs at rate_bits=1 (the reference needs 2 for some);
* constraint evaluation is TYPE-BATCHED: all G instances of a gadget type
  evaluate through one gathered (G, limb, domain) emission — the traced
  XLA graph stays a few hundred wide tensor ops even for the 100k-column
  starks (the reference evaluates per-instance scalar constraints);
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
from .core import ChipBuilder, FillRecorder, put, put_rows

B32 = 1 << 32
RC_OFFSET = (1 << 382) - P381  # range-check additive constant (fp.rs:319)
RC_OFFSET_LIMBS = limbs.to_limbs(RC_OFFSET)
P_SQUARED_LIMBS = limbs.to_limbs(P381 * P381, 24)


def _rows_of(row0s, phase):
    return frozenset(r + phase for r in row0s)


def _all_rows(row0s, nrows=12):
    return frozenset(r + i for r in row0s for i in range(nrows))


def cm(offsets, width):
    """Column index matrix (G, width) from per-instance base offsets."""
    return np.asarray(offsets, dtype=np.int64)[:, None] + np.arange(width, dtype=np.int64)[None, :]


def c1(offsets):
    """Column index matrix (G, 1)."""
    return np.asarray(offsets, dtype=np.int64)[:, None]


class RegPinGadget:
    """Pins a register (width cols) constant across consecutive rows."""

    def __init__(self, cb: ChipBuilder, col: int, width: int, pin_rows):
        self.col = col
        self.width = width
        self.s_pin = cb.indicator(frozenset(pin_rows))
        cb.register(("regpin", width), self)

    @staticmethod
    def eval_batched(ctx, insts):
        w = insts[0].width
        pin = ctx.const_g(c1([i.s_pin for i in insts]))
        a = ctx.local_g(cm([i.col for i in insts], w))
        b = ctx.next_g(cm([i.col for i in insts], w))
        ctx.constraint_transition(pin * (a - b))


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
        cb.register("fpmul", self)

    def fill(self, trace, row0, x_int: int, y_int: int) -> int:
        if isinstance(trace, FillRecorder):
            trace.record("fpmul", (self, row0, x_int, y_int))
            return x_int * y_int
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

    @staticmethod
    def eval_batched(ctx, insts):
        x = ctx.local_g(cm([i.x for i in insts], 12))
        y = ctx.local_g(cm([i.y for i in insts], 12))
        xn = ctx.next_g(cm([i.x for i in insts], 12))
        yn = ctx.next_g(cm([i.y for i in insts], 12))
        xy = ctx.local_g(cm([i.xy for i in insts], 13))
        c = ctx.local_g(cm([i.xy_c for i in insts], 12))
        s = ctx.const_g(cm([i.s_phase for i in insts], 12))
        pin = ctx.const_g(c1([i.s_pin for i in insts]))
        first = ctx.const_g(c1([i.s_first for i in insts]))
        s_all = ctx.const_g(c1([i.s_all for i in insts]))

        # X/Y registers constant across the window
        ctx.constraint_transition(pin * (x - xn))
        ctx.constraint_transition(pin * (y - yn))

        # partial products with carry chain: row r0+i uses y-limb i
        ctx.constraint(s * (x[:, :1] * y - xy[:, :1] - c[:, :1] * B32))
        ctx.constraint(
            s[:, :, None]
            * (
                x[:, None, 1:] * y[:, :, None]
                + c[:, None, :11]
                - xy[:, None, 1:12]
                - c[:, None, 1:] * B32
            )
        )
        ctx.constraint(s_all * (xy[:, 12:] - c[:, 11:]))

        # shifted partials: shifted[i + j] == xy[j], remainder pinned to 0
        for i in range(12):
            sh = ctx.local_g(cm([inst.shift + i for inst in insts], 13))
            ctx.constraint(s[:, i : i + 1] * (sh - xy))
            if i:
                ctx.constraint(s[:, i : i + 1] * ctx.local_g(cm([inst.shift for inst in insts], i)))
            if i < 11:
                ctx.constraint(
                    s[:, i : i + 1] * ctx.local_g(cm([inst.shift + i + 13 for inst in insts], 11 - i))
                )

        # running sum: first row copies shifted, then chains with carries
        sm = ctx.local_g(cm([i.sum for i in insts], 24))
        smc = ctx.local_g(cm([i.sum_c for i in insts], 24))
        sh0 = ctx.local_g(cm([i.shift for i in insts], 24))
        sm_n = ctx.next_g(cm([i.sum for i in insts], 24))
        smc_n = ctx.next_g(cm([i.sum_c for i in insts], 24))
        sh_n = ctx.next_g(cm([i.shift for i in insts], 24))
        ctx.constraint(first * (sm - sh0))
        ctx.constraint(first * smc)
        ctx.constraint_transition(pin * (sm_n[:, :1] + smc_n[:, :1] * B32 - sh_n[:, :1] - sm[:, :1]))
        ctx.constraint_transition(
            pin * (sm_n[:, 1:] + smc_n[:, 1:] * B32 - sh_n[:, 1:] - sm[:, 1:] - smc_n[:, :23])
        )
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
        cb.register(("addn", n), self)

    def fill(self, trace, row, x_limbs, y_limbs):
        if isinstance(trace, FillRecorder):
            xi = limbs.from_limbs(x_limbs)
            yi = limbs.from_limbs(y_limbs)
            trace.record(("addn", self.n), (self, row, xi, yi))
            return limbs.to_limbs((xi + yi) & ((1 << (32 * self.n)) - 1), self.n)
        x = np.asarray(x_limbs, dtype=np.uint64)
        y = np.asarray(y_limbs, dtype=np.uint64)
        s, c = limbs.add_u32_slices(x, y)
        put(trace, row, self.x, x)
        put(trace, row, self.y, y)
        put(trace, row, self.sum, s)
        put(trace, row, self.carry, c)
        return s

    @staticmethod
    def eval_batched(ctx, insts):
        n = insts[0].n
        sel = ctx.const_g(c1([i.sel for i in insts]))
        x = ctx.local_g(cm([i.x for i in insts], n))
        y = ctx.local_g(cm([i.y for i in insts], n))
        s = ctx.local_g(cm([i.sum for i in insts], n))
        c = ctx.local_g(cm([i.carry for i in insts], n))
        ctx.constraint(sel * (x[:, :1] + y[:, :1] - s[:, :1] - c[:, :1] * B32))
        ctx.constraint(sel * (x[:, 1:] + y[:, 1:] + c[:, : n - 1] - s[:, 1:] - c[:, 1:] * B32))
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
        cb.register(("subn", n), self)

    def fill(self, trace, row, x_limbs, y_limbs):
        if isinstance(trace, FillRecorder):
            xi = limbs.from_limbs(x_limbs)
            yi = limbs.from_limbs(y_limbs)
            assert xi >= yi
            trace.record(("subn", self.n), (self, row, xi, yi))
            return limbs.to_limbs(xi - yi, self.n)
        x = np.asarray(x_limbs, dtype=np.uint64)
        y = np.asarray(y_limbs, dtype=np.uint64)
        d, b = limbs.sub_u32_slices(x, y)
        put(trace, row, self.x, x)
        put(trace, row, self.y, y)
        put(trace, row, self.diff, d)
        put(trace, row, self.borrow, b)
        return d

    @staticmethod
    def eval_batched(ctx, insts):
        n = insts[0].n
        sel = ctx.const_g(c1([i.sel for i in insts]))
        x = ctx.local_g(cm([i.x for i in insts], n))
        y = ctx.local_g(cm([i.y for i in insts], n))
        d = ctx.local_g(cm([i.diff for i in insts], n))
        b = ctx.local_g(cm([i.borrow for i in insts], n))
        ctx.constraint(sel * (x[:, :1] + b[:, :1] * B32 - y[:, :1] - d[:, :1]))
        ctx.constraint(sel * (x[:, 1:] + b[:, 1:] * B32 - y[:, 1:] - b[:, : n - 1] - d[:, 1:]))
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
        cb.register("mulsingle", self)

    def fill(self, trace, row, x_limbs, y_limb: int):
        if isinstance(trace, FillRecorder):
            xi = limbs.from_limbs(x_limbs)
            trace.record("mulsingle", (self, row, xi, int(y_limb)))
            prod = xi * int(y_limb)
            assert prod < (1 << 384)
            return limbs.to_limbs(prod)
        x = np.asarray(x_limbs, dtype=np.uint64)
        r, c = limbs.mul_u32_slice_u32(x, np.uint64(y_limb))
        put(trace, row, self.x, x)
        trace[row, self.y] = np.uint64(y_limb)
        put(trace, row, self.res, r)
        put(trace, row, self.carry, c)
        return r

    @staticmethod
    def eval_batched(ctx, insts):
        sel = ctx.const_g(c1([i.sel for i in insts]))
        x = ctx.local_g(cm([i.x for i in insts], 12))
        y = ctx.local_g(c1([i.y for i in insts]))
        r = ctx.local_g(cm([i.res for i in insts], 12))
        c = ctx.local_g(cm([i.carry for i in insts], 12))
        ctx.constraint(sel * (x[:, :1] * y - r[:, :1] - c[:, :1] * B32))
        ctx.constraint(sel * (x[:, 1:] * y + c[:, :11] - r[:, 1:] - c[:, 1:] * B32))


class RangeCheckGadget:
    """x < bound check (default bound = p): y = x + (2^382 - bound) must
    have bits 382/383 clear (fp.rs:315-330 / :1326-1441; we also pin bit
    383, which the honest filler never sets but a malicious one could)."""

    def __init__(self, cb: ChipBuilder, rows, bound: int = P381):
        self.rows = frozenset(rows)
        assert 0 < bound <= (1 << 382)
        self.off_limbs = limbs.to_limbs((1 << 382) - bound)
        w = cb.wit
        self.x = w.take(12)
        self.sum = w.take(12)
        self.carry = w.take(12)
        self.bits = w.take(32)
        self.sel = cb.indicator(self.rows)
        cb.register("rangecheck", self)

    def fill(self, trace, row, x_limbs):
        if isinstance(trace, FillRecorder):
            trace.record("rangecheck", (self, row, limbs.from_limbs(x_limbs)))
            return
        x = np.asarray(x_limbs, dtype=np.uint64)
        s, c = limbs.add_u32_slices(x, self.off_limbs)
        put(trace, row, self.x, x)
        put(trace, row, self.sum, s)
        put(trace, row, self.carry, c)
        put(trace, row, self.bits, limbs.get_bits_as_array(s[11]))

    @staticmethod
    def eval_batched(ctx, insts):
        sel = ctx.const_g(c1([i.sel for i in insts]))
        x = ctx.local_g(cm([i.x for i in insts], 12))
        s = ctx.local_g(cm([i.sum for i in insts], 12))
        c = ctx.local_g(cm([i.carry for i in insts], 12))
        b = ctx.local_g(cm([i.bits for i in insts], 32))
        k = ctx.lift(np.stack([i.off_limbs for i in insts]))
        ctx.constraint(sel * (x[:, :1] + k[:, :1] - s[:, :1] - c[:, :1] * B32))
        ctx.constraint(sel * (x[:, 1:] + k[:, 1:] + c[:, :11] - s[:, 1:] - c[:, 1:] * B32))
        ctx.constraint(sel * c * (c - 1))
        ctx.constraint(sel * b * (b - 1))
        recomposed = b[:, :1]
        for k_ in range(1, 32):
            recomposed = recomposed + b[:, k_ : k_ + 1] * (1 << k_)
        ctx.constraint(sel * (recomposed - s[:, 11:]))
        ctx.constraint(sel * (b[:, 30:31] + b[:, 31:32]))


HP381 = (P381 + 1) // 2
HP381_LIMBS = limbs.to_limbs(HP381)


class SignGadget:
    """y -> a-flag = floor(2y/p) (the reference's compressed-point sign
    witness, g1_plonky2.rs:27-35): witnesses the conditional subtraction
    y = f*hp + s with hp = (p+1)/2, boolean f, and s range-checked < hp,
    so f = 1 iff y >= hp iff floor(2y/p) = 1. Requires y < p (bind the
    `y` port to range-checked or public data)."""

    def __init__(self, cb: ChipBuilder, rows):
        self.cb = cb
        self.rows = frozenset(rows)
        self.f = cb.wit.take(1)
        self.add = AddNGadget(cb, rows, 12)  # s + f*hp = y
        cb.bind_const(rows, self.add.carry + 11, [0])
        self.rc = RangeCheckGadget(cb, rows, bound=HP381)  # s < hp
        cb.wire(rows, self.rc.x, self.add.x, 12)
        self.s = self.add.x
        self.y = self.add.sum  # consumers wire their y here
        self.sel = cb.indicator(self.rows)
        cb.register("sign", self)

    def fill(self, trace, row, y_int: int) -> int:
        f = 1 if y_int >= HP381 else 0
        s = y_int - f * HP381
        self.add.fill(trace, row, limbs.to_limbs(s), limbs.to_limbs(f * HP381))
        self.rc.fill(trace, row, limbs.to_limbs(s))
        put(trace, row, self.f, np.asarray([f], dtype=np.uint64))
        return f

    @staticmethod
    def eval_batched(ctx, insts):
        sel = ctx.const_g(c1([i.sel for i in insts]))
        f = ctx.local_g(c1([i.f for i in insts]))
        yv = ctx.local_g(cm([i.add.y for i in insts], 12))
        hp = ctx.lift(HP381_LIMBS[None, :])
        ctx.constraint(sel * f * (f - 1))
        # the AddN y-port carries f * hp limb-wise
        ctx.constraint(sel * (yv - f * hp))


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
        RegPinGadget(cb, self.rem, 12, _all_rows(self.row0s, 11))

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


class SingleReduceGadget:
    """12-limb mod-p reduction (div fits one limb): input == div*p + rem
    (fp.rs:293-312, FP_SINGLE_REDUCE) + range check. Single row. Consumer
    wires `add.sum` to its 12-limb input via `wire_input`."""

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


# ---------------------------------------------------------------------------
# Batched fill executors (the trace-generation dual of eval_batched).
#
# FillRecorder collects (instance, row, input-value) records per leaf type;
# each type has a PREPARE step (host: big-int -> limb conversion, index
# arrays — a few MB even for the widest traces) and an EXPAND step (pure
# array math: partial products, carry chains, range-check bits) that
# scatters whole batches into the trace. Expand is backend-agnostic, so
# the same code fills a numpy trace eagerly (17.5 s -> 2.5 s for the
# miller-loop fill) or runs under jax.jit straight into device HBM
# (on-device trace generation: only the prepared inputs ever cross the
# host->device link, not the 100s-of-MB witness expansion).
# ---------------------------------------------------------------------------


class TraceWriter:
    """Write adapter for batch expansion. Records are grouped by IDENTICAL
    row schedule (the BLS airs activate every instance of a gadget type on
    the same row set), so each (gadget-type, field, row-group) lowers to a
    SINGLE write: numpy fancy assignment on host, or one flat 1-D scatter
    with unique indices under jax.jit, whose index grid is computed ON
    DEVICE from two small static vectors (rows, column bases). Per-record
    scatters with baked-in index constants blew the MLIR payload to ~50 MB
    at miller-loop width and killed the remote TPU compiler; per-instance
    dense slice updates produced tens of thousands of ops and compiled for
    hours. A handful of big unique-index scatters keeps the graph tiny."""

    def __init__(self, xp, arr, ncols: int | None = None):
        self.xp = xp
        self.arr = arr  # host: (R, C) numpy; device: flat (R*C,) jnp
        self.ncols = ncols

    def _write(self, rows, cols, slab):
        """rows (k,), cols (mw,) host ints; slab (k, mw): one grid write."""
        if self.xp is np:
            self.arr[rows[:, None], cols[None, :]] = slab
        else:
            xp = self.xp
            r = xp.asarray(rows.astype(np.int32) * np.int32(self.ncols))
            c = xp.asarray(cols.astype(np.int32))
            idx = (r[:, None] + c[None, :]).reshape(-1)
            self.arr = self.arr.at[idx].set(slab.reshape(-1), unique_indices=True)

    def w1(self, meta, cbs, vals):
        """Single-row writes: vals (B, w) ordered group- then instance-major."""
        w = vals.shape[-1]
        aw = np.arange(w)
        for rec0, inst0, m, k, rt in meta:
            cols = (np.asarray(cbs[inst0 : inst0 + m])[:, None] + aw[None, :]).reshape(-1)
            slab = vals[rec0 : rec0 + m * k].reshape(m, k, w).swapaxes(0, 1).reshape(k, m * w)
            self._write(np.asarray(rt), cols, slab)

    def w12(self, meta, cbs, vals):
        """12-row window writes: vals (B, 12, w)."""
        w = vals.shape[-1]
        aw = np.arange(w)
        for rec0, inst0, m, k, rt in meta:
            cols = (np.asarray(cbs[inst0 : inst0 + m])[:, None] + aw[None, :]).reshape(-1)
            rows = (np.asarray(rt)[:, None] + np.arange(12)[None, :]).reshape(-1)
            slab = (
                vals[rec0 : rec0 + m * k]
                .reshape(m, k, 12, w)
                .transpose(1, 2, 0, 3)
                .reshape(k * 12, m * w)
            )
            self._write(rows, cols, slab)


def _group_records(insts, rows):
    """Order records group-major and merge instances sharing an identical
    row schedule (column-wise batching: the write for a whole group is one
    (k rows) x (m instances * width) grid).

    Returns (order, meta, ordered_insts): `order` reindexes record arrays
    instance-major with rows sorted within each instance; meta entries are
    (rec0, inst0, m, k, rows_tuple)."""
    by_inst: dict = {}
    inst_list = []
    for idx, g in enumerate(insts):
        key = id(g)
        if key not in by_inst:
            by_inst[key] = []
            inst_list.append((key, g))
        by_inst[key].append(idx)
    groups: dict = {}
    for key, g in inst_list:
        idxs = sorted(by_inst[key], key=lambda i: rows[i])
        rt = tuple(int(rows[i]) for i in idxs)
        groups.setdefault(rt, []).append((g, idxs))
    order: list = []
    meta = []
    ordered_insts: list = []
    for rt, members in groups.items():
        meta.append((len(order), len(ordered_insts), len(members), len(rt), rt))
        for g, idxs in members:
            order.extend(idxs)
            ordered_insts.append(g)
    return np.asarray(order), meta, ordered_insts


def _cbs(insts, name):
    return [int(getattr(g, name)) for g in insts]


def _prep_fpmul(_key, recs):
    insts, row0s, xs, ys = zip(*recs)
    order, meta, oinsts = _group_records(insts, row0s)
    xs = [xs[i] for i in order]
    ys = [ys[i] for i in order]
    return {
        "xv": limbs.to_limbs_batch(xs),
        "yv": limbs.to_limbs_batch(ys),
        "meta": meta,
        "cbs": {n: _cbs(oinsts, n) for n in ("x", "y", "xy", "xy_c", "shift", "sum", "sum_c")},
    }


def _expand_fpmul(w, _key, d):
    xp = w.xp
    x = xp.asarray(d["xv"])
    y = xp.asarray(d["yv"])
    B = x.shape[0]
    meta, cbs = d["meta"], d["cbs"]
    xy, xy_c = limbs.multiply_by_slice(x[:, None, :], y)  # (B,12,13),(B,12,12)
    sh_rows = []
    for i in range(12):
        z1 = xp.zeros((B, i), dtype=xp.uint64)
        z2 = xp.zeros((B, 11 - i), dtype=xp.uint64)
        sh_rows.append(xp.concatenate([z1, xy[:, i], z2], axis=1))
    shifted = xp.stack(sh_rows, axis=1)  # (B, 12, 24)
    sums, carrs = [], []
    run = xp.zeros((B, 24), dtype=xp.uint64)
    for i in range(12):
        run, cr = limbs.add_u32_slices(shifted[:, i], run)
        sums.append(run)
        carrs.append(cr)
    w.w12(meta, cbs["x"], xp.broadcast_to(x[:, None, :], (B, 12, 12)))
    w.w12(meta, cbs["y"], xp.broadcast_to(y[:, None, :], (B, 12, 12)))
    w.w12(meta, cbs["xy"], xy)
    w.w12(meta, cbs["xy_c"], xy_c)
    w.w12(meta, cbs["shift"], shifted)
    w.w12(meta, cbs["sum"], xp.stack(sums, axis=1))
    w.w12(meta, cbs["sum_c"], xp.stack(carrs, axis=1))


def _prep_addsub(key, recs):
    n = key[1]
    insts, rows, xs, ys = zip(*recs)
    order, meta, oinsts = _group_records(insts, rows)
    xs = [xs[i] for i in order]
    ys = [ys[i] for i in order]
    names = ("x", "y", "sum", "carry") if key[0] == "addn" else ("x", "y", "diff", "borrow")
    return {
        "xv": limbs.to_limbs_batch(xs, n),
        "yv": limbs.to_limbs_batch(ys, n),
        "meta": meta,
        "cbs": {m: _cbs(oinsts, m) for m in names},
    }


def _expand_addn(w, key, d):
    x, y = w.xp.asarray(d["xv"]), w.xp.asarray(d["yv"])
    s, c = limbs.add_u32_slices(x, y)
    w.w1(d["meta"], d["cbs"]["x"], x)
    w.w1(d["meta"], d["cbs"]["y"], y)
    w.w1(d["meta"], d["cbs"]["sum"], s)
    w.w1(d["meta"], d["cbs"]["carry"], c)


def _expand_subn(w, key, d):
    x, y = w.xp.asarray(d["xv"]), w.xp.asarray(d["yv"])
    dd, b = limbs.sub_u32_slices(x, y)
    w.w1(d["meta"], d["cbs"]["x"], x)
    w.w1(d["meta"], d["cbs"]["y"], y)
    w.w1(d["meta"], d["cbs"]["diff"], dd)
    w.w1(d["meta"], d["cbs"]["borrow"], b)


def _prep_mulsingle(_key, recs):
    insts, rows, xs, ys = zip(*recs)
    order, meta, oinsts = _group_records(insts, rows)
    xs = [xs[i] for i in order]
    ys = [ys[i] for i in order]
    return {
        "xv": limbs.to_limbs_batch(xs),
        "yv": np.asarray(ys, dtype=np.uint64),
        "meta": meta,
        "cbs": {m: _cbs(oinsts, m) for m in ("x", "y", "res", "carry")},
    }


def _expand_mulsingle(w, _key, d):
    x, y = w.xp.asarray(d["xv"]), w.xp.asarray(d["yv"])
    r, c = limbs.mul_u32_slice_u32(x, y)
    w.w1(d["meta"], d["cbs"]["x"], x)
    w.w1(d["meta"], d["cbs"]["y"], y[:, None])
    w.w1(d["meta"], d["cbs"]["res"], r)
    w.w1(d["meta"], d["cbs"]["carry"], c)


def _prep_rangecheck(_key, recs):
    insts, rows, xs = zip(*recs)
    order, meta, oinsts = _group_records(insts, rows)
    xs = [xs[i] for i in order]
    offs = np.stack([insts[i].off_limbs for i in order])  # per-record bound offset
    return {
        "xv": limbs.to_limbs_batch(xs),
        "offv": offs,
        "meta": meta,
        "cbs": {m: _cbs(oinsts, m) for m in ("x", "sum", "carry", "bits")},
    }


def _expand_rangecheck(w, _key, d):
    x = w.xp.asarray(d["xv"])
    s, c = limbs.add_u32_slices(x, w.xp.asarray(d["offv"]))
    bits = limbs.get_bits_as_array(s[:, 11])
    w.w1(d["meta"], d["cbs"]["x"], x)
    w.w1(d["meta"], d["cbs"]["sum"], s)
    w.w1(d["meta"], d["cbs"]["carry"], c)
    w.w1(d["meta"], d["cbs"]["bits"], bits)


FILL_BATCHERS = {
    "fpmul": (_prep_fpmul, _expand_fpmul),
    "addn": (_prep_addsub, _expand_addn),
    "subn": (_prep_addsub, _expand_subn),
    "mulsingle": (_prep_mulsingle, _expand_mulsingle),
    "rangecheck": (_prep_rangecheck, _expand_rangecheck),
}
