"""Fp gadget tests: fills satisfy constraints, tampering breaks them.

Strategy per SURVEY.md §4 ("the new framework should instead test each
chip: trace-gen vs native vectors bit-exactly, constraint residual == 0 on
honest traces, and tamper tests").
"""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from starky_bls12_381_tpu.backend.air import Air
from starky_bls12_381_tpu.chips import limbs
from starky_bls12_381_tpu.chips.core import ChipBuilder
from starky_bls12_381_tpu.chips.fp import (
    AddNGadget,
    FpMulGadget,
    FpMulReduceGadget,
    MulSingleGadget,
    RangeCheckGadget,
    SingleReduceGadget,
    SubNGadget,
)
from starky_bls12_381_tpu.chips.testing import assert_zero_residuals, residuals
from starky_bls12_381_tpu.fields.bls12_381 import P381

rng = random.Random(42)


def test_limb_helpers_match_ints():
    for _ in range(20):
        x = rng.randrange(P381)
        y = rng.randrange(1 << 32)
        xl = limbs.to_limbs(x)
        res, carries = limbs.multiply_by_slice(xl, np.uint64(y))
        assert limbs.from_limbs(res) == x * y
        a, b = rng.randrange(P381), rng.randrange(P381)
        s, c = limbs.add_u32_slices(limbs.to_limbs(a, 24), limbs.to_limbs(b, 24))
        assert limbs.from_limbs(s) == a + b
        assert set(np.unique(c)) <= {0, 1}
        hi, lo = max(a, b), min(a, b)
        d, bo = limbs.sub_u32_slices(limbs.to_limbs(hi), limbs.to_limbs(lo))
        assert limbs.from_limbs(d) == hi - lo


class _GadgetAir(Air):
    """Wraps a single gadget arrangement into an Air for residual checks."""

    def __init__(self, num_rows, build):
        self.num_rows = num_rows
        self.cb = ChipBuilder(num_rows)
        self.gadgets = build(self.cb)
        self.cb.finalize_wiring_patterns()
        self._const = self.cb.build_const_matrix()
        self.num_cols = self.cb.wit.n
        self.num_pis = 0

    def constant_columns(self):
        return self._const

    def eval(self, ctx):
        self.cb.eval_all(ctx)

    def new_trace(self):
        return np.zeros((self.num_rows, self.num_cols), dtype=np.uint64)


def test_fp_mul_gadget():
    air = _GadgetAir(32, lambda cb: [FpMulGadget(cb, [0, 12])])
    g = air.gadgets[0]
    trace = air.new_trace()
    x1, y1 = rng.randrange(P381), rng.randrange(P381)
    x2, y2 = rng.randrange(P381), rng.randrange(P381)
    g.fill(trace, 0, x1, y1)
    g.fill(trace, 12, x2, y2)
    # the 24-limb product sits in sum at rows 11 / 23
    assert limbs.from_limbs(trace[11, g.sum : g.sum + 24]) == x1 * y1
    assert limbs.from_limbs(trace[23, g.sum : g.sum + 24]) == x2 * y2
    assert_zero_residuals(air, trace, [])
    # tamper: change one product limb -> violated
    t2 = trace.copy()
    t2[11, g.sum + 3] += 1
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, t2, [])
    # tamper: break input pinning
    t3 = trace.copy()
    t3[4, g.x + 2] += 1
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, t3, [])


def test_add_sub_single_row_gadgets():
    def build(cb):
        return [
            AddNGadget(cb, [3], 24),
            SubNGadget(cb, [3], 24),
            MulSingleGadget(cb, [5]),
            RangeCheckGadget(cb, [5]),
        ]

    air = _GadgetAir(8, build)
    add, sub, mul1, rc = air.gadgets
    trace = air.new_trace()
    a, b = rng.randrange(P381 * P381), rng.randrange(P381 * P381)
    add.fill(trace, 3, limbs.to_limbs(a, 24), limbs.to_limbs(b, 24))
    sub.fill(trace, 3, limbs.to_limbs(max(a, b), 24), limbs.to_limbs(min(a, b), 24))
    x = rng.randrange(P381)
    mul1.fill(trace, 5, limbs.to_limbs(x), 7)  # small multiplier: must fit 384 bits
    rc.fill(trace, 5, limbs.to_limbs(x))
    assert_zero_residuals(air, trace, [])
    t2 = trace.copy()
    t2[3, add.sum] += 1
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, t2, [])


def test_range_check_rejects_ge_p():
    air = _GadgetAir(4, lambda cb: [RangeCheckGadget(cb, [1])])
    rc = air.gadgets[0]
    trace = air.new_trace()
    rc.fill(trace, 1, limbs.to_limbs(P381 - 1))
    assert_zero_residuals(air, trace, [])
    # x = p is out of range: honest fill produces bit 382 set -> violation
    t2 = air.new_trace()
    rc.fill(t2, 1, limbs.to_limbs(P381))
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, t2, [])


def test_single_reduce_gadget():
    air = _GadgetAir(4, lambda cb: [SingleReduceGadget(cb, [2])])
    g = air.gadgets[0]
    trace = air.new_trace()
    x = rng.randrange(4 * P381)  # a few p's worth, div fits one limb
    rem = g.fill(trace, 2, x)
    assert rem == x % P381
    # the consumer-facing input is add.sum; check it holds x
    assert limbs.from_limbs(trace[2, g.add.sum : g.add.sum + 12]) == x
    assert_zero_residuals(air, trace, [])


def test_fp_mul_reduce_gadget():
    air = _GadgetAir(16, lambda cb: [FpMulReduceGadget(cb, [0])])
    g = air.gadgets[0]
    trace = air.new_trace()
    x, y = rng.randrange(P381), rng.randrange(P381)
    rem = g.fill(trace, 0, x, y)
    assert rem == x * y % P381
    assert limbs.from_limbs(trace[0, g.rem : g.rem + 12]) == rem
    assert_zero_residuals(air, trace, [])
    # tamper with the claimed remainder everywhere it is pinned
    t2 = trace.copy()
    t2[:12, g.rem] = (t2[0, g.rem] + 1) % (1 << 32)
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, t2, [])


def test_quotient_degree_factor_is_2():
    air = _GadgetAir(16, lambda cb: [FpMulReduceGadget(cb, [0])])
    assert air.quotient_degree_factor() == 2
