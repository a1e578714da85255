"""Fp2 gadget tests: residuals on honest fills + value checks vs native."""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from starky_bls12_381_tpu.chips import limbs
from starky_bls12_381_tpu.chips.fp2 import (
    Fp2AddReduceGadget,
    Fp2FpMulGadget,
    Fp2MulByBGadget,
    Fp2MulGadget,
    Fp2NegGadget,
    Fp2NonResidueGadget,
    Fp2SubReduceGadget,
)
from starky_bls12_381_tpu.chips.testing import assert_zero_residuals
from starky_bls12_381_tpu.fields import bls12_381 as bls
from starky_bls12_381_tpu.fields.bls12_381 import P381

from test_fp_gadgets import _GadgetAir

rng = random.Random(7)


def _fp2():
    return (rng.randrange(P381), rng.randrange(P381))


def test_fp2_mul_gadget():
    air = _GadgetAir(16, lambda cb: [Fp2MulGadget(cb, [0])])
    g = air.gadgets[0]
    trace = air.new_trace()
    a, b = _fp2(), _fp2()
    out = g.fill(trace, 0, a, b)
    assert out == bls.fp2_mul(a, b)
    assert limbs.from_limbs(trace[0, g.c0 : g.c0 + 12]) == out[0]
    assert limbs.from_limbs(trace[5, g.c1 : g.c1 + 12]) == out[1]
    assert_zero_residuals(air, trace, [])
    t2 = trace.copy()
    t2[:12, g.c0] = (t2[0, g.c0] + 1) % (1 << 32)
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, t2, [])


def test_fp2_single_row_ops():
    def build(cb):
        return [
            Fp2AddReduceGadget(cb, [2]),
            Fp2SubReduceGadget(cb, [2]),
            Fp2NegGadget(cb, [2]),
            Fp2NonResidueGadget(cb, [3]),
            Fp2MulByBGadget(cb, [3]),
        ]

    air = _GadgetAir(8, build)
    addg, subg, negg, nrg, bg = air.gadgets
    trace = air.new_trace()
    a, b = _fp2(), _fp2()
    assert addg.fill(trace, 2, a, b) == bls.fp2_add(a, b)
    assert subg.fill(trace, 2, a, b) == bls.fp2_sub(a, b)
    n = negg.fill(trace, 2, a)
    assert (n[0] % P381, n[1] % P381) == bls.fp2_neg(a)
    assert nrg.fill(trace, 3, a) == bls.fp2_mul_by_nonresidue(a)
    assert bg.fill(trace, 3, a) == bls.fp2_multiply_by_b(a)
    assert_zero_residuals(air, trace, [])


def test_fp2_fp_mul():
    air = _GadgetAir(16, lambda cb: [Fp2FpMulGadget(cb, [0])])
    g = air.gadgets[0]
    trace = air.new_trace()
    a, s = _fp2(), rng.randrange(P381)
    assert g.fill(trace, 0, a, s) == bls.fp2_mul_fp(a, s)
    assert_zero_residuals(air, trace, [])


def test_fp2_mul_overlay_two_windows():
    # same gadget instance active in two 12-row windows (iteration reuse)
    air = _GadgetAir(32, lambda cb: [Fp2MulGadget(cb, [0, 12])])
    g = air.gadgets[0]
    trace = air.new_trace()
    g.fill(trace, 0, _fp2(), _fp2())
    g.fill(trace, 12, _fp2(), _fp2())
    assert_zero_residuals(air, trace, [])


def test_fp6_mul_gadget():
    from starky_bls12_381_tpu.chips.fp6 import Fp6MulGadget

    air = _GadgetAir(16, lambda cb: [Fp6MulGadget(cb, [0])])
    g = air.gadgets[0]
    trace = air.new_trace()
    a = tuple(_fp2() for _ in range(3))
    b = tuple(_fp2() for _ in range(3))
    assert g.fill(trace, 0, a, b) == bls.fp6_mul(a, b)
    assert_zero_residuals(air, trace, [])


def test_fp12_mul014_gadget():
    from starky_bls12_381_tpu.chips.fp12 import Fp12MultiplyBy014Gadget

    air = _GadgetAir(16, lambda cb: [Fp12MultiplyBy014Gadget(cb, [0])])
    g = air.gadgets[0]
    trace = air.new_trace()
    a = (tuple(_fp2() for _ in range(3)), tuple(_fp2() for _ in range(3)))
    o0, o1, o4 = _fp2(), _fp2(), _fp2()
    assert g.fill(trace, 0, a, o0, o1, o4) == bls.fp12_multiply_by_014(a, o0, o1, o4)
    assert_zero_residuals(air, trace, [])
