"""G2 gadget tests: honest fills vs native, residuals, tamper cases
(g2_plonky2.rs:11-239 capability; SURVEY.md §4 chip-test strategy)."""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from starky_bls12_381_tpu.chips import limbs
from starky_bls12_381_tpu.chips.g2 import (
    Fp2NegCanonGadget,
    Fp2ZeroFlagGadget,
    G2AddGadget,
    G2DoubleGadget,
    ParityGadget,
    PsiGadget,
    Psi2Gadget,
)
from starky_bls12_381_tpu.chips.testing import assert_zero_residuals
from starky_bls12_381_tpu.fields import bls12_381 as bls
from starky_bls12_381_tpu.fields import hash_to_curve as h2c
from starky_bls12_381_tpu.fields.bls12_381 import P381

from test_fp_gadgets import _GadgetAir

rng = random.Random(31)


def _g2_points():
    """Two distinct on-E2 points (iso-mapped SSWU outputs)."""
    p = h2c.iso_map(h2c.map_to_curve_sswu((5, 7)))
    q = h2c.iso_map(h2c.map_to_curve_sswu((11, 13)))
    return p, q


def test_g2_add_gadget():
    air = _GadgetAir(16, lambda cb: [G2AddGadget(cb, [0])])
    g = air.gadgets[0]
    p, q = _g2_points()
    trace = air.new_trace()
    out = g.fill(trace, 0, p, q)
    assert out == h2c.g2_add(p, q)
    assert limbs.from_limbs(trace[0, g.x3[0] : g.x3[0] + 12]) == out[0][0]
    assert_zero_residuals(air, trace, [])
    # tamper: shift the witnessed x3 -> identity 1 violated
    bad = trace.copy()
    bad[:12, g.x3[0]] = (bad[0, g.x3[0]] + 1) % (1 << 32)
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, bad, [])


def test_g2_double_gadget():
    air = _GadgetAir(16, lambda cb: [G2DoubleGadget(cb, [0])])
    g = air.gadgets[0]
    p, _ = _g2_points()
    trace = air.new_trace()
    out = g.fill(trace, 0, p)
    assert out == h2c.g2_double(p)
    assert_zero_residuals(air, trace, [])
    bad = trace.copy()
    bad[:12, g.y3[1]] = (bad[0, g.y3[1]] + 1) % (1 << 32)
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, bad, [])


def test_psi_gadgets():
    air = _GadgetAir(16, lambda cb: [PsiGadget(cb, [0]), Psi2Gadget(cb, [0])])
    g, g2 = air.gadgets
    p, _ = _g2_points()
    trace = air.new_trace()
    assert g.fill(trace, 0, p) == h2c.psi(p)
    assert g2.fill(trace, 0, p) == h2c.psi2(p)
    assert_zero_residuals(air, trace, [])


def test_neg_parity_zero_gadgets():
    def build(cb):
        neg = Fp2NegCanonGadget(cb, [3])
        par = ParityGadget(cb, [3])
        zf = Fp2ZeroFlagGadget(cb, [3], neg.c0)
        return [neg, par, zf]

    air = _GadgetAir(8, build)
    neg, par, zf = air.gadgets
    a = (rng.randrange(P381), rng.randrange(P381))
    trace = air.new_trace()
    out = neg.fill(trace, 3, a)
    assert out == bls.fp2_neg(a)
    assert par.fill(trace, 3, a[0]) == a[0] & 1
    assert zf.fill(trace, 3, out[0]) == (1 if out[0] == 0 else 0)
    assert_zero_residuals(air, trace, [])
    # zero case: canonical negation of 0 stays 0, zero flag = 1
    trace2 = air.new_trace()
    out2 = neg.fill(trace2, 3, (0, 5))
    assert out2 == (0, P381 - 5)
    par.fill(trace2, 3, 0)
    assert zf.fill(trace2, 3, 0) == 1
    assert_zero_residuals(air, trace2, [])
    # tamper: flip the zero flag -> violated
    bad = trace2.copy()
    bad[3, zf.z] = 0
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, bad, [])
    # tamper: flip the parity bit -> violated
    bad = trace.copy()
    bad[3, par.b] = 1 - int(bad[3, par.b])
    with pytest.raises(AssertionError):
        assert_zero_residuals(air, bad, [])
