"""PkPointCheckAir / SigPointCheckAir: in-proof decompression checks
(parity: g1_plonky2.rs pk_point_check, g2_plonky2.rs signature_point_check)."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import prove
from starky_bls12_381_tpu.backend.verifier import VerificationError, verify
from starky_bls12_381_tpu.chips.testing import assert_zero_residuals
from starky_bls12_381_tpu.fields import bls12_381 as bls
from starky_bls12_381_tpu.fields.compression import _sign_fp, _sign_fp2
from starky_bls12_381_tpu.starks.point_check import PkPointCheckAir, SigPointCheckAir

CFG = StarkConfig(pow_bits=4, num_queries=24)

N = 4


@pytest.fixture(scope="module")
def points():
    pts = [bls.G1_GEN]
    for _ in range(N - 1):
        pts.append(bls.g1_double(pts[-1]))
    return pts


@pytest.fixture(scope="module")
def proven(points):
    air = PkPointCheckAir(num_points=N)
    trace, pis = air.generate_trace(points)
    proof = prove(air, trace, pis, CFG, xp=np)
    return air, trace, pis, proof


def test_residuals_zero(proven):
    air, trace, pis, _ = proven
    assert_zero_residuals(air, trace, pis)


def test_sign_flags_match_native(proven, points):
    air, _, pis, _ = proven
    for i, (x, y) in enumerate(points):
        assert pis[25 * i + 24] == _sign_fp(y)


def test_degree_fits_rate_1(proven):
    assert proven[0].quotient_degree_factor() <= 2


def test_prove_verify(proven):
    air, _, pis, proof = proven
    verify(air, proof, pis, CFG)


def test_flipped_sign_rejected(proven):
    air, _, pis, proof = proven
    bad = list(pis)
    bad[24] = 1 - bad[24]
    with pytest.raises(VerificationError):
        verify(air, proof, bad, CFG)


def test_off_curve_point_rejected_at_fill(points):
    air = PkPointCheckAir(num_points=N)
    bad = list(points)
    bad[1] = (bad[1][0], (bad[1][1] + 1) % bls.P381)
    with pytest.raises(AssertionError):
        air.generate_trace(bad)


def test_tampered_y_trace_rejected(proven, points):
    """Forge a different y for point 0 in the trace (keeping the PIs):
    the on-curve wire must reject it."""
    air, trace, pis, _ = proven
    t2 = trace.copy()
    t2[0, air.ysq.x] = (t2[0, air.ysq.x] + 1) % np.uint64(1 << 32)
    proof2 = prove(air, t2, pis, CFG, xp=np)
    with pytest.raises(VerificationError):
        verify(air, proof2, pis, CFG)


# -- G2 signature ------------------------------------------------------------


@pytest.fixture(scope="module")
def g2_proven():
    # a real G2 point: the generator scaled a few times
    from starky_bls12_381_tpu.fields.hash_to_curve import g2_scalar_mul

    g2 = g2_scalar_mul(bls.G2_GEN, 7)
    air = SigPointCheckAir()
    trace, pis = air.generate_trace(*g2)
    proof = prove(air, trace, pis, CFG, xp=np)
    return air, trace, pis, proof, g2


def test_g2_residuals_zero(g2_proven):
    air, trace, pis, _, _ = g2_proven
    assert_zero_residuals(air, trace, pis)


def test_g2_sign_matches_native(g2_proven):
    air, _, pis, _, g2 = g2_proven
    assert pis[48] == _sign_fp2(g2[1])


def test_g2_degree_fits_rate_1(g2_proven):
    assert g2_proven[0].quotient_degree_factor() <= 2


def test_g2_prove_verify(g2_proven):
    air, _, pis, proof, _ = g2_proven
    verify(air, proof, pis, CFG)


def test_g2_flipped_sign_rejected(g2_proven):
    air, _, pis, proof, _ = g2_proven
    bad = list(pis)
    bad[48] = 1 - bad[48]
    with pytest.raises(VerificationError):
        verify(air, proof, bad, CFG)


def test_g2_off_curve_rejected_at_fill(g2_proven):
    air = SigPointCheckAir()
    _, _, _, _, g2 = g2_proven
    with pytest.raises(AssertionError):
        air.generate_trace(g2[0], (g2[1][0], (g2[1][1] + 1) % bls.P381))
