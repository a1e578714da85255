"""hash_to_curve tests: structural RFC 9380 checks + BLS sign/verify."""

from starky_bls12_381_tpu.fields import bls12_381 as bls
from starky_bls12_381_tpu.fields import hash_to_curve as h2c

import pytest

pytestmark = pytest.mark.smoke


def _g1_mul(p, k):
    acc, add = None, p
    while k:
        if k & 1:
            acc = add if acc is None else (bls.g1_double(acc) if acc == add else bls.g1_add(acc, add))
        add = bls.g1_double(add)
        k >>= 1
    return acc


def test_expand_message_xmd_shapes():
    out = h2c.expand_message_xmd(b"msg", h2c.DST, 256)
    assert len(out) == 256
    assert out != h2c.expand_message_xmd(b"msg2", h2c.DST, 256)


def test_hash_to_field_in_range():
    els = h2c.hash_to_field(b"field test", 2)
    assert len(els) == 2
    for e in els:
        assert 0 <= e[0] < bls.P381 and 0 <= e[1] < bls.P381


def test_sswu_point_on_isogenous_curve_maps_to_e2():
    u = h2c.hash_to_field(b"sswu", 1)[0]
    q = h2c.iso_map(h2c.map_to_curve_sswu(u))
    assert bls.g2_is_on_curve(q)


def test_hash_to_curve_subgroup_and_determinism():
    hm = h2c.hash_to_curve_g2(b"subgroup test")
    assert bls.g2_is_on_curve(hm)
    assert h2c.g2_scalar_mul(hm, h2c.R_ORDER) is None
    assert hm == h2c.hash_to_curve_g2(b"subgroup test")


def test_bls_sign_verify_roundtrip():
    sk = 987654321123456789
    hm = h2c.hash_to_curve_g2(b"sign me")
    sig = h2c.g2_scalar_mul(hm, sk)
    pk = _g1_mul(bls.G1_GEN, sk)
    assert bls.verify_bls_signature(pk, (hm[0], hm[1], (1, 0)), (sig[0], sig[1], (1, 0)))
    bad = ((sig[0][0] + 1, sig[0][1]), sig[1])
    assert not bls.verify_bls_signature(pk, (hm[0], hm[1], (1, 0)), (bad[0], bad[1], (1, 0)))
