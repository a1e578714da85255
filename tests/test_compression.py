"""Compressed-point serialization tests (pk_point_check /
signature_point_check parity, g1_plonky2.rs:59-117, g2_plonky2.rs:484+)."""

import pytest

pytestmark = pytest.mark.smoke

from starky_bls12_381_tpu.fields import bls12_381 as bls
from starky_bls12_381_tpu.fields import compression as cz
from starky_bls12_381_tpu.fields import hash_to_curve as h2c

# IETF/ZCash standard compressed generators (draft-irtf-cfrg-pairing-friendly
# §4.2.1 / zkcrypto/bls12_381 test vectors)
G1_GEN_COMPRESSED = bytes.fromhex(
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac586c55e83ff97a1aeffb3af00adb22c6bb"
)
G2_GEN_COMPRESSED = bytes.fromhex(
    "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049334cf11213945d57e5ac7d055d042b7e"
    "024aa2b2f08f0a91260805272dc51051c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
)


def test_g1_generator_vector():
    assert cz.g1_compress(bls.G1_GEN) == G1_GEN_COMPRESSED
    assert cz.g1_decompress(G1_GEN_COMPRESSED) == bls.G1_GEN


def test_g2_generator_vector():
    assert cz.g2_compress(bls.G2_GEN) == G2_GEN_COMPRESSED
    assert cz.g2_decompress(G2_GEN_COMPRESSED) == bls.G2_GEN


def test_g1_roundtrip_many():
    p = bls.G1_GEN
    for _ in range(16):
        p = bls.g1_double(p)
        data = cz.g1_compress(p)
        assert len(data) == 48
        assert cz.g1_decompress(data) == p


def test_g2_roundtrip_many():
    q = bls.G2_GEN
    for k in (3, 5, 1 << 40, h2c.R_ORDER - 2):
        qq = h2c.g2_scalar_mul(q, k)
        assert cz.g2_decompress(cz.g2_compress(qq)) == qq


def test_infinity_encodings():
    assert cz.g1_compress(None)[0] == 0xC0
    assert cz.g1_decompress(bytes([0xC0]) + bytes(47)) is None
    assert cz.g2_decompress(bytes([0xC0]) + bytes(95)) is None
    with pytest.raises(ValueError):
        cz.g1_decompress(bytes([0xE0]) + bytes(47))  # inf + sign set


def test_malformed_rejection():
    with pytest.raises(ValueError):
        cz.g1_decompress(bytes(48))  # compression flag unset
    with pytest.raises(ValueError):
        cz.g1_decompress(bytes([0x9F]) + b"\xff" * 47)  # x >= p
    with pytest.raises((ValueError, AssertionError)):
        # x with no curve point (x=0 -> gx=4, 4 is a QR... pick x=1: 5 is
        # a non-residue mod p? ensure failure by scanning)
        for x in range(1, 50):
            gx = (pow(x, 3, bls.P381) + 4) % bls.P381
            if pow(gx, (bls.P381 - 1) // 2, bls.P381) != 1:
                cz.g1_decompress(bytes([0x80]) + x.to_bytes(47, "big"))
                break
        else:
            raise ValueError("no non-square found (fine)")


def test_subgroup_checks():
    assert cz.g1_subgroup_check(bls.G1_GEN)
    assert cz.g2_subgroup_check(bls.G2_GEN)
    # a point on the curve but outside the r-order subgroup: cofactor != 1,
    # so take a curve point from x-scan and verify check fails unless it
    # lands in the subgroup (probability ~ 1/h)
    x = 0
    while True:
        x += 1
        gx = (pow(x, 3, bls.P381) + 4) % bls.P381
        if pow(gx, (bls.P381 - 1) // 2, bls.P381) == 1:
            y = pow(gx, (bls.P381 + 1) // 4, bls.P381)
            p = (x, y)
            if bls.g1_is_on_curve(p):
                break
    assert not cz.g1_subgroup_check(p)
