"""SSZ merkleization units + light-client input loading (main.rs parity)."""

import hashlib
import os

import pytest

pytestmark = pytest.mark.smoke

from starky_bls12_381_tpu.fields import ssz

FIX_1052 = "/root/reference/src/light_client_update_period_1052.json"
FIX_1053 = "/root/reference/src/light_client_update_period_1053.json"


def test_uint64_root():
    assert ssz.uint64_root(1) == b"\x01" + bytes(31)
    assert ssz.uint64_root(0x0102) == b"\x02\x01" + bytes(30)


def test_merkleize_pads_to_pow2():
    a, b, c = (bytes([i]) * 32 for i in (1, 2, 3))
    h = lambda x, y: hashlib.sha256(x + y).digest()  # noqa: E731
    expected = h(h(a, b), h(c, bytes(32)))
    assert ssz.merkleize([a, b, c]) == expected


def test_signing_root_is_two_leaf_hash():
    obj, dom = bytes([7]) * 32, bytes([9]) * 32
    assert ssz.signing_root(obj, dom) == hashlib.sha256(obj + dom).digest()


def test_bitvector_little_endian_bit_order():
    bits = ssz.decode_sync_committee_bits("0x0180", count=16)
    assert bits[0] == 1 and sum(bits[1:8]) == 0
    assert bits[15] == 1 and sum(bits[8:15]) == 0


def test_compute_domain_shape():
    d = ssz.compute_domain(b"\x07\x00\x00\x00", bytes(4), bytes(32))
    assert len(d) == 32 and d[:4] == b"\x07\x00\x00\x00"


@pytest.mark.skipif(
    not (os.path.exists(FIX_1052) and os.path.exists(FIX_1053)),
    reason="reference light-client fixtures not available",
)
def test_load_light_client_input():
    from starky_bls12_381_tpu.cli import load_light_client_input
    from starky_bls12_381_tpu.fields import bls12_381 as bls

    n, pubkeys, bits, message, signature = load_light_client_input(
        FIX_1052, FIX_1053, "070000006a95a1a967855d676d48be69883b712607f952d5198d0f5677564636"
    )
    assert n == 512 and len(pubkeys) == 512 and len(bits) == 512
    assert len(message) == 32
    assert all(bls.g1_is_on_curve(p) for p in pubkeys[:4])
    assert bls.g2_is_on_curve(signature)
