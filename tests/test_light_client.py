"""End-to-end light-client validation against REAL Ethereum mainnet data.

Reads the reference's fixture JSONs at test time (public chain data, not
code; skipped when absent). This is the strongest correctness gate for the
witness pipeline: if SSZ merkleization, pubkey/signature decompression,
hash-to-curve, G1 aggregation, or the pairing were wrong in any bit, the
BLS check would fail. Mirrors main.rs:8-55 behavior.
"""

import json
import os

import pytest

from starky_bls12_381_tpu.fields import bls12_381 as bls
from starky_bls12_381_tpu.fields import compression as cz
from starky_bls12_381_tpu.fields import hash_to_curve as h2c
from starky_bls12_381_tpu.fields import ssz

FIX_1052 = "/root/reference/src/light_client_update_period_1052.json"
FIX_1053 = "/root/reference/src/light_client_update_period_1053.json"
# domain used by the reference for these fixtures (main.rs:29)
DOMAIN = bytes.fromhex("070000006a95a1a967855d676d48be69883b712607f952d5198d0f5677564636")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(FIX_1052) and os.path.exists(FIX_1053)),
    reason="reference light-client fixtures not available",
)


@pytest.fixture(scope="module")
def fixture_data():
    with open(FIX_1052) as f:
        prev = json.load(f)
    with open(FIX_1053) as f:
        cur = json.load(f)
    pubkeys_hex = prev["data"]["next_sync_committee"]["pubkeys"]
    agg = cur["data"]["sync_aggregate"]
    return pubkeys_hex, agg, cur["data"]["attested_header"]["beacon"]


def test_mainnet_sync_aggregate_verifies(fixture_data):
    pubkeys_hex, agg, beacon = fixture_data
    assert len(pubkeys_hex) == 512

    pubkeys = [cz.g1_decompress(bytes.fromhex(h[2:])) for h in pubkeys_hex]
    bits = ssz.decode_sync_committee_bits(agg["sync_committee_bits"])
    sig = cz.g2_decompress(bytes.fromhex(agg["sync_committee_signature"][2:]))

    root = ssz.light_client_signing_root(beacon, DOMAIN)
    hm = h2c.hash_to_curve_g2(root)

    apk = bls.g1_aggregate(pubkeys, bits)
    assert sum(bits) > 400  # sanity: most of the committee signed
    assert bls.verify_bls_signature(apk, (hm[0], hm[1], (1, 0)), (sig[0], sig[1], (1, 0)))


def test_mainnet_signature_tamper_fails(fixture_data):
    pubkeys_hex, agg, beacon = fixture_data
    pubkeys = [cz.g1_decompress(bytes.fromhex(h[2:])) for h in pubkeys_hex]
    bits = ssz.decode_sync_committee_bits(agg["sync_committee_bits"])
    sig = cz.g2_decompress(bytes.fromhex(agg["sync_committee_signature"][2:]))
    # flip one committee bit -> aggregate pk changes -> check must fail
    bits[0] ^= 1
    root = ssz.light_client_signing_root(beacon, DOMAIN)
    hm = h2c.hash_to_curve_g2(root)
    apk = bls.g1_aggregate(pubkeys, bits)
    assert not bls.verify_bls_signature(apk, (hm[0], hm[1], (1, 0)), (sig[0], sig[1], (1, 0)))
