"""Minimal SSZ merkleization for the light-client signing root.

Capability parity with the reference's use of `tree_hash` in `main.rs:31-39`:
hash_tree_root(BeaconBlockHeader) and hash_tree_root(SigningData), plus the
sync-committee bitfield decode needed to drive the aggregate pipeline from a
light-client update JSON. Only the containers the driver needs are
implemented — this is not a general SSZ library.
"""

from __future__ import annotations

import hashlib


def _h(a: bytes, b: bytes) -> bytes:
    return hashlib.sha256(a + b).digest()


def uint64_root(v: int) -> bytes:
    """SSZ basic-type root: 8-byte little-endian, zero-padded to 32."""
    return v.to_bytes(8, "little") + bytes(24)


def merkleize(leaves: list[bytes]) -> bytes:
    """Binary merkleization over 32-byte chunks, padded to a power of two."""
    n = 1
    while n < len(leaves):
        n *= 2
    layer = list(leaves) + [bytes(32)] * (n - len(leaves))
    while len(layer) > 1:
        layer = [_h(layer[i], layer[i + 1]) for i in range(0, len(layer), 2)]
    return layer[0]


def beacon_block_header_root(
    slot: int, proposer_index: int, parent_root: bytes, state_root: bytes, body_root: bytes
) -> bytes:
    """hash_tree_root of a BeaconBlockHeader (5 fields -> 8 leaves)."""
    return merkleize(
        [uint64_root(slot), uint64_root(proposer_index), parent_root, state_root, body_root]
    )


def signing_root(object_root: bytes, domain: bytes) -> bytes:
    """hash_tree_root of SigningData{object_root, domain} (main.rs:34-39)."""
    assert len(object_root) == 32 and len(domain) == 32
    return merkleize([object_root, domain])


def compute_domain(domain_type: bytes, fork_version: bytes, genesis_validators_root: bytes) -> bytes:
    """domain = domain_type(4) || fork_data_root[:28] (consensus spec)."""
    fork_data_root = merkleize([fork_version + bytes(28), genesis_validators_root])
    return domain_type + fork_data_root[:28]


def decode_sync_committee_bits(hex_bits: str, count: int = 512) -> list[int]:
    """SSZ Bitvector[count]: little-endian bit order within each byte."""
    raw = bytes.fromhex(hex_bits[2:] if hex_bits.startswith("0x") else hex_bits)
    assert len(raw) * 8 >= count
    return [(raw[i // 8] >> (i % 8)) & 1 for i in range(count)]


def light_client_signing_root(attested_beacon: dict, domain: bytes) -> bytes:
    """Signing root of an attested beacon header from a light-client update
    (the reference's main.rs:31-39 flow on the `attested_header.beacon`
    object)."""

    def b32(s: str) -> bytes:
        return bytes.fromhex(s[2:] if s.startswith("0x") else s)

    root = beacon_block_header_root(
        int(attested_beacon["slot"]),
        int(attested_beacon["proposer_index"]),
        b32(attested_beacon["parent_root"]),
        b32(attested_beacon["state_root"]),
        b32(attested_beacon["body_root"]),
    )
    return signing_root(root, domain)
