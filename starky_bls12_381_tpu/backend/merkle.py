"""Merkle tree with cap over Poseidon digests.

Mirrors the capability of plonky2's `MerkleTree`/`MerkleCap` used by starky
commitments (SURVEY.md §2.2): leaves are LDE rows hashed by the Poseidon
sponge, the tree stops `cap_height` levels early, and query proofs carry the
sibling path up to the cap. Layer construction is fully batched (one
`compress_rows` per level) so it runs as a handful of wide TPU ops.
"""

from __future__ import annotations

import numpy as np

from . import poseidon as ps


def build_layers(leaf_digests, cap_height: int):
    """leaf_digests (N, 4) -> list of layers [leaves, ..., cap].

    N must be a power of two and >= 2^cap_height.
    """
    n = leaf_digests.shape[0]
    assert n & (n - 1) == 0 and n >= (1 << cap_height)
    layers = [leaf_digests]
    while layers[-1].shape[0] > (1 << cap_height):
        cur = layers[-1]
        layers.append(ps.compress_rows(cur[0::2], cur[1::2]))
    return layers


def cap_of(layers):
    return layers[-1]


def prove_path(layers_np, index: int):
    """Sibling digests from leaf `index` up to (excluding) the cap.

    `layers_np` must be host numpy arrays. Returns list of (4,) digests.
    """
    path = []
    idx = index
    for layer in layers_np[:-1]:
        path.append(np.asarray(layer[idx ^ 1], dtype=np.uint64))
        idx >>= 1
    return path


def verify_path(leaf_digest, index: int, path, cap) -> bool:
    """Host-side path check against the cap (python ints / numpy)."""
    dig = tuple(int(x) for x in leaf_digest)
    idx = index
    for sib in path:
        sib = tuple(int(x) for x in sib)
        if idx & 1:
            dig = ps.compress_s(sib, dig)
        else:
            dig = ps.compress_s(dig, sib)
        idx >>= 1
    return dig == tuple(int(x) for x in cap[idx])
