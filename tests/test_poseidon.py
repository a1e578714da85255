import numpy as np

from starky_bls12_381_tpu.backend import poseidon as ps
from starky_bls12_381_tpu.fields.goldilocks import P


def test_batched_matches_scalar():
    rng = np.random.default_rng(0)
    states = rng.integers(0, P, size=(5, 12), dtype=np.uint64)
    out = ps.permute(states)
    for i in range(5):
        expect = ps.permute_s([int(x) for x in states[i]])
        assert [int(x) for x in out[i]] == expect


def test_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    states = rng.integers(0, P, size=(4, 12), dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(ps.permute(jnp.asarray(states))), ps.permute(states))


def test_hash_rows_matches_scalar_leaf_hash():
    rng = np.random.default_rng(2)
    # widths exercising: sub-rate, single chunk, multi-segment w/ tail pad,
    # power-of-two segments, > 128 segments (kseg > 1)
    for c in (4, 8, 21, 64, 2048, 1500):
        rows = rng.integers(0, P, size=(3, c), dtype=np.uint64)
        digs = ps.hash_rows(rows)
        for i in range(3):
            expect = ps.hash_row_s([int(x) for x in rows[i]])
            assert tuple(int(x) for x in digs[i]) == expect


def test_leaf_hash_single_chunk_equals_sponge():
    # c <= RATE leaves are one zero-padded permutation == the plain sponge
    # digest of the padded chunk (keeps FRI pair-leaf and flat-tree digests
    # on the simple sponge spec)
    rng = np.random.default_rng(7)
    row = rng.integers(0, P, size=(1, 8), dtype=np.uint64)
    assert tuple(int(x) for x in ps.hash_rows(row)[0]) == ps.hash_elements_s(
        [int(x) for x in row[0]]
    )


def test_hash_rows_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    rows = rng.integers(0, P, size=(2, 300), dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(ps.hash_rows(jnp.asarray(rows))), ps.hash_rows(rows))


def test_compress_matches_scalar():
    rng = np.random.default_rng(3)
    l = rng.integers(0, P, size=(2, 4), dtype=np.uint64)
    r = rng.integers(0, P, size=(2, 4), dtype=np.uint64)
    out = ps.compress_rows(l, r)
    for i in range(2):
        expect = ps.compress_s([int(x) for x in l[i]], [int(x) for x in r[i]])
        assert tuple(int(x) for x in out[i]) == expect


def test_permutation_changes_state_and_is_deterministic():
    s = ps.permute_s([0] * 12)
    assert s != [0] * 12
    assert s == ps.permute_s([0] * 12)
