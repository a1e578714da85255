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


def test_hash_rows_matches_scalar_sponge():
    rng = np.random.default_rng(2)
    rows = rng.integers(0, P, size=(3, 21), dtype=np.uint64)  # non-multiple of rate
    digs = ps.hash_rows(rows)
    for i in range(3):
        expect = ps.hash_elements_s([int(x) for x in rows[i]])
        assert tuple(int(x) for x in digs[i]) == expect


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
