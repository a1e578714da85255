import numpy as np

from starky_bls12_381_tpu.backend import ntt
from starky_bls12_381_tpu.fields import goldilocks as gl

import pytest

pytestmark = pytest.mark.smoke


def _eval_poly(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + int(c)) % gl.P
    return acc


def test_ntt_roundtrip():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, gl.P, size=(64, 3), dtype=np.uint64)
    coeffs = ntt.interpolate(vals)
    back = ntt.ntt(coeffs)
    np.testing.assert_array_equal(back, vals)


def test_ntt_matches_direct_evaluation():
    rng = np.random.default_rng(1)
    coeffs = rng.integers(0, gl.P, size=(8, 2), dtype=np.uint64)
    out = ntt.ntt(coeffs.copy())
    w = gl.primitive_root_of_unity(3)
    for i in range(8):
        x = pow(w, i, gl.P)
        for c in range(2):
            assert int(out[i, c]) == _eval_poly(coeffs[:, c], x)


def test_coset_lde():
    rng = np.random.default_rng(2)
    vals = rng.integers(0, gl.P, size=(16, 2), dtype=np.uint64)
    lde_vals, coeffs = ntt.lde(vals, rate_bits=2)
    assert lde_vals.shape == (64, 2)
    w64 = gl.primitive_root_of_unity(6)
    for i in [0, 1, 17, 63]:
        x = gl.GENERATOR * pow(w64, i, gl.P) % gl.P
        for c in range(2):
            assert int(lde_vals[i, c]) == _eval_poly(coeffs[:, c], x)
    # coset interpolate inverts coset evaluate
    back = ntt.coset_interpolate(lde_vals)
    np.testing.assert_array_equal(back[:16], coeffs)
    assert not back[16:].any()


def test_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    vals = rng.integers(0, gl.P, size=(32, 4), dtype=np.uint64)
    a = ntt.ntt(vals)
    b = np.asarray(ntt.ntt(jnp.asarray(vals)))
    np.testing.assert_array_equal(a, b)
