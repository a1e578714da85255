import random

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from starky_bls12_381_tpu.fields import goldilocks as gl


def _rand(n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(gl.P) for _ in range(n)]


@pytest.mark.parametrize("use_jax", [False, True])
def test_array_ops_match_int_math(use_jax):
    xs = _rand(257, 1)
    ys = _rand(257, 2)
    if use_jax:
        import jax.numpy as xp
    else:
        import numpy as xp
    a = xp.asarray(np.asarray(xs, dtype=np.uint64))
    b = xp.asarray(np.asarray(ys, dtype=np.uint64))
    for fn, ref in [
        (gl.gl_add, lambda x, y: (x + y) % gl.P),
        (gl.gl_sub, lambda x, y: (x - y) % gl.P),
        (gl.gl_mul, lambda x, y: (x * y) % gl.P),
    ]:
        out = np.asarray(fn(a, b))
        expect = np.asarray([ref(x, y) for x, y in zip(xs, ys)], dtype=np.uint64)
        np.testing.assert_array_equal(out, expect)
    np.testing.assert_array_equal(
        np.asarray(gl.gl_neg(a)), np.asarray([(-x) % gl.P for x in xs], dtype=np.uint64)
    )


def test_edge_values():
    edge = [0, 1, gl.P - 1, gl.P - 2, 1 << 32, (1 << 32) - 1, (1 << 63), gl.NEG]
    a = np.asarray(edge, dtype=np.uint64)
    for x in edge:
        b = np.full_like(a, np.uint64(x))
        np.testing.assert_array_equal(
            gl.gl_mul(a, b), np.asarray([(v * x) % gl.P for v in edge], dtype=np.uint64)
        )
        np.testing.assert_array_equal(
            gl.gl_add(a, b), np.asarray([(v + x) % gl.P for v in edge], dtype=np.uint64)
        )


def test_inv():
    xs = np.asarray(_rand(64, 3), dtype=np.uint64)
    inv = gl.gl_inv(xs)
    np.testing.assert_array_equal(gl.gl_mul(xs, inv), np.ones_like(xs))


def test_gl_sum():
    xs = _rand(1000, 4)
    a = np.asarray(xs, dtype=np.uint64)
    assert int(gl.gl_sum(a, axis=0)) == sum(xs) % gl.P


def test_ext_field():
    rng = random.Random(5)
    a = (rng.randrange(gl.P), rng.randrange(gl.P))
    b = (rng.randrange(gl.P), rng.randrange(gl.P))
    assert gl.ext_mul(a, gl.ext_inv(a)) == gl.EXT_ONE
    # distributivity
    left = gl.ext_mul(a, gl.ext_add(b, gl.EXT_ONE))
    right = gl.ext_add(gl.ext_mul(a, b), a)
    assert left == right
    # 7 must be a non-residue for x^2-7 to be irreducible
    assert pow(gl.W_EXT, (gl.P - 1) // 2, gl.P) == gl.P - 1
    # vector version matches scalar
    av = (np.asarray([a[0]], dtype=np.uint64), np.asarray([a[1]], dtype=np.uint64))
    bv = (np.asarray([b[0]], dtype=np.uint64), np.asarray([b[1]], dtype=np.uint64))
    mv = gl.ext_mul_v(av, bv)
    ms = gl.ext_mul(a, b)
    assert (int(mv[0][0]), int(mv[1][0])) == ms
    iv = gl.ext_inv_v(av)
    assert (int(iv[0][0]), int(iv[1][0])) == gl.ext_inv(a)


def test_root_of_unity():
    for k in [1, 5, 15]:
        w = gl.primitive_root_of_unity(k)
        assert pow(w, 1 << k, gl.P) == 1
        assert pow(w, 1 << (k - 1), gl.P) == gl.P - 1
