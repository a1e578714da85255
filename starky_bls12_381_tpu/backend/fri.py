"""FRI commit-phase helpers shared by prover and verifier.

Arity-2 folding over GF(p^2) values living on a multiplicative coset
(natural order, index i <-> point shift * w^i). The capability replaces the
plonky2 FRI used by starky (SURVEY.md §2.2); folding math:

    f_next(x^2) = (f(x) + f(-x))/2 + beta * (f(x) - f(-x)) / (2x)

with -x sitting at index i + N/2 in natural order.
"""

from __future__ import annotations

import numpy as np

from ..fields import goldilocks as gl


def layer_x_invs(n_half: int, shift: int, root: int):
    """inv(x_i) for i < n_half as a uint64 numpy array, x_i = shift * w^i."""
    inv_shift = gl.inv_s(shift)
    inv_root = gl.inv_s(root)
    out = np.empty(n_half, dtype=np.uint64)
    acc = inv_shift
    for i in range(n_half):
        out[i] = acc
        acc = acc * inv_root % gl.P
    return out


def fold_layer(values, beta, x_invs, xp):
    """values: ext pair (v0, v1) arrays of length N -> folded length N/2.

    beta: ext scalar (b0, b1) python ints. x_invs: (N/2,) uint64.
    """
    n = values[0].shape[0]
    half = n // 2
    lo = (values[0][:half], values[1][:half])
    hi = (values[0][half:], values[1][half:])
    s = gl.ext_add_v(lo, hi)
    d = gl.ext_sub_v(lo, hi)
    inv2 = gl.inv_s(2)
    if xp is not np:
        x_invs = xp.asarray(x_invs)
    beta_v = (xp.uint64(beta[0]), xp.uint64(beta[1]))
    term = gl.ext_mul_base_v(gl.ext_mul_v(d, beta_v), x_invs)
    out = gl.ext_add_v(s, term)
    return (gl.gl_mul(out[0], xp.uint64(inv2)), gl.gl_mul(out[1], xp.uint64(inv2)))


def fold_scalar(v_x, v_negx, beta, x: int):
    """Scalar (host) version of the fold at one point: returns f_next(x^2)."""
    s = gl.ext_add(v_x, v_negx)
    d = gl.ext_sub(v_x, v_negx)
    inv2x = gl.inv_s(2 * x % gl.P)
    half_s = gl.ext_scalar_mul(s, gl.inv_s(2))
    term = gl.ext_scalar_mul(gl.ext_mul(beta, d), inv2x)
    return gl.ext_add(half_s, term)


def pair_rows(values, xp):
    """Ext values (v0, v1) of length N -> (N/2, 4) leaf rows
    [re(i), im(i), re(i+half), im(i+half)] for Merkle commitment."""
    n = values[0].shape[0]
    half = n // 2
    return xp.stack(
        [values[0][:half], values[1][:half], values[0][half:], values[1][half:]], axis=1
    )


def eval_final_poly(coeffs, x):
    """Evaluate the final polynomial (list of ext tuples) at ext point x."""
    acc = gl.EXT_ZERO
    for c in reversed(coeffs):
        acc = gl.ext_add(gl.ext_mul(acc, x), (int(c[0]), int(c[1])))
    return acc
