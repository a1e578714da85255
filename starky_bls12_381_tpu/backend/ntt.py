"""Radix-2 NTT / coset LDE over Goldilocks, vectorized across columns.

Replaces the reference backend's polynomial machinery (plonky2 `fft` /
`coset_fft`, used by starky's `trace_rows_to_poly_values` + LDE commitment,
see SURVEY.md §2.2). Data layout is (rows, cols): the transform runs along
axis 0 while every butterfly is vectorized across the trailing columns axis,
which maps straight onto the TPU VPU lanes; columns are the natural sharding
axis for multi-device LDE (parallel/mesh.py).

All functions are backend-agnostic (numpy or jax.numpy uint64 arrays).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..fields import goldilocks as gl


@lru_cache(maxsize=None)
def _twiddle_tables(n_log: int, inverse: bool):
    """Per-stage twiddle tables for a size-2^n_log NTT, as numpy arrays.

    Stage s (s = 1..n_log) works on blocks of size 2^s and needs
    2^(s-1) twiddles w_{2^s}^j.
    """
    n = 1 << n_log
    root = gl.primitive_root_of_unity(n_log)
    if inverse:
        root = gl.inv_s(root)
    # powers[j] = root^j for j < n/2
    pows = np.empty(max(n // 2, 1), dtype=np.uint64)
    acc = 1
    for j in range(max(n // 2, 1)):
        pows[j] = acc
        acc = acc * root % gl.P
    tables = []
    for s in range(1, n_log + 1):
        m = 1 << (s - 1)  # half block
        stride = n >> s
        tables.append(pows[: m * stride : stride].copy())  # w_{2^s}^j = root^(j * n / 2^s)
    return tables


@lru_cache(maxsize=None)
def _bitrev_perm(n_log: int):
    n = 1 << n_log
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(n_log):
        rev |= ((idx >> b) & 1) << (n_log - 1 - b)
    return rev


def ntt(values, inverse: bool = False):
    """NTT along axis 0 of a (n, ...) uint64 array (natural in/out order)."""
    xp = gl._xp(values)
    n = values.shape[0]
    n_log = n.bit_length() - 1
    assert 1 << n_log == n, "size must be a power of two"
    if n == 1:
        return values
    tail = values.shape[1:]
    perm = _bitrev_perm(n_log)
    a = values[perm if xp is np else xp.asarray(perm)]
    tables = _twiddle_tables(n_log, inverse)
    for s in range(1, n_log + 1):
        m = 1 << (s - 1)
        tw = tables[s - 1]
        if xp is not np:
            tw = xp.asarray(tw)
        a = a.reshape((n >> s, 2, m) + tail)
        even = a[:, 0]
        odd = gl.gl_mul(a[:, 1], tw.reshape((1, m) + (1,) * len(tail)))
        a = xp.stack([gl.gl_add(even, odd), gl.gl_sub(even, odd)], axis=1)
    a = a.reshape((n,) + tail)
    if inverse:
        n_inv = gl.inv_s(n)
        a = gl.gl_mul(a, xp.uint64(n_inv))
    return a


def interpolate(evals):
    """Evaluations over the order-n subgroup (natural order) -> coefficients."""
    return ntt(evals, inverse=True)


def _shift_powers(xp, n: int, shift: int):
    pows = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        pows[i] = acc
        acc = acc * shift % gl.P
    return pows if xp is np else xp.asarray(pows)


def coset_evaluate(coeffs, n_out: int, shift: int = gl.GENERATOR):
    """Evaluate a polynomial (coeff axis 0, len <= n_out) on the coset
    shift * <w_{n_out}> in natural order: out[i] = f(shift * w^i)."""
    xp = gl._xp(coeffs)
    n_in = coeffs.shape[0]
    tail = coeffs.shape[1:]
    pows = _shift_powers(xp, n_in, shift).reshape((n_in,) + (1,) * len(tail))
    scaled = gl.gl_mul(coeffs, pows)
    if n_in < n_out:
        scaled = xp.concatenate([scaled, xp.zeros((n_out - n_in,) + tail, dtype=xp.uint64)], axis=0)
    return ntt(scaled)


def coset_interpolate(evals, shift: int = gl.GENERATOR):
    """Inverse of coset_evaluate with n_out == len(evals)."""
    xp = gl._xp(evals)
    n = evals.shape[0]
    tail = evals.shape[1:]
    coeffs = ntt(evals, inverse=True)
    inv_pows = _shift_powers(xp, n, gl.inv_s(shift)).reshape((n,) + (1,) * len(tail))
    return gl.gl_mul(coeffs, inv_pows)


def lde(trace_evals, rate_bits: int, shift: int = gl.GENERATOR):
    """Low-degree extension: values over H (axis 0) -> values over the coset
    shift*K of size |H| * 2^rate_bits. Returns (lde_values, coeffs)."""
    n = trace_evals.shape[0]
    coeffs = interpolate(trace_evals)
    return coset_evaluate(coeffs, n << rate_bits, shift), coeffs
