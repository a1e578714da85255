"""Pins the memory-disciplined prover machinery:

* barycentric openings from LDE values == coefficient-basis openings,
* chunked streaming commit digests == whole-row leaf hash,
* ChunkedColumns gather == dense gather (in-order and shuffled),
* a full prove with forced multi-chunk commit verifies and is bit-identical
  to the single-chunk proof.
"""

import numpy as np

from starky_bls12_381_tpu.backend import ntt
from starky_bls12_381_tpu.backend import poseidon as ps
from starky_bls12_381_tpu.backend.air import ChunkedColumns
from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.prover import (
    SHIFT,
    StarkProver,
    _domain_points,
    barycentric_weights,
    ext_powers,
)
from starky_bls12_381_tpu.backend.verifier import verify
from starky_bls12_381_tpu.fields import goldilocks as gl


def test_barycentric_matches_coefficient_opening():
    rng = np.random.default_rng(0)
    n, n0, cols = 16, 32, 5
    trace = rng.integers(0, gl.P, size=(n, cols), dtype=np.uint64)
    lde, coeffs = ntt.lde(trace, 1, SHIFT)
    pts = _domain_points(n0)
    zeta = (1234567890123456789, 987654321987654321)
    w = barycentric_weights(n0, pts, zeta)
    # coefficient-basis opening
    pows = ext_powers(zeta, n)
    ref0 = gl.gl_sum(gl.gl_mul(coeffs, pows[:, 0][:, None]), axis=0)
    ref1 = gl.gl_sum(gl.gl_mul(coeffs, pows[:, 1][:, None]), axis=0)
    # barycentric from LDE values
    got0 = gl.gl_sum(gl.gl_mul(lde, w[:, 0][:, None]), axis=0)
    got1 = gl.gl_sum(gl.gl_mul(lde, w[:, 1][:, None]), axis=0)
    np.testing.assert_array_equal(got0, ref0)
    np.testing.assert_array_equal(got1, ref1)


def test_segment_hash_chunks_match_whole_row():
    rng = np.random.default_rng(1)
    n, c = 4, 200
    rows = rng.integers(0, gl.P, size=(n, c), dtype=np.uint64)
    whole = np.asarray(ps.hash_rows(rows))
    _, s, kseg = ps.leaf_plan(c)
    seg_cols = kseg * ps.RATE
    padded = np.zeros((n, s * seg_cols), dtype=np.uint64)
    padded[:, :c] = rows
    # stream in 3 uneven segment groups
    digs = []
    for lo, hi in [(0, 2), (2, 3), (3, s)]:
        digs.append(ps.hash_row_segments(padded[:, lo * seg_cols : hi * seg_cols], kseg))
    leaves = ps.fold_segment_digests(np.concatenate(digs, axis=1))
    np.testing.assert_array_equal(np.asarray(leaves), whole)
    # and the scalar reference agrees
    assert tuple(int(x) for x in whole[0]) == ps.hash_row_s([int(x) for x in rows[0]])


def test_chunked_columns_gather():
    rng = np.random.default_rng(2)
    mat = rng.integers(0, gl.P, size=(8, 30), dtype=np.uint64)
    chunks = [mat[:, 0:10], mat[:, 10:20], mat[:, 20:30]]
    cc = ChunkedColumns(np, chunks)
    for cols in ([3], [0, 10, 20], [25, 1, 14, 14, 7], list(range(30))):
        got = cc.gather(np.asarray(cols))
        np.testing.assert_array_equal(got, mat[:, np.asarray(cols)])


def test_multichunk_prove_bit_identical(monkeypatch):
    """Force a tiny chunk size so the commit streams in many chunks; the
    proof must verify and match the single-chunk proof bit-for-bit."""
    from starky_bls12_381_tpu.starks.poseidon_air import PoseidonAir

    air = PoseidonAir(num_perms=2)
    rng = np.random.default_rng(3)
    inputs = [list(rng.integers(0, gl.P, size=12, dtype=np.uint64)) for _ in range(2)]
    trace, pis = air.generate_trace(inputs)
    config = StarkConfig(pow_bits=4, num_queries=8)

    big = StarkProver(air, config, xp=np)
    assert big.num_chunks == 1
    proof_one = big.prove(trace, pis)

    monkeypatch.setattr(StarkProver, "_CHUNK_BYTES", 1 << 12)
    small = StarkProver(air, config, xp=np)
    assert small.num_chunks > 1
    proof_many = small.prove(trace, pis)
    verify(air, proof_many, pis, config)

    from starky_bls12_381_tpu.backend.proof import proof_to_bytes

    assert proof_to_bytes(proof_one) == proof_to_bytes(proof_many)


def test_on_device_trace_generation_bit_identical():
    """FillRecorder.flush_device expands the recorded fills under jax.jit;
    the device trace must equal the host flush bit-for-bit."""
    import random

    import jax.numpy as jnp  # noqa: F401

    from starky_bls12_381_tpu.fields.bls12_381 import P381
    from starky_bls12_381_tpu.starks.fp12_mul import FP12MulAir

    rng_py = random.Random(1)

    def fp12():
        return tuple(
            tuple((rng_py.randrange(P381), rng_py.randrange(P381)) for _ in range(3))
            for _ in range(2)
        )

    air = FP12MulAir()
    x, y = fp12(), fp12()
    host, pis = air.generate_trace(x, y)
    dev, pis2 = air.generate_trace(x, y, device=True)
    assert pis == pis2
    np.testing.assert_array_equal(np.asarray(dev), host)
    # second statement reuses the cached compiled expansion
    x2, y2 = fp12(), fp12()
    host2, _ = air.generate_trace(x2, y2)
    dev2, _ = air.generate_trace(x2, y2, device=True)
    np.testing.assert_array_equal(np.asarray(dev2), host2)
    assert len(air._fill_jit) == 1


def test_row_segmented_quotient_bit_identical(monkeypatch):
    """Forcing a tiny quotient segment budget must produce the identical
    proof (row-segmented constraint evaluation with halo blocks)."""
    from starky_bls12_381_tpu.starks.poseidon_air import PoseidonAir

    air = PoseidonAir(num_perms=2)
    rng = np.random.default_rng(9)
    inputs = [list(rng.integers(0, gl.P, size=12, dtype=np.uint64)) for _ in range(2)]
    trace, pis = air.generate_trace(inputs)
    config = StarkConfig(pow_bits=4, num_queries=8)

    one = StarkProver(air, config, xp=np)
    proof_one = one.prove(trace, pis)

    monkeypatch.setattr(StarkProver, "_QUOTIENT_SEG_BYTES", 1 << 10)
    seg = StarkProver(air, config, xp=np)
    proof_seg = seg.prove(trace, pis)
    verify(air, proof_seg, pis, config)
    from starky_bls12_381_tpu.backend.proof import proof_to_bytes

    assert proof_to_bytes(proof_one) == proof_to_bytes(proof_seg)
