"""STARK verifier: host-side, numpy-vectorized where bulk hashing matters.

Mirrors prover.py's transcript exactly (same Challenger class). Checks:

1. challenge derivation (caps/openings observed in identical order);
2. the quotient identity at zeta:
      sum_k zeta^{n k} Q_k(zeta) * Z_H(zeta) == combined constraints(zeta)
   where the constraint combination re-runs the SAME `air.eval` through
   `ExtScalarAlgebra` (no hand-written mirror, unlike the reference's
   eval_packed_generic / eval_ext_circuit pair);
3. proof-of-work grinding;
4. every FRI query round: Merkle paths for trace/quotient rows and fold
   layers, the DEEP composition value at the query point, arity-2 fold
   consistency, and the final-polynomial evaluation.
"""

from __future__ import annotations

import numpy as np

from ..fields import goldilocks as gl
from . import fri
from . import poseidon as ps
from .air import Ctx, ExtVectorAccessors, ExtVectorAlgebra
from .challenger import Challenger
from .config import StarkConfig
from . import ntt
from .prover import SHIFT, check_pow, ext_dot_ext, ext_powers, filter_at_point
from .proof import StarkProof


def _eval_cols_at(coeffs: np.ndarray, point) -> np.ndarray:
    """Evaluate base-coeff column polys (n, K) at ext point -> (K, 2) u64."""
    pows = ext_powers(point, coeffs.shape[0])
    c0 = gl.gl_sum(gl.gl_mul(coeffs, pows[:, 0][:, None]), axis=0)
    c1 = gl.gl_sum(gl.gl_mul(coeffs, pows[:, 1][:, None]), axis=0)
    return np.stack([np.asarray(c0), np.asarray(c1)], axis=1)


class VerificationError(Exception):
    pass


def _req(cond, msg):
    if not cond:
        raise VerificationError(msg)


def derive_challenges(air, proof: StarkProof, pis, config: StarkConfig) -> dict:
    """Replay the Fiat-Shamir transcript over the proof's PUBLIC part
    (caps, openings, final poly, nonce) and return every derived value.
    Shared by the plain verifier and the recursive-verification layer
    (starks/recursive_verifier.py), which keeps transcript replay native."""
    n = air.num_rows
    n0 = n * config.blowup
    ch = Challenger()
    ch.observe_array(np.asarray([int(x) % gl.P for x in pis], dtype=np.uint64))
    ch.observe_cap(proof.trace_cap)
    phase_chals: list = []
    if getattr(air, "num_cols2", 0):
        _req(proof.trace2_cap is not None, "missing phase-2 commitment")
        phase_chals = ch.get_challenges(air.num_phase_challenges)
        ch.observe_cap(proof.trace2_cap)
    alphas = ch.get_challenges(config.num_challenges)
    ch.observe_cap(proof.quotient_cap)
    zeta = ch.get_ext_challenge()
    g = gl.primitive_root_of_unity(n.bit_length() - 1)
    if getattr(air, "num_cols2", 0):
        ch.observe_array(np.concatenate(
            [proof.trace_local, proof.trace_next, proof.trace2_local, proof.trace2_next,
             proof.quotient_open], axis=0))
    else:
        ch.observe_array(
            np.concatenate([proof.trace_local, proof.trace_next, proof.quotient_open], axis=0)
        )
    gamma = ch.get_ext_challenge()
    betas = []
    for cap in proof.fri.layer_caps:
        ch.observe_cap(cap)
        betas.append(ch.get_ext_challenge())
    ch.observe_array(proof.fri.final_coeffs)
    pow_challenge = ch.get_challenge()
    ch.observe(proof.fri.pow_nonce)
    indices = ch.get_indices(config.num_queries, n0)
    return {
        "alphas": alphas,
        "zeta": zeta,
        "zeta_g": gl.ext_scalar_mul(zeta, g),
        "gamma": gamma,
        "betas": betas,
        "pow_challenge": pow_challenge,
        "indices": indices,
        "phase_challenges": phase_chals,
    }


def check_quotient_identity(air, proof: StarkProof, pis, config: StarkConfig, alphas, zeta,
                            phase_chals=None) -> None:
    """The quotient identity at zeta: re-runs air.eval through the
    ext-scalar algebra against the opened values. Raises on mismatch."""
    n = air.num_rows
    factor = air.quotient_degree_factor()
    alg = ExtVectorAlgebra()
    t_local = np.asarray(proof.trace_local, dtype=np.uint64)
    t_next = np.asarray(proof.trace_next, dtype=np.uint64)
    zeta_g = gl.ext_scalar_mul(zeta, gl.primitive_root_of_unity(n.bit_length() - 1))
    const = air.constant_columns()
    if const is not None:
        c_coeffs = ntt.interpolate(np.asarray(const, dtype=np.uint64))
        c_zeta = _eval_cols_at(c_coeffs, zeta)
        c_zeta_g = _eval_cols_at(c_coeffs, zeta_g)
    else:
        c_zeta = c_zeta_g = np.zeros((1, 2), dtype=np.uint64)
    t2l = t2n = None
    if getattr(air, "num_cols2", 0):
        t2l = np.asarray(proof.trace2_local, dtype=np.uint64)
        t2n = np.asarray(proof.trace2_next, dtype=np.uint64)
    ctx = Ctx(alg, ExtVectorAccessors(
        t_local, t_next, c_zeta, c_zeta_g, [int(x) % gl.P for x in pis],
        local2_vals=t2l, next2_vals=t2n, chals=phase_chals))
    air.eval(ctx)
    zh_zeta = gl.ext_sub(gl.ext_pow(zeta, n), gl.EXT_ONE)
    filt_cache = {}
    for ci, alpha in enumerate(alphas):
        acc = gl.EXT_ZERO
        for filt, data, _deg in reversed(ctx.constraints):
            grp, nrows = alg.combine_rows(data, alpha)
            if filt not in filt_cache:
                filt_cache[filt] = filter_at_point(filt, n, zeta)
            if filt[0] != "every":
                grp = gl.ext_mul(grp, filt_cache[filt])
            acc = gl.ext_add(gl.ext_scalar_mul(acc, pow(alpha, nrows, gl.P)), grp)
        zn = gl.ext_pow(zeta, n)
        q_sum = gl.EXT_ZERO
        zpow = gl.EXT_ONE
        for k in range(factor):
            q_k = (int(proof.quotient_open[ci * factor + k, 0]), int(proof.quotient_open[ci * factor + k, 1]))
            q_sum = gl.ext_add(q_sum, gl.ext_mul(zpow, q_k))
            zpow = gl.ext_mul(zpow, zn)
        _req(gl.ext_mul(q_sum, zh_zeta) == acc, f"quotient identity failed (challenge {ci})")


def verify(air, proof: StarkProof, pis, config: StarkConfig, timings: dict | None = None) -> None:
    """Raises VerificationError on any failure; returns None on success."""
    import time as _time

    _t = [_time.time()]

    def _mark(name):
        if timings is not None:
            now = _time.time()
            timings[name] = timings.get(name, 0.0) + now - _t[0]
            _t[0] = now

    n = air.num_rows
    num_cols = air.num_cols
    blowup = config.blowup
    n0 = n * blowup
    pis = [int(x) % gl.P for x in pis]
    _req(len(pis) == air.num_pis, "bad public input count")
    factor = air.quotient_degree_factor()
    nq = config.num_challenges * factor
    _req(proof.quotient_open.shape[0] == nq, "bad quotient opening count")
    _req(proof.trace_local.shape[0] == num_cols, "bad trace opening count")
    C2 = getattr(air, "num_cols2", 0)
    if C2:
        _req(proof.trace2_cap is not None and proof.trace2_local is not None
             and proof.trace2_next is not None, "missing phase-2 fields")
        _req(proof.trace2_local.shape[0] == C2 and proof.trace2_next.shape[0] == C2,
             "bad phase-2 opening count")
    else:
        _req(proof.trace2_cap is None, "unexpected phase-2 commitment")

    # ---- transcript --------------------------------------------------
    num_folds = config.fri_num_folds(n0)
    _req(len(proof.fri.layer_caps) == num_folds, "bad FRI layer count")
    final_len = (n0 >> num_folds) // blowup
    _req(proof.fri.final_coeffs.shape[0] == final_len, "bad final poly length")
    d = derive_challenges(air, proof, pis, config)
    alphas, zeta, zeta_g, gamma, betas = d["alphas"], d["zeta"], d["zeta_g"], d["gamma"], d["betas"]
    indices = d["indices"]
    _req(check_pow(d["pow_challenge"], proof.fri.pow_nonce, config.pow_bits), "bad grinding witness")
    _req([qr.index for qr in proof.fri.query_rounds] == indices, "query indices mismatch")
    _mark("transcript")

    # ---- quotient identity at zeta ----------------------------------
    check_quotient_identity(air, proof, pis, config, alphas, zeta,
                            phase_chals=d["phase_challenges"])
    _mark("quotient_identity")

    # ---- DEEP / FRI queries -----------------------------------------
    j1 = num_cols + C2 + nq
    j2 = num_cols + C2
    weights = ext_powers(gamma, j1 + j2)
    if C2:
        open1 = np.concatenate(
            [proof.trace_local, proof.trace2_local, proof.quotient_open], axis=0)
        open2 = np.concatenate([proof.trace_next, proof.trace2_next], axis=0)
    else:
        open1 = np.concatenate([proof.trace_local, proof.quotient_open], axis=0)
        open2 = proof.trace_next
    # numpy-vectorized DEEP anchor sums (a python loop here is ~180k
    # scalar ext muls for the 89k-column stark)
    r1_zeta = ext_dot_ext(weights[:j1], open1.astype(np.uint64))
    r2_zetag = ext_dot_ext(weights[j1:], open2.astype(np.uint64))

    w_n0 = gl.primitive_root_of_unity(n0.bit_length() - 1)

    # ---- structural validation (fail-closed with VerificationError,
    # not IndexError: the batched path walk below relies on every query
    # round having exactly num_folds steps and equal-length paths) ------
    _req(len(proof.fri.query_rounds) == config.num_queries, "bad query round count")
    cap_h = config.cap_height
    for qi, qr in enumerate(proof.fri.query_rounds):
        _req(len(qr.steps) == num_folds, f"bad FRI step count (query {qi})")
        _req(np.asarray(qr.trace_row).shape == (num_cols,), f"bad trace row shape (query {qi})")
        _req(np.asarray(qr.quotient_row).shape == (nq,), f"bad quotient row shape (query {qi})")
        _req(len(qr.trace_path) == n0.bit_length() - 1 - cap_h,
             f"bad trace path length (query {qi})")
        _req(len(qr.quotient_path) == n0.bit_length() - 1 - cap_h,
             f"bad quotient path length (query {qi})")
        if C2:
            _req(qr.trace2_row is not None and np.asarray(qr.trace2_row).shape == (C2,),
                 f"bad phase-2 row shape (query {qi})")
            _req(qr.trace2_path is not None
                 and len(qr.trace2_path) == n0.bit_length() - 1 - cap_h,
                 f"bad phase-2 path length (query {qi})")
        for l, st in enumerate(qr.steps):
            _req(np.asarray(st.pair).shape == (2, 2), f"bad FRI pair shape (query {qi}, layer {l})")
            half = (n0 >> l) // 2
            _req(len(st.path) == half.bit_length() - 1 - cap_h,
                 f"bad FRI path length (query {qi}, layer {l})")

    # batch-hash all opened rows (numpy-vectorized Poseidon)
    trace_rows = np.stack([qr.trace_row for qr in proof.fri.query_rounds]).astype(np.uint64)
    q_rows = np.stack([qr.quotient_row for qr in proof.fri.query_rounds]).astype(np.uint64)
    trace_leaf_digs = ps.hash_rows_host_fast(trace_rows)
    q_leaf_digs = ps.hash_rows_host_fast(q_rows)
    if C2:
        t2_rows = np.stack([qr.trace2_row for qr in proof.fri.query_rounds]).astype(np.uint64)
        t2_leaf_digs = ps.hash_rows_host_fast(t2_rows)
    step_rows = []
    for qr in proof.fri.query_rounds:
        pos = qr.index
        for l, st in enumerate(qr.steps):
            step_rows.append(np.asarray([st.pair[0, 0], st.pair[0, 1], st.pair[1, 0], st.pair[1, 1]], dtype=np.uint64))
    step_digs = ps.hash_rows(np.stack(step_rows)) if step_rows else np.zeros((0, 4), np.uint64)
    _mark("row_hashing")

    # Merkle paths: batched per tree/level (one numpy-vectorized Poseidon
    # compression per level for ALL queries, instead of ~3k scalar
    # permutations through the per-query python walk)
    qs = proof.fri.query_rounds
    _verify_paths_batch(
        trace_leaf_digs, indices, [qr.trace_path for qr in qs], proof.trace_cap, "trace"
    )
    _verify_paths_batch(
        q_leaf_digs, indices, [qr.quotient_path for qr in qs], proof.quotient_cap, "quotient"
    )
    if C2:
        _verify_paths_batch(
            t2_leaf_digs, indices, [qr.trace2_path for qr in qs], proof.trace2_cap, "phase-2"
        )
    nsteps = num_folds
    for l in range(nsteps):
        half = (n0 >> l) // 2
        pos_l = [idx % half for idx in indices]
        _verify_paths_batch(
            step_digs[l::nsteps],
            pos_l,
            [qr.steps[l].path for qr in qs],
            proof.fri.layer_caps[l],
            f"FRI layer {l}",
        )
    _mark("paths")

    for qi, qr in enumerate(proof.fri.query_rounds):
        index = qr.index
        # DEEP value at x = SHIFT * w^index
        x = SHIFT * pow(w_n0, index, gl.P) % gl.P
        if C2:
            vals1 = np.concatenate([qr.trace_row, qr.trace2_row, qr.quotient_row]).astype(np.uint64)
            vals2 = np.concatenate([qr.trace_row, qr.trace2_row]).astype(np.uint64)
        else:
            vals1 = np.concatenate([qr.trace_row, qr.quotient_row]).astype(np.uint64)
            vals2 = qr.trace_row.astype(np.uint64)
        r1_x = _ext_dot_base(weights[:j1], vals1)
        r2_x = _ext_dot_base(weights[j1:], vals2)
        f1 = gl.ext_mul(gl.ext_sub(r1_x, r1_zeta), gl.ext_inv(gl.ext_sub((x, 0), zeta)))
        f2 = gl.ext_mul(gl.ext_sub(r2_x, r2_zetag), gl.ext_inv(gl.ext_sub((x, 0), zeta_g)))
        value = gl.ext_add(f1, f2)

        pos = index
        shift_l, root_l, size_l = SHIFT, w_n0, n0
        x_l = x
        for l, st in enumerate(qr.steps):
            half = size_l // 2
            pos_in = pos % half
            pair = [(int(st.pair[0, 0]), int(st.pair[0, 1])), (int(st.pair[1, 0]), int(st.pair[1, 1]))]
            mine = 0 if pos < half else 1
            _req(pair[mine] == value, f"FRI fold input mismatch at layer {l} (query {qi})")
            # x at tree position pos_in (the + branch); fold formula uses it
            x_pos = shift_l * pow(root_l, pos_in, gl.P) % gl.P
            value = fri.fold_scalar(pair[0], pair[1], betas[l], x_pos)
            pos = pos_in
            shift_l = shift_l * shift_l % gl.P
            root_l = root_l * root_l % gl.P
            size_l = half
            x_l = x_l * x_l % gl.P
        # final polynomial evaluation at x_l = x^(2^folds)
        expect = fri.eval_final_poly(proof.fri.final_coeffs, (x_l, 0))
        _req(expect == value, f"final poly mismatch (query {qi})")
    _mark("queries")


def _ext_dot_base(weights: np.ndarray, values: np.ndarray):
    """Sum_j weights[j] (ext) * values[j] (base) -> ext tuple, numpy fast."""
    c0 = gl.gl_sum(gl.gl_mul(weights[:, 0], values), axis=0)
    c1 = gl.gl_sum(gl.gl_mul(weights[:, 1], values), axis=0)
    return (int(c0), int(c1))


def _verify_paths_batch(leaf_digs, indices, paths, cap, what: str) -> None:
    """Authenticate Q Merkle paths of equal length against one cap with
    one batched Poseidon compression per LEVEL (semantics identical to
    merkle.verify_path per query). Raises naming the first bad query."""
    q = len(indices)
    if q == 0:
        return
    digs = np.asarray(leaf_digs, dtype=np.uint64).reshape(q, 4)
    idx = np.asarray(indices, dtype=np.int64)
    length = len(paths[0])
    _req(all(len(p) == length for p in paths), f"{what} Merkle path length mismatch")
    for lvl in range(length):
        sibs = np.stack([np.asarray(p[lvl], dtype=np.uint64) for p in paths])
        bit = (idx & 1).astype(bool)[:, None]
        left = np.where(bit, sibs, digs)
        right = np.where(bit, digs, sibs)
        digs = np.asarray(ps.compress_rows(left, right))
        idx >>= 1
    cap = np.asarray(cap, dtype=np.uint64)
    ok = (digs == cap[idx]).all(axis=1)
    if not ok.all():
        bad = int(np.argwhere(~ok)[0][0])
        raise VerificationError(f"{what} Merkle path failed (query {bad})")
