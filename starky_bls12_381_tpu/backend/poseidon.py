"""Poseidon2 permutation over Goldilocks, width 12 — the backend hash.

The reference's proving backend (plonky2 / starky, SURVEY.md §2.2) commits
traces with a Poseidon-Goldilocks Merkle tree and runs Fiat–Shamir through
a Poseidon duplex challenger. We rebuild the same capability with our own
nothing-up-my-sleeve instantiation (we define both prover and verifier, so
any fixed secure instance works) — and we choose the instance for the
TARGET HARDWARE. Rounds 1-2 used classic Poseidon with a dense Cauchy MDS:
measured compute-bound on the TPU VPU at 4.3 Mperm/s, with ~79% of its
~2250 modmuls/permutation spent multiplying by full-width matrix
constants (docs/PERF.md). An MXU offload of those constant muls (int8
chunk matmuls) measured SLOWER at the XLA level — the i32 position-sum
materialization costs more HBM traffic than the VPU math it saves. The
TPU-first fix is algorithmic: Poseidon2 (Grassi–Khovratovich–Schofnegger,
ePrint 2023/323) keeps the sbox count but replaces both linear layers
with shift-add-shaped matrices, cutting the full-width modmuls to ~470
per permutation — everything else is doublings, shifts and lane-local
adds, exactly what the VPU does at full rate.

Instance (t = 12, rate 8, capacity 4, alpha = 7, R_F = 8, R_P = 22 — the
same publicly vetted Poseidon/Poseidon2 Goldilocks parameter point used
by plonky2 and Plonky3, the backend of the reference's proof stack):

* external (full) rounds and the initial layer apply
  M_E = circ(2*M4, M4, M4) with the paper's M4 =
  [[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]] (§5.1): per 4-lane block an
  8-add/3-double schedule, no general multiplications;
* internal (partial) rounds apply M_I = J + diag(2^e_0, ..., 2^e_11)
  (all-ones matrix plus a power-of-two diagonal): one lane-sum plus one
  shift-reduce per lane. The exponents e_i are derived from SHA-256 in
  counter mode over the domain tag below (each counter's byte 0 reduced
  mod 40, +1; first 12 DISTINCT values per attempt), taking the first
  attempt whose M_I has an IRREDUCIBLE characteristic polynomial over
  GF(p) — the paper's §5.3 condition ruling out invariant subspaces;
  re-verified by tests/test_poseidon.py under RUN_SLOW. (The mod-40
  reduction is mildly biased toward small exponents; irrelevant for a
  nothing-up-my-sleeve parameter, the security condition is the
  irreducibility check itself);
* round constants: rejection-sampled from SHA-256 in counter mode —
  12 per external round, 1 (lane 0) per internal round, per the spec.

Security margin: the Poseidon2 analysis reuses Poseidon's statistical and
algebraic bounds (paper §4): for (p, t, alpha) = (2^64 - 2^32 + 1, 12, 7)
at 128-bit security they require R_F >= 8 with R_P >= ~22 including the
recommended margins — exactly this instance, matching the round numbers
plonky2/Plonky3 ship for Goldilocks width 12. The linear-layer conditions
(M_E MDS on 4-blocks, M_I invariant-subspace-free) are the two properties
pinned by our derivation and tests.

Two implementations with identical outputs:
* scalar/python-int (`permute_s`) for the host challenger,
* batched array (`permute`) over numpy or jax.numpy uint64 for Merkle
  leaf/internal hashing on TPU (and numpy-vectorized host verification).
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..fields import goldilocks as gl
from ..fields.goldilocks import M32, NEG, P, _c

WIDTH = 12
RATE = 8
CAP = 4
N_FULL = 8
N_PARTIAL = 22
N_ROUNDS = N_FULL + N_PARTIAL
ALPHA = 7

_DOMAIN = b"starky_bls12_381_tpu/poseidon2-gl12/v1"

# the Poseidon2 paper's 4x4 building block (§5.1)
M4 = ((5, 7, 1, 3), (4, 6, 1, 1), (1, 3, 5, 7), (1, 1, 4, 6))

# internal-diagonal exponents: M_I = J + diag(2^e_i). Derived from
# SHA-256(domain tag | "diag" | attempt | counter): each counter's byte 0
# reduced mod 40, +1; first 12 distinct values form the attempt's
# candidate diagonal — attempts 0-2 fail the irreducibility check,
# attempt 3 passes; see tests/test_poseidon.py::test_internal_matrix_secure.
DIAG_EXP = (9, 5, 12, 37, 36, 7, 35, 8, 34, 2, 10, 20)
_DIAG_ATTEMPT = 3


def _derive_constants():
    """118 round constants: 12 per external round, 1 per internal round
    (lane 0), stored as a (30, 12) table with structural zeros."""
    consts = []
    ctr = 0
    need = N_FULL * WIDTH + N_PARTIAL
    while len(consts) < need:
        h = hashlib.sha256(_DOMAIN + b"|rc|" + str(ctr).encode()).digest()
        v = int.from_bytes(h[:8], "little")
        ctr += 1
        if v < P:
            consts.append(v)
    rc = [[0] * WIDTH for _ in range(N_ROUNDS)]
    half = N_FULL // 2
    it = iter(consts)
    for r in range(N_ROUNDS):
        if half <= r < half + N_PARTIAL:
            rc[r][0] = next(it)
        else:
            for i in range(WIDTH):
                rc[r][i] = next(it)
    return rc


ROUND_CONSTANTS = _derive_constants()
_RC_NP = np.asarray(ROUND_CONSTANTS, dtype=np.uint64)  # (30, 12)

# dense forms of the two linear layers (for the in-AIR constraint tables
# and the scalar oracle; the batched path uses the shift-add schedules)
_ME = [[0] * WIDTH for _ in range(WIDTH)]
for _bi in range(3):
    for _bj in range(3):
        for _i in range(4):
            for _j in range(4):
                _ME[_bi * 4 + _i][_bj * 4 + _j] = M4[_i][_j] * (2 if _bi == _bj else 1)
M_EXTERNAL = tuple(tuple(row) for row in _ME)
del _ME
M_INTERNAL = tuple(
    tuple((pow(2, DIAG_EXP[i], P) + 1) % P if i == j else 1 for j in range(WIDTH))
    for i in range(WIDTH)
)
_ME_NP = np.asarray(M_EXTERNAL, dtype=np.uint64)
_MI_NP = np.asarray(M_INTERNAL, dtype=np.uint64)


def round_is_full(r: int) -> bool:
    half = N_FULL // 2
    return not (half <= r < half + N_PARTIAL)


# ---------------------------------------------------------------------------
# Scalar permutation (python ints) — host challenger / reference oracle.
# ---------------------------------------------------------------------------


def _sbox_s(x: int) -> int:
    x2 = x * x % P
    x3 = x2 * x % P
    return x3 * x3 % P * x % P


def _mat_s(mat, s):
    return [sum(mat[i][j] * s[j] for j in range(WIDTH)) % P for i in range(WIDTH)]


def permute_s(state):
    """Permute a list of 12 python ints (canonical)."""
    s = _mat_s(M_EXTERNAL, [x % P for x in state])  # initial external layer
    for r in range(N_ROUNDS):
        if round_is_full(r):
            s = [_sbox_s((s[i] + ROUND_CONSTANTS[r][i]) % P) for i in range(WIDTH)]
            s = _mat_s(M_EXTERNAL, s)
        else:
            s[0] = _sbox_s((s[0] + ROUND_CONSTANTS[r][0]) % P)
            s = _mat_s(M_INTERNAL, s)
    return s


def hash_elements_s(elements):
    """Sponge-hash a list of ints to a 4-element digest (overwrite mode)."""
    state = [0] * WIDTH
    for i in range(0, len(elements), RATE):
        chunk = elements[i : i + RATE]
        for j, v in enumerate(chunk):
            state[j] = v % P
        state = permute_s(state)
    return tuple(state[:CAP])


def compress_s(left, right):
    """2-to-1 digest compression (each digest is 4 ints)."""
    state = list(left) + list(right) + [0] * (WIDTH - 2 * CAP)
    state = permute_s(state)
    return tuple(state[:CAP])


# ---------------------------------------------------------------------------
# Batched permutation: state shape (..., 12) uint64 array (numpy or jnp).
#
# All linear-layer work is doublings / shift-reduces / adds: `_dbl` is
# 2x mod p, `_shl` is x * 2^e mod p via a 64+e-bit split and the
# Goldilocks 128-bit reduction (2^64 = 2^32 - 1 mod p) — no multiplier
# in any of them, which is the entire point of this instance on a VPU
# whose u64 multiply is ~100 emulated i32 ops.
# ---------------------------------------------------------------------------


def _reduce128(hi, lo, xp):
    """(hi*2^64 + lo) mod p, branchless."""
    c32, cNEG, cP = _c(xp, 32), _c(xp, NEG), _c(xp, P)
    hi_hi = hi >> c32
    hi_lo = hi & _c(xp, M32)
    t0 = lo - hi_hi
    t0 = xp.where(lo < hi_hi, t0 - cNEG, t0)
    t1 = (hi_lo << c32) - hi_lo  # hi_lo * (2^32 - 1), exact in u64
    res = t0 + t1
    res = res + xp.where(res < t0, cNEG, _c(xp, 0))
    return xp.where(res >= cP, res - cP, res)


def _dbl(x, xp):
    """2x mod p for canonical x."""
    cP = _c(xp, P)
    t = (x << _c(xp, 1)) + (x >> _c(xp, 63)) * _c(xp, NEG)
    return xp.where(t >= cP, t - cP, t)


def _shl(x, e: int, xp):
    """x * 2^e mod p for canonical x, 1 <= e <= 63."""
    return _reduce128(x >> _c(xp, 64 - e), x << _c(xp, e), xp)


def _m4_block(a, b, c, d, xp):
    """M4 @ (a,b,c,d) via the paper's add/double schedule (§5.1)."""
    t0 = gl.gl_add(a, b)
    t1 = gl.gl_add(c, d)
    t2 = gl.gl_add(_dbl(b, xp), t1)
    t3 = gl.gl_add(_dbl(d, xp), t0)
    t4 = gl.gl_add(_dbl(_dbl(t1, xp), xp), t3)
    t5 = gl.gl_add(_dbl(_dbl(t0, xp), xp), t2)
    t6 = gl.gl_add(t3, t5)
    t7 = gl.gl_add(t2, t4)
    return t6, t5, t7, t4


def _external_layer(state, xp):
    """state (..., 12) -> M_E @ state = block M4 + block-sum combine."""
    cols = [state[..., i] for i in range(WIDTH)]
    blocks = [_m4_block(*cols[4 * b : 4 * b + 4], xp) for b in range(3)]
    sums = [gl.gl_add(gl.gl_add(blocks[0][i], blocks[1][i]), blocks[2][i]) for i in range(4)]
    out = [gl.gl_add(blocks[b][i], sums[i]) for b in range(3) for i in range(4)]
    return xp.stack(out, axis=-1)


def _internal_layer(state, xp):
    """state (..., 12) -> M_I @ state = lane-sum + 2^e_i shifts."""
    total = gl.gl_sum(state, axis=-1)
    cols = [
        gl.gl_add(total, _shl(state[..., i], DIAG_EXP[i], xp)) for i in range(WIDTH)
    ]
    return xp.stack(cols, axis=-1)


def _sbox(x):
    # x^7 = ((x^3)^2) * x with squares specialized (3 partial products
    # instead of 4): 2 squares + 2 muls, ~19% fewer emulated multiplies
    # than the 4-mul chain
    x3 = gl.gl_mul(gl.gl_sqr(x), x)
    return gl.gl_mul(gl.gl_sqr(x3), x)


# ---------------------------------------------------------------------------
# Transposed (lane-major) permutation core: state shape (12, B).
#
# A (B, 12) batch puts the 12 state lanes on the MINOR axis, which the TPU
# tiles to (8, 128) — 12 of 128 lanes carry data, so every elementwise op
# that materializes runs at <10% VPU utilization. Transposing to (12, B)
# puts the BATCH on the 128-lane axis (full occupancy; the 12 pads only
# the 8-sublane axis to 16). The sponge and Merkle paths below keep their
# state in this layout across whole scans so the transpose happens once
# per commit, not once per round. Bit-identical to `permute` by
# construction (same ops, axes swapped).
# ---------------------------------------------------------------------------


def _external_layer_t(state, xp):
    """state (12, ...) -> M_E @ state, lane-major."""
    rows = [state[i] for i in range(WIDTH)]
    blocks = [_m4_block(*rows[4 * b : 4 * b + 4], xp) for b in range(3)]
    sums = [gl.gl_add(gl.gl_add(blocks[0][i], blocks[1][i]), blocks[2][i]) for i in range(4)]
    out = [gl.gl_add(blocks[b][i], sums[i]) for b in range(3) for i in range(4)]
    return xp.stack(out, axis=0)


def _internal_layer_t(state, xp):
    total = gl.gl_sum(state, axis=0)
    rows = [gl.gl_add(total, _shl(state[i], DIAG_EXP[i], xp)) for i in range(WIDTH)]
    return xp.stack(rows, axis=0)


def permute_t(state):
    """Permute a (12, ...) uint64 array (transposed layout).
    permute_t(x.T).T == permute(x) bit-for-bit."""
    xp = gl._xp(state)
    if xp is not np and _use_rolled():
        return _permute_rolled_t(state)
    asx = (lambda a: a) if xp is np else xp.asarray
    rc = asx(_RC_NP)  # (30, 12)
    state = _external_layer_t(state, xp)
    for r in range(N_ROUNDS):
        if round_is_full(r):
            rcr = rc[r].reshape((WIDTH,) + (1,) * (state.ndim - 1))
            state = _external_layer_t(_sbox(gl.gl_add(state, rcr)), xp)
        else:
            s0 = _sbox(gl.gl_add(state[:1], rc[r][:1].reshape((1,) + (1,) * (state.ndim - 1))))
            state = _internal_layer_t(xp.concatenate([s0, state[1:]], axis=0), xp)
    return state


def _permute_rolled_t(state):
    """Rolled (lax.scan) form of permute_t — small traced graph for
    compile-time-sensitive backends (see _permute_rolled)."""
    import jax
    import jax.numpy as jnp

    rc = jnp.asarray(_RC_NP)
    half = N_FULL // 2
    tail = (1,) * (state.ndim - 1)
    state = _external_layer_t(state, jnp)

    def full_body(st, rcr):
        return _external_layer_t(_sbox(gl.gl_add(st, rcr.reshape((WIDTH,) + tail))), jnp), None

    def part_body(st, rc0):
        s0 = _sbox(gl.gl_add(st[:1], rc0.reshape((1,) + tail)))
        return _internal_layer_t(jnp.concatenate([s0, st[1:]], axis=0), jnp), None

    state, _ = jax.lax.scan(full_body, state, rc[:half])
    state, _ = jax.lax.scan(part_body, state, rc[half : half + N_PARTIAL, 0])
    state, _ = jax.lax.scan(full_body, state, rc[half + N_PARTIAL :])
    return state


def permute(state):
    """Permute a (..., 12) uint64 array (bit-identical to `permute_s`).

    STARKY_PALLAS=1 routes 2-D device batches through the hand-written
    Pallas u32-pair kernel (backend/poseidon_pallas.py); default is the
    XLA u64 path below."""
    import os

    xp = gl._xp(state)
    if xp is not np and state.ndim == 2 and os.environ.get("STARKY_PALLAS") == "1":
        # only on an actual TPU backend: the Mosaic kernel does not
        # compile on jax-CPU (the host verifier's jitted fallback paths
        # also reach here with traced arrays)
        import jax

        if jax.default_backend() not in ("cpu",):
            from . import poseidon_pallas as pp

            return pp.permute(state)
    if (
        xp is np
        and state.ndim == 2
        and state.shape[0] >= 256
        and os.environ.get("STARKY_NATIVE", "1") == "1"
    ):
        # host bulk hashing: the native C kernel is ~20-50x the
        # numpy-eager path and ~10x the XLA-CPU jitted path per core
        from . import poseidon_native as pn

        if pn.available():
            return pn.permute_batch(state)
    if xp is not np and _use_rolled():
        return _permute_rolled(state)
    asx = (lambda a: a) if xp is np else xp.asarray
    rc = asx(_RC_NP)
    state = _external_layer(state, xp)
    for r in range(N_ROUNDS):
        if round_is_full(r):
            state = _external_layer(_sbox(gl.gl_add(state, rc[r])), xp)
        else:
            s0 = _sbox(gl.gl_add(state[..., :1], rc[r][:1]))
            state = _internal_layer(xp.concatenate([s0, state[..., 1:]], axis=-1), xp)
    return state


# Roll the permutation rounds into lax.scan on compile-time-sensitive
# backends. XLA-CPU compiles an UNROLLED permutation in ~1 min per inlined
# instance on a 2-vCPU host (the round-3/4 multichip-gate timeouts and
# most of the test suite's wall time); the rolled body compiles in
# seconds. On the real TPU the unrolled form is ~25% faster at the
# committing batch sizes (8.43 vs 6.37 Mperm/s measured), so rolling is
# chosen only when the process default backend is CPU (driver dryrun,
# tests) or a host-verifier jit explicitly asks for it (_host_fast).
_FORCE_ROLLED = None  # lazily-created contextvar


def _rolled_var():
    global _FORCE_ROLLED
    if _FORCE_ROLLED is None:
        import contextvars

        _FORCE_ROLLED = contextvars.ContextVar("starky_poseidon_rolled", default=False)
    return _FORCE_ROLLED


def _use_rolled() -> bool:
    if _rolled_var().get():
        return True
    import jax

    return jax.default_backend() == "cpu"


def _permute_rolled(state):
    """Traced-backend permute with the rounds ROLLED into lax.scan.

    Bit-identical to the unrolled numpy loop, but the traced graph holds
    ONE full-round body + ONE partial-round body instead of 30 inlined
    rounds. This matters twice: XLA-CPU compiles an unrolled permutation
    in ~1 min per inlined instance on a small host (the round-3/4
    multichip dryrun timeouts were mostly this), and the remote-TPU
    compile helper pays per-instruction too. Runtime cost is one loop
    step per round over a batch-wide elementwise body — sub-1% of the
    hashing HBM traffic at committing batch sizes."""
    import jax
    import jax.numpy as jnp

    rc = jnp.asarray(_RC_NP)
    half = N_FULL // 2
    state = _external_layer(state, jnp)

    def full_body(st, rcr):
        return _external_layer(_sbox(gl.gl_add(st, rcr)), jnp), None

    def part_body(st, rc0):
        s0 = _sbox(gl.gl_add(st[..., :1], rc0))
        return _internal_layer(jnp.concatenate([s0, st[..., 1:]], axis=-1), jnp), None

    state, _ = jax.lax.scan(full_body, state, rc[:half])
    state, _ = jax.lax.scan(part_body, state, rc[half : half + N_PARTIAL, 0])
    state, _ = jax.lax.scan(full_body, state, rc[half + N_PARTIAL :])
    return state


# ---------------------------------------------------------------------------
# Merkle-leaf hash of a (wide) row: segmented sponge + digest tree.
#
# A plain rate-8 sponge over a 90k-column LDE row is an ~11k-step strictly
# sequential permutation chain — the worst possible shape for the TPU VPU
# (tiny batch, huge sequential depth). Instead the leaf hash splits the row
# into S power-of-two segments, sponges each segment independently (all
# segments of all rows permute together as ONE batched op per step, so the
# sequential depth drops ~S-fold), then folds the S segment digests with a
# log2(S)-level binary compression tree. The layout (S, chunks-per-segment)
# is a pure function of the row width, so prover, verifier, and the
# recursive Merkle chips all derive the identical digest.
# ---------------------------------------------------------------------------

LEAF_MAX_LOG_SEGMENTS = 7  # S <= 128


def leaf_plan(c: int):
    """Row width -> (n_chunks K, segments S, chunks-per-segment kseg).

    K = ceil(c / RATE) (>= 1), S = largest power of two <= min(K, 128),
    kseg = ceil(K / S); the row is zero-padded to S * kseg * RATE lanes.
    For c <= RATE this is exactly one permutation of the zero-padded chunk.
    """
    k = max(1, -(-c // RATE))
    s = 1 << min(LEAF_MAX_LOG_SEGMENTS, k.bit_length() - 1)
    kseg = -(-k // s)
    return k, s, kseg


def hash_row_s(elements):
    """Scalar (python-int) reference of the leaf hash of one row."""
    _, s, kseg = leaf_plan(len(elements))
    padded = list(elements) + [0] * (s * kseg * RATE - len(elements))
    digs = []
    for seg in range(s):
        state = [0] * WIDTH
        base = seg * kseg * RATE
        for i in range(kseg):
            chunk = padded[base + i * RATE : base + (i + 1) * RATE]
            state = [v % P for v in chunk] + state[RATE:]
            state = permute_s(state)
        digs.append(tuple(state[:CAP]))
    while len(digs) > 1:
        digs = [compress_s(digs[2 * i], digs[2 * i + 1]) for i in range(len(digs) // 2)]
    return digs[0]


def hash_row_segments(rows, kseg: int):
    """Segment sponges over a (N, W) uint64 array with W = w*kseg*RATE
    columns (an integer number of segments): returns (N, w, CAP) digests.

    Each segment is an independent rate-8 overwrite-mode sponge over its
    kseg*RATE contiguous columns; all N*w segment sponges advance together
    as one batched permutation per absorb step. Because segments are
    independent, a wide row can be committed in column CHUNKS (the prover's
    streaming commit) and still produce digests identical to hashing the
    whole row at once."""
    xp = gl._xp(rows)
    n, wcols = rows.shape
    assert wcols % (kseg * RATE) == 0
    w = wcols // (kseg * RATE)
    if xp is np:
        # (kseg, N*w, RATE) chunk stream: segment sponges advance in lockstep
        chunks = rows.reshape(n * w, kseg, RATE).transpose(1, 0, 2)
        state = np.zeros((n * w, WIDTH), dtype=np.uint64)
        for i in range(kseg):
            state = np.concatenate([chunks[i], state[:, RATE:]], axis=1)
            state = permute(state)
        return state[:, :CAP].reshape(n, w, CAP)

    # Traced backends: lane-major sponge — state (12, B) keeps the batch
    # on the 128-lane axis through the whole scan (one transpose per
    # commit chunk, not per absorb step)
    import jax

    chunks_t = rows.reshape(n * w, kseg, RATE).transpose(1, 2, 0)  # (kseg, RATE, B)
    state = (chunks_t[0, :1, :] & xp.uint64(0)) + xp.zeros((WIDTH, n * w), dtype=xp.uint64)

    def body(st, chunk):
        st = xp.concatenate([chunk, st[RATE:]], axis=0)
        return permute_t(st), None

    state, _ = jax.lax.scan(body, state, chunks_t)
    return state[:CAP].transpose(1, 0).reshape(n, w, CAP)


def fold_segment_digests(digs):
    """(N, S, CAP) segment digests -> (N, CAP) leaf digests via the binary
    compression tree (S a power of two), matching `hash_row_s`."""
    n = digs.shape[0]
    while digs.shape[1] > 1:
        digs = compress_rows(
            digs[:, 0::2].reshape(-1, CAP), digs[:, 1::2].reshape(-1, CAP)
        ).reshape(n, digs.shape[1] // 2, CAP)
    return digs[:, 0]


def hash_rows(rows):
    """Hash each row of a (N, C) uint64 array to a (N, 4) digest array.

    This is the Merkle-leaf hash over a full LDE row (all trace columns),
    matching `hash_row_s`: segmented sponge (overwrite mode, rate 8) + a
    binary compression tree over the segment digests. All N*S segment
    sponges advance together, so each absorb step is one wide batched
    permutation (sequential depth kseg + log2(S) instead of the ~C/8 of a
    single row-long sponge), which is what keeps Merkle commitment of
    90k-column traces off the critical path on TPU (docs/PERF.md).
    """
    xp = gl._xp(rows)
    n, c = rows.shape
    _, s, kseg = leaf_plan(c)
    pad = s * kseg * RATE - c
    if pad:
        # derive the pad from the input so it carries the same sharding
        # variance inside shard_map (a plain zeros() is mesh-invariant)
        zero_col = rows[:, :1] & xp.uint64(0)
        rows = xp.concatenate([rows, xp.broadcast_to(zero_col, (n, pad))], axis=1)
    return fold_segment_digests(hash_row_segments(rows, kseg))


def hash_flat_tree_arr(arr):
    """Digest of a flat uint64 array (numpy or device) via a batched
    Poseidon2 binary tree: leaves = rate-sized chunks (zero-padded), then
    pairwise compression. Returns a (4,) array on the input's backend."""
    xp = gl._xp(arr)
    a = arr.reshape(-1)
    k = max(1, -(-a.size // RATE))
    k_pad = 1 << (k - 1).bit_length()
    pad = k_pad * RATE - a.size
    if pad:
        a = xp.concatenate([a, xp.zeros(pad, dtype=xp.uint64)])
    digs = hash_rows(a.reshape(k_pad, RATE))
    while digs.shape[0] > 1:
        digs = compress_rows(digs[0::2], digs[1::2])
    return digs[0]


def _fold_pairs_level(digs):
    """One binary-compression level: (N, 4) -> (N/2, 4)."""
    return compress_rows(digs[0::2], digs[1::2])


def _host_fold_to_root(digs: np.ndarray) -> np.ndarray:
    """Compress (N, 4) digests down to one digest on host, one SMALL
    jitted program per level (shape-keyed, shared across callers). A
    monolithic unrolled tree program costs minutes of XLA-CPU compile
    per shape (the round-3 verifier's 853 s was mostly two such
    compiles); per-level programs compile in seconds and are cached."""
    while digs.shape[0] > 1:
        if digs.shape[0] >= 1 << 11:
            digs = _host_fast(_fold_pairs_level, digs, key=f"fold_pairs/{digs.shape[0]}")
        else:
            digs = np.asarray(_fold_pairs_level(digs))
    return digs[0]


def hash_flat_tree(arr) -> tuple:
    """Host tuple form of hash_flat_tree_arr (challenger absorption).
    Large inputs route leaf hashing + each fold level through small
    jax-CPU jitted programs (identical digest to hash_flat_tree_arr)."""
    a = np.asarray(arr, dtype=np.uint64)
    # jit-compile only for genuinely large inputs: each (fn, shape) pair
    # costs XLA-CPU compile time on a small host, and eager numpy wins
    # below ~1M elements (the test suite lives entirely down there —
    # per-shape compiles were the bulk of its wall time, VERDICT r3 #8).
    # With the native C kernel the eager path wins at every size.
    from . import poseidon_native as pn

    if a.size < 1 << 20 or pn.available():
        return tuple(int(x) for x in np.asarray(hash_flat_tree_arr(a)))
    a = a.reshape(-1)
    k = max(1, -(-a.size // RATE))
    k_pad = 1 << (k - 1).bit_length()
    pad = k_pad * RATE - a.size
    if pad:
        a = np.concatenate([a, np.zeros(pad, dtype=np.uint64)])
    leaves = _host_fast(hash_rows, a.reshape(k_pad, RATE), key=f"flat_leaves/{k_pad}")
    return tuple(int(x) for x in _host_fold_to_root(leaves))


_host_jits: dict = {}


def _host_fast(fn, *arrays, key: str | None = None):
    """Run `fn` jit-compiled on the CPU backend (the host verifier's fast
    path for bulk hashing: a compiled lax.scan instead of millions of tiny
    numpy dispatches). Falls back to plain numpy if no CPU backend.
    `key` disambiguates the jit cache for closures whose captured shape
    parameters differ; outputs (any pytree) come back as numpy."""
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return jax.tree_util.tree_map(np.asarray, fn(*arrays))
    k = key or fn.__name__
    if k not in _host_jits:
        # force the rolled permutation body into these CPU programs: the
        # tracing happens inside this call, and an unrolled Poseidon costs
        # ~1 min of XLA-CPU compile per inlined instance on a small host
        def wrapped(*xs, _fn=fn):
            tok = _rolled_var().set(True)
            try:
                return _fn(*xs)
            finally:
                _rolled_var().reset(tok)

        _host_jits[k] = jax.jit(wrapped)
    with jax.default_device(cpu):
        out = _host_jits[k](*arrays)
    return jax.tree_util.tree_map(np.asarray, out)


def hash_rows_host_fast(rows: np.ndarray) -> np.ndarray:
    """hash_rows for the host verifier. With the native C kernel built,
    the eager numpy path (whose permutes dispatch to C) beats the
    XLA-CPU jitted path ~10x AND pays no per-shape compile; otherwise:
    segment sponges as ONE scan program (small: one permutation in the
    scan body), then per-level fold programs — not the monolithic
    hash_rows trace whose unrolled fold tree compiles for minutes."""
    from . import poseidon_native as pn

    if pn.available():
        return hash_rows(rows)
    if rows.size < 1 << 22:  # see hash_flat_tree: eager below ~4M elements
        return hash_rows(rows)
    n, c = rows.shape
    _, s, kseg = leaf_plan(c)
    pad = s * kseg * RATE - c
    if pad:
        rows = np.concatenate([rows, np.zeros((n, pad), dtype=np.uint64)], axis=1)
    segs = _host_fast(
        lambda r: hash_row_segments(r, kseg), rows, key=f"row_segs/{n}x{rows.shape[1]}x{kseg}"
    )
    digs = segs.reshape(n * s, CAP)
    lvl = s
    while lvl > 1:
        pair = digs.reshape(n, lvl, CAP)
        flat_l = np.ascontiguousarray(pair[:, 0::2].reshape(-1, CAP))
        flat_r = np.ascontiguousarray(pair[:, 1::2].reshape(-1, CAP))
        both = np.stack([flat_l, flat_r])
        digs = _host_fast(
            lambda b: compress_rows(b[0], b[1]), both, key=f"fold_lr/{flat_l.shape[0]}"
        )
        lvl //= 2
    return digs.reshape(n, CAP)


def compress_rows(left, right):
    """Compress (N, 4) x (N, 4) digests into (N, 4)."""
    xp = gl._xp(left)
    n = left.shape[0]
    if xp is np:
        state = np.concatenate([left, right, np.zeros((n, WIDTH - 2 * CAP), dtype=np.uint64)], axis=1)
        return permute(state)[:, :CAP]
    # traced: lane-major (see permute_t)
    state = xp.concatenate(
        [left.transpose(1, 0), right.transpose(1, 0), xp.zeros((WIDTH - 2 * CAP, n), dtype=xp.uint64)],
        axis=0,
    )
    return permute_t(state)[:CAP].transpose(1, 0)
