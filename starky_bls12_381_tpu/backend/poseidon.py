"""Poseidon permutation over Goldilocks, width 12 — the backend hash.

The reference's proving backend (plonky2 / starky, SURVEY.md §2.2) commits
traces with a Poseidon-Goldilocks Merkle tree and runs Fiat–Shamir through a
Poseidon duplex challenger. We rebuild the same capability with our own
nothing-up-my-sleeve instantiation (we define both prover and verifier, so
any fixed secure instance works):

* width t = 12 (rate 8, capacity 4), alpha = 7 (gcd(7, p-1) = 1),
* R_F = 8 full rounds, R_P = 22 partial rounds (HADES: 4 full, 22 partial,
  4 full) — the standard Poseidon-Goldilocks parameter point,
* MDS matrix: Cauchy matrix M[i][j] = 1/(x_i + y_j) with x_i = i,
  y_j = 12 + j (provably MDS),
* round constants: rejection-sampled from SHA-256 in counter mode over a
  domain-separation tag.

Security margin: (p, t, alpha, R_F, R_P) = (2^64-2^32+1, 12, 7, 8, 22) is
the SAME parameter point as plonky2's publicly vetted Poseidon-Goldilocks
instance (the backend hash of the reference's entire proof stack). The
published Poseidon security analysis (GKRRS20, §5.5) bounds statistical
attacks by R_F >= 6 for t=12 at 128-bit security (we have 8) and algebraic
interpolation/Groebner attacks by R_F + R_P >= ~1.075 * (R_F+R_P)_min with
(R_F+R_P)_min ~ 26 for alpha=7 over a 64-bit field with 128-bit capacity
(we have 30, matching plonky2's chosen margin). Those bounds depend only
on (p, t, alpha, round counts), an MDS linear layer, and structureless
round constants: our Cauchy matrix is provably MDS (all square submatrices
of a Cauchy matrix are nonsingular), and SHA-256-counter rejection
sampling yields constants with no exploitable algebraic structure, the
same nothing-up-my-sleeve recipe as the reference instantiations. The two
implementations below (scalar and batched with the sparse partial-round
factorization) are pinned equal by tests/test_poseidon.py.

Two implementations with identical outputs:
* scalar/python-int (`permute_s`) for the host challenger,
* batched array (`permute`) over numpy or jax.numpy uint64 for Merkle
  leaf/internal hashing on TPU (and numpy-vectorized host verification).
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..fields import goldilocks as gl
from ..fields.goldilocks import P

WIDTH = 12
RATE = 8
CAP = 4
N_FULL = 8
N_PARTIAL = 22
N_ROUNDS = N_FULL + N_PARTIAL
ALPHA = 7

_DOMAIN = b"starky_bls12_381_tpu/poseidon-gl12/v1"


def _derive_constants():
    consts = []
    ctr = 0
    while len(consts) < N_ROUNDS * WIDTH:
        h = hashlib.sha256(_DOMAIN + b"|rc|" + str(ctr).encode()).digest()
        v = int.from_bytes(h[:8], "little")
        ctr += 1
        if v < P:
            consts.append(v)
    rc = [consts[r * WIDTH : (r + 1) * WIDTH] for r in range(N_ROUNDS)]
    mds = [[gl.inv_s((i + 12 + j) % P) for j in range(WIDTH)] for i in range(WIDTH)]
    return rc, mds


ROUND_CONSTANTS, MDS = _derive_constants()
_MDS_NP = np.asarray(MDS, dtype=np.uint64)  # (12, 12)
_RC_NP = np.asarray(ROUND_CONSTANTS, dtype=np.uint64)  # (30, 12)


# ---------------------------------------------------------------------------
# Optimized partial rounds (bit-identical sparse factorization).
#
# A partial round is s -> M @ sbox0(s + C). Writing M = M' @ M'' with
# M' = blockdiag(1, H) and M'' = [[m00, u^T], [H^{-1} w, I]] (where
# M = [[m00, u^T], [w, H]]), M' commutes with the coord-0-only sbox, so the
# whole partial-round chain factors as
#     (M f)^R = M'_R  o  (M''_R f) o ... o (M''_1 f),
# with M_1 = M, M_{i+1} = M @ M'_i, and round constants transformed as
# C_i -> blockdiag(1, H_{i-1}^{-1}) @ C_i.  Each M'' application costs
# 1 + (t-1) + (t-1) = 23 modmuls instead of t^2 = 144, which is what makes
# Poseidon leaf-hashing of 90k-column LDEs cheap on the VPU (docs/PERF.md).
# The scalar path `permute_s` keeps the textbook round structure and the
# test suite pins the two paths equal.
# ---------------------------------------------------------------------------


def _mat_inv_mod(mat):
    """Inverse of a square matrix of python ints mod P (Gauss-Jordan)."""
    n = len(mat)
    a = [[mat[i][j] % P for j in range(n)] + [1 if j == i else 0 for j in range(n)] for i in range(n)]
    for col in range(n):
        piv = next(r for r in range(col, n) if a[r][col] % P)
        a[col], a[piv] = a[piv], a[col]
        inv = gl.inv_s(a[col][col])
        a[col] = [x * inv % P for x in a[col]]
        for r in range(n):
            if r != col and a[r][col]:
                f = a[r][col]
                a[r] = [(a[r][j] - f * a[col][j]) % P for j in range(2 * n)]
    return [row[n:] for row in a]


def _mat_mul_mod(a, b):
    return [[sum(a[i][k] * b[k][j] for k in range(len(b))) % P for j in range(len(b[0]))] for i in range(len(a))]


def _derive_fast_partial():
    half = N_FULL // 2
    t = WIDTH
    m00s, us, whats, rcs = [], [], [], []
    m_i = [row[:] for row in MDS]
    h_prev_inv = [[1 if i == j else 0 for j in range(t - 1)] for i in range(t - 1)]
    h = None
    for i in range(N_PARTIAL):
        m00 = m_i[0][0]
        u = [m_i[0][j] for j in range(1, t)]
        w = [[m_i[j][0]] for j in range(1, t)]
        h = [[m_i[j][k] for k in range(1, t)] for j in range(1, t)]
        h_inv = _mat_inv_mod(h)
        w_hat = [row[0] for row in _mat_mul_mod(h_inv, w)]
        m00s.append(m00)
        us.append(u)
        whats.append(w_hat)
        c = ROUND_CONSTANTS[half + i]
        c_rest = _mat_mul_mod(h_prev_inv, [[x] for x in c[1:]])
        rcs.append([c[0]] + [row[0] for row in c_rest])
        h_prev_inv = h_inv
        if i + 1 < N_PARTIAL:
            m_prime = [[1 if (j == 0 and k == 0) else (h[j - 1][k - 1] if j and k else 0) for k in range(t)] for j in range(t)]
            m_i = _mat_mul_mod(MDS, m_prime)
    return (
        np.asarray(m00s, dtype=np.uint64),  # (R_P,)
        np.asarray(us, dtype=np.uint64),  # (R_P, 11)
        np.asarray(whats, dtype=np.uint64),  # (R_P, 11)
        np.asarray(rcs, dtype=np.uint64),  # (R_P, 12)
        np.asarray(h, dtype=np.uint64),  # (11, 11) final dense block
    )


_FP_M00, _FP_U, _FP_WHAT, _FP_RC, _FP_DENSE = _derive_fast_partial()


# ---------------------------------------------------------------------------
# Scalar permutation (python ints) — host challenger / reference oracle.
# ---------------------------------------------------------------------------


def _sbox_s(x: int) -> int:
    x2 = x * x % P
    x3 = x2 * x % P
    return x3 * x3 % P * x % P


def permute_s(state):
    """Permute a list of 12 python ints (canonical)."""
    s = list(state)
    half = N_FULL // 2
    for r in range(N_ROUNDS):
        s = [(s[i] + ROUND_CONSTANTS[r][i]) % P for i in range(WIDTH)]
        if half <= r < half + N_PARTIAL:
            s[0] = _sbox_s(s[0])
        else:
            s = [_sbox_s(x) for x in s]
        s = [sum(MDS[i][j] * s[j] for j in range(WIDTH)) % P for i in range(WIDTH)]
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


# ---------------------------------------------------------------------------
# Batched permutation: state shape (..., 12) uint64 array (numpy or jnp).
# ---------------------------------------------------------------------------


def _mds_layer(state, xp):
    """state (..., 12) -> MDS @ state, mod p, via tree-reduced products."""
    mds = _MDS_NP if xp is np else xp.asarray(_MDS_NP)
    prod = gl.gl_mul(state[..., None, :], mds)  # (..., 12out, 12in)
    return gl.gl_sum(prod, axis=-1)


def _sbox(x):
    x2 = gl.gl_mul(x, x)
    x3 = gl.gl_mul(x2, x)
    return gl.gl_mul(gl.gl_mul(x3, x3), x)


def permute(state):
    """Permute a (..., 12) uint64 array (fast-partial-round form;
    bit-identical to the textbook `permute_s`, see factorization note
    above)."""
    xp = gl._xp(state)
    asx = (lambda a: a) if xp is np else xp.asarray
    rc = asx(_RC_NP)
    half = N_FULL // 2
    for r in range(half):
        state = _mds_layer(_sbox(gl.gl_add(state, rc[r])), xp)
    fp_rc, fp_m00, fp_u, fp_what = asx(_FP_RC), asx(_FP_M00), asx(_FP_U), asx(_FP_WHAT)
    for i in range(N_PARTIAL):
        state = gl.gl_add(state, fp_rc[i])
        s0 = _sbox(state[..., 0:1])
        rest = state[..., 1:]
        new0 = gl.gl_add(
            gl.gl_mul(s0, fp_m00[i]),
            gl.gl_sum(gl.gl_mul(rest, fp_u[i]), axis=-1)[..., None],
        )
        new_rest = gl.gl_add(rest, gl.gl_mul(s0, fp_what[i]))
        state = xp.concatenate([new0, new_rest], axis=-1)
    # final dense factor M'_{R_P} = blockdiag(1, H)
    dense = asx(_FP_DENSE)
    rest = gl.gl_sum(gl.gl_mul(state[..., None, 1:], dense), axis=-1)
    state = xp.concatenate([state[..., 0:1], rest], axis=-1)
    for r in range(half + N_PARTIAL, N_ROUNDS):
        state = _mds_layer(_sbox(gl.gl_add(state, rc[r])), xp)
    return state


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
    # (kseg, N*w, RATE) chunk stream: segment sponges advance in lockstep
    chunks = rows.reshape(n * w, kseg, RATE).transpose(1, 0, 2)
    state = (chunks[0, :, :1] & xp.uint64(0)) + xp.zeros((n * w, WIDTH), dtype=xp.uint64)
    if xp is np:
        for i in range(kseg):
            state = np.concatenate([chunks[i], state[:, RATE:]], axis=1)
            state = permute(state)
    else:
        import jax

        def body(st, chunk):
            st = xp.concatenate([chunk, st[:, RATE:]], axis=1)
            return permute(st), None

        state, _ = jax.lax.scan(body, state, chunks)
    return state[:, :CAP].reshape(n, w, CAP)


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
    Poseidon binary tree: leaves = rate-sized chunks (zero-padded), then
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


def hash_flat_tree(arr) -> tuple:
    """Host tuple form of hash_flat_tree_arr (challenger absorption).
    Large inputs route through the jax-CPU jitted path."""
    a = np.asarray(arr, dtype=np.uint64)
    if a.size >= 1 << 14:
        return tuple(int(x) for x in _host_fast(hash_flat_tree_arr, a))
    return tuple(int(x) for x in np.asarray(hash_flat_tree_arr(a)))


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
        _host_jits[k] = jax.jit(fn)
    with jax.default_device(cpu):
        out = _host_jits[k](*arrays)
    return jax.tree_util.tree_map(np.asarray, out)


def hash_rows_host_fast(rows: np.ndarray) -> np.ndarray:
    """hash_rows for the host verifier via the jax-CPU jitted path."""
    if rows.size < 1 << 14:
        return hash_rows(rows)
    return _host_fast(hash_rows, rows)


def compress_rows(left, right):
    """Compress (N, 4) x (N, 4) digests into (N, 4)."""
    xp = gl._xp(left)
    n = left.shape[0]
    state = xp.concatenate([left, right, xp.zeros((n, WIDTH - 2 * CAP), dtype=xp.uint64)], axis=1)
    return permute(state)[:, :CAP]
