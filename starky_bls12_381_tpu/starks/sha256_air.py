"""SHA-256 compression AIR: proves batches of SHA-256 compressions.

TPU-native counterpart of the reference's in-circuit SHA-256 gadget
(hash_to_field.rs:82-169, which synthesizes ~2^16 gates per expansion to
prove `expand_message_xmd` inside the plonky2 aggregation SNARK). Here the
compression function itself — all 64 rounds of bit-level Σ/σ/Ch/Maj mixing
plus the message schedule — is proved in one STARK at rate 1 / degree <= 3,
one round per row, every round constraint shared across all rounds and all
blocks through constant selector columns (no per-round specialization, so
the traced constraint graph is a few hundred wide tensor ops regardless of
block count — the same type-batching idiom as the BLS chips).

Layout per 72-row block (64 round rows + digest row + 7 pad rows):

* rows t=0..63 hold the state BEFORE round t: bits of a,b,c,e,f,g (LSB
  first), d and h as words, the rolling 16-word schedule window
  w[j] = W[t+j], bit decompositions of w[1]/w[14] (schedule feed), and
  degree-lowering helper bits (pairwise XORs of the rotation triples, a&b
  products) plus addition carries;
* the transition t -> t+1 enforces the round function exactly: helper
  equalities at degree 3, word-level additions with boolean carries;
* row 64 adds the feed-forward digest: h_in[j] + state[j] = 2^32*c + out,
  with out bound directly to public inputs.

Public inputs per block: [w16 | h_in8 | h_out8] (32 words). Chaining,
padding, and XMD plumbing between compressions are re-checked natively by
the consumer over these PUBLIC words (fields/sha256.py `check_xmd_pis`) —
they involve only public data, so native checking matches the reference's
in-circuit wiring soundness-for-soundness while the proof carries all the
actual hashing work.
"""

from __future__ import annotations

import numpy as np

from ..backend.air import Air
from ..fields import sha256 as sh

ROWS_PER_BLOCK = 72  # 64 rounds + digest row + 7 pad
N_ROUNDS = 64

# -- witness column layout ---------------------------------------------------
A = 0  # bits of a (32)
B = 32  # bits of b
C = 64  # bits of c
E = 96  # bits of e
F = 128  # bits of f
G = 160  # bits of g
D = 192  # d as word
H = 193  # h as word
W = 194  # schedule window w[0..16)
WB1 = 210  # bits of w[1]
WB14 = 242  # bits of w[14]
M_S1 = 274  # helper: rotr6(e) xor rotr11(e)
M_S0 = 306  # helper: rotr2(a) xor rotr13(a)
M_LS0 = 338  # helper: rotr7(w1) xor rotr18(w1)
M_LS1 = 370  # helper: rotr17(w14) xor rotr19(w14)
AB = 402  # helper: a_i * b_i
CE = 434  # carries for the e-update (3 bits)
CA = 437  # carries for the a-update (3 bits)
CW = 440  # carries for the schedule word (2 bits)
CD = 442  # digest feed-forward carries (8 bits, digest row)
HC = 450  # chaining value h_in (8 words, pinned through the block)
TOTAL_COLS = 458

# -- constant column layout --------------------------------------------------
C_K = 0  # round constant K[t] on round rows
C_ROUND = 1  # rows 0..63 of each block
C_SCHED = 2  # rows 0..47 (schedule generation)
C_ROLL = 3  # rows 0..62 (window roll)
C_DIG = 4  # row 64
C_FIRST = 5  # row 0 of each block
C_BLK = 6  # per-block indicators: first row (B cols) then digest row (B cols)

_POW2 = np.asarray([1 << i for i in range(32)], dtype=np.uint64)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _bits(words) -> np.ndarray:
    """(k,) uint words -> (k, 32) bits, LSB first."""
    w = np.asarray(words, dtype=np.uint64)
    return (w[:, None] >> np.arange(32, dtype=np.uint64)[None, :]) & np.uint64(1)


def _rotr_idx(n: int) -> np.ndarray:
    """bit i of rotr(x, n) is bit (i+n)%32 of x."""
    return (np.arange(32) + n) % 32


def _shr_idx_mask(n: int):
    """bit i of (x >> n) is bit i+n of x for i < 32-n, else 0."""
    idx = np.minimum(np.arange(32) + n, 31)
    mask = (np.arange(32) + n < 32).astype(np.uint64)
    return idx, mask


class Sha256Air(Air):
    """num_blocks SHA-256 compressions; PIs = [w16 h_in8 h_out8] per block."""

    def __init__(self, num_blocks: int = 4):
        self.num_blocks = num_blocks
        self.num_rows = max(128, _next_pow2(num_blocks * ROWS_PER_BLOCK))
        self.num_cols = TOTAL_COLS
        self.num_pis = 32 * num_blocks

    # -- constant columns -------------------------------------------------
    def constant_columns(self):
        out = np.zeros((self.num_rows, C_BLK + 2 * self.num_blocks), dtype=np.uint64)
        for b in range(self.num_blocks):
            base = b * ROWS_PER_BLOCK
            out[base : base + 64, C_K] = np.asarray(sh.K, dtype=np.uint64)
            out[base : base + 64, C_ROUND] = 1
            out[base : base + 48, C_SCHED] = 1
            out[base : base + 63, C_ROLL] = 1
            out[base + 64, C_DIG] = 1
            out[base, C_FIRST] = 1
            out[base, C_BLK + b] = 1
            out[base + 64, C_BLK + self.num_blocks + b] = 1
        return out

    # -- trace generation ---------------------------------------------------
    def generate_trace(self, blocks):
        """blocks: list of (w16, h_in8) or (w16, h_in8, h_out8) tuples."""
        assert len(blocks) == self.num_blocks
        trace = np.zeros((self.num_rows, TOTAL_COLS), dtype=np.uint64)
        pis: list = []
        for bi, blk in enumerate(blocks):
            w16, h_in = blk[0], blk[1]
            h_out = self._fill_block(trace, bi * ROWS_PER_BLOCK, w16, h_in)
            if len(blk) > 2:
                assert tuple(h_out) == tuple(int(x) for x in blk[2]), "sha fill mismatch"
            pis.extend(int(x) for x in w16)
            pis.extend(int(x) for x in h_in)
            pis.extend(h_out)
        return trace, pis

    def _fill_block(self, trace, base: int, w16, h_in):
        M = sh.MASK32
        # message schedule with carries
        w = [int(x) for x in w16] + [0] * 48
        cw = [0] * 64
        for t in range(16, 64):
            s0 = sh._rotr(w[t - 15], 7) ^ sh._rotr(w[t - 15], 18) ^ (w[t - 15] >> 3)
            s1 = sh._rotr(w[t - 2], 17) ^ sh._rotr(w[t - 2], 19) ^ (w[t - 2] >> 10)
            s = w[t - 16] + s0 + w[t - 7] + s1
            w[t] = s & M
            cw[t] = s >> 32
        # round evolution; states[t] = (a..h) before round t, states[64] final
        states = [tuple(int(x) for x in h_in)]
        ce = [0] * 64
        ca = [0] * 64
        for t in range(64):
            a, b, c, d, e, f, g, h = states[-1]
            S1 = sh._rotr(e, 6) ^ sh._rotr(e, 11) ^ sh._rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + S1 + ch + sh.K[t] + w[t]
            S0 = sh._rotr(a, 2) ^ sh._rotr(a, 13) ^ sh._rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = S0 + maj
            e_new = d + t1
            a_new = t1 + t2
            ce[t] = e_new >> 32
            ca[t] = a_new >> 32
            states.append((a_new & M, a, b, c, e_new & M, e, f, g))
        rows = np.arange(base, base + 65)
        st = np.asarray(states, dtype=np.uint64)  # (65, 8)
        for col, j in ((A, 0), (B, 1), (C, 2), (E, 4), (F, 5), (G, 6)):
            trace[rows, col : col + 32] = _bits(st[:, j])
        trace[rows, D] = st[:, 3]
        trace[rows, H] = st[:, 7]
        trace[rows[:, None], HC + np.arange(8)[None, :]] = np.asarray(h_in, dtype=np.uint64)[None, :]
        # schedule window + feed bits + helpers, rows 0..63
        warr = np.asarray(w, dtype=np.uint64)
        for t in range(64):
            r = base + t
            win = np.zeros(16, dtype=np.uint64)
            hi = min(16, 64 - t)
            win[:hi] = warr[t : t + hi]
            trace[r, W : W + 16] = win
            if t < 48:
                trace[r, WB1 : WB1 + 32] = _bits([win[1]])[0]
                trace[r, WB14 : WB14 + 32] = _bits([win[14]])[0]
                trace[r, M_LS0 : M_LS0 + 32] = _bits([sh._rotr(int(win[1]), 7) ^ sh._rotr(int(win[1]), 18)])[0]
                trace[r, M_LS1 : M_LS1 + 32] = _bits([sh._rotr(int(win[14]), 17) ^ sh._rotr(int(win[14]), 19)])[0]
                trace[r, CW] = cw[t + 16] & 1
                trace[r, CW + 1] = (cw[t + 16] >> 1) & 1
            a, b, c, d_, e, f, g, h = states[t]
            trace[r, M_S1 : M_S1 + 32] = _bits([sh._rotr(e, 6) ^ sh._rotr(e, 11)])[0]
            trace[r, M_S0 : M_S0 + 32] = _bits([sh._rotr(a, 2) ^ sh._rotr(a, 13)])[0]
            trace[r, AB : AB + 32] = _bits([a & b])[0]
            trace[r, CE] = ce[t] & 1
            trace[r, CE + 1] = (ce[t] >> 1) & 1
            trace[r, CE + 2] = (ce[t] >> 2) & 1
            trace[r, CA] = ca[t] & 1
            trace[r, CA + 1] = (ca[t] >> 1) & 1
            trace[r, CA + 2] = (ca[t] >> 2) & 1
        # digest row: feed-forward with carries
        h_out = []
        for j in range(8):
            s = int(h_in[j]) + int(states[64][j])
            h_out.append(s & M)
            trace[base + 64, CD + j] = s >> 32
        return h_out

    # -- constraints --------------------------------------------------------
    def eval(self, ctx):
        s_round = ctx.const(C_ROUND)
        s_sched = ctx.const(C_SCHED)
        s_roll = ctx.const(C_ROLL)
        s_dig = ctx.const(C_DIG)
        s_first = ctx.const(C_FIRST)
        k_const = ctx.const(C_K)

        a = ctx.local(A, 32)
        b = ctx.local(B, 32)
        c = ctx.local(C, 32)
        e = ctx.local(E, 32)
        f = ctx.local(F, 32)
        g = ctx.local(G, 32)
        a_n = ctx.next(A, 32)
        b_n = ctx.next(B, 32)
        c_n = ctx.next(C, 32)
        e_n = ctx.next(E, 32)
        f_n = ctx.next(F, 32)
        g_n = ctx.next(G, 32)
        d = ctx.local(D)
        h = ctx.local(H)
        d_n = ctx.next(D)
        h_n = ctx.next(H)
        w = ctx.local(W, 16)
        w_n = ctx.next(W, 16)
        wb1 = ctx.local(WB1, 32)
        wb14 = ctx.local(WB14, 32)
        m_s1 = ctx.local(M_S1, 32)
        m_s0 = ctx.local(M_S0, 32)
        m_ls0 = ctx.local(M_LS0, 32)
        m_ls1 = ctx.local(M_LS1, 32)
        ab = ctx.local(AB, 32)
        hc = ctx.local(HC, 8)
        hc_n = ctx.next(HC, 8)

        pw = ctx.lift(_POW2)

        def word(vbits):
            return (vbits * pw).sum0()

        def xor2(x, y):
            return x + y - 2 * (x * y)

        # booleanity of every bit/carry/helper column (cheap: one stacked
        # emission; pad rows hold zeros so the filter is EVERY)
        bit_cols = np.concatenate(
            [
                np.arange(A, A + 6 * 32),  # a,b,c,e,f,g
                np.arange(WB1, WB1 + 64),  # wb1, wb14
                np.arange(M_S1, M_S1 + 5 * 32),  # helpers
                np.arange(CE, CE + 8),  # ce, ca, cw
                np.arange(CD, CD + 8),  # digest carries
            ]
        )
        bits = ctx.local_g(bit_cols)
        ctx.constraint(bits * (bits - 1))

        # -- helper XOR equalities (degree 3 with the selector) -------------
        ctx.constraint(s_round * (m_s1 - xor2(e[_rotr_idx(6)], e[_rotr_idx(11)])))
        ctx.constraint(s_round * (m_s0 - xor2(a[_rotr_idx(2)], a[_rotr_idx(13)])))
        ctx.constraint(s_round * (ab - a * b))
        ctx.constraint(s_sched * (m_ls0 - xor2(wb1[_rotr_idx(7)], wb1[_rotr_idx(18)])))
        ctx.constraint(s_sched * (m_ls1 - xor2(wb14[_rotr_idx(17)], wb14[_rotr_idx(19)])))
        # feed-bit decompositions bind to the window words
        ctx.constraint(s_sched * (word(wb1) - w[1]))
        ctx.constraint(s_sched * (word(wb14) - w[14]))

        # -- round function t -> t+1 ----------------------------------------
        S1 = word(xor2(m_s1, e[_rotr_idx(25)]))
        ch = word(g + e * (f - g))
        t1 = h + S1 + ch + k_const + w[0]
        S0 = word(xor2(m_s0, a[_rotr_idx(22)]))
        maj = word(ab + c * (a + b - 2 * ab))
        t2 = S0 + maj
        ce_v = ctx.local(CE) + 2 * ctx.local(CE + 1) + 4 * ctx.local(CE + 2)
        ca_v = ctx.local(CA) + 2 * ctx.local(CA + 1) + 4 * ctx.local(CA + 2)
        two32 = 1 << 32
        ctx.constraint(s_round * (word(e_n) + ce_v * two32 - d - t1))
        ctx.constraint(s_round * (word(a_n) + ca_v * two32 - t1 - t2))
        # register shifts
        ctx.constraint(s_round * (b_n - a))
        ctx.constraint(s_round * (c_n - b))
        ctx.constraint(s_round * (f_n - e))
        ctx.constraint(s_round * (g_n - f))
        ctx.constraint(s_round * (d_n - word(c)))
        ctx.constraint(s_round * (h_n - word(g)))
        # chaining value pinned through the block (rows 0..63 -> 64)
        ctx.constraint(s_round * (hc_n - hc))

        # -- message schedule ------------------------------------------------
        # window roll: w'[j] = w[j+1] for j < 15 (rows 0..62)
        ctx.constraint(s_roll * (w_n[0:15] - w[1:16]))
        # generation: w'[15] = w[0] + sigma0(w[1]) + w[9] + sigma1(w[14])
        sh3_idx, sh3_m = _shr_idx_mask(3)
        sh10_idx, sh10_m = _shr_idx_mask(10)
        ls0 = word(xor2(m_ls0, wb1[sh3_idx] * ctx.lift(sh3_m)))
        ls1 = word(xor2(m_ls1, wb14[sh10_idx] * ctx.lift(sh10_m)))
        cw_v = ctx.local(CW) + 2 * ctx.local(CW + 1)
        ctx.constraint(s_sched * (w_n[15] + cw_v * two32 - w[0] - ls0 - w[9] - ls1))

        # -- block boundaries -------------------------------------------------
        # initial state equals the chaining value
        state_words = [word(a), word(b), word(c), d, word(e), word(f), word(g), h]
        for j in range(8):
            ctx.constraint(s_first * (state_words[j] - hc[j]))

        # -- public input bindings (stacked across blocks) --------------------
        nb = self.num_blocks
        first_ind = ctx.const_g(np.arange(C_BLK, C_BLK + nb)[:, None])
        dig_ind = ctx.const_g(np.arange(C_BLK + nb, C_BLK + 2 * nb)[:, None])
        pi_base = 32 * np.arange(nb)[:, None]
        # message words bound at the first row
        w_all = ctx.local_g(W + np.tile(np.arange(16), (nb, 1)))
        ctx.constraint(first_ind * (w_all - ctx.pi_g(pi_base + np.arange(16))))
        # h_in bound to the pinned chaining columns
        hc_all = ctx.local_g(HC + np.tile(np.arange(8), (nb, 1)))
        ctx.constraint(first_ind * (hc_all - ctx.pi_g(pi_base + 16 + np.arange(8))))
        # digest feed-forward: h_in + state = 2^32 * carry + h_out(PI),
        # bound per block via its digest-row indicator
        cd = ctx.local(CD, 8)
        for j in range(8):
            expr = hc[j] + state_words[j] - cd[j] * two32
            ctx.constraint(dig_ind * (expr[None] - ctx.pi_g(pi_base + 24 + j)))
