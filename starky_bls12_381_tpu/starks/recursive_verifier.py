"""RecursiveVerifierAir: proves the query phase of a STARK verification.

Capability parity with the reference's per-stark recursive wrap
(`recursive_proof`, /root/reference/src/aggregate_proof.rs:417-451, whose
dominant in-circuit cost is the FRI verifier: Poseidon leaf hashing,
Merkle authentication paths, and the fold cascade): this AIR proves, for
every FRI query of an inner `StarkProof`,

  1. the Poseidon leaf hash of the opened trace row (segmented sponge +
     digest fold tree, exactly backend/poseidon.py `hash_row_s`),
  2. the Merkle authentication path from that leaf to the trace cap,
  3. the same for the opened quotient row,
  4. the DEEP composition value at the query point — the gamma-power
     weighted sums run over the SAME witness cells the leaf sponges
     absorb, so the hashed row and the combined row are one witness,
  5. the FRI arity-2 fold cascade with each layer's opened pair hashed
     and authenticated against its layer cap,
  6. the final fold output against the final-polynomial evaluation.

The outer verifier (verify_recursive) keeps the cheap scalar work
native — transcript replay, grinding, the quotient identity at zeta,
final-poly evaluation, and every index-derived selector (mine flags,
1/(2x) tables, cap-entry selection) — each a pure function of public,
transcript-bound data, supplied to the AIR as public inputs. This is
stage (c) of docs/RECURSION.md's staged trust model.

The headline effect matches the reference's reason for recursion: proof
COMPRESSION. A `CompressedProof` ships the inner proof's public part
(caps + openings + final poly, KBs) plus one outer STARK proof; the
query rounds — 60 MB for the wide BLS starks — never leave the prover.

TPU-scalability design (what makes a 90k-column inner wrappable):

* The segment-digest fold tree runs as a STREAMING Merkle stack
  interleaved with the segment sponges: completing segment s pushes its
  digest and equal-depth subtree digests merge immediately (a binary
  counter), so at most log2(segments)+1 digest registers are live. A
  register per tree NODE would pin 255 * CAP = 1020 columns across the
  query region; the stack holds it at 8 * CAP (~9x smaller trace).
* Row bindings that recur at many schedule rows (fresh sponge states,
  digest pushes into a stack slot, merge input/output wiring, Merkle
  path chaining) are gated by CONSTANT COLUMNS, not per-row Lagrange
  filters: a ("row", k) filter costs an LDE-length vector in the
  prover, and a wide wrap has hundreds of such rows per query (~GBs of
  filter tables). With constant gating, only ~10 one-off rows per query
  (chain starts, DEEP scalars, cap bindings) remain row-filtered.
* Merkle path direction bits live in a witness column constrained
  boolean, with a position accumulator column that sums bit_v * 2^v
  along each path and is bound once, at the path's cap-binding row, to
  the query index public input — replacing per-level public-input bit
  bindings (and their per-level row filters).
* Trace generation is fully batched: every permutation in the schedule
  advances through `poseidon_block.permute_record` in (queries x
  segments)-wide lanes, so an 84-query wrap of a 90k-column inner fills
  in seconds instead of hours.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..backend import fri as fri_mod
from ..backend import poseidon as ps
from ..backend.air import Air
from ..backend.config import StarkConfig
from ..backend.proof import FriProof, StarkProof
from ..backend.prover import SHIFT, check_pow, ext_powers
from ..backend.verifier import VerificationError, check_quotient_identity, derive_challenges, verify
from ..fields import goldilocks as gl
from . import poseidon_block as pb

WIDTH = pb.WIDTH
RATE = ps.RATE
CAP = ps.CAP
N_ROUNDS = pb.N_ROUNDS
RPP = pb.ROWS_PER_PERM  # 32
RESULT = pb.RESULT_OFF  # 31: result-row offset in a window

# trace columns after the shared poseidon block
SIB = pb.BLOCK_COLS  # 4: merkle sibling digests
WCH = SIB + CAP  # 16: DEEP weights w_0..w_7 as ext pairs
ACCC = WCH + 2 * RATE  # 2: DEEP accumulator (ext)
BITC = ACCC + 2  # 1: merkle path direction bit (boolean at select rows)
POSA = BITC + 1  # 1: path position accumulator (sum of bit_v * 2^v)
TSTK0 = POSA + 1  # trace digest stack slots (nslot_t * CAP columns)

# constant columns after the shared poseidon block constants
C_CARRY = pb.C_TOTAL  # sponge capacity-carry result rows
C_DEEPW = pb.C_TOTAL + 1  # absorb rows: weight/acc update on the transition
C_PINW = pb.C_TOTAL + 2  # weight/acc pin rows
C_PINREG = pb.C_TOTAL + 3  # scalar-register pin rows
C_FRESH = pb.C_TOTAL + 4  # segment first-block rows: capacity lanes zero
C_P0T = pb.C_TOTAL + 5  # trace path level-0 load rows
C_P0Q = pb.C_TOTAL + 6  # quotient path level-0 load rows
C_PATHC = pb.C_TOTAL + 7  # chained path select rows (result-row handoff)
C_PSEL = pb.C_TOTAL + 8  # all path select rows: bit boolean + pos increment
C_PPOW = pb.C_TOTAL + 9  # 2^level at select rows
C_PPIN = pb.C_TOTAL + 10  # position-accumulator pin rows within a path
C_PSTART = pb.C_TOTAL + 11  # path start rows: POSA == 0
C_STKPIN0 = pb.C_TOTAL + 12  # per-stack-slot pin rows (trace slots, then quotient)

_INV2 = gl.inv_s(2)
_W = gl.W_EXT


def _eadd(a, b):
    return (a[0] + b[0], a[1] + b[1])


def _esub(a, b):
    return (a[0] - b[0], a[1] - b[1])


def _emul(a, b):
    return (a[0] * b[0] + _W * (a[1] * b[1]), a[0] * b[1] + a[1] * b[0])


class RecursiveVerifierAir(Air):
    """Verifies the query phase of proofs for one (inner air, config)."""

    def __init__(self, inner_air, inner_config: StarkConfig, num_queries: int | None = None):
        """`num_queries`: how many query slots this outer air carries
        (default: all of the inner config's). A smaller value turns the
        air into a SHARD: the same compiled prover then wraps any
        `num_queries`-sized slice of the inner proof's queries, and a DAG
        of shards covers wide inner airs whose full wrap would not fit
        device memory (`prove_recursive_dag`)."""
        self.inner = inner_air
        self.icfg = inner_config
        n = inner_air.num_rows
        self.C = inner_air.num_cols
        self.n0 = n * inner_config.blowup
        self.L = inner_config.fri_num_folds(self.n0)
        self.Q = num_queries if num_queries is not None else inner_config.num_queries
        self.nq = inner_config.num_challenges * inner_air.quotient_degree_factor()
        ch = inner_config.cap_height
        self.depth = (self.n0.bit_length() - 1) - ch
        assert self.depth >= 1, "inner tree shallower than its cap"
        # FRI layer l commits pairs: n0>>(l+1) leaves
        self.depth_l = [max(0, (self.n0 >> (l + 1)).bit_length() - 1 - ch) for l in range(self.L)]
        _, self.st, self.ksegt = ps.leaf_plan(self.C)
        _, self.sq, self.ksegq = ps.leaf_plan(self.nq)
        self.final_len = (self.n0 >> self.L) // inner_config.blowup
        # streaming digest stacks: at most log2(segments)+1 live slots
        self.nslot_t = self.st.bit_length()  # st is a power of two
        self.nslot_q = self.sq.bit_length()
        self.QSTK0 = TSTK0 + self.nslot_t * CAP
        self.REG0 = self.QSTK0 + self.nslot_q * CAP
        # per-slot push-row / merge-row constant selectors
        self.C_PUSH_T = C_STKPIN0 + self.nslot_t + self.nslot_q
        self.C_PUSH_Q = self.C_PUSH_T + self.nslot_t
        self.C_MRG_T = self.C_PUSH_Q + self.nslot_q
        self.C_MRG_Q = self.C_MRG_T + max(0, self.nslot_t - 1)
        self.c_total = self.C_MRG_Q + max(0, self.nslot_q - 1)

        # ---- scalar register file (columns; one value per query region) --
        cur = [self.REG0]

        def alloc(k):
            c = cur[0]
            cur[0] += k
            return c

        self.R_A = alloc(2)  # trace part of the r1 DEEP sum
        self.R_R1X = alloc(2)  # full r1(x)
        self.R_IV1 = alloc(2)  # 1/(x - zeta)
        self.R_IV2 = alloc(2)  # 1/(x - zeta*g)
        self.R_VAL = alloc(2)  # DEEP value at x
        self.R_FV = [alloc(2) for _ in range(self.L)]  # fold outputs
        self.num_cols = cur[0]

        # ---- per-query schedule (relative rows; identical per query) ----
        plan = self._layout_query()
        self.plan = plan
        self.rows_per_query = plan["rows"]
        self.num_rows = pb.next_pow2(self.Q * self.rows_per_query)

        # ---- public input layout ----------------------------------------
        pi = [0]

        def take(k):
            c = pi[0]
            pi[0] += k
            return c

        self.PI_ZETA = take(2)
        self.PI_ZETA_G = take(2)
        self.PI_GAMMA = take(2)
        self.PI_G8 = take(2)  # gamma^8
        self.PI_GQ = take(2)  # gamma^C (quotient-part weight start)
        self.PI_GP2 = take(2)  # gamma^{C+nq} (r2 weight scale)
        self.PI_R1Z = take(2)
        self.PI_R2Z = take(2)
        self.PI_BETAS = take(2 * self.L)
        per_q = {}
        per_q["x"] = take(1)
        per_q["ixlow"] = take(1)  # index & (2^depth - 1): path position bound
        per_q["tcap"] = take(CAP)
        per_q["qcap"] = take(CAP)
        per_q["layers"] = []
        for l in range(self.L):
            per_q["layers"].append(
                {
                    "mine": take(1),
                    "xinv": take(1),  # 1/(2 * x_pos_l)
                    "poslow": take(1),  # pos_in & (2^depth_l - 1)
                    "fcap": take(CAP),
                }
            )
        per_q["final"] = take(2)
        self.per_q_size = pi[0] - self.PI_BETAS - 2 * self.L
        self.PI_Q0 = self.PI_BETAS + 2 * self.L
        self.per_q = per_q  # offsets of query 0; query q adds q*per_q_size
        self.num_pis = self.PI_Q0 + self.Q * self.per_q_size

    # ------------------------------------------------------------------
    # schedule
    # ------------------------------------------------------------------
    def _layout_query(self):
        """Relative row layout of one query region."""
        r = [0]
        perms = []

        def perm():
            base = r[0]
            perms.append(base)
            r[0] += RPP
            return base

        p = {}
        # trace leaf: segment sponges interleaved with the streaming
        # digest-stack merges (binary counter over completed segments)
        p["t_seg"], p["t_merge"], p["t_push"], t_absorb = self._leaf_plan_sched(
            self.st, self.ksegt, perm
        )
        p["t_absorb"] = t_absorb
        p["t_span"] = (t_absorb[0], p["t_seg"][-1][1])  # weight chain live range
        # trace merkle path
        p["t_path"] = [perm() for _ in range(self.depth)]
        # quotient leaf + stack + path
        p["q_seg"], p["q_merge"], p["q_push"], q_absorb = self._leaf_plan_sched(
            self.sq, self.ksegq, perm
        )
        p["q_absorb"] = q_absorb
        p["q_span"] = (q_absorb[0], p["q_seg"][-1][1])
        p["q_path"] = [perm() for _ in range(self.depth)]
        # FRI layers: pair perm + path
        p["fri"] = []
        for l in range(self.L):
            pair = perm()
            path = [perm() for _ in range(self.depth_l[l])]
            p["fri"].append((pair, path))
        p["perms"] = perms
        p["rows"] = r[0] + 1  # one spare row: region-final pin break
        return p

    def _leaf_plan_sched(self, s, kseg, perm):
        """Schedule s segment sponges (kseg chained perms each) with the
        streaming merge stack. Returns (segs, merges, pushes, absorb_rows):
          segs:    [(block_bases, digest_row, push_slot)] per segment
          merges:  [(perm_base, a_slot, b_slot, level, out_pair)] — output
                   (a level+1 tree node) lands back in a_slot
          pushes:  [(row, slot, ref)] in row order; ref = (level, node)
          absorb_rows: every sponge block base, in chunk-consumption order
        """
        segs, merges, pushes, absorbs = [], [], [], []
        stack = []  # (depth, node_index_at_depth)
        for seg in range(s):
            blocks = [perm() for _ in range(kseg)]
            absorbs.extend(blocks)
            dig_row = blocks[-1] + RESULT
            stack.append((0, seg))
            slot = len(stack) - 1
            segs.append((blocks, dig_row, slot))
            pushes.append((dig_row, slot, (0, seg)))
            while len(stack) >= 2 and stack[-1][0] == stack[-2][0]:
                base = perm()
                d, nb = stack.pop()
                _d, na = stack.pop()
                assert na == nb - 1 and na % 2 == 0
                a_slot = len(stack)
                merges.append((base, a_slot, a_slot + 1, d, na // 2))
                stack.append((d + 1, na // 2))
                pushes.append((base + RESULT, a_slot, (d + 1, na // 2)))
        assert len(stack) == 1, "segment count must be a power of two"
        return segs, merges, pushes, absorbs

    def _paths(self):
        """Every Merkle path in one query region, with its select rows:
        yields (path_bases, select_rows, capbind_row, kind) where kind is
        't' / 'q' (level 0 loads from a stack-root register) or 'f'
        (level 0 chains from the preceding FRI pair permutation)."""
        p = self.plan
        for bases, kind in ((p["t_path"], "t"), (p["q_path"], "q")):
            sels = [bases[0]] + [b - 1 for b in bases[1:]]
            yield bases, sels, bases[-1] + RESULT, kind
        for pair_base, bases in p["fri"]:
            if not bases:
                continue
            sels = [pair_base + RESULT] + [b - 1 for b in bases[1:]]
            yield bases, sels, bases[-1] + RESULT, "f"

    # ------------------------------------------------------------------
    # constants
    # ------------------------------------------------------------------
    def constant_columns(self):
        """All constant columns are identical across query regions, so one
        (rows_per_query, c_total) template is built with vectorized writes
        and tiled over the Q regions (padding rows stay zero). Cached: the
        production wrap calls this once per SHARD (12 shards for the
        84-query miller loop) on an identical air."""
        cached = self.__dict__.get("_const_cols_cache")
        if cached is not None:
            return cached
        out = self._constant_columns_impl()
        self.__dict__["_const_cols_cache"] = out
        return out

    def _constant_columns_impl(self):
        rpq = self.rows_per_query
        p = self.plan
        tpl = np.zeros((rpq, self.c_total), dtype=np.uint64)
        # poseidon window constants, vectorized over every permutation:
        # tile the one-window template (pre row + rc/full/partial rounds)
        bases = np.asarray(p["perms"], dtype=np.int64)
        rows = (bases[:, None] + np.arange(RPP)[None, :]).reshape(-1)
        tpl[rows[:, None], np.arange(pb.C_TOTAL)[None, :]] = np.tile(
            pb.perm_const_template(), (bases.shape[0], 1)
        )
        # sponge wiring: capacity carry within a segment, fresh first blocks
        for seg_list in (p["t_seg"], p["q_seg"]):
            for blocks, _dig, _slot in seg_list:
                tpl[blocks[0], C_FRESH] = 1
                for b in blocks[1:]:
                    tpl[b - 1, C_CARRY] = 1
        # DEEP weight chain: updates on absorb rows, pins elsewhere
        for span, absorbs in ((p["t_span"], p["t_absorb"]), (p["q_span"], p["q_absorb"])):
            lo, hi = span
            tpl[lo:hi, C_PINW] = 1
            ab = np.asarray(absorbs, dtype=np.int64)
            tpl[ab, C_PINW] = 0
            tpl[ab, C_DEEPW] = 1
        # scalar registers pinned across the region (break on its last row)
        tpl[: rpq - 1, C_PINREG] = 1
        # digest-stack slots: pinned except where a push lands a new value;
        # push rows and merge rows get their per-slot selectors
        for side, (pushes, merges, nslot) in enumerate(
            (
                (p["t_push"], p["t_merge"], self.nslot_t),
                (p["q_push"], p["q_merge"], self.nslot_q),
            )
        ):
            pin0 = C_STKPIN0 + (self.nslot_t if side else 0)
            push0 = self.C_PUSH_Q if side else self.C_PUSH_T
            mrg0 = self.C_MRG_Q if side else self.C_MRG_T
            tpl[: rpq - 1, pin0 : pin0 + nslot] = 1
            for row, slot, _ref in pushes:
                tpl[row - 1, pin0 + slot] = 0
                tpl[row, push0 + slot] = 1
            for base, a_slot, _b, _lvl, _pair in merges:
                tpl[base, mrg0 + a_slot] = 1
        # merkle paths: select rows, powers, position pinning, starts
        for bases, sels, capbind, kind in self._paths():
            tpl[sels[0], C_PSTART] = 1
            mask = np.ones(capbind - sels[0], dtype=bool)
            for v, srow in enumerate(sels):
                tpl[srow, C_PSEL] = 1
                tpl[srow, C_PPOW] = 1 << v
                mask[srow - sels[0]] = False
            pin_rows = sels[0] + np.nonzero(mask)[0]
            tpl[pin_rows, C_PPIN] = 1
            if kind == "t":
                tpl[bases[0], C_P0T] = 1
            elif kind == "q":
                tpl[bases[0], C_P0Q] = 1
            else:
                tpl[sels[0], C_PATHC] = 1
            for srow in sels[1:]:
                tpl[srow, C_PATHC] = 1
        out = np.zeros((self.num_rows, self.c_total), dtype=np.uint64)
        out[: self.Q * rpq] = np.tile(tpl, (self.Q, 1))
        return out

    # ------------------------------------------------------------------
    # constraints
    # ------------------------------------------------------------------
    def _tslot(self, d):
        return TSTK0 + d * CAP

    def _qslot(self, d):
        return self.QSTK0 + d * CAP

    def eval(self, ctx):
        s, s_next = pb.eval_block(ctx)
        c_carry = ctx.const(C_CARRY)
        c_deepw = ctx.const(C_DEEPW)
        c_pinw = ctx.const(C_PINW)
        c_pinreg = ctx.const(C_PINREG)

        # capacity carry at marked result rows (next block overwrites rate)
        ctx.constraint_transition(c_carry[None] * (ctx.next(pb.S + RATE, WIDTH - RATE) - s[RATE:]))
        # fresh sponge states: capacity lanes zero on segment first blocks
        ctx.constraint(ctx.const(C_FRESH)[None] * s[RATE:])

        # scalar register pinning
        npin = self.num_cols - self.REG0
        ctx.constraint_transition(
            c_pinreg[None] * (ctx.next(self.REG0, npin) - ctx.local(self.REG0, npin))
        )
        # digest-stack slots: pinning, push bindings, merge wiring
        for side in range(2):
            nslot = self.nslot_q if side else self.nslot_t
            slot_of = self._qslot if side else self._tslot
            pin0 = C_STKPIN0 + (self.nslot_t if side else 0)
            push0 = self.C_PUSH_Q if side else self.C_PUSH_T
            mrg0 = self.C_MRG_Q if side else self.C_MRG_T
            for d in range(nslot):
                pin = ctx.const(pin0 + d)
                col = slot_of(d)
                ctx.constraint_transition(pin[None] * (ctx.next(col, CAP) - ctx.local(col, CAP)))
                # a digest landing in slot d equals the permutation output
                c_push = ctx.const(push0 + d)
                ctx.constraint(c_push[None] * (s[:CAP] - ctx.local(col, CAP)))
            for a in range(nslot - 1):
                c_mrg = ctx.const(mrg0 + a)
                ctx.constraint(c_mrg[None] * (s[:CAP] - ctx.local(slot_of(a), CAP)))
                ctx.constraint(c_mrg[None] * (s[CAP : 2 * CAP] - ctx.local(slot_of(a + 1), CAP)))
                ctx.constraint(c_mrg[None] * s[2 * CAP :])

        # merkle path machinery: boolean bits, position accumulator,
        # level-0 loads and chained result-row handoffs
        b = ctx.local(BITC)
        pos = ctx.local(POSA)
        pos_next = ctx.next(POSA)
        c_psel = ctx.const(C_PSEL)
        c_ppow = ctx.const(C_PPOW)
        c_ppin = ctx.const(C_PPIN)
        ctx.constraint(c_psel * b * (1 - b))
        ctx.constraint(ctx.const(C_PSTART) * pos)
        ctx.constraint_transition(c_psel * (pos_next - pos - b * c_ppow))
        ctx.constraint_transition(c_ppin * (pos_next - pos))
        sib = ctx.local(SIB, CAP)
        for c_col, leaf_col in ((C_P0T, self._tslot(0)), (C_P0Q, self._qslot(0))):
            c0 = ctx.const(c_col)
            leaf = ctx.local(leaf_col, CAP)
            ctx.constraint(c0[None] * (s[:CAP] - (b[None] * sib + (1 - b)[None] * leaf)))
            ctx.constraint(c0[None] * (s[CAP : 2 * CAP] - (b[None] * leaf + (1 - b)[None] * sib)))
            ctx.constraint(c0[None] * s[2 * CAP :])
        c_pathc = ctx.const(C_PATHC)
        cur = s[:CAP]
        nxt_lo = ctx.next(pb.S, CAP)
        nxt_hi = ctx.next(pb.S + CAP, CAP)
        nxt_cap = ctx.next(pb.S + 2 * CAP, WIDTH - 2 * CAP)
        ctx.constraint_transition(c_pathc[None] * (nxt_lo - (b[None] * sib + (1 - b)[None] * cur)))
        ctx.constraint_transition(c_pathc[None] * (nxt_hi - (b[None] * cur + (1 - b)[None] * sib)))
        ctx.constraint_transition(c_pathc[None] * nxt_cap)

        # DEEP weight/acc chain
        gamma = (ctx.pi(self.PI_GAMMA), ctx.pi(self.PI_GAMMA + 1))
        g8 = (ctx.pi(self.PI_G8), ctx.pi(self.PI_G8 + 1))
        w = [(ctx.local(WCH + 2 * k), ctx.local(WCH + 2 * k + 1)) for k in range(RATE)]
        acc = (ctx.local(ACCC), ctx.local(ACCC + 1))
        acc_next = (ctx.next(ACCC), ctx.next(ACCC + 1))
        # within-row weight chain on absorb rows: w_{k+1} = w_k * gamma
        for k in range(RATE - 1):
            e = _esub(w[k + 1], _emul(w[k], gamma))
            ctx.constraint(c_deepw * e[0])
            ctx.constraint(c_deepw * e[1])
        # update transition LEAVING each absorb row: acc' = acc + sum w_k*s_k
        # and every w_k advances by gamma^8 — the advanced values are then
        # pinned forward INTO the next absorb row, so the chain stays
        # consistent across permutation bodies.
        tot = acc
        for k in range(RATE):
            tot = _eadd(tot, (w[k][0] * s[k], w[k][1] * s[k]))
        e = _esub(acc_next, tot)
        ctx.constraint_transition(c_deepw * e[0])
        ctx.constraint_transition(c_deepw * e[1])
        for k in range(RATE):
            w_next_k = (ctx.next(WCH + 2 * k), ctx.next(WCH + 2 * k + 1))
            e = _esub(w_next_k, _emul(w[k], g8))
            ctx.constraint_transition(c_deepw * e[0])
            ctx.constraint_transition(c_deepw * e[1])
        # pin rows
        wa = ctx.local(WCH, 2 * RATE + 2)
        ctx.constraint_transition(c_pinw[None] * (ctx.next(WCH, 2 * RATE + 2) - wa))

        # per-query fixed-row wiring (the few one-off rows)
        for q in range(self.Q):
            self._eval_query(ctx, q, s, s_next)

    def _eval_query(self, ctx, q, s, s_next):
        p = self.plan
        r0 = q * self.rows_per_query

        def qpi(field, k=0, layer=None):
            base = self.per_q[field] if layer is None else self.per_q["layers"][layer][field]
            return ctx.pi(base + q * self.per_q_size + k)

        def qpi_vec(field, width, layer=None):
            base = self.per_q[field] if layer is None else self.per_q["layers"][layer][field]
            return ctx.pi(base + q * self.per_q_size, width)

        def rext(col):
            return (ctx.local(col), ctx.local(col + 1))

        ROW = lambda k: ("row", r0 + k)  # noqa: E731

        zeta = (ctx.pi(self.PI_ZETA), ctx.pi(self.PI_ZETA + 1))
        zeta_g = (ctx.pi(self.PI_ZETA_G), ctx.pi(self.PI_ZETA_G + 1))
        gq = (ctx.pi(self.PI_GQ), ctx.pi(self.PI_GQ + 1))
        gp2 = (ctx.pi(self.PI_GP2), ctx.pi(self.PI_GP2 + 1))
        r1z = (ctx.pi(self.PI_R1Z), ctx.pi(self.PI_R1Z + 1))
        r2z = (ctx.pi(self.PI_R2Z), ctx.pi(self.PI_R2Z + 1))
        x = qpi("x")
        ixlow = qpi("ixlow")

        # ---- DEEP chain boundary rows ------------------------------------
        first_absorb = p["t_absorb"][0]
        # chain start: W = [1, gamma, ...] enforced by within-row chain + W0==1
        ctx.constraint(ctx.local(WCH) - 1, ROW(first_absorb))
        ctx.constraint(ctx.local(WCH + 1), ROW(first_absorb))
        ctx.constraint(ctx.local(ACCC), ROW(first_absorb))
        ctx.constraint(ctx.local(ACCC + 1), ROW(first_absorb))
        # A register == trace-part DEEP sum at the sponge end
        span_end = p["t_span"][1]
        ctx.constraint(ctx.local(ACCC) - ctx.local(self.R_A), ROW(span_end))
        ctx.constraint(ctx.local(ACCC + 1) - ctx.local(self.R_A + 1), ROW(span_end))
        # quotient sponge chain start / end
        qa0 = p["q_absorb"][0]
        ctx.constraint(ctx.local(WCH) - gq[0], ROW(qa0))
        ctx.constraint(ctx.local(WCH + 1) - gq[1], ROW(qa0))
        ctx.constraint(ctx.local(ACCC) - ctx.local(self.R_A), ROW(qa0))
        ctx.constraint(ctx.local(ACCC + 1) - ctx.local(self.R_A + 1), ROW(qa0))
        qspan_end = p["q_span"][1]
        ctx.constraint(ctx.local(ACCC) - ctx.local(self.R_R1X), ROW(qspan_end))
        ctx.constraint(ctx.local(ACCC + 1) - ctx.local(self.R_R1X + 1), ROW(qspan_end))

        # ---- path cap + position bindings ---------------------------------
        for path, cap_field in ((p["t_path"], "tcap"), (p["q_path"], "qcap")):
            capbind = path[-1] + RESULT
            ctx.constraint(s[:CAP] - qpi_vec(cap_field, CAP), ROW(capbind))
            ctx.constraint(ctx.local(POSA) - ixlow, ROW(capbind))

        # ---- DEEP scalars (registers; constraints at the region row 0) ---
        iv1 = rext(self.R_IV1)
        iv2 = rext(self.R_IV2)
        a_reg = rext(self.R_A)
        r1x = rext(self.R_R1X)
        val = rext(self.R_VAL)
        # (x - zeta) * iv1 == 1 ; (x - zeta_g) * iv2 == 1
        d1 = (x - zeta[0], 0 - zeta[1])
        d2 = (x - zeta_g[0], 0 - zeta_g[1])
        e = _emul(d1, iv1)
        ctx.constraint(e[0] - 1, ROW(0))
        ctx.constraint(e[1], ROW(0))
        e = _emul(d2, iv2)
        ctx.constraint(e[0] - 1, ROW(0))
        ctx.constraint(e[1], ROW(0))
        # VAL == (r1x - r1z)*iv1 + (gp2*A - r2z)*iv2
        f1 = _emul(_esub(r1x, r1z), iv1)
        f2 = _emul(_esub(_emul(gp2, a_reg), r2z), iv2)
        e = _esub(val, _eadd(f1, f2))
        ctx.constraint(e[0], ROW(0))
        ctx.constraint(e[1], ROW(0))

        # ---- FRI layers ---------------------------------------------------
        for l, (pair_base, path) in enumerate(p["fri"]):
            beta = (ctx.pi(self.PI_BETAS + 2 * l), ctx.pi(self.PI_BETAS + 2 * l + 1))
            mine = qpi("mine", layer=l)
            xinv = qpi("xinv", layer=l)
            v0 = (s[0], s[1])
            v1 = (s[2], s[3])
            # pair leaf: lanes 4..12 zero
            ctx.constraint(s[4:], ROW(pair_base))
            # chain: selected element == previous value
            prev = rext(self.R_VAL if l == 0 else self.R_FV[l - 1])
            sel = (
                mine * v1[0] + (1 - mine) * v0[0],
                mine * v1[1] + (1 - mine) * v0[1],
            )
            e = _esub(sel, prev)
            ctx.constraint(e[0], ROW(pair_base))
            ctx.constraint(e[1], ROW(pair_base))
            # fold: FV[l] == (v0+v1)/2 + beta*(v0-v1)*xinv
            fv = rext(self.R_FV[l])
            sm = _eadd(v0, v1)
            df = _esub(v0, v1)
            t = _emul(beta, df)
            fold = (_INV2 * sm[0] + t[0] * xinv, _INV2 * sm[1] + t[1] * xinv)
            e = _esub(fv, fold)
            ctx.constraint(e[0], ROW(pair_base))
            ctx.constraint(e[1], ROW(pair_base))
            # cap + position binding at the layer path's end (or, with no
            # path levels, the pair digest IS the cap entry)
            fcap = qpi_vec("fcap", CAP, layer=l)
            if path:
                capbind = path[-1] + RESULT
                ctx.constraint(s[:CAP] - fcap, ROW(capbind))
                ctx.constraint(ctx.local(POSA) - qpi("poslow", layer=l), ROW(capbind))
            else:
                ctx.constraint(s[:CAP] - fcap, ROW(pair_base + RESULT))

        # final value binding (outer verifier evaluates the final poly)
        if self.L:
            fin = qpi_vec("final", 2)
            fv = rext(self.R_FV[self.L - 1])
            ctx.constraint(fv[0] - fin[0], ROW(0))
            ctx.constraint(fv[1] - fin[1], ROW(0))
        else:
            fin = qpi_vec("final", 2)
            val = rext(self.R_VAL)
            ctx.constraint(val[0] - fin[0], ROW(0))
            ctx.constraint(val[1] - fin[1], ROW(0))

    # ------------------------------------------------------------------
    # trace generation (fully batched: one permute_record call per
    # schedule step, vectorized over queries x parallel lanes)
    # ------------------------------------------------------------------
    def generate_trace(self, proof: StarkProof, inner_pis, query_indices=None):
        """Builds the witness from a full inner proof (with query rounds)
        and returns (trace, outer_pis). `query_indices`: which inner query
        slots fill this air's Q regions (default 0..Q-1; shards pass their
        slice, padded by repetition to Q)."""
        if query_indices is None:
            query_indices = list(range(self.Q))
        assert len(query_indices) == self.Q
        d = derive_challenges(self.inner, proof, inner_pis, self.icfg)
        outer_pis = build_outer_pis(self, proof, d, query_indices)
        P = gl.P
        Q = self.Q
        rpq = self.rows_per_query
        p = self.plan
        trace = np.zeros((self.num_rows, self.num_cols), dtype=np.uint64)
        r0s = np.arange(Q, dtype=np.int64) * rpq
        gamma = d["gamma"]
        zeta, zeta_g = d["zeta"], d["zeta_g"]
        j1 = self.C + self.nq
        len_pt = self.st * self.ksegt * RATE
        len_pq = self.sq * self.ksegq * RATE
        wtab = ext_powers(gamma, max(j1 + self.C, self.C + len_pq + RATE, len_pt + RATE))
        r1z = _dot(wtab[:j1], np.concatenate([proof.trace_local, proof.quotient_open]))
        r2z = _dot(wtab[j1 : j1 + self.C], proof.trace_next)
        w_n0 = gl.primitive_root_of_unity(self.n0.bit_length() - 1)
        qrs = [proof.fri.query_rounds[qi] for qi in query_indices]

        # dense register matrix: one value per (query, register column)
        regmat = np.zeros((Q, rpq, self.num_cols - TSTK0), dtype=np.uint64)

        def set_reg(col, vals):  # vals (Q, k) — pinned across each region
            vals = np.asarray(vals, dtype=np.uint64)
            regmat[:, :, col - TSTK0 : col - TSTK0 + vals.shape[1]] = vals[:, None, :]

        # ---- trace leaf: sponges + streaming stack + DEEP chain ---------
        padded_t = np.zeros((Q, len_pt), dtype=np.uint64)
        padded_t[:, : self.C] = np.stack([np.asarray(qr.trace_row, dtype=np.uint64) for qr in qrs]) % np.uint64(P)
        levels_t = self._fill_leaf(trace, r0s, p["t_seg"], p["t_merge"], padded_t)
        self._fill_stack_regs(regmat, p["t_push"], levels_t, TSTK0)
        acc_t = self._fill_chain(trace, r0s, p["t_absorb"], p["t_span"], padded_t, wtab, 0, None)
        a_val = acc_t[:, -1]  # (Q, 2) trace-part DEEP sums
        set_reg(self.R_A, a_val)
        # ---- trace merkle path ------------------------------------------
        indices = np.asarray([qr.index for qr in qrs], dtype=np.int64)
        self._fill_merkle(
            trace, r0s, p["t_path"], levels_t[-1][:, 0],
            np.stack([np.stack(qr.trace_path) for qr in qrs]), indices,
        )
        # ---- quotient leaf + stack + chain + path ------------------------
        padded_q = np.zeros((Q, len_pq), dtype=np.uint64)
        padded_q[:, : self.nq] = np.stack([np.asarray(qr.quotient_row, dtype=np.uint64) for qr in qrs]) % np.uint64(P)
        levels_q = self._fill_leaf(trace, r0s, p["q_seg"], p["q_merge"], padded_q)
        self._fill_stack_regs(regmat, p["q_push"], levels_q, self.QSTK0)
        acc_q = self._fill_chain(trace, r0s, p["q_absorb"], p["q_span"], padded_q, wtab, self.C, a_val)
        r1x = acc_q[:, -1]
        set_reg(self.R_R1X, r1x)
        self._fill_merkle(
            trace, r0s, p["q_path"], levels_q[-1][:, 0],
            np.stack([np.stack(qr.quotient_path) for qr in qrs]), indices,
        )
        # ---- DEEP scalars -------------------------------------------------
        gp2 = gl.ext_pow(gamma, self.C + self.nq)
        iv1s, iv2s, values = [], [], []
        for q in range(Q):
            x = SHIFT * pow(w_n0, int(indices[q]), P) % P
            iv1 = gl.ext_inv(gl.ext_sub((x, 0), zeta))
            iv2 = gl.ext_inv(gl.ext_sub((x, 0), zeta_g))
            f1 = gl.ext_mul(gl.ext_sub((int(r1x[q, 0]), int(r1x[q, 1])), r1z), iv1)
            f2 = gl.ext_mul(
                gl.ext_sub(gl.ext_mul(gp2, (int(a_val[q, 0]), int(a_val[q, 1]))), r2z), iv2
            )
            iv1s.append(iv1)
            iv2s.append(iv2)
            values.append(gl.ext_add(f1, f2))
        set_reg(self.R_IV1, np.asarray(iv1s, dtype=np.uint64))
        set_reg(self.R_IV2, np.asarray(iv2s, dtype=np.uint64))
        set_reg(self.R_VAL, np.asarray(values, dtype=np.uint64))
        # ---- FRI layers ----------------------------------------------------
        pos = indices.copy()
        shift_l, root_l, size_l = SHIFT, w_n0, self.n0
        for l, (pair_base, path) in enumerate(p["fri"]):
            half = size_l // 2
            pos_in = pos % half
            mine = (pos >= half).astype(np.int64)
            pairs = np.stack([np.asarray(qrs[q].steps[l].pair, dtype=np.uint64) for q in range(Q)])
            for q in range(Q):
                got = tuple(int(v) for v in pairs[q, mine[q]])
                assert got == tuple(int(v) for v in values[q]), "fold chain mismatch"
            states = np.concatenate(
                [pairs.reshape(Q, 4), np.zeros((Q, WIDTH - 4), dtype=np.uint64)], axis=1
            )
            blocks, out = pb.permute_record(states)
            pb.scatter_blocks(trace, r0s + pair_base, blocks)
            values = []
            for q in range(Q):
                x_pos = shift_l * pow(root_l, int(pos_in[q]), P) % P
                values.append(
                    fri_mod.fold_scalar(
                        tuple(int(v) for v in pairs[q, 0]),
                        tuple(int(v) for v in pairs[q, 1]),
                        d["betas"][l],
                        x_pos,
                    )
                )
            set_reg(self.R_FV[l], np.asarray(values, dtype=np.uint64))
            if path:
                self._fill_merkle(
                    trace, r0s, path, out[:, :CAP],
                    np.stack([np.stack(qrs[q].steps[l].path) for q in range(Q)]),
                    pos_in, leaf_result_row=pair_base + RESULT,
                )
            pos = pos_in
            shift_l = shift_l * shift_l % P
            root_l = root_l * root_l % P
            size_l = half

        # ---- flush registers + non-round witness lanes --------------------
        for q in range(Q):
            trace[r0s[q] : r0s[q] + rpq, TSTK0:] = regmat[q]
        consts = self.constant_columns()
        pb.fill_nonround_witnesses(trace, consts)
        return trace, outer_pis

    # -- batched fill helpers ---------------------------------------------
    def _fill_leaf(self, trace, r0s, segs, merges, padded):
        """Segment sponges (batched over queries x segments, sequential
        over the kseg chain) + merge tree (batched per level). Returns the
        per-level node values [(Q, st, CAP), (Q, st/2, CAP), ...]."""
        Q = padded.shape[0]
        stq, kseg = len(segs), len(segs[0][0])
        chunks = padded.reshape(Q, stq, kseg, RATE)
        block_rows = np.asarray([blocks for blocks, _d, _s in segs], dtype=np.int64)  # (st, kseg)
        state = np.zeros((Q * stq, WIDTH), dtype=np.uint64)
        for i in range(kseg):
            state = np.concatenate(
                [chunks[:, :, i].reshape(Q * stq, RATE), state[:, RATE:]], axis=1
            )
            blocks_t, state = pb.permute_record(state)
            bases = (r0s[:, None] + block_rows[None, :, i]).reshape(-1)
            pb.scatter_blocks(trace, bases, blocks_t)
        levels = [state[:, :CAP].reshape(Q, stq, CAP)]
        by_level: dict = {}
        for base, _a, _b, lvl, pair in merges:
            by_level.setdefault(lvl, []).append((pair, base))
        for lvl in range(len(by_level)):
            pairs = sorted(by_level[lvl])
            bases_rel = np.asarray([b for _pr, b in pairs], dtype=np.int64)
            cur = levels[-1]
            npairs = cur.shape[1] // 2
            states = np.concatenate(
                [
                    cur[:, 0::2].reshape(Q * npairs, CAP),
                    cur[:, 1::2].reshape(Q * npairs, CAP),
                    np.zeros((Q * npairs, WIDTH - 2 * CAP), dtype=np.uint64),
                ],
                axis=1,
            )
            blocks_t, out = pb.permute_record(states)
            pb.scatter_blocks(trace, (r0s[:, None] + bases_rel[None, :]).reshape(-1), blocks_t)
            levels.append(out[:, :CAP].reshape(Q, npairs, CAP))
        return levels

    def _fill_stack_regs(self, regmat, pushes, levels, stk0):
        """Stack slot columns as step functions of the push schedule."""
        rpq = self.rows_per_query
        rel = np.arange(rpq)
        by_slot: dict = {}
        for row, slot, ref in pushes:
            by_slot.setdefault(slot, []).append((row, ref))
        for slot, items in by_slot.items():
            rows = np.asarray([r for r, _ in items], dtype=np.int64)
            vals = np.stack([levels[lvl][:, node] for _r, (lvl, node) in items], axis=1)
            idx = np.clip(np.searchsorted(rows, rel, side="right") - 1, 0, len(items) - 1)
            c0 = stk0 + slot * CAP - TSTK0
            regmat[:, :, c0 : c0 + CAP] = vals[:, idx]

    def _fill_chain(self, trace, r0s, absorbs, span, padded, wtab, w0, acc_start):
        """DEEP weight/accumulator chain columns over one sponge span.

        w lane k at absorb step j is gamma^(w0 + 8j + k) (shared across
        queries); the accumulator is the running gamma-weighted sum of the
        absorbed values, starting from `acc_start` ((Q,2) or None).
        Returns the per-step post-update accumulators (Q, nsteps, 2)."""
        P = gl.P
        Q, nvals = padded.shape
        nsteps = nvals // RATE
        lo, hi = span
        # per-step accumulator table (object cumsum keeps exact arithmetic)
        wv = gl.ext_mul_base_v(
            (wtab[w0 : w0 + nvals, 0][None, :], wtab[w0 : w0 + nvals, 1][None, :]), padded
        )
        step_sums = np.stack(
            [
                np.asarray(gl.gl_sum(wv[0].reshape(Q, nsteps, RATE), axis=-1)),
                np.asarray(gl.gl_sum(wv[1].reshape(Q, nsteps, RATE), axis=-1)),
            ],
            axis=-1,
        )
        cum = (np.cumsum(step_sums.astype(object), axis=1)) % P
        if acc_start is not None:
            cum = (cum + acc_start.astype(object)[:, None, :]) % P
        cum = cum.astype(np.uint64)
        # row values: state BEFORE each row's absorb
        relrows = np.arange(lo, hi + 1)
        ab = np.asarray(absorbs, dtype=np.int64)
        spre = np.searchsorted(ab, relrows, side="left")
        wrows = wtab[(w0 + RATE * spre[:, None] + np.arange(RATE)[None, :]).reshape(-1)]
        wrows = wrows.reshape(relrows.shape[0], 2 * RATE)  # (nspan, 16) w columns
        accrows = np.where(
            (spre == 0)[None, :, None],
            (acc_start if acc_start is not None else np.zeros((Q, 2), dtype=np.uint64))[:, None, :],
            cum[:, np.maximum(spre - 1, 0)],
        )
        rows2d = (r0s[:, None] + relrows[None, :]).reshape(-1)
        trace[rows2d[:, None], np.arange(WCH, WCH + 2 * RATE)[None, :]] = np.tile(
            wrows, (Q, 1)
        )
        trace[rows2d[:, None], np.arange(ACCC, ACCC + 2)[None, :]] = accrows.reshape(-1, 2)
        return cum

    def _fill_merkle(self, trace, r0s, path, leaf, sibs, indices, leaf_result_row=None):
        """Batched Merkle path fill: `leaf` (Q, CAP), `sibs` (Q, depth,
        CAP), `indices` (Q,). `leaf_result_row`: when the path chains from
        a preceding perm's result row (FRI pair leaves), level 0's sibling
        witness (and select bit) lives there; otherwise on level 0's first
        round row. Also fills the BITC select bits and the POSA position
        accumulator along the path."""
        Q = leaf.shape[0]
        cur = np.asarray(leaf, dtype=np.uint64)
        sibs = np.asarray(sibs, dtype=np.uint64)
        sel0 = path[0] if leaf_result_row is None else leaf_result_row
        sels = [sel0] + [b - 1 for b in path[1:]]
        capbind = path[-1] + RESULT
        cum = np.zeros(Q, dtype=np.uint64)
        for v, base in enumerate(path):
            bit = ((indices >> v) & 1).astype(np.uint64)
            bitb = bit.astype(bool)[:, None]
            sib = sibs[:, v]
            srow = r0s + sels[v]
            trace[srow[:, None], np.arange(SIB, SIB + CAP)[None, :]] = sib
            trace[srow, BITC] = bit
            trace[srow, POSA] = cum
            cum = cum + (bit << np.uint64(v))
            nxt = sels[v + 1] if v + 1 < len(path) else capbind
            rows_rel = np.arange(sels[v] + 1, nxt + 1)
            trace[(r0s[:, None] + rows_rel[None, :]).reshape(-1), POSA] = np.repeat(
                cum, rows_rel.shape[0]
            )
            lo = np.where(bitb, sib, cur)
            hi = np.where(bitb, cur, sib)
            states = np.concatenate(
                [lo, hi, np.zeros((Q, WIDTH - 2 * CAP), dtype=np.uint64)], axis=1
            )
            blocks_t, out = pb.permute_record(states)
            pb.scatter_blocks(trace, r0s + base, blocks_t)
            cur = out[:, :CAP]
        return cur


def _dot(weights: np.ndarray, values: np.ndarray):
    acc = gl.EXT_ZERO
    for j in range(values.shape[0]):
        acc = gl.ext_add(
            acc,
            gl.ext_mul(
                (int(weights[j, 0]), int(weights[j, 1])),
                (int(values[j, 0]), int(values[j, 1])),
            ),
        )
    return acc


# ---------------------------------------------------------------------------
# outer public inputs + compressed-proof flow
# ---------------------------------------------------------------------------


def build_outer_pis(rair: RecursiveVerifierAir, proof: StarkProof, d: dict,
                    query_indices=None) -> list:
    """The recursive air's public-input vector: a pure function of the
    inner proof's PUBLIC part and the transcript-derived values (the outer
    verifier recomputes and checks every entry natively)."""
    P = gl.P
    gamma, zeta, zeta_g = d["gamma"], d["zeta"], d["zeta_g"]
    j1 = rair.C + rair.nq
    weights = ext_powers(gamma, j1 + rair.C)
    r1z = _dot(weights[:j1], np.concatenate([proof.trace_local, proof.quotient_open]))
    r2z = _dot(weights[j1:], proof.trace_next)
    pis = []
    pis += [zeta[0], zeta[1], zeta_g[0], zeta_g[1], gamma[0], gamma[1]]
    g8 = gl.ext_pow(gamma, RATE)
    gq = gl.ext_pow(gamma, rair.C)
    gp2 = gl.ext_pow(gamma, rair.C + rair.nq)
    pis += [g8[0], g8[1], gq[0], gq[1], gp2[0], gp2[1]]
    pis += [r1z[0], r1z[1], r2z[0], r2z[1]]
    for b in d["betas"]:
        pis += [b[0], b[1]]
    w_n0 = gl.primitive_root_of_unity(rair.n0.bit_length() - 1)
    if query_indices is None:
        query_indices = list(range(rair.Q))
    for qi in query_indices:
        index = d["indices"][qi]
        x = SHIFT * pow(w_n0, index, P) % P
        pis.append(x)
        pis.append(index & ((1 << rair.depth) - 1))
        pis += [int(v) for v in proof.trace_cap[index >> rair.depth]]
        pis += [int(v) for v in proof.quotient_cap[index >> rair.depth]]
        pos = index
        shift_l, root_l, size_l = SHIFT, w_n0, rair.n0
        x_l = x
        for l in range(rair.L):
            half = size_l // 2
            pos_in = pos % half
            mine = 0 if pos < half else 1
            x_pos = shift_l * pow(root_l, pos_in, P) % P
            pis.append(mine)
            pis.append(gl.inv_s(2 * x_pos % P))
            pis.append(pos_in & ((1 << rair.depth_l[l]) - 1))
            pis += [int(v) for v in proof.fri.layer_caps[l][pos_in >> rair.depth_l[l]]]
            pos = pos_in
            shift_l = shift_l * shift_l % P
            root_l = root_l * root_l % P
            size_l = half
            x_l = x_l * x_l % P
        fv = fri_mod.eval_final_poly(proof.fri.final_coeffs, (x_l, 0))
        pis += [fv[0], fv[1]]
    assert len(pis) == rair.num_pis, (len(pis), rair.num_pis)
    return [int(v) % P for v in pis]


@dataclass
class CompressedProof:
    """Inner proof public part (no query rounds) + the recursive proof."""

    inner_public: StarkProof
    outer_proof: StarkProof


def strip_queries(proof: StarkProof) -> StarkProof:
    """The inner proof's public part: caps, openings, final poly, nonce."""
    return StarkProof(
        trace_cap=proof.trace_cap,
        quotient_cap=proof.quotient_cap,
        trace_local=proof.trace_local,
        trace_next=proof.trace_next,
        quotient_open=proof.quotient_open,
        fri=FriProof(
            layer_caps=proof.fri.layer_caps,
            final_coeffs=proof.fri.final_coeffs,
            pow_nonce=proof.fri.pow_nonce,
            query_rounds=[],
        ),
        trace2_cap=proof.trace2_cap,
        trace2_local=proof.trace2_local,
        trace2_next=proof.trace2_next,
    )


def prove_recursive(inner_air, proof: StarkProof, inner_pis, inner_config: StarkConfig,
                    outer_config: StarkConfig, xp=None, rair: RecursiveVerifierAir | None = None):
    """Wrap a full inner proof: returns (rair, CompressedProof)."""
    from ..backend.prover import prove

    if rair is None:
        rair = RecursiveVerifierAir(inner_air, inner_config)
    trace, outer_pis = rair.generate_trace(proof, inner_pis)
    outer_proof = prove(rair, trace, outer_pis, outer_config, xp=xp)
    return rair, CompressedProof(inner_public=strip_queries(proof), outer_proof=outer_proof)


def verify_recursive(inner_air, inner_pis, inner_config: StarkConfig,
                     comp: CompressedProof, outer_config: StarkConfig,
                     rair: RecursiveVerifierAir | None = None) -> None:
    """Verify a compressed proof: native transcript + grinding + quotient
    identity + final-poly/PI derivation, then the recursive STARK proof."""
    if rair is None:
        rair = RecursiveVerifierAir(inner_air, inner_config)
    p = comp.inner_public
    if len(p.fri.layer_caps) != rair.L:
        raise VerificationError("bad FRI layer count")
    if p.fri.final_coeffs.shape[0] != rair.final_len:
        raise VerificationError("bad final poly length")
    if p.trace_local.shape[0] != rair.C or p.quotient_open.shape[0] != rair.nq:
        raise VerificationError("bad opening shape")
    d = derive_challenges(inner_air, p, inner_pis, inner_config)
    if not check_pow(d["pow_challenge"], p.fri.pow_nonce, inner_config.pow_bits):
        raise VerificationError("bad grinding witness")
    check_quotient_identity(inner_air, p, inner_pis, inner_config, d["alphas"], d["zeta"])
    outer_pis = build_outer_pis(rair, p, d)
    verify(rair, comp.outer_proof, outer_pis, outer_config)


# ---------------------------------------------------------------------------
# Query-sharded recursion: wrap wide inner airs as a DAG of outer proofs
# ---------------------------------------------------------------------------


@dataclass
class CompressedProofDag:
    """Inner public part + one outer proof per query shard. The shards
    jointly cover every FRI query of the inner proof (the last shard pads
    by repeating queries, so all shards share one air/compiled prover).
    `ext_op_proof` (optional): an ExtOpAir proof of the quotient identity
    (starks/ext_op_air.py) — when present, verification does NO native
    `inner.eval`."""

    inner_public: StarkProof
    outer_proofs: list
    shard: int
    ext_op_proof: StarkProof | None = None


def _shard_indices(Q: int, shard: int, indices=None):
    """Partition the query slots into shard-sized slices, padding the last
    by repetition (duplicate queries re-prove the same checks: sound).

    With `indices` (the transcript-derived per-slot LDE indices), slots
    whose index repeats are DEDUPLICATED first: a slot's opened data is a
    pure function of its index, so proving one representative per unique
    index covers every slot (small inner airs draw 84 queries from a
    32-leaf tree; the wrap shrinks ~3x). Both prover and verifier derive
    the same representative list from the same transcript."""
    slots = list(range(Q))
    if indices is not None:
        seen = set()
        slots = []
        for qi in range(Q):
            if indices[qi] not in seen:
                seen.add(indices[qi])
                slots.append(qi)
    out = []
    for lo in range(0, len(slots), shard):
        idxs = slots[lo : lo + shard]
        while len(idxs) < shard:
            idxs.append(idxs[-1])
        out.append(idxs)
    return out


def prove_recursive_dag(inner_air, proof: StarkProof, inner_pis,
                        inner_config: StarkConfig, outer_config: StarkConfig,
                        shard: int, xp=None, rair: RecursiveVerifierAir | None = None,
                        ext_op_air=None):
    """Wrap a full inner proof as ceil(Q/shard) outer proofs, each covering
    `shard` queries — the path to recursing over the wide BLS starks whose
    single-air wrap exceeds device memory (docs/RECURSION.md). One air (and
    one jitted prover) serves every shard. `ext_op_air`: an ExtOpAir for
    (inner_air, inner_config) — when given, the dag additionally carries a
    proof of the quotient identity so verification runs no native
    `inner.eval`."""
    from ..backend.prover import StarkProver

    if rair is None:
        rair = RecursiveVerifierAir(inner_air, inner_config, num_queries=shard)
    prover = StarkProver(rair, outer_config, xp=xp)
    d = derive_challenges(inner_air, proof, inner_pis, inner_config)
    # pipeline host fills with device proves: while the accelerator proves
    # shard k, a worker thread fills shard k+1's trace (the fills are tens
    # of seconds of host work per shard at the production point)
    from concurrent.futures import ThreadPoolExecutor

    shards = _shard_indices(inner_config.num_queries, shard, d["indices"])
    outers = []
    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(rair.generate_trace, proof, inner_pis, shards[0])
        for k, idxs in enumerate(shards):
            trace, opis = fut.result()
            if k + 1 < len(shards):
                fut = ex.submit(rair.generate_trace, proof, inner_pis, shards[k + 1])
            outers.append(prover.prove(trace, opis))
    eproof = None
    if ext_op_air is not None:
        from .ext_op_air import prove_ext_op

        eproof = prove_ext_op(ext_op_air, proof, inner_pis, outer_config, xp=xp)
    return rair, CompressedProofDag(
        inner_public=strip_queries(proof), outer_proofs=outers, shard=shard,
        ext_op_proof=eproof,
    )


def verify_recursive_dag(inner_air, inner_pis, inner_config: StarkConfig,
                         dag: CompressedProofDag, outer_config: StarkConfig,
                         rair: RecursiveVerifierAir | None = None,
                         ext_op_air=None) -> None:
    """Native scalar checks once, then one outer verification per shard;
    the shard index sets must cover every inner query. With `ext_op_air`
    and a dag carrying an ext-op proof, the quotient identity is checked
    via that proof instead of native `inner.eval`."""
    if rair is None:
        rair = RecursiveVerifierAir(inner_air, inner_config, num_queries=dag.shard)
    p = dag.inner_public
    if len(p.fri.layer_caps) != rair.L:
        raise VerificationError("bad FRI layer count")
    if p.fri.final_coeffs.shape[0] != rair.final_len:
        raise VerificationError("bad final poly length")
    if p.trace_local.shape[0] != rair.C or p.quotient_open.shape[0] != rair.nq:
        raise VerificationError("bad opening shape")
    d = derive_challenges(inner_air, p, inner_pis, inner_config)
    if not check_pow(d["pow_challenge"], p.fri.pow_nonce, inner_config.pow_bits):
        raise VerificationError("bad grinding witness")
    if ext_op_air is not None and dag.ext_op_proof is not None:
        from .ext_op_air import verify_ext_op

        verify_ext_op(ext_op_air, p, inner_pis, dag.ext_op_proof, outer_config, d=d)
    else:
        check_quotient_identity(inner_air, p, inner_pis, inner_config, d["alphas"], d["zeta"])
    shards = _shard_indices(inner_config.num_queries, dag.shard, d["indices"])
    if len(dag.outer_proofs) != len(shards):
        raise VerificationError("bad shard count")
    covered = set()
    for idxs, op in zip(shards, dag.outer_proofs):
        outer_pis = build_outer_pis(rair, p, d, idxs)
        verify(rair, op, outer_pis, outer_config)
        covered.update(d["indices"][qi] for qi in idxs)
    # coverage over transcript-derived LDE indices: a slot's opened data is
    # a pure function of its index, so covering every unique index covers
    # every query slot
    if covered != {d["indices"][qi] for qi in range(inner_config.num_queries)}:
        raise VerificationError("query shards do not cover all queries")
