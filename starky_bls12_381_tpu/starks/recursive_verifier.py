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
final-poly evaluation, and every index-derived selector (path bits,
1/(2x) tables, cap-entry selection) — each a pure function of public,
transcript-bound data, supplied to the AIR as public inputs. This is
stage (c) of docs/RECURSION.md's staged trust model.

The headline effect matches the reference's reason for recursion: proof
COMPRESSION. A `CompressedProof` ships the inner proof's public part
(caps + openings + final poly, KBs) plus one outer STARK proof; the
query rounds — 60 MB for the wide BLS starks — never leave the prover.

Layout: all Poseidon work (leaf sponges, digest trees, Merkle levels,
FRI pair leaves) shares ONE poseidon_block column group, scheduled on
disjoint 31-row windows; per-query scalars live in column registers
pinned across the query's row region (the FinalExponentiateAir register
idiom); the DEEP weight/accumulator chain rides extra columns updated on
sponge absorb rows. Every constraint is degree <= 3 (rate-1 config).
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
RPP = pb.ROWS_PER_PERM  # 31

# trace columns after the shared poseidon block
SIB = pb.BLOCK_COLS  # 4: merkle sibling digests
WCH = SIB + CAP  # 16: DEEP weights w_0..w_7 as ext pairs
ACCC = WCH + 2 * RATE  # 2: DEEP accumulator (ext)
REG0 = ACCC + 2  # register file start

# constant columns after the shared poseidon block constants
C_CARRY = pb.C_TOTAL  # sponge capacity-carry result rows
C_DEEPW = pb.C_TOTAL + 1  # absorb rows: weight/acc update on the transition
C_PINW = pb.C_TOTAL + 2  # weight/acc pin rows
C_PINREG = pb.C_TOTAL + 3  # register pin rows
C_TOTAL = pb.C_TOTAL + 4

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

        # ---- register file (columns; values pinned per query region) ----
        cur = [REG0]

        def alloc(k):
            c = cur[0]
            cur[0] += k
            return c

        self.R_TN = [alloc(CAP) for _ in range(2 * self.st - 1)]  # trace digest tree
        self.R_QN = [alloc(CAP) for _ in range(2 * self.sq - 1)]  # quotient digest tree
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
        self.PI_Q = []  # per-query sub-layout
        per_q = {}
        per_q["x"] = take(1)
        per_q["bits"] = take(self.depth)  # low index bits (trace+quotient paths)
        per_q["tcap"] = take(CAP)
        per_q["qcap"] = take(CAP)
        per_q["layers"] = []
        for l in range(self.L):
            per_q["layers"].append(
                {
                    "mine": take(1),
                    "xinv": take(1),  # 1/(2 * x_pos_l)
                    "bits": take(self.depth_l[l]),
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
        # trace leaf: segment sponges (chained perms per segment)
        p["t_seg"] = []
        t_absorb = []
        for _seg in range(self.st):
            blocks = [perm() for _ in range(self.ksegt)]
            t_absorb.extend(blocks)
            p["t_seg"].append((blocks, blocks[-1] + N_ROUNDS))  # (bases, digest row)
        p["t_absorb"] = t_absorb
        p["t_span"] = (t_absorb[0], p["t_seg"][-1][1])  # weight chain live range
        # trace digest fold tree over R_TN registers
        p["t_tree"] = self._tree_plan(self.st, perm)
        # trace merkle path
        p["t_path"] = [perm() for _ in range(self.depth)]
        # quotient leaf + tree + path
        p["q_seg"] = []
        q_absorb = []
        for _seg in range(self.sq):
            blocks = [perm() for _ in range(self.ksegq)]
            q_absorb.extend(blocks)
            p["q_seg"].append((blocks, blocks[-1] + N_ROUNDS))
        p["q_absorb"] = q_absorb
        p["q_span"] = (q_absorb[0], p["q_seg"][-1][1])
        p["q_tree"] = self._tree_plan(self.sq, perm)
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

    def _tree_plan(self, s, perm):
        """Fold-tree perms pairing adjacent nodes (matches
        fold_segment_digests): list of (perm_base, a_node, b_node, out_node).
        Node ids index R_TN/R_QN: leaves 0..s-1, internals s..2s-2."""
        nodes = list(range(s))
        nxt = s
        out = []
        while len(nodes) > 1:
            paired = []
            for i in range(0, len(nodes), 2):
                out.append((perm(), nodes[i], nodes[i + 1], nxt))
                paired.append(nxt)
                nxt += 1
            nodes = paired
        return out

    # ------------------------------------------------------------------
    # constants
    # ------------------------------------------------------------------
    def constant_columns(self):
        out = np.zeros((self.num_rows, C_TOTAL), dtype=np.uint64)
        p = self.plan
        for q in range(self.Q):
            r0 = q * self.rows_per_query
            for base in p["perms"]:
                pb.write_round_constants(out, r0 + base)
            # capacity carry within each multi-chunk segment
            for seg_list in (p["t_seg"], p["q_seg"]):
                for blocks, _dig in seg_list:
                    for b in blocks[1:]:
                        out[r0 + b - 1, C_CARRY] = 1
            # DEEP weight chain: updates on absorb rows, pins elsewhere
            for span, absorbs in ((p["t_span"], p["t_absorb"]), (p["q_span"], p["q_absorb"])):
                lo, hi = span
                for rr in range(lo, hi):
                    out[r0 + rr, C_PINW] = 1
                for a in absorbs:
                    out[r0 + a, C_PINW] = 0
                    out[r0 + a, C_DEEPW] = 1
            # registers pinned across the region (break on its last row)
            out[r0 : r0 + self.rows_per_query - 1, C_PINREG] = 1
        return out

    # ------------------------------------------------------------------
    # constraints
    # ------------------------------------------------------------------
    def _pin_ext(self, ctx, col):
        return (ctx.local(col), ctx.local(col + 1))

    def eval(self, ctx):
        s, s_next = pb.eval_block(ctx)
        c_carry = ctx.const(C_CARRY)
        c_deepw = ctx.const(C_DEEPW)
        c_pinw = ctx.const(C_PINW)
        c_pinreg = ctx.const(C_PINREG)

        # capacity carry at marked result rows (next block overwrites rate)
        ctx.constraint_transition(c_carry[None] * (ctx.next(pb.S + RATE, WIDTH - RATE) - s[RATE:]))

        # register pinning
        npin = self.num_cols - REG0
        ctx.constraint_transition(
            c_pinreg[None] * (ctx.next(REG0, npin) - ctx.local(REG0, npin))
        )

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

        # per-query fixed-row wiring
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

        def reg(col, width=2):
            return ctx.local(col, width)

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

        # ---- trace leaf sponges ----------------------------------------
        first_absorb = p["t_absorb"][0]
        # chain start: W = [1, gamma, ...] enforced by within-row chain + W0==1
        ctx.constraint(ctx.local(WCH) - 1, ROW(first_absorb))
        ctx.constraint(ctx.local(WCH + 1), ROW(first_absorb))
        ctx.constraint(ctx.local(ACCC), ROW(first_absorb))
        ctx.constraint(ctx.local(ACCC + 1), ROW(first_absorb))
        for seg_i, (blocks, dig_row) in enumerate(p["t_seg"]):
            # fresh sponge state: capacity lanes zero on the first block
            ctx.constraint(s[RATE:], ROW(blocks[0]))
            # segment digest -> leaf register
            ctx.constraint(s[:CAP] - reg(self.R_TN[seg_i], CAP), ROW(dig_row))
        # A register == trace-part DEEP sum at the sponge end
        span_end = p["t_span"][1]
        ctx.constraint(ctx.local(ACCC) - ctx.local(self.R_A), ROW(span_end))
        ctx.constraint(ctx.local(ACCC + 1) - ctx.local(self.R_A + 1), ROW(span_end))

        # ---- digest fold trees ------------------------------------------
        for tree, regs in ((p["t_tree"], self.R_TN), (p["q_tree"], self.R_QN)):
            for base, a, b, out in tree:
                ctx.constraint(s[:CAP] - reg(regs[a], CAP), ROW(base))
                ctx.constraint(s[CAP : 2 * CAP] - reg(regs[b], CAP), ROW(base))
                ctx.constraint(s[2 * CAP :], ROW(base))
                ctx.constraint(s[:CAP] - reg(regs[out], CAP), ROW(base + N_ROUNDS))

        # ---- merkle paths (trace + quotient share the index bits) -------
        for path, root_reg, cap_field in (
            (p["t_path"], self.R_TN[2 * self.st - 2], "tcap"),
            (p["q_path"], self.R_QN[2 * self.sq - 2], "qcap"),
        ):
            self._eval_merkle(
                ctx,
                ROW,
                s,
                s_next,
                path,
                lambda w=CAP, rr=root_reg: ctx.local(rr, w),
                [qpi("bits", v) for v in range(self.depth)],
                qpi_vec(cap_field, CAP),
            )

        # ---- quotient sponge chain start ---------------------------------
        qa0 = p["q_absorb"][0]
        ctx.constraint(ctx.local(WCH) - gq[0], ROW(qa0))
        ctx.constraint(ctx.local(WCH + 1) - gq[1], ROW(qa0))
        ctx.constraint(ctx.local(ACCC) - ctx.local(self.R_A), ROW(qa0))
        ctx.constraint(ctx.local(ACCC + 1) - ctx.local(self.R_A + 1), ROW(qa0))
        for seg_i, (blocks, dig_row) in enumerate(p["q_seg"]):
            ctx.constraint(s[RATE:], ROW(blocks[0]))
            ctx.constraint(s[:CAP] - reg(self.R_QN[seg_i], CAP), ROW(dig_row))
        qspan_end = p["q_span"][1]
        ctx.constraint(ctx.local(ACCC) - ctx.local(self.R_R1X), ROW(qspan_end))
        ctx.constraint(ctx.local(ACCC + 1) - ctx.local(self.R_R1X + 1), ROW(qspan_end))

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
            # path from the pair digest to the layer cap
            if path:
                self._eval_merkle(
                    ctx,
                    ROW,
                    s,
                    s_next,
                    path,
                    lambda w=CAP, base=pair_base: None,  # leaf = perm result (chained below)
                    [qpi("bits", v, layer=l) for v in range(self.depth_l[l])],
                    qpi_vec("fcap", CAP, layer=l),
                    leaf_result_row=pair_base + N_ROUNDS,
                )
            else:
                fcap = qpi_vec("fcap", CAP, layer=l)
                ctx.constraint(s[:CAP] - fcap, ROW(pair_base + N_ROUNDS))

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

    def _eval_merkle(self, ctx, ROW, s, s_next, path, leaf_fn, bits, cap_pi, leaf_result_row=None):
        """Merkle path constraints over chained perm blocks.

        Level 0's input either loads from a register leaf (`leaf_fn`) on
        the first round row, or chains from a preceding perm's result row
        (`leaf_result_row`, used by FRI pair leaves). Direction bits are
        public inputs; sibling digests are witness cells (SIB columns) on
        the binding row of each level."""
        for v, base in enumerate(path):
            bit = bits[v]
            if v == 0 and leaf_result_row is None:
                leaf = leaf_fn()
                sib = ctx.local(SIB, CAP)
                ctx.constraint(s[:CAP] - (bit * sib + (1 - bit) * leaf), ROW(base))
                ctx.constraint(s[CAP : 2 * CAP] - (bit * leaf + (1 - bit) * sib), ROW(base))
                ctx.constraint(s[2 * CAP :], ROW(base))
            else:
                # chain from the previous result row (leaf_result_row for
                # v==0, else the previous level's result row)
                prow = leaf_result_row if v == 0 else path[v - 1] + N_ROUNDS
                cur = s[:CAP]
                sib = ctx.local(SIB, CAP)
                nxt_lo = ctx.next(pb.S, CAP)
                nxt_hi = ctx.next(pb.S + CAP, CAP)
                nxt_cap = ctx.next(pb.S + 2 * CAP, WIDTH - 2 * CAP)
                ctx.constraint(nxt_lo - (bit * sib + (1 - bit) * cur), ROW(prow))
                ctx.constraint(nxt_hi - (bit * cur + (1 - bit) * sib), ROW(prow))
                ctx.constraint(nxt_cap, ROW(prow))
        ctx.constraint(s[:CAP] - cap_pi, ROW(path[-1] + N_ROUNDS))

    # ------------------------------------------------------------------
    # trace generation
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
        trace = np.zeros((self.num_rows, self.num_cols), dtype=np.uint64)
        consts = self.constant_columns()
        p = self.plan
        gamma = d["gamma"]
        zeta, zeta_g = d["zeta"], d["zeta_g"]
        j1 = self.C + self.nq
        weights = ext_powers(gamma, j1 + self.C)
        r1z = _dot(weights[:j1], np.concatenate([proof.trace_local, proof.quotient_open]))
        r2z = _dot(weights[j1:], proof.trace_next)
        w_n0 = gl.primitive_root_of_unity(self.n0.bit_length() - 1)

        for q, qi in enumerate(query_indices):
            qr = proof.fri.query_rounds[qi]
            r0 = q * self.rows_per_query
            regs = {}

            def set_reg(col, vals):
                vals = [int(v) % P for v in vals]
                regs[col] = vals
                trace[r0 : r0 + self.rows_per_query, col : col + len(vals)] = vals

            # --- trace leaf sponges + DEEP chain -------------------------
            row_vals = [int(v) % P for v in qr.trace_row]
            padded_t = row_vals + [0] * (self.st * self.ksegt * RATE - self.C)
            digs = self._fill_sponge(
                trace, r0, p["t_seg"], padded_t, gamma, 1, (0, 0), p["t_span"]
            )
            for i, dg in enumerate(digs):
                set_reg(self.R_TN[i], dg)
            a_val = self._acc_after(padded_t, weights[: len(padded_t)])
            set_reg(self.R_A, a_val)
            # --- trace digest tree ---------------------------------------
            self._fill_tree(trace, r0, p["t_tree"], self.R_TN, regs, set_reg)
            # --- trace merkle path ---------------------------------------
            index = qr.index
            self._fill_merkle(
                trace, r0, p["t_path"], regs[self.R_TN[2 * self.st - 2]],
                qr.trace_path, index,
            )
            # --- quotient sponge + tree + path ---------------------------
            q_vals = [int(v) % P for v in qr.quotient_row]
            padded_q = q_vals + [0] * (self.sq * self.ksegq * RATE - self.nq)
            gq = gl.ext_pow(gamma, self.C)
            digs = self._fill_sponge(
                trace, r0, p["q_seg"], padded_q, gamma, gq, tuple(a_val), p["q_span"]
            )
            for i, dg in enumerate(digs):
                set_reg(self.R_QN[i], dg)
            r1x = self._acc_after(padded_q, _wmul(ext_powers(gamma, len(padded_q)), gq), start=tuple(a_val))
            set_reg(self.R_R1X, r1x)
            self._fill_tree(trace, r0, p["q_tree"], self.R_QN, regs, set_reg)
            self._fill_merkle(
                trace, r0, p["q_path"], regs[self.R_QN[2 * self.sq - 2]],
                qr.quotient_path, index,
            )
            # --- DEEP scalars ---------------------------------------------
            x = SHIFT * pow(w_n0, index, P) % P
            iv1 = gl.ext_inv(gl.ext_sub((x, 0), zeta))
            iv2 = gl.ext_inv(gl.ext_sub((x, 0), zeta_g))
            set_reg(self.R_IV1, iv1)
            set_reg(self.R_IV2, iv2)
            gp2 = gl.ext_pow(gamma, self.C + self.nq)
            f1 = gl.ext_mul(gl.ext_sub(tuple(r1x), r1z), iv1)
            f2 = gl.ext_mul(gl.ext_sub(gl.ext_mul(gp2, tuple(a_val)), r2z), iv2)
            value = gl.ext_add(f1, f2)
            set_reg(self.R_VAL, value)
            # --- FRI layers -------------------------------------------------
            pos = index
            shift_l, root_l, size_l = SHIFT, w_n0, self.n0
            for l, (pair_base, path) in enumerate(p["fri"]):
                st = qr.steps[l]
                half = size_l // 2
                pos_in = pos % half
                pair = [
                    (int(st.pair[0, 0]), int(st.pair[0, 1])),
                    (int(st.pair[1, 0]), int(st.pair[1, 1])),
                ]
                mine = 0 if pos < half else 1
                assert pair[mine] == tuple(int(v) for v in value), "fold chain mismatch"
                state = [pair[0][0], pair[0][1], pair[1][0], pair[1][1]] + [0] * (WIDTH - 4)
                out = pb.fill_permutation(trace, r0 + pair_base, state)
                x_pos = shift_l * pow(root_l, pos_in, P) % P
                value = fri_mod.fold_scalar(pair[0], pair[1], d["betas"][l], x_pos)
                set_reg(self.R_FV[l], value)
                if path:
                    self._fill_merkle(
                        trace, r0, path, out[:CAP], st.path, pos_in,
                        leaf_result_row=pair_base + N_ROUNDS,
                    )
                pos = pos_in
                shift_l = shift_l * shift_l % P
                root_l = root_l * root_l % P
                size_l = half

        pb.fill_nonround_witnesses(trace, consts)
        return trace, outer_pis

    # -- fill helpers ----------------------------------------------------
    def _fill_sponge(self, trace, r0, segs, padded, gamma, w_start, acc_start, span):
        """Fill segment sponges and the W/ACC chain columns; returns the
        list of segment digests."""
        P = gl.P
        digs = []
        kseg = len(segs[0][0])
        # sponge permutations
        ci = 0
        for blocks, _dig in segs:
            state = [0] * WIDTH
            for b in blocks:
                chunk = padded[ci * RATE : (ci + 1) * RATE]
                ci += 1
                state = [v % P for v in chunk] + state[RATE:]
                state = pb.fill_permutation(trace, r0 + b, state)
            digs.append(state[:CAP])
        # W/ACC chain across the span
        w = [gl.ext_mul(w_start if isinstance(w_start, tuple) else (w_start, 0), gl.ext_pow(gamma, k)) for k in range(RATE)]
        g8 = gl.ext_pow(gamma, RATE)
        acc = tuple(int(v) % P for v in acc_start)
        absorbs = {r0 + b for blocks, _d in segs for b in blocks}
        lo, hi = span
        ci = 0
        for rr in range(r0 + lo, r0 + hi + 1):
            for k in range(RATE):
                trace[rr, WCH + 2 * k] = w[k][0]
                trace[rr, WCH + 2 * k + 1] = w[k][1]
            trace[rr, ACCC] = acc[0]
            trace[rr, ACCC + 1] = acc[1]
            if rr in absorbs:
                chunk = padded[ci * RATE : (ci + 1) * RATE]
                ci += 1
                for k in range(RATE):
                    acc = gl.ext_add(acc, gl.ext_scalar_mul(w[k], chunk[k]))
                w = [gl.ext_mul(wk, g8) for wk in w]
        return digs

    def _acc_after(self, padded, weights, start=(0, 0)):
        acc = tuple(int(v) for v in start)
        for j, v in enumerate(padded):
            acc = gl.ext_add(acc, gl.ext_scalar_mul((int(weights[j][0]), int(weights[j][1])), v))
        return [acc[0], acc[1]]

    def _fill_tree(self, trace, r0, tree, regs_cols, regs, set_reg):
        for base, a, b, out in tree:
            da, db = regs[regs_cols[a]], regs[regs_cols[b]]
            state = list(da) + list(db) + [0] * (WIDTH - 2 * CAP)
            res = pb.fill_permutation(trace, r0 + base, state)
            set_reg(regs_cols[out], res[:CAP])

    def _fill_merkle(self, trace, r0, path, leaf, sibs, index, leaf_result_row=None):
        """leaf_result_row: when the path chains from a preceding perm's
        result row (FRI pair leaves), level 0's sibling witness lives
        there; otherwise it lives on level 0's first round row."""
        P = gl.P
        cur = [int(v) % P for v in leaf]
        for v, base in enumerate(path):
            bit = (index >> v) & 1
            sib = [int(x) % P for x in sibs[v]]
            if v == 0:
                srow = r0 + base if leaf_result_row is None else r0 + leaf_result_row
            else:
                srow = r0 + path[v - 1] + N_ROUNDS
            trace[srow, SIB : SIB + CAP] = sib
            pair = (sib, cur) if bit else (cur, sib)
            state = list(pair[0]) + list(pair[1]) + [0] * (WIDTH - 2 * CAP)
            out = pb.fill_permutation(trace, r0 + base, state)
            cur = out[:CAP]
            assert tuple(cur) == ps.compress_s(*pair)
        return cur


def _wmul(weights: np.ndarray, scale) -> np.ndarray:
    """Scale an (n,2) ext power table by an ext scalar."""
    out = np.empty_like(weights)
    for j in range(weights.shape[0]):
        v = gl.ext_mul((int(weights[j, 0]), int(weights[j, 1])), scale)
        out[j] = v
    return out


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
        pis += [(index >> v) & 1 for v in range(rair.depth)]
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
            pis += [(pos_in >> v) & 1 for v in range(rair.depth_l[l])]
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
    n0 = rair.n0
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
    by repeating queries, so all shards share one air/compiled prover)."""

    inner_public: StarkProof
    outer_proofs: list
    shard: int


def _shard_indices(Q: int, shard: int):
    """Partition 0..Q-1 into shard-sized slices, padding the last by
    repetition (duplicate queries re-prove the same checks: sound)."""
    out = []
    for lo in range(0, Q, shard):
        idxs = list(range(lo, min(lo + shard, Q)))
        while len(idxs) < shard:
            idxs.append(idxs[-1])
        out.append(idxs)
    return out


def prove_recursive_dag(inner_air, proof: StarkProof, inner_pis,
                        inner_config: StarkConfig, outer_config: StarkConfig,
                        shard: int, xp=None, rair: RecursiveVerifierAir | None = None):
    """Wrap a full inner proof as ceil(Q/shard) outer proofs, each covering
    `shard` queries — the path to recursing over the wide BLS starks whose
    single-air wrap exceeds device memory (docs/RECURSION.md). One air (and
    one jitted prover) serves every shard."""
    from ..backend.prover import StarkProver

    if rair is None:
        rair = RecursiveVerifierAir(inner_air, inner_config, num_queries=shard)
    prover = StarkProver(rair, outer_config, xp=xp)
    outers = []
    for idxs in _shard_indices(inner_config.num_queries, shard):
        trace, opis = rair.generate_trace(proof, inner_pis, idxs)
        outers.append(prover.prove(trace, opis))
    return rair, CompressedProofDag(
        inner_public=strip_queries(proof), outer_proofs=outers, shard=shard
    )


def verify_recursive_dag(inner_air, inner_pis, inner_config: StarkConfig,
                         dag: CompressedProofDag, outer_config: StarkConfig,
                         rair: RecursiveVerifierAir | None = None) -> None:
    """Native scalar checks once, then one outer verification per shard;
    the shard index sets must cover every inner query."""
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
    check_quotient_identity(inner_air, p, inner_pis, inner_config, d["alphas"], d["zeta"])
    shards = _shard_indices(inner_config.num_queries, dag.shard)
    if len(dag.outer_proofs) != len(shards):
        raise VerificationError("bad shard count")
    covered = set()
    for idxs, op in zip(shards, dag.outer_proofs):
        outer_pis = build_outer_pis(rair, p, d, idxs)
        verify(rair, op, outer_pis, outer_config)
        covered.update(idxs)
    if covered != set(range(inner_config.num_queries)):
        raise VerificationError("query shards do not cover all queries")
