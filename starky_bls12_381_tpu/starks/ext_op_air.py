"""ExtOpAir: proves an inner proof's quotient identity as an op tape.

The second recursion level's missing half (docs/RECURSION.md item 2; the
reference proves the same computation inside its plonky2 wrap via
`eval_ext_circuit`, aggregate_proof.rs:417-451): `check_quotient_identity`
is a straight-line GF(p^2) computation over the inner proof's opened
values; backend/optape.py records it once per (inner air, config) as a
static tape, and this AIR proves the tape's execution:

* one tape node per row: leaf nodes carry their value in the public LEAF
  columns (LV0/LV1), op nodes compute O = A op B with constant op-selector
  columns (ext add/sub/mul/neg, all degree <= 3);
* operand WIRING is the two-phase grand-product permutation argument
  (backend/permutation.py): every operand cell (A/B) is copy-classed to
  its producer's value cell (O of an op row, LV of a leaf row);
* the two combined-constraint outputs are bound to public inputs at their
  producing rows; the verifier checks them natively against
  Z_H(zeta) * sum_k zeta^{n k} Q_k(zeta) from the inner proof's public
  quotient openings — no native `air.eval` anywhere;
* the LEAF columns are bound publicly: the verifier builds the full leaf
  vector (openings + constant-column evals at zeta + inner PIs + filter
  values + alphas — all public data), evaluates its interpolating
  polynomial at the OUTER zeta, and compares against the outer proof's
  own LV openings (Schwartz-Zippel over the outer domain).

With this, `verify_ext_op` replaces the verifier's quotient-identity
evaluation by one outer STARK check whose cost is independent of the
inner air's constraint count.
"""

from __future__ import annotations

import numpy as np

from ..backend.air import ROW, Air
from ..backend.config import StarkConfig
from ..backend.optape import (
    ADD,
    LEAF,
    MUL,
    NEG,
    SUB,
    L_INT,
    extract_identity_tape,
    tape_leaf_values,
)
from ..backend.permutation import CopyConstraintSystem
from ..backend.verifier import VerificationError, derive_challenges, verify
from ..fields import goldilocks as gl

# witness columns
A0, A1, B0, B1, O0, O1, LV0, LV1 = range(8)
_SLOTS = [A0, A1, B0, B1, O0, O1, LV0, LV1]
# slot indices (into _SLOTS) used by the copy classes
_S_A, _S_B, _S_O, _S_LV = 0, 2, 4, 6


def next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


class ExtOpAir(Air):
    """One instance per (inner air, inner config)."""

    num_cols = 8
    num_pis = 4  # acc_0, acc_1 as ext pairs

    def __init__(self, inner_air, inner_config: StarkConfig):
        self.inner = inner_air
        self.icfg = inner_config
        tape, filts = extract_identity_tape(inner_air, inner_config)
        self.tape = tape
        self.filts = filts
        self.num_pis = 4  # 2 outputs x ext pair
        n = next_pow2(len(tape))
        self.num_rows = max(n, 8)
        self.out_rows = list(tape.outputs)

        # ---- constant columns: op selectors + copy labels ----------------
        nt = len(tape.ops)
        ops_arr = np.zeros(nt, dtype=np.int64)
        a_arr = np.zeros(nt, dtype=np.int64)
        b_arr = np.zeros(nt, dtype=np.int64)
        for i, (op, a, b) in enumerate(tape.ops):
            ops_arr[i] = op
            a_arr[i] = a
            b_arr[i] = b
        self._ops_arr, self._a_arr, self._b_arr = ops_arr, a_arr, b_arr
        sel = np.zeros((self.num_rows, 4), dtype=np.uint64)
        for k, opc in enumerate((ADD, SUB, MUL, NEG)):
            sel[np.nonzero(ops_arr == opc)[0], k] = 1
        self._sel = sel

        # ---- copy classes ------------------------------------------------
        ccs = CopyConstraintSystem(self.num_rows, _SLOTS, num_sets=2)
        is_leaf = ops_arr == LEAF
        # consumers[src] = list of (slot, row): operand cells reading src
        consumers: dict[int, list] = {}
        for i in range(nt):
            if is_leaf[i]:
                continue
            consumers.setdefault(int(a_arr[i]), []).append((_S_A, i))
            if ops_arr[i] != NEG:
                consumers.setdefault(int(b_arr[i]), []).append((_S_B, i))
        for src, cells in consumers.items():
            src_slot = _S_LV if is_leaf[src] else _S_O
            # two parallel classes: ext component 0 and component 1
            ccs.connect([(src_slot, src)] + cells)
            ccs.connect([(src_slot + 1, src)] + [(s + 1, r) for s, r in cells])
        self.ccs = ccs
        self.num_cols2 = ccs.num_cols2
        self.num_phase_challenges = ccs.num_phase_challenges
        self._labels = ccs.label_columns()
        self._const = np.concatenate([sel, self._labels], axis=1)

    def constant_columns(self):
        return self._const

    def generate_trace2(self, trace, challenges):
        return self.ccs.generate_trace2(trace, challenges)

    # ------------------------------------------------------------------
    def eval(self, ctx):
        s_add = ctx.const(0)
        s_sub = ctx.const(1)
        s_mul = ctx.const(2)
        s_neg = ctx.const(3)
        a = (ctx.local(A0), ctx.local(A1))
        b = (ctx.local(B0), ctx.local(B1))
        o = (ctx.local(O0), ctx.local(O1))
        ctx.constraint(s_add * (o[0] - (a[0] + b[0])))
        ctx.constraint(s_add * (o[1] - (a[1] + b[1])))
        ctx.constraint(s_sub * (o[0] - (a[0] - b[0])))
        ctx.constraint(s_sub * (o[1] - (a[1] - b[1])))
        ctx.constraint(s_mul * (o[0] - (a[0] * b[0] + gl.W_EXT * (a[1] * b[1]))))
        ctx.constraint(s_mul * (o[1] - (a[0] * b[1] + a[1] * b[0])))
        ctx.constraint(s_neg * (o[0] + a[0]))
        ctx.constraint(s_neg * (o[1] + a[1]))
        # outputs -> public inputs at their producing rows
        for k, r in enumerate(self.out_rows):
            ctx.constraint(ctx.local(O0) - ctx.pi(2 * k), ROW(r))
            ctx.constraint(ctx.local(O1) - ctx.pi(2 * k + 1), ROW(r))
        # copy wiring (labels live after the 4 selector columns)
        self.ccs.eval(ctx, const_base=4)

    # ------------------------------------------------------------------
    def leaf_vector(self, leaves: dict) -> np.ndarray:
        """(num_rows, 2) public leaf-value columns (zeros on op rows)."""
        out = np.zeros((self.num_rows, 2), dtype=np.uint64)
        idx = np.nonzero(self._ops_arr == LEAF)[0]
        for i in idx:
            kind, j = int(self._a_arr[i]), int(self._b_arr[i])
            if kind == L_INT:
                out[i] = (np.uint64(j % gl.P), np.uint64(0))
            else:
                out[i] = leaves[kind][j]
        return out

    def node_values(self, leaves: dict) -> np.ndarray:
        """(nt, 2) evaluated tape (native C kernel when available)."""
        from ..backend import tape_native as tn

        if tn.available():
            return tn.eval_tape(self.tape, leaves)
        vals = np.zeros((len(self.tape.ops), 2), dtype=np.uint64)
        _fill_eval_py(self.tape, leaves, vals)
        return vals

    def generate_trace(self, inner_proof, inner_pis, d=None):
        """Outer witness from the inner proof's PUBLIC part. Returns
        (trace, outer_pis)."""
        if d is None:
            d = derive_challenges(self.inner, inner_proof, inner_pis, self.icfg)
        leaves = tape_leaf_values(self.inner, inner_proof, inner_pis, self.icfg, d, self.filts)
        vals = self.node_values(leaves)
        nt = vals.shape[0]
        trace = np.zeros((self.num_rows, self.num_cols), dtype=np.uint64)
        is_op = self._ops_arr != LEAF
        rows = np.nonzero(is_op)[0]
        trace[rows, A0] = vals[self._a_arr[rows], 0]
        trace[rows, A1] = vals[self._a_arr[rows], 1]
        hasb = is_op & (self._ops_arr != NEG)
        rows_b = np.nonzero(hasb)[0]
        trace[rows_b, B0] = vals[self._b_arr[rows_b], 0]
        trace[rows_b, B1] = vals[self._b_arr[rows_b], 1]
        trace[rows, O0] = vals[rows, 0]
        trace[rows, O1] = vals[rows, 1]
        lv = self.leaf_vector(leaves)
        trace[:, LV0] = lv[:, 0]
        trace[:, LV1] = lv[:, 1]
        outer_pis = []
        for r in self.out_rows:
            outer_pis += [int(vals[r, 0]), int(vals[r, 1])]
        return trace, outer_pis


def _fill_eval_py(tape, leaves, vals):
    W = np.uint64(gl.W_EXT)
    for i, (op, a, b) in enumerate(tape.ops):
        if op == LEAF:
            if a == L_INT:
                vals[i] = (np.uint64(b % gl.P), np.uint64(0))
            else:
                vals[i] = leaves[a][b]
        elif op == ADD:
            vals[i] = gl.gl_add(vals[a], vals[b])
        elif op == SUB:
            vals[i] = gl.gl_sub(vals[a], vals[b])
        elif op == NEG:
            vals[i] = gl.gl_neg(vals[a])
        else:
            a0, a1 = vals[a]
            b0, b1 = vals[b]
            c0 = gl.gl_add(gl.gl_mul(a0, b0), gl.gl_mul(W, gl.gl_mul(a1, b1)))
            c1 = gl.gl_add(gl.gl_mul(a0, b1), gl.gl_mul(a1, b0))
            vals[i] = (c0, c1)


def eval_trace_poly_at(values: np.ndarray, zeta) -> tuple:
    """Evaluate the degree-<n interpolant of `values` over the trace domain
    {g^i} at an ext point: P(zeta) = (zeta^n - 1)/n * sum_i v_i g^i/(zeta-g^i).
    Vectorized host math; values (n,) uint64."""
    n = values.shape[0]
    g = gl.primitive_root_of_unity(n.bit_length() - 1)
    pts = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        pts[i] = acc
        acc = acc * g % gl.P
    d0 = gl.gl_sub(np.full(n, np.uint64(zeta[0] % gl.P)), pts)
    d1 = np.full(n, np.uint64(zeta[1] % gl.P))
    inv = gl.ext_inv_v((d0, np.asarray(d1)))
    w = gl.ext_mul_base_v(inv, pts)
    t = gl.ext_mul_base_v(w, values)
    s0 = int(gl.gl_sum(np.asarray(t[0]), axis=0))
    s1 = int(gl.gl_sum(np.asarray(t[1]), axis=0))
    zn = gl.ext_sub(gl.ext_pow(zeta, n), gl.EXT_ONE)
    scale = gl.ext_scalar_mul(zn, gl.inv_s(n % gl.P))
    return gl.ext_mul(scale, (s0, s1))


def prove_ext_op(eair: ExtOpAir, inner_proof, inner_pis, outer_config: StarkConfig, xp=None):
    """Prove the inner proof's quotient identity. Returns the outer proof
    (the outer PIs are recomputed by the verifier from public data)."""
    from ..backend.prover import prove as _prove

    trace, outer_pis = eair.generate_trace(inner_proof, inner_pis)
    return _prove(eair, trace, outer_pis, outer_config, xp=xp)


def verify_ext_op(eair: ExtOpAir, inner_proof, inner_pis, outer_proof,
                  outer_config: StarkConfig, d=None) -> None:
    """Check the inner quotient identity via the outer proof — no native
    `inner.eval`. Raises VerificationError on failure."""
    inner = eair.inner
    icfg = eair.icfg
    if d is None:
        d = derive_challenges(inner, inner_proof, inner_pis, icfg)
    n = inner.num_rows
    zeta = d["zeta"]
    zh = gl.ext_sub(gl.ext_pow(zeta, n), gl.EXT_ONE)
    factor = inner.quotient_degree_factor()
    outer_pis = []
    for ci in range(icfg.num_challenges):
        zn = gl.ext_pow(zeta, n)
        q_sum, zpow = gl.EXT_ZERO, gl.EXT_ONE
        for k in range(factor):
            q_k = (int(inner_proof.quotient_open[ci * factor + k, 0]),
                   int(inner_proof.quotient_open[ci * factor + k, 1]))
            q_sum = gl.ext_add(q_sum, gl.ext_mul(zpow, q_k))
            zpow = gl.ext_mul(zpow, zn)
        acc = gl.ext_mul(q_sum, zh)
        outer_pis += [acc[0], acc[1]]
    # the outer proof must verify against the NATIVELY-expected outputs
    verify(eair, outer_proof, outer_pis, outer_config)
    # leaf binding: committed LV columns == the public leaf polynomial
    leaves = tape_leaf_values(inner, inner_proof, inner_pis, icfg, d, eair.filts)
    lv = eair.leaf_vector(leaves)
    od = derive_challenges(eair, outer_proof, outer_pis, outer_config)
    zeta_o = od["zeta"]
    for comp, col in ((0, LV0), (1, LV1)):
        expect = eval_trace_poly_at(lv[:, comp], zeta_o)
        got = (int(outer_proof.trace_local[col, 0]), int(outer_proof.trace_local[col, 1]))
        if got != expect:
            raise VerificationError(f"leaf column {comp} does not match public leaves")
