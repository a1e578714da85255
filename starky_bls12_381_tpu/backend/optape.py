"""Op-tape extraction: `air.eval` traced once into a static ext-op tape.

The verifier's quotient-identity check at zeta is a straight-line GF(p^2)
computation over the opened values (check_quotient_identity). To prove that
computation inside a STARK (docs/RECURSION.md item 2 — the second recursion
level), this module records it as a TAPE: a list of (op, a, b) entries over
ext values whose leaves are the opened trace values, the constant-column
evaluations at zeta, the inner public inputs and the transcript-derived
scalars (alphas, filter values). The tape is a pure function of the inner
(air, config) — independent of the statement — so one ExtOpAir per inner
air proves the identity for every proof of that air.

The fourth algebra: `TapeAlgebra` values are numpy object arrays of node
ids, so the same type-batched `air.eval` that emits wide tensor ops for the
prover scalarizes here into one tape entry per element (hash-consed: at
most one node per distinct (op, a, b))."""

from __future__ import annotations

import numpy as np

from ..fields import goldilocks as gl
from .air import Ctx, DegreeAccessors, DegreeAlgebra, V

# node opcodes
ADD, SUB, MUL, NEG, LEAF = 0, 1, 2, 3, 4
# leaf kinds
L_LOCAL, L_NEXT, L_CONST, L_CONST_NEXT, L_PI, L_FILT, L_ALPHA, L_INT = range(8)


class Tape:
    def __init__(self):
        self.ops: list[tuple] = []  # (opcode, a, b)
        self._cse: dict = {}
        self.outputs: list[int] = []

    def _emit(self, op, a, b):
        key = (op, a, b)
        hit = self._cse.get(key)
        if hit is not None:
            return hit
        self.ops.append(key)
        idx = len(self.ops) - 1
        self._cse[key] = idx
        return idx

    def leaf(self, kind, index) -> int:
        return self._emit(LEAF, kind, index)

    def const(self, v: int) -> int:
        return self.leaf(L_INT, int(v) % gl.P)

    def add(self, a, b):
        return self._emit(ADD, a, b)

    def sub(self, a, b):
        return self._emit(SUB, a, b)

    def mul(self, a, b):
        return self._emit(MUL, a, b)

    def neg(self, a):
        return self._emit(NEG, a, 0)

    def pow(self, a, e: int):
        result = None
        base = a
        while e > 0:
            if e & 1:
                result = base if result is None else self.mul(result, base)
            base = self.mul(base, base)
            e >>= 1
        return self.const(1) if result is None else result

    def __len__(self):
        return len(self.ops)


class TapeAlgebra:
    """Values: object arrays (any shape) of tape node ids."""

    def __init__(self, tape: Tape):
        self.t = tape
        self._add = np.frompyfunc(tape.add, 2, 1)
        self._sub = np.frompyfunc(tape.sub, 2, 1)
        self._mul = np.frompyfunc(tape.mul, 2, 1)
        self._neg = np.frompyfunc(tape.neg, 1, 1)

    def constant(self, v):
        return self.t.const(int(v))

    def add(self, a, b):
        return self._add(a, b)

    def sub(self, a, b):
        return self._sub(a, b)

    def mul(self, a, b):
        return self._mul(a, b)

    def neg(self, a):
        return self._neg(a)

    def rows(self, data):
        data = np.asarray(data, dtype=object)
        return [r for r in data.reshape(-1)]

    def index(self, data, idx):
        return np.asarray(data, dtype=object)[idx]

    def sum0(self, data):
        data = np.asarray(data, dtype=object)
        out = data[0]
        for i in range(1, data.shape[0]):
            out = self._add(out, data[i])
        return out

    def lift_ints(self, arr):
        f = np.frompyfunc(lambda v: self.t.const(int(v)), 1, 1)
        return f(np.asarray(arr, dtype=np.uint64))

    def combine_rows(self, data, alpha_node):
        """sum_r alpha^r * row_r (tape ops). Returns (node, num_rows)."""
        data = np.asarray(data, dtype=object)
        flat = data.reshape(-1)
        r = flat.shape[0]
        acc = flat[r - 1]
        for i in range(r - 2, -1, -1):
            acc = self.t.add(self.t.mul(acc, alpha_node), flat[i])
        return acc, r


class TapeAccessors:
    def __init__(self, tape: Tape):
        self.t = tape
        self._fl = np.frompyfunc(lambda c: tape.leaf(L_LOCAL, int(c)), 1, 1)
        self._fn = np.frompyfunc(lambda c: tape.leaf(L_NEXT, int(c)), 1, 1)
        self._fc = np.frompyfunc(lambda c: tape.leaf(L_CONST, int(c)), 1, 1)
        self._fcn = np.frompyfunc(lambda c: tape.leaf(L_CONST_NEXT, int(c)), 1, 1)
        self._fp = np.frompyfunc(lambda c: tape.leaf(L_PI, int(c)), 1, 1)

    def _wrap(self, f, cols):
        cols = np.asarray(cols)
        out = f(cols)
        if cols.ndim == 0:
            return out if isinstance(out, int) else out[()]
        return out

    def local(self, cols):
        return self._wrap(self._fl, cols)

    def next(self, cols):
        return self._wrap(self._fn, cols)

    def const(self, cols):
        return self._wrap(self._fc, cols)

    def const_next(self, cols):
        return self._wrap(self._fcn, cols)

    def pi(self, idxs):
        return self._wrap(self._fp, idxs)


def extract_identity_tape(air, config):
    """Record the full quotient-identity combination as a tape.

    Returns (tape, filter_list): tape.outputs[ci] is the combined
    constraint value for challenge ci; filter_list gives the meaning of
    L_FILT leaves (same discovery order as the prover's)."""
    tape = Tape()
    alg = TapeAlgebra(tape)
    ctx = Ctx(alg, TapeAccessors(tape))
    air.eval(ctx)
    filts: list = []
    for filt, _d, _deg in ctx.constraints:
        if filt not in filts:
            filts.append(filt)
    filter_index = {f: i for i, f in enumerate(filts)}
    pow_cache: dict = {}
    for ci in range(config.num_challenges):
        alpha = tape.leaf(L_ALPHA, ci)
        acc = tape.const(0)
        for filt, data, _deg in reversed(ctx.constraints):
            grp, nrows = alg.combine_rows(data, alpha)
            if filt[0] != "every":
                grp = tape.mul(grp, tape.leaf(L_FILT, filter_index[filt]))
            key = (ci, nrows)
            if key not in pow_cache:
                pow_cache[key] = tape.pow(alpha, nrows)
            acc = tape.add(tape.mul(acc, pow_cache[key]), grp)
        tape.outputs.append(acc)
    return tape, filts


def tape_leaf_values(air, proof, pis, config, d, filts):
    """Ext value for every leaf kind, from the proof's PUBLIC part and the
    derived challenges `d` — what the native evaluator and the ExtOpAir
    public region feed the tape."""
    from . import ntt
    from .prover import filter_at_point
    from .verifier import _eval_cols_at

    n = air.num_rows
    zeta = d["zeta"]
    zeta_g = gl.ext_scalar_mul(zeta, gl.primitive_root_of_unity(n.bit_length() - 1))
    const = air.constant_columns()
    if const is not None:
        c_coeffs = ntt.interpolate(np.asarray(const, dtype=np.uint64))
        c_zeta = _eval_cols_at(c_coeffs, zeta)
        c_zeta_g = _eval_cols_at(c_coeffs, zeta_g)
    else:
        c_zeta = c_zeta_g = np.zeros((1, 2), dtype=np.uint64)
    return {
        L_LOCAL: np.asarray(proof.trace_local, dtype=np.uint64),
        L_NEXT: np.asarray(proof.trace_next, dtype=np.uint64),
        L_CONST: c_zeta,
        L_CONST_NEXT: c_zeta_g,
        L_PI: np.asarray([[int(x) % gl.P, 0] for x in pis] or [[0, 0]], dtype=np.uint64),
        L_FILT: np.asarray([filter_at_point(f, n, zeta) for f in filts] or [[0, 0]], dtype=np.uint64),
        L_ALPHA: np.asarray([[a, 0] for a in d["alphas"]], dtype=np.uint64),
    }


def eval_tape(tape: Tape, leaves: dict) -> list:
    """Native sequential evaluation (vectorized per level would be faster;
    this is the correctness oracle). Returns the output ext values."""
    vals = np.zeros((len(tape.ops), 2), dtype=np.uint64)
    W = np.uint64(gl.W_EXT)
    for i, (op, a, b) in enumerate(tape.ops):
        if op == LEAF:
            if a == L_INT:
                vals[i] = (np.uint64(b), np.uint64(0))
            else:
                vals[i] = leaves[a][b]
        elif op == ADD:
            vals[i] = gl.gl_add(vals[a], vals[b])
        elif op == SUB:
            vals[i] = gl.gl_sub(vals[a], vals[b])
        elif op == NEG:
            vals[i] = gl.gl_neg(vals[a])
        else:  # MUL
            a0, a1 = vals[a]
            b0, b1 = vals[b]
            c0 = gl.gl_add(gl.gl_mul(a0, b0), gl.gl_mul(W, gl.gl_mul(a1, b1)))
            c1 = gl.gl_add(gl.gl_mul(a0, b1), gl.gl_mul(a1, b0))
            vals[i] = (c0, c1)
    return [(int(vals[o][0]), int(vals[o][1])) for o in tape.outputs]
