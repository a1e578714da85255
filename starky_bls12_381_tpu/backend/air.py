"""AIR definition framework: constraints written once, evaluated three ways.

The reference maintains every constraint twice — `eval_packed_generic` over
packed base-field values and `eval_ext_circuit` as a plonky2 recursive
circuit — and the two mirrors must be kept in sync by hand (SURVEY.md §1,
e.g. `fp.rs:443` vs `fp.rs:576`). Here an AIR's `eval(ctx)` is written once
against a tiny algebra interface and is executed with:

* `BaseVectorAlgebra` — prover: values are uint64 arrays over all LDE
  points (numpy or jax.numpy); every constraint becomes a handful of wide
  vector ops, ideal for the TPU VPU.
* `ExtScalarAlgebra`  — verifier: values are GF(p^2) scalars (numpy object
  arrays of python ints) evaluated at the DEEP point zeta.
* `DegreeAlgebra`     — static analysis: values are just polynomial
  degrees; used to derive the quotient degree factor automatically.

Filters (constraint divisors): unlike starky, which supports only
first-row / last-row / transition, this backend supports boundary
constraints at ARBITRARY fixed rows (`Row(k)` => Lagrange kernel L_k(x)
multiplier). That removes whole classes of one-hot selector columns the
reference needs (e.g. the 8192 row-selector columns of
`final_exponentiate.rs:37`).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..fields import goldilocks as gl

# ---------------------------------------------------------------------------
# Filters
# ---------------------------------------------------------------------------

EVERY = ("every",)
TRANSITION = ("transition",)
FIRST = ("row", 0)


def ROW(k: int):
    return ("row", k)


def LAST(num_rows: int):
    return ("row", num_rows - 1)


def _filter_extra_degree(filt) -> int:
    """Degree the filter adds to the quotient (beyond constraint degree - 1)."""
    # transition: c * (x - g^{n-1}) / Z_H -> factor d-1.
    # every:      c / Z_H                 -> factor d-1.
    # row k:      c * L_k / Z_H ~ c/(x-g^k) -> factor d.
    return 1 if filt[0] == "row" else 0


# ---------------------------------------------------------------------------
# Value wrapper with degree tracking
# ---------------------------------------------------------------------------


class V:
    """An algebra value with tracked polynomial degree (in trace columns)."""

    __slots__ = ("alg", "d", "deg")

    def __init__(self, alg, d, deg):
        self.alg = alg
        self.d = d
        self.deg = deg

    def _lift(self, o):
        if isinstance(o, V):
            return o
        return V(self.alg, self.alg.constant(o), 0)

    def __add__(self, o):
        o = self._lift(o)
        return V(self.alg, self.alg.add(self.d, o.d), max(self.deg, o.deg))

    __radd__ = __add__

    def __sub__(self, o):
        o = self._lift(o)
        return V(self.alg, self.alg.sub(self.d, o.d), max(self.deg, o.deg))

    def __rsub__(self, o):
        return self._lift(o).__sub__(self)

    def __mul__(self, o):
        o = self._lift(o)
        return V(self.alg, self.alg.mul(self.d, o.d), self.deg + o.deg)

    __rmul__ = __mul__

    def __neg__(self):
        return V(self.alg, self.alg.neg(self.d), self.deg)

    def __getitem__(self, idx):
        """Leading-dim indexing/broadcast reshaping of stacked values.

        Only use forms that are agnostic to trailing axes: `v[k]`, `v[a:b]`,
        `v[:, None]`, `v[None]` — the prover's trailing axis is the domain,
        the verifier's is the GF(p^2) pair."""
        return V(self.alg, self.alg.index(self.d, idx), self.deg)

    def sum0(self):
        """Sum over the leading (stacked) axis — e.g. recomposing a word
        from weighted bit columns in one reduction."""
        return V(self.alg, self.alg.sum0(self.d), self.deg)


# ---------------------------------------------------------------------------
# Algebras
# ---------------------------------------------------------------------------


class BaseVectorAlgebra:
    """Base-field vectors over the evaluation domain. Data: uint64 arrays
    with trailing axis = points; leading axes = stacked constraints."""

    def __init__(self, xp):
        self.xp = xp

    def constant(self, v):
        return self.xp.uint64(int(v) % gl.P)

    def add(self, a, b):
        return gl.gl_add(a, b)

    def sub(self, a, b):
        return gl.gl_sub(a, b)

    def mul(self, a, b):
        return gl.gl_mul(a, b)

    def neg(self, a):
        return gl.gl_neg(a)

    def rows(self, data):
        """Iterate stacked constraints: data (..., N) -> list of (N,) rows."""
        if data.ndim <= 1:
            return [data]
        return [r for r in data.reshape(-1, data.shape[-1])]

    def index(self, data, idx):
        return data[idx]

    def sum0(self, data):
        return gl.gl_sum(data, axis=0)

    def lift_ints(self, arr: np.ndarray):
        """Constant array (any shape) -> data broadcastable against stacked
        trace values (adds the trailing domain axis)."""
        a = np.asarray(arr, dtype=np.uint64)[..., None]
        return a if self.xp is np else self.xp.asarray(a)

    def combine_rows(self, data, alpha):
        """sum_r alpha^r * row_r over the flattened leading dims.
        Returns (combined (N,), num_rows)."""
        if data.ndim <= 1:
            return data, 1
        flat = data.reshape(-1, data.shape[-1])
        r = flat.shape[0]
        w = gl.gl_powers_vec(alpha, r)
        return gl.gl_sum(gl.gl_mul(flat, w[:, None]), axis=0), r

    def zero_accum(self, npoints):
        return self.xp.zeros((npoints,), dtype=self.xp.uint64)


class ExtScalarAlgebra:
    """GF(p^2) scalars as numpy object arrays with trailing axis 2."""

    def constant(self, v):
        return np.array([int(v) % gl.P, 0], dtype=object)

    def add(self, a, b):
        return (a + b) % gl.P

    def sub(self, a, b):
        return (a - b) % gl.P

    def mul(self, a, b):
        a0, a1 = a[..., 0], a[..., 1]
        b0, b1 = b[..., 0], b[..., 1]
        c0 = (a0 * b0 + gl.W_EXT * a1 * b1) % gl.P
        c1 = (a0 * b1 + a1 * b0) % gl.P
        # NB: np.stack on python-int scalars silently infers int64/float64
        # and corrupts >2^63 values; build the object array explicitly.
        out = np.empty(np.broadcast(a0, b0).shape + (2,), dtype=object)
        out[..., 0] = c0
        out[..., 1] = c1
        return out

    def neg(self, a):
        return (-a) % gl.P

    def rows(self, data):
        if data.ndim == 1:
            return [data]
        return [r for r in data.reshape(-1, 2)]

    def index(self, data, idx):
        return data[idx]

    def sum0(self, data):
        return data.sum(axis=0) % gl.P

    def lift_ints(self, arr: np.ndarray):
        a = np.asarray(arr, dtype=np.uint64)
        out = np.zeros(a.shape + (2,), dtype=object)
        out[..., 0] = a.astype(object)
        return out

    def combine_rows(self, data, alpha: int):
        if data.ndim == 1:
            return (int(data[0]), int(data[1])), 1
        flat = data.reshape(-1, 2)
        r = flat.shape[0]
        pows = np.empty(r, dtype=object)
        acc = 1
        for i in range(r):
            pows[i] = acc
            acc = acc * alpha % gl.P
        c0 = int((flat[:, 0] * pows).sum() % gl.P)
        c1 = int((flat[:, 1] * pows).sum() % gl.P)
        return (c0, c1), r

    def zero_accum(self, npoints):
        return np.array([0, 0], dtype=object)


class ExtVectorAlgebra:
    """GF(p^2) values as uint64 arrays with trailing axis 2 — the
    numpy-vectorized version of ExtScalarAlgebra. The verifier's quotient
    identity over a 90k-column air runs in milliseconds instead of minutes
    of object-array bignum arithmetic; results are bit-identical (the same
    modular ops via fields/goldilocks)."""

    def constant(self, v):
        return np.array([int(v) % gl.P, 0], dtype=np.uint64)

    def add(self, a, b):
        return np.asarray(gl.gl_add(a, b))

    def sub(self, a, b):
        return np.asarray(gl.gl_sub(a, b))

    def mul(self, a, b):
        a0, a1 = a[..., 0], a[..., 1]
        b0, b1 = b[..., 0], b[..., 1]
        c0 = gl.gl_add(gl.gl_mul(a0, b0), gl.gl_mul(np.uint64(gl.W_EXT), gl.gl_mul(a1, b1)))
        c1 = gl.gl_add(gl.gl_mul(a0, b1), gl.gl_mul(a1, b0))
        return np.stack([np.asarray(c0), np.asarray(c1)], axis=-1)

    def neg(self, a):
        return np.asarray(gl.gl_neg(a))

    def rows(self, data):
        if data.ndim == 1:
            return [data]
        return [r for r in data.reshape(-1, 2)]

    def index(self, data, idx):
        return data[idx]

    def sum0(self, data):
        return np.asarray(gl.gl_sum(data, axis=0))

    def lift_ints(self, arr: np.ndarray):
        a = np.asarray(arr, dtype=np.uint64)
        out = np.zeros(a.shape + (2,), dtype=np.uint64)
        out[..., 0] = a
        return out

    def combine_rows(self, data, alpha: int):
        if data.ndim == 1:
            return (int(data[0]), int(data[1])), 1
        flat = data.reshape(-1, 2)
        r = flat.shape[0]
        w = gl.gl_powers_vec(alpha, r)
        c0 = int(gl.gl_sum(gl.gl_mul(flat[:, 0], w), axis=0))
        c1 = int(gl.gl_sum(gl.gl_mul(flat[:, 1], w), axis=0))
        return (c0, c1), r


class DegreeAlgebra:
    """Values are polynomial degrees (ints); used for quotient sizing."""

    def constant(self, v):
        return 0

    def add(self, a, b):
        return max(a, b)

    sub = add

    def mul(self, a, b):
        return a + b

    def neg(self, a):
        return a

    def rows(self, data):
        return [data]

    def index(self, data, idx):
        return data

    def sum0(self, data):
        return data

    def lift_ints(self, arr):
        return 0


# ---------------------------------------------------------------------------
# Constraint context
# ---------------------------------------------------------------------------


class Ctx:
    """Handed to `Air.eval`. Provides trace/PI/constant-column access and
    collects (filter, value, degree) constraint emissions in a fixed order.

    Constant columns are public, air-defined fixed patterns (selectors,
    one-hot schedules, round flags). They are NOT committed: the prover
    LDEs them once per air, the verifier evaluates their polynomials at
    zeta directly — so unlike the reference's witness selector columns
    they cannot be forged (see fp12_mul.rs:70-97, whose
    FP12_MUL_SELECTOR_OFFSET column is unconstrained witness)."""

    def __init__(self, alg, acc):
        """`acc` provides gather access to the trace/constants/PIs: methods
        local/next/const/const_next taking a column index array of any shape
        (returning data of shape idx.shape + (domain,)), and pi likewise.
        Two-phase airs additionally read phase-2 columns via local2/next2
        and the round-1 verifier challenges via challenge(i)."""
        self.alg = alg
        self.acc = acc
        self.constraints: list[tuple[Any, Any, int]] = []

    def _cols(self, col, width):
        if width is None:
            return col
        return np.arange(col, col + width)

    def local(self, col: int, width: int | None = None) -> V:
        return V(self.alg, self.acc.local(self._cols(col, width)), 1)

    def next(self, col: int, width: int | None = None) -> V:
        return V(self.alg, self.acc.next(self._cols(col, width)), 1)

    def const(self, col: int, width: int | None = None) -> V:
        return V(self.alg, self.acc.const(self._cols(col, width)), 1)

    def const_next(self, col: int, width: int | None = None) -> V:
        return V(self.alg, self.acc.const_next(self._cols(col, width)), 1)

    def pi(self, idx: int, width: int | None = None) -> V:
        return V(self.alg, self.acc.pi(self._cols(idx, width)), 0)

    # -- phase-2 (second commitment round) access -----------------------
    def local2(self, col: int, width: int | None = None) -> V:
        return V(self.alg, self.acc.local2(self._cols(col, width)), 1)

    def next2(self, col: int, width: int | None = None) -> V:
        return V(self.alg, self.acc.next2(self._cols(col, width)), 1)

    def local2_g(self, cols) -> V:
        return V(self.alg, self.acc.local2(np.asarray(cols)), 1)

    def next2_g(self, cols) -> V:
        return V(self.alg, self.acc.next2(np.asarray(cols)), 1)

    def challenge(self, i: int) -> V:
        """The i-th round-1 challenge (drawn after the phase-1 commitment,
        before phase 2 is committed). Degree-0; a traced scalar on the
        prover so challenge values never bake into compiled programs."""
        return V(self.alg, self.acc.challenge(i), 0)

    # -- gathered (instance-batched) access -----------------------------
    def local_g(self, cols) -> V:
        return V(self.alg, self.acc.local(np.asarray(cols)), 1)

    def next_g(self, cols) -> V:
        return V(self.alg, self.acc.next(np.asarray(cols)), 1)

    def const_g(self, cols) -> V:
        return V(self.alg, self.acc.const(np.asarray(cols)), 1)

    def const_next_g(self, cols) -> V:
        return V(self.alg, self.acc.const_next(np.asarray(cols)), 1)

    def pi_g(self, idxs) -> V:
        return V(self.alg, self.acc.pi(np.asarray(idxs)), 0)

    def lift(self, arr) -> V:
        """Constant integer array as a broadcastable value."""
        return V(self.alg, self.alg.lift_ints(arr), 0)

    def c(self, v: int) -> V:
        return V(self.alg, self.alg.constant(v), 0)

    def constraint(self, expr: V, filt=EVERY):
        self.constraints.append((filt, expr.d, expr.deg))

    def constraint_transition(self, expr: V):
        self.constraint(expr, TRANSITION)

    def constraint_row(self, expr: V, k: int):
        self.constraint(expr, ROW(k))

    def constraint_first_row(self, expr: V):
        self.constraint(expr, FIRST)


# ---------------------------------------------------------------------------
# Accessors: how a Ctx reads trace/const/PI data
# ---------------------------------------------------------------------------


class ChunkedColumns:
    """A (domain, C) matrix stored as a list of equal-width column chunks.

    The TPU prover keeps the trace LDE as separate chunk buffers (the
    streaming commit produces them and nothing ever needs the whole matrix
    contiguously), so column gathers route through this wrapper instead of
    forcing a multi-GB concatenation. Gather order is preserved exactly.
    """

    def __init__(self, xp, chunks):
        self.xp = xp
        self.chunks = list(chunks)
        self.width = self.chunks[0].shape[1]
        self.domain = self.chunks[0].shape[0]

    def gather(self, flat_cols: np.ndarray):
        """flat_cols: 1-D numpy int array -> (domain, len) array."""
        if len(self.chunks) == 1:
            return self.chunks[0][:, flat_cols]
        cid = flat_cols // self.width
        parts, perm = [], []
        for i, ch in enumerate(self.chunks):
            sel = np.nonzero(cid == i)[0]
            if sel.size:
                parts.append(ch[:, flat_cols[sel] - i * self.width])
                perm.append(sel)
        g = parts[0] if len(parts) == 1 else self.xp.concatenate(parts, axis=1)
        perm = np.concatenate(perm)
        if not np.array_equal(perm, np.arange(flat_cols.size)):
            g = g[:, np.argsort(perm)]
        return g


class VectorAccessors:
    """Prover-style: matrices of shape (domain, C); gathers produce
    uint64 arrays of shape idx.shape + (domain,).

    Matrices may be arrays or `ChunkedColumns`. `next_mat`/`const_next_mat`
    may be None with `next_roll` set: next-row values are then produced by
    rolling each GATHERED column block by -next_roll along the domain axis
    (LDE index i+blowup is the next trace row), which avoids materializing
    a rolled copy of the full multi-GB LDE."""

    def __init__(self, xp, local_mat, next_mat, const_mat, const_next_mat, pis_arr, next_roll=None, halo=None,
                 local2_mat=None, chals_arr=None):
        """`halo=(L, b)`: matrices carry L+b rows (a row segment plus its
        b-row halo); local access slices [:L], next access [b:b+L]. Used by
        the row-segmented quotient evaluation (bounds peak memory for wide
        tall LDEs). Mutually exclusive with full-domain `next_roll`.
        `local2_mat`: phase-2 LDE (domain, C2); next2 follows the same
        roll/halo convention. `chals_arr`: (k,) round-1 challenges."""
        self.xp = xp
        self._mats = {
            "local": local_mat,
            "next": next_mat,
            "const": const_mat,
            "const_next": const_next_mat,
            "local2": local2_mat,
            "next2": None,
        }
        self.pis = pis_arr
        self.chals = chals_arr
        self.next_roll = next_roll
        self.halo = halo

    def _gather(self, name, cols):
        mat = self._mats[name]
        is_next = False
        if mat is None:
            mat = self._mats[{"next": "local", "next2": "local2", "const_next": "const"}[name]]
            is_next = True
        cols = np.asarray(cols)
        scalar = cols.ndim == 0
        flat = np.atleast_1d(cols).reshape(-1)
        if isinstance(mat, ChunkedColumns):
            g = mat.gather(flat)
        else:
            g = mat[:, flat]
        if self.halo is not None:
            L, b = self.halo
            g = g[b : b + L] if is_next else g[:L]
        elif is_next:
            g = self.xp.roll(g, -self.next_roll, axis=0)
        if scalar:
            return g[:, 0]
        g = self.xp.moveaxis(g, 0, -1)
        return g.reshape(tuple(cols.shape) + (g.shape[-1],))

    def local(self, cols):
        return self._gather("local", cols)

    def next(self, cols):
        return self._gather("next", cols)

    def const(self, cols):
        return self._gather("const", cols)

    def const_next(self, cols):
        return self._gather("const_next", cols)

    def local2(self, cols):
        return self._gather("local2", cols)

    def next2(self, cols):
        return self._gather("next2", cols)

    def challenge(self, i: int):
        return self.chals[int(i)]

    def pi(self, idxs):
        idxs = np.asarray(idxs)
        if idxs.ndim == 0:
            return self.pis[int(idxs)]
        return self.pis[idxs.reshape(-1)].reshape(tuple(idxs.shape))[..., None]


class ScalarAccessors:
    """Verifier-style: per-column GF(p^2) values, shape (C, 2) object."""

    def __init__(self, local_vals, next_vals, const_vals, const_next_vals, pis,
                 local2_vals=None, next2_vals=None, chals=None):
        self._mats = {
            "local": local_vals,
            "next": next_vals,
            "const": const_vals,
            "const_next": const_next_vals,
            "local2": local2_vals,
            "next2": next2_vals,
        }
        self.pis = [int(x) for x in pis]
        self.chals = chals

    def _gather(self, name, cols):
        mat = self._mats[name]
        cols = np.asarray(cols)
        if cols.ndim == 0:
            return mat[int(cols)]
        return mat[cols]

    def local(self, cols):
        return self._gather("local", cols)

    def next(self, cols):
        return self._gather("next", cols)

    def const(self, cols):
        return self._gather("const", cols)

    def const_next(self, cols):
        return self._gather("const_next", cols)

    def local2(self, cols):
        return self._gather("local2", cols)

    def next2(self, cols):
        return self._gather("next2", cols)

    def challenge(self, i: int):
        return np.array([int(self.chals[int(i)]), 0], dtype=object)

    def pi(self, idxs):
        idxs = np.asarray(idxs)
        if idxs.ndim == 0:
            return np.array([self.pis[int(idxs)], 0], dtype=object)
        vals = np.asarray([self.pis[i] for i in idxs.reshape(-1)], dtype=np.uint64)
        out = np.zeros(vals.shape + (2,), dtype=object)
        out[..., 0] = vals.astype(object)
        return out.reshape(tuple(idxs.shape) + (2,))


class ExtVectorAccessors(ScalarAccessors):
    """ScalarAccessors over uint64 (C, 2) matrices (for ExtVectorAlgebra):
    public inputs are lifted to uint64 ext pairs instead of object."""

    def challenge(self, i: int):
        return np.array([int(self.chals[int(i)]) % gl.P, 0], dtype=np.uint64)

    def pi(self, idxs):
        idxs = np.asarray(idxs)
        if idxs.ndim == 0:
            return np.array([self.pis[int(idxs)], 0], dtype=np.uint64)
        vals = np.asarray([self.pis[i] for i in idxs.reshape(-1)], dtype=np.uint64)
        out = np.zeros(vals.shape + (2,), dtype=np.uint64)
        out[..., 0] = vals
        return out.reshape(tuple(idxs.shape) + (2,))


class DegreeAccessors:
    def local(self, cols):
        return 1

    next = const = const_next = local
    local2 = next2 = local

    def pi(self, idxs):
        return 0

    def challenge(self, i):
        return 0


# ---------------------------------------------------------------------------
# AIR base class
# ---------------------------------------------------------------------------


class Air:
    """A STARK statement: trace shape + public inputs + constraints.

    Subclasses set `num_cols`, `num_rows`, `num_pis` (and optionally
    provide constant columns via `constant_columns()` returning an
    (num_rows, K) uint64 array) and implement `eval(ctx)`. Trace
    generation lives with each concrete stark.
    """

    num_cols: int
    num_rows: int
    num_pis: int = 0
    # two-phase airs (permutation/copy arguments): phase-2 witness columns
    # committed AFTER the round-1 challenges are drawn from the phase-1 cap
    num_cols2: int = 0
    num_phase_challenges: int = 0

    def eval(self, ctx: Ctx) -> None:
        raise NotImplementedError

    def constant_columns(self):
        """(num_rows, K) uint64 array of public fixed columns, or None."""
        return None

    def generate_trace2(self, trace: np.ndarray, challenges):
        """(num_rows, num_cols2) phase-2 witness from the phase-1 trace and
        the round-1 challenges. Required when num_cols2 > 0."""
        raise NotImplementedError

    # -- static analysis ------------------------------------------------
    def _degree_ctx(self) -> Ctx:
        ctx = Ctx(DegreeAlgebra(), DegreeAccessors())
        self.eval(ctx)
        return ctx

    def quotient_degree_factor(self) -> int:
        factor = 1
        for filt, _d, deg in self._degree_ctx().constraints:
            factor = max(factor, deg - 1 + _filter_extra_degree(filt))
        return factor

    def num_constraints(self) -> int:
        return len(self._degree_ctx().constraints)
