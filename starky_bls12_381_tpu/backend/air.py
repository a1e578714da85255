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

from dataclasses import dataclass
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

    def zero_accum(self, npoints):
        return np.array([0, 0], dtype=object)


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

    def __init__(self, alg, local_fn, next_fn, pi_fn, const_fn=None, const_next_fn=None):
        self.alg = alg
        self._local = local_fn
        self._next = next_fn
        self._pi = pi_fn
        self._const = const_fn or (lambda c, w=None: 1)
        self._const_next = const_next_fn or (lambda c, w=None: 1)
        self.constraints: list[tuple[Any, Any, int]] = []

    def local(self, col: int, width: int | None = None) -> V:
        return V(self.alg, self._local(col, width), 1)

    def next(self, col: int, width: int | None = None) -> V:
        return V(self.alg, self._next(col, width), 1)

    def const(self, col: int, width: int | None = None) -> V:
        return V(self.alg, self._const(col, width), 1)

    def const_next(self, col: int, width: int | None = None) -> V:
        return V(self.alg, self._const_next(col, width), 1)

    def pi(self, idx: int, width: int | None = None) -> V:
        return V(self.alg, self._pi(idx, width), 0)

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

    def eval(self, ctx: Ctx) -> None:
        raise NotImplementedError

    def constant_columns(self):
        """(num_rows, K) uint64 array of public fixed columns, or None."""
        return None

    # -- static analysis ------------------------------------------------
    def _degree_ctx(self) -> Ctx:
        one = lambda c, w=None: 1  # noqa: E731
        ctx = Ctx(DegreeAlgebra(), one, one, lambda i, w=None: 0, one, one)
        self.eval(ctx)
        return ctx

    def quotient_degree_factor(self) -> int:
        factor = 1
        for filt, _d, deg in self._degree_ctx().constraints:
            factor = max(factor, deg - 1 + _filter_extra_degree(filt))
        return factor

    def num_constraints(self) -> int:
        return len(self._degree_ctx().constraints)
