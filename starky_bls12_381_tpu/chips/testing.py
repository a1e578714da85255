"""Trace-domain residual checking: the chip-level correctness harness.

Evaluates an AIR's constraints directly over the trace rows (no LDE, no
proof) and asserts each constraint vanishes wherever its filter requires.
This is the cheap inner test loop for every gadget and stark (the tamper /
prove / verify roundtrips sit on top). The reference has no equivalent —
its chips are only exercised through full proofs (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

from ..backend.air import BaseVectorAlgebra, Ctx, VectorAccessors


def residuals(air, trace: np.ndarray, pis, use_jax: bool | None = None):
    """Run air.eval over the trace domain; returns [(filter, residual array)].

    Large traces route through a jit-compiled jax-CPU evaluation (fused,
    multi-threaded) — the wide starks (~90k columns) take minutes in eager
    numpy but seconds compiled. Results are bit-identical (same algebra)."""
    n = air.num_rows
    const = air.constant_columns()
    if const is None:
        const = np.zeros((n, 1), dtype=np.uint64)
    const = np.asarray(const, dtype=np.uint64)
    pis_arr = np.asarray([int(x) for x in pis], dtype=np.uint64) if len(pis) else np.zeros(1, np.uint64)
    if use_jax is None:
        use_jax = trace.size >= (1 << 21)

    if use_jax:
        import jax
        import jax.numpy as jnp

        filts = [filt for filt, _d, _deg in _degree_constraints(air)]

        # one jit per air instance: tamper tests call residuals repeatedly
        jitted = getattr(air, "_residuals_jit", None)
        if jitted is None:

            def f(tr, const_a, pis_a):
                nxt = jnp.roll(tr, -1, axis=0)
                cnxt = jnp.roll(const_a, -1, axis=0)
                ctx = Ctx(BaseVectorAlgebra(jnp), VectorAccessors(jnp, tr, nxt, const_a, cnxt, pis_a))
                air.eval(ctx)
                return [d for _f, d, _deg in ctx.constraints]

            jitted = jax.jit(f)
            air._residuals_jit = jitted

        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            outs = jitted(jnp.asarray(trace), jnp.asarray(const), jnp.asarray(pis_arr))
        return [(filt, np.asarray(d)) for filt, d in zip(filts, outs)]

    nxt = np.roll(trace, -1, axis=0)
    cnxt = np.roll(const, -1, axis=0)
    alg = BaseVectorAlgebra(np)
    acc = VectorAccessors(np, trace, nxt, const, cnxt, pis_arr)
    ctx = Ctx(alg, acc)
    air.eval(ctx)
    return [(filt, np.asarray(d)) for filt, d, _deg in ctx.constraints]


def _degree_constraints(air):
    from ..backend.air import DegreeAccessors, DegreeAlgebra

    ctx = Ctx(DegreeAlgebra(), DegreeAccessors())
    air.eval(ctx)
    return ctx.constraints


def assert_zero_residuals(air, trace: np.ndarray, pis):
    n = air.num_rows
    bad = []
    for ci, (filt, res) in enumerate(residuals(air, trace, pis)):
        flat = res.reshape(-1, n)
        if filt[0] == "every":
            mask = np.ones(n, bool)
        elif filt[0] == "transition":
            mask = np.ones(n, bool)
            mask[n - 1] = False
        elif filt[0] == "row":
            mask = np.zeros(n, bool)
            mask[filt[1]] = True
        else:
            raise ValueError(filt)
        viol = flat[:, mask].any(axis=1)
        if viol.any():
            rows = np.nonzero(flat[:, mask].any(axis=0))[0]
            bad.append((ci, filt, int(viol.sum()), rows[:5]))
    assert not bad, f"nonzero residuals: {bad[:10]}"
