"""Chip infrastructure: column allocation, constant selector patterns, wiring.

The reference identifies every op gadget by compile-time column offsets and
gates its constraints with witness selector columns filled alongside the
data (SURVEY.md §1 "key architectural idiom"). Here:

* `Alloc` hands out witness / constant column ranges;
* constant selector patterns (which rows a gadget is active on, bit
  schedules, phase indicators) are interned into PUBLIC constant columns —
  computed by the verifier, not committed, impossible to forge, and free of
  the reference's unconstrained-selector soundness gap;
* `Wiring` records equality bindings between column ranges at fixed row
  sets (the reference does this with per-stark selector-gated constraint
  code, e.g. miller_loop.rs:180-190 R-register chaining).

Gadgets allocate their columns in __init__, write witness rows in
`fill(trace, row0, ...)` (numpy, vectorized across limbs), and emit
constraints once in `eval(ctx)` — the same eval serves prover and verifier
through the backend's algebra abstraction.
"""

from __future__ import annotations

import numpy as np


class Alloc:
    def __init__(self):
        self.n = 0

    def take(self, width: int) -> int:
        off = self.n
        self.n += width
        return off


class ChipBuilder:
    """Shared per-air builder: witness columns, interned constant patterns,
    wiring constraints."""

    def __init__(self, num_rows: int):
        self.num_rows = num_rows
        self.wit = Alloc()
        self.con = Alloc()
        self._patterns: dict = {}  # frozenset(rows) -> const col
        self._group_patterns: dict = {}  # tuple of frozensets -> base col
        self.wirings: list = []  # (rows_key, col_a, col_b, width)
        self.const_bindings: list = []  # (rows_key, col, values tuple)
        self.pi_bindings: list = []  # (rows_key, col, pi_idx, width)
        self.registry: dict = {}  # gadget type key -> [instances]

    def register(self, key, inst):
        self.registry.setdefault(key, []).append(inst)

    # -- column overlays -------------------------------------------------
    # Gadget families whose active rows are disjoint may share column space
    # (the reference does this with its FINAL_EXP_OP_OFFSET shared op region
    # and the BIT0/BIT1 overlay of calc_pairing_precomp.rs:46). Allocation
    # between begin_overlay()/next_variant()/end_overlay() reuses the same
    # base; end_overlay() advances the allocator past the widest variant.

    def begin_overlay(self):
        self._overlay_base = self.wit.n
        self._overlay_max = self.wit.n

    def next_variant(self):
        self._overlay_max = max(self._overlay_max, self.wit.n)
        self.wit.n = self._overlay_base

    def end_overlay(self):
        self._overlay_max = max(self._overlay_max, self.wit.n)
        self.wit.n = self._overlay_max
        del self._overlay_base, self._overlay_max

    def eval_all(self, ctx):
        """Emit every registered gadget type's batched constraints plus all
        wiring/binding constraints. Iteration order is insertion order, so
        prover and verifier (same air instance/construction) agree."""
        for key, insts in self.registry.items():
            insts[0].eval_batched(ctx, insts)
        self.eval_wiring(ctx)

    # -- constant selector patterns -------------------------------------
    def indicator(self, rows) -> int:
        key = frozenset(rows)
        if key not in self._patterns:
            self._patterns[key] = self.con.take(1)
        return self._patterns[key]

    def indicator_group(self, row_sets) -> int:
        """Contiguous block of indicator columns (for ctx.const(base, k))."""
        key = tuple(frozenset(r) for r in row_sets)
        if key not in self._group_patterns:
            base = self.con.take(len(key))
            self._group_patterns[key] = base
        return self._group_patterns[key]

    def build_const_matrix(self) -> np.ndarray | None:
        k = self.con.n
        if k == 0:
            return None
        mat = np.zeros((self.num_rows, k), dtype=np.uint64)
        for rows, col in self._patterns.items():
            for r in rows:
                mat[r, col] = 1
        for row_sets, base in self._group_patterns.items():
            for j, rows in enumerate(row_sets):
                for r in rows:
                    mat[r, base + j] = 1
        return mat

    # -- wiring ----------------------------------------------------------
    def wire(self, rows, col_a: int, col_b: int, width: int):
        """Constrain trace[r, col_a:col_a+width] == trace[r, col_b:col_b+width]
        for r in rows."""
        self.wirings.append((frozenset(rows), col_a, col_b, width))

    def bind_const(self, rows, col: int, values):
        """Constrain trace[r, col:col+len(values)] == values (public ints)."""
        self.const_bindings.append((frozenset(rows), col, tuple(int(v) for v in values)))

    def bind_pi(self, rows, col: int, pi_idx: int, width: int):
        """Constrain trace[r, col:col+width] == public_inputs[pi_idx:pi_idx+width]."""
        self.pi_bindings.append((frozenset(rows), col, pi_idx, width))

    def eval_wiring(self, ctx):
        """Batched by width: one (G, width, domain) emission per group."""

        def colmat(offs, w):
            return np.asarray(offs, dtype=np.int64)[:, None] + np.arange(w, dtype=np.int64)[None, :]

        groups: dict = {}
        for rows, a, b, w in self.wirings:
            groups.setdefault(w, []).append((self.indicator(rows), a, b))
        for w in sorted(groups):
            items = groups[w]
            sel = ctx.const_g(np.asarray([s for s, _, _ in items])[:, None])
            a = ctx.local_g(colmat([a for _, a, _ in items], w))
            b = ctx.local_g(colmat([b for _, _, b in items], w))
            ctx.constraint(sel * (a - b))
        cgroups: dict = {}
        for rows, col, values in self.const_bindings:
            cgroups.setdefault(len(values), []).append((self.indicator(rows), col, values))
        for w in sorted(cgroups):
            items = cgroups[w]
            sel = ctx.const_g(np.asarray([s for s, _, _ in items])[:, None])
            a = ctx.local_g(colmat([c for _, c, _ in items], w))
            vals = ctx.lift(np.asarray([list(v) for _, _, v in items], dtype=np.uint64))
            ctx.constraint(sel * (a - vals))
        pgroups: dict = {}
        for rows, col, pi_idx, width in self.pi_bindings:
            pgroups.setdefault(width, []).append((self.indicator(rows), col, pi_idx))
        for w in sorted(pgroups):
            items = pgroups[w]
            sel = ctx.const_g(np.asarray([s for s, _, _ in items])[:, None])
            a = ctx.local_g(colmat([c for _, c, _ in items], w))
            p = ctx.pi_g(colmat([pi for _, _, pi in items], w))
            ctx.constraint(sel * (a - p))

    def finalize_wiring_patterns(self):
        """Intern all wiring indicator patterns (call before building the
        const matrix so eval-time lookups hit existing columns)."""
        for rows, *_ in self.wirings:
            self.indicator(rows)
        for rows, *_ in self.const_bindings:
            self.indicator(rows)
        for rows, *_ in self.pi_bindings:
            self.indicator(rows)


def _const_vec(ctx, values):
    """A stacked constant column vector (len(values), 1-broadcast)."""
    import numpy as np

    from ..backend.air import V

    alg = ctx.alg
    if alg.__class__.__name__ == "DegreeAlgebra":
        return V(alg, 0, 0)
    if alg.__class__.__name__ == "TapeAlgebra":
        # no trailing domain/pair axis: (len,) broadcasts against (G, w)
        return V(alg, alg.lift_ints(np.asarray([int(v) for v in values], dtype=np.uint64)), 0)
    if alg.__class__.__name__ == "ExtScalarAlgebra":
        data = np.array([[int(v), 0] for v in values], dtype=object)
        return V(alg, data, 0)
    if alg.__class__.__name__ == "ExtVectorAlgebra":
        data = np.zeros((len(values), 2), dtype=np.uint64)
        data[:, 0] = np.asarray([int(v) for v in values], dtype=np.uint64)
        return V(alg, data, 0)
    xp = alg.xp
    arr = np.asarray([int(v) for v in values], dtype=np.uint64).reshape(len(values), 1)
    return V(alg, arr if xp is np else xp.asarray(arr), 0)


class FillRecorder:
    """Drop-in 'trace' target for generate_trace: leaf gadget fills RECORD
    (instance, row, inputs) instead of expanding witness blocks one window
    at a time, and `flush()` executes ONE vectorized expansion per leaf
    gadget TYPE (the trace-generation dual of the type-batched constraint
    eval). This turns the ~10^5 tiny per-window numpy dispatches of a wide
    trace fill into a handful of (B, rows, limbs) batch ops — and because
    the batch executors are plain array code, the same expansion can run
    under jax.jit straight into device HBM (on-device trace generation).
    """

    def __init__(self, num_rows: int, num_cols: int):
        self.shape = (num_rows, num_cols)
        self.records: dict = {}  # leaf type key -> list of tuples
        self.direct: list = []  # (row0, col, values2d) raw block writes

    def record(self, key, item):
        self.records.setdefault(key, []).append(item)

    def _prepared(self):
        from . import fp as _fp

        out = []
        for key, recs in self.records.items():
            base = key[0] if isinstance(key, tuple) else key
            prep, expand = _fp.FILL_BATCHERS[base]
            out.append((key, expand, prep(key, recs)))
        return out

    def flush(self, out: np.ndarray | None = None) -> np.ndarray:
        """Expand all records into a host numpy trace array."""
        from . import fp as _fp

        if out is None:
            out = np.zeros(self.shape, dtype=np.uint64)
        for row0, col, vals in self.direct:
            vals = np.asarray(vals, dtype=np.uint64)
            if vals.ndim == 1:
                out[row0, col : col + vals.shape[0]] = vals
            else:
                out[row0 : row0 + vals.shape[0], col : col + vals.shape[1]] = vals
        w = _fp.TraceWriter(np, out)
        for _key, expand, d in self._prepared():
            expand(w, _key, d)
        return out

    def flush_device(self, jit_cache: dict | None = None):
        """Expand all records into a DEVICE trace array under jax.jit:
        only the prepared inputs (limb value arrays, a few MB) cross the
        host->device link; the witness expansion (100s of MB for the wide
        BLS traces) happens in HBM. Every write — batched leaf-gadget
        fields and shape-grouped direct writes alike — is one flat
        unique-index scatter whose index grid is computed on device from
        small static vectors, so the traced graph is a few dozen ops with
        a tiny MLIR payload regardless of trace width. Returns a jnp
        (rows, cols) uint64 array ready for StarkProver.prove."""
        import jax
        import jax.numpy as jnp

        from . import fp as _fp

        prepared = self._prepared()
        R, C = self.shape

        # direct writes grouped by (block shape, broadcast?): one scatter
        # per group. Within a group the write order must not matter, so
        # host-sequential "last write wins" semantics are preserved by
        # dropping all but the last write to any cell (checked cheaply via
        # the flat base indices — blocks of one group are identical shape).
        dgroups: dict = {}
        for row0, col, vals in self.direct:
            vals = np.asarray(vals, dtype=np.uint64)
            if vals.ndim == 2 and vals.strides[0] == 0:  # broadcast rows
                key = (vals.shape[0], vals.shape[1], True)
                v = np.ascontiguousarray(vals[0])
            elif vals.ndim == 1:
                key = (1, vals.shape[0], False)
                v = vals[None, :]
            else:
                key = (vals.shape[0], vals.shape[1], False)
                v = np.ascontiguousarray(vals)
            dgroups.setdefault(key, []).append((row0 * C + col, v))
        dmeta = []  # (h, w, bcast, base int32 (n,))
        dvals = []
        for (h, wid, bcast), items in dgroups.items():
            base = np.asarray([b for b, _ in items], dtype=np.int32)
            # keep the LAST write per base (matches sequential host flush);
            # same-shape blocks at the same base fully overlap
            _, last = np.unique(base[::-1], return_index=True)
            if last.shape[0] != base.shape[0]:
                keep = np.sort(base.shape[0] - 1 - last)
                base = base[keep]
                items = [items[i] for i in keep]
            dmeta.append((h, wid, bcast, base))
            dvals.append(np.stack([v for _, v in items]))

        def build(dv, pvals):
            # widen u32-shipped value arrays back to the u64 trace domain
            dv = [v.astype(jnp.uint64) for v in dv]
            pvals = [{n: v.astype(jnp.uint64) for n, v in d.items()} for d in pvals]
            flat = jnp.zeros(R * C, dtype=jnp.uint64)
            for (h, wid, bcast, base), v in zip(dmeta, dv):
                offs = (
                    np.arange(h, dtype=np.int32)[:, None] * np.int32(C)
                    + np.arange(wid, dtype=np.int32)[None, :]
                ).reshape(-1)
                idx = (jnp.asarray(base)[:, None] + jnp.asarray(offs)[None, :]).reshape(-1)
                if bcast:
                    vv = jnp.broadcast_to(v[:, None, :], (v.shape[0], h, wid))
                else:
                    vv = v
                flat = flat.at[idx].set(vv.reshape(-1), unique_indices=True)
            w = _fp.TraceWriter(jnp, flat, C)
            for (key, expand, d), pv in zip(prepared, pvals):
                d = dict(d)
                d.update(pv)
                expand(w, key, d)
            return w.arr.reshape(R, C)

        # the VALUE arrays are jit inputs (only they differ between
        # statements); the write schedule (row groups + column bases)
        # stays static host data feeding tiny on-device index math.
        # BLS limb values are u32 by construction — ship them narrow
        # (halves the host->device transfer) and widen on device.
        def _ship(v):
            if v.size and int(v.max()) < (1 << 32):
                return jnp.asarray(v.astype(np.uint32))
            return jnp.asarray(v)

        dv = [_ship(v) for v in dvals]
        pvals = [
            {n: _ship(v) for n, v in d.items() if isinstance(v, np.ndarray)}
            for _k, _e, d in prepared
        ]
        # one compiled expansion per (air) record structure: the schedule
        # is identical across statements, only the prepared VALUES differ
        key = tuple((str(k), d["xv"].shape) for k, _e, d in prepared) + (
            tuple((h, wid, bcast, b.shape[0]) for h, wid, bcast, b in dmeta),
        )
        fn = jit_cache.get(key) if jit_cache is not None else None
        if fn is None:
            fn = jax.jit(build)
            if jit_cache is not None:
                jit_cache[key] = fn
        return fn(dv, pvals)


def finish_trace(air, rec: "FillRecorder", device: bool = False):
    """Flush a recorder to a host numpy trace, or (device=True) expand it
    on the accelerator under a per-air cached jit."""
    if device:
        cache = air.__dict__.setdefault("_fill_jit", {})
        return rec.flush_device(cache)
    return rec.flush()


def put(trace, row: int, col: int, values):
    values = np.asarray(values, dtype=np.uint64)
    if isinstance(trace, FillRecorder):
        trace.direct.append((row, col, values))
        return
    trace[row, col : col + values.shape[-1]] = values


def put_rows(trace, row0: int, col: int, values2d):
    """values2d (k, w): write k consecutive rows starting at row0."""
    if isinstance(trace, FillRecorder):
        trace.direct.append((row0, col, values2d))
        return
    values2d = np.asarray(values2d, dtype=np.uint64)
    trace[row0 : row0 + values2d.shape[0], col : col + values2d.shape[1]] = values2d
