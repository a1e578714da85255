"""Grand-product permutation argument (copy constraints) over two phases.

The reference's plonky2 backend gets cell-to-cell copy wiring from its
permutation argument (plonk.rs in the external crate); this module rebuilds
the capability for this backend's two-phase commitment (docs/RECURSION.md
item 2): a `CopyConstraintSystem` takes K phase-1 "slot" columns and a set
of copy classes over their (slot, row) cells, and emits

* 2K constant label columns: id_j(i) = j*n + i + 1 and sigma_j(i) = the
  label of the cell's successor in its copy-class cycle (identity where no
  class touches the cell);
* per challenge set c (independent (beta_c, gamma_c) pairs drawn after the
  phase-1 commitment): K-1 numerator partials, K-1 denominator partials and
  one running product Z, as phase-2 columns;
* constraints (all degree <= 3, rate-1 compatible):
    PN_1 = t_0 * t_1, PN_j = PN_{j-1} * t_j   with t_j = v_j + beta*id_j + gamma
    PD likewise over sigma labels
    Z(0) = 1
    Z(next) * PD = Z * PN           (transition rows)
    Z * PN = PD                     (last row: product closes to 1)

Soundness: the products agree iff the multisets {(v, id)} and {(v, sigma)}
agree (up to Schwartz-Zippel error ~ cells/p per challenge set), which for
a permutation sigma made of copy-class cycles holds iff all cells of each
class carry equal values. Two independent challenge sets square the error
(plonky2 uses the same duplication for its ~2^-100 budget).
"""

from __future__ import annotations

import numpy as np

from ..fields import goldilocks as gl


def batch_inv(vals: np.ndarray) -> np.ndarray:
    """Montgomery batch inversion of a nonzero uint64 array (host)."""
    v = [int(x) for x in vals]
    n = len(v)
    prefix = [1] * (n + 1)
    for i in range(n):
        prefix[i + 1] = prefix[i] * v[i] % gl.P
    inv_all = pow(prefix[n], gl.P - 2, gl.P)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % gl.P
        inv_all = inv_all * v[i] % gl.P
    return np.asarray(out, dtype=np.uint64)


class CopyConstraintSystem:
    """Copy constraints over K slot columns x n rows, for a two-phase air.

    Usage (inside an Air's __init__):
        ccs = CopyConstraintSystem(num_rows, [colA, colB], num_sets=2)
        ccs.connect([(0, 3), (1, 7)])     # trace[3, colA] == trace[7, colB]
        ...
        air.num_cols2 = ccs.num_cols2
        air.num_phase_challenges = ccs.num_phase_challenges
    and from the air's constant_columns()/generate_trace2()/eval() forward
    to ccs.label_columns()/ccs.generate_trace2()/ccs.eval(ctx, ...).
    """

    def __init__(self, num_rows: int, slot_cols, num_sets: int = 2):
        self.n = num_rows
        self.slot_cols = list(slot_cols)
        self.K = len(self.slot_cols)
        self.num_sets = num_sets
        # labels: id_j(i) = j*n + i + 1 (nonzero); sigma starts as identity
        self._ids = np.arange(1, self.K * self.n + 1, dtype=np.uint64).reshape(self.K, self.n)
        self._sigma = self._ids.copy()
        self._frozen = False
        # phase-2 layout per challenge set: [PN_1..PN_{K-1}, PD_1.., Z]
        self.per_set = 2 * max(0, self.K - 1) + 1
        self.num_cols2 = num_sets * self.per_set
        self.num_phase_challenges = 2 * num_sets

    def connect(self, cells) -> None:
        """`cells`: [(slot_idx, row), ...] — constrain all equal. Each cell
        may appear in at most ONE class across all connect calls."""
        assert not self._frozen
        assert len(cells) >= 2
        labels = [int(self._ids[j, i]) for j, i in cells]
        for k, (j, i) in enumerate(cells):
            assert self._sigma[j, i] == self._ids[j, i], f"cell {(j, i)} already wired"
            self._sigma[j, i] = labels[(k + 1) % len(cells)]

    # -- constant label columns -----------------------------------------
    def label_columns(self) -> np.ndarray:
        """(n, 2K) uint64: id columns then sigma columns."""
        self._frozen = True
        return np.concatenate([self._ids.T, self._sigma.T], axis=1)

    # -- phase-2 witness -------------------------------------------------
    def generate_trace2(self, trace: np.ndarray, challenges) -> np.ndarray:
        """(n, num_cols2) phase-2 columns from the phase-1 trace values."""
        n, K = self.n, self.K
        vals = np.stack(
            [np.asarray(trace[:, c], dtype=np.uint64) % np.uint64(gl.P) for c in self.slot_cols]
        )  # (K, n)
        out = np.zeros((n, self.num_cols2), dtype=np.uint64)
        for s in range(self.num_sets):
            beta = np.uint64(int(challenges[2 * s]) % gl.P)
            gamma = np.uint64(int(challenges[2 * s + 1]) % gl.P)
            t_num = gl.gl_add(vals, gl.gl_add(gl.gl_mul(np.broadcast_to(beta, self._ids.shape), self._ids), gamma))
            t_den = gl.gl_add(vals, gl.gl_add(gl.gl_mul(np.broadcast_to(beta, self._sigma.shape), self._sigma), gamma))
            base = s * self.per_set
            pn = t_num[0]
            pd = t_den[0]
            for j in range(1, K):
                pn = np.asarray(gl.gl_mul(pn, t_num[j]))
                pd = np.asarray(gl.gl_mul(pd, t_den[j]))
                out[:, base + (j - 1)] = pn
                out[:, base + (K - 1) + (j - 1)] = pd
            # Z(0)=1; Z(i+1) = Z(i) * pn(i) / pd(i)
            ratio = np.asarray(gl.gl_mul(pn, batch_inv(pd)))
            z = np.empty(n, dtype=np.uint64)
            acc = 1
            for i in range(n):
                z[i] = acc
                acc = acc * int(ratio[i]) % gl.P
            assert acc == 1, "copy classes do not hold on this trace"
            out[:, base + 2 * (K - 1)] = z
        return out

    # -- constraints -----------------------------------------------------
    def eval(self, ctx, const_base: int, chal_base: int = 0, p2_base: int = 0) -> None:
        """Emit the argument's constraints. `const_base`: first label
        column's index among the air's constant columns; `chal_base`:
        offset of this system's challenges within the air's phase
        challenges; `p2_base`: offset of its phase-2 columns."""
        K = self.K
        from .air import LAST, ROW

        for s in range(self.num_sets):
            beta = ctx.challenge(chal_base + 2 * s)
            gamma = ctx.challenge(chal_base + 2 * s + 1)
            base = p2_base + s * self.per_set
            t_num, t_den = [], []
            for j in range(K):
                v = ctx.local(self.slot_cols[j])
                idc = ctx.const(const_base + j)
                sgc = ctx.const(const_base + K + j)
                t_num.append(v + beta * idc + gamma)
                t_den.append(v + beta * sgc + gamma)
            pn = t_num[0]
            pd = t_den[0]
            for j in range(1, K):
                pn_c = ctx.local2(base + (j - 1))
                pd_c = ctx.local2(base + (K - 1) + (j - 1))
                ctx.constraint(pn_c - pn * t_num[j])
                ctx.constraint(pd_c - pd * t_den[j])
                pn, pd = pn_c, pd_c
            z = ctx.local2(base + 2 * (K - 1))
            z_next = ctx.next2(base + 2 * (K - 1))
            ctx.constraint(z - 1, ROW(0))
            ctx.constraint_transition(z_next * pd - z * pn)
            ctx.constraint(z * pn - pd, LAST(self.n))
