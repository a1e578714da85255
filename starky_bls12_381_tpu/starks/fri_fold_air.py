"""FRI fold-chain AIR: verifies one query's arity-2 fold cascade in-STARK.

Fourth chip of the recursive-verification layer. A FRI query round checks,
per layer l, that the opened pair (v(x), v(-x)) folds to

    f_next(x^2) = (v(x) + v(-x))/2 + beta_l * (v(x) - v(-x)) / (2x)

and that the running value equals the pair element selected by the query
position bit (backend/verifier.py:194-218). This AIR proves exactly that
chain for one query: one row per layer holding the GF(p^2) pair and the
folded output; the transition constraint selects the next layer's pair
element by the (public) position bit.

PIs per layer l: beta_l (2), xinv_l (1, = 1/(2*x_pos_l) premultiplied by
the verifier — it derives x_pos from the query index it already checks),
bit_l (the `mine` selector, = 1 iff pos >= half at layer l); plus the
initial DEEP value (2) and the final value (2, checked against the final
polynomial by the outer verifier). All fold arithmetic is degree <= 2 in
trace columns (betas/xinvs/bits are public), rate-1 config applies.
"""

from __future__ import annotations

import numpy as np

from ..backend.air import Air
from ..fields import goldilocks as gl

# trace columns: pair (v0re v0im v1re v1im), folded out (re, im)
V0 = 0
V1 = 2
OUT = 4
TOTAL_COLS = 6


class FriFoldAir(Air):
    """Fold cascade for one query across num_layers FRI layers."""

    def __init__(self, num_layers: int = 8):
        self.num_layers = num_layers
        self.num_rows = max(8, _next_pow2(num_layers + 1))
        self.num_cols = TOTAL_COLS
        # PIs: per layer [beta(2), xinv(1), bit(1)] then init(2), final(2)
        self.PIS_LAYERS = 0
        self.PIS_INIT = num_layers * 4
        self.PIS_FINAL = self.PIS_INIT + 2
        self.num_pis = self.PIS_FINAL + 2

    # -- trace ------------------------------------------------------------
    def generate_trace(self, init_value, pairs, betas, x_positions, bits):
        """init_value: ext tuple (the DEEP value at the query point);
        pairs: num_layers [(v(x), v(-x))] ext tuples; betas: per-layer ext;
        x_positions: per-layer base x_pos; bits: per-layer `mine` selector.
        Returns (trace, pis). Asserts chain consistency like the verifier.
        """
        L = self.num_layers
        assert len(pairs) == len(betas) == len(x_positions) == len(bits) == L
        trace = np.zeros((self.num_rows, TOTAL_COLS), dtype=np.uint64)
        pis = []
        value = (int(init_value[0]) % gl.P, int(init_value[1]) % gl.P)
        for l in range(L):
            va, vb = pairs[l]
            va = (int(va[0]) % gl.P, int(va[1]) % gl.P)
            vb = (int(vb[0]) % gl.P, int(vb[1]) % gl.P)
            pair = [va, vb]
            assert pair[bits[l]] == value, f"fold input mismatch at layer {l}"
            trace[l, V0 : V0 + 2] = va
            trace[l, V1 : V1 + 2] = vb
            xinv = gl.inv_s(2 * int(x_positions[l]) % gl.P)
            s = gl.ext_add(va, vb)
            d = gl.ext_sub(va, vb)
            value = gl.ext_add(
                gl.ext_scalar_mul(s, gl.inv_s(2)),
                gl.ext_scalar_mul(gl.ext_mul(betas[l], d), xinv),
            )
            trace[l, OUT : OUT + 2] = value
            pis.extend([int(betas[l][0]) % gl.P, int(betas[l][1]) % gl.P, xinv, int(bits[l])])
        pis.extend([int(init_value[0]) % gl.P, int(init_value[1]) % gl.P])
        pis.extend([value[0], value[1]])
        return trace, pis

    # -- constraints -------------------------------------------------------
    def eval(self, ctx):
        v0 = ctx.local(V0, 2)
        v1 = ctx.local(V1, 2)
        out = ctx.local(OUT, 2)
        W = gl.W_EXT

        for l in range(self.num_layers):
            beta = ctx.pi(self.PIS_LAYERS + 4 * l, 2)
            xinv2 = ctx.pi(self.PIS_LAYERS + 4 * l + 2)  # 1/(2x)
            bit = ctx.pi(self.PIS_LAYERS + 4 * l + 3)
            # fold identity at row l (all public scalars => degree 1):
            # out = (v0+v1)/2 + beta*(v0-v1)*1/(2x)
            #  <=>  2x... keep premultiplied: s/2 absorbed by using xinv2
            # components with half = inv(2):
            s0 = v0[0] + v1[0]
            s1 = v0[1] + v1[1]
            d0 = v0[0] - v1[0]
            d1 = v0[1] - v1[1]
            half = gl.inv_s(2)
            t0 = (beta[0] * d0 + W * (beta[1] * d1)) * xinv2
            t1 = (beta[0] * d1 + beta[1] * d0) * xinv2
            ctx.constraint(out[0] - (half * s0 + t0), ("row", l))
            ctx.constraint(out[1] - (half * s1 + t1), ("row", l))
            # chain: this row's selected pair element equals the previous
            # row's folded output (layer 0 binds to the DEEP init PI)
            sel0 = bit * v1[0] + (1 - bit) * v0[0]
            sel1 = bit * v1[1] + (1 - bit) * v0[1]
            if l == 0:
                init = ctx.pi(self.PIS_INIT, 2)
                ctx.constraint(sel0 - init[0], ("row", 0))
                ctx.constraint(sel1 - init[1], ("row", 0))
        # chain transitions: out at row l feeds the selection at row l+1.
        # written as a single gated transition using next-row access.
        nxt_v0 = ctx.next(V0, 2)
        nxt_v1 = ctx.next(V1, 2)
        for l in range(self.num_layers - 1):
            bit_next = ctx.pi(self.PIS_LAYERS + 4 * (l + 1) + 3)
            sel0 = bit_next * nxt_v1[0] + (1 - bit_next) * nxt_v0[0]
            sel1 = bit_next * nxt_v1[1] + (1 - bit_next) * nxt_v0[1]
            ctx.constraint(sel0 - out[0], ("row", l))
            ctx.constraint(sel1 - out[1], ("row", l))
        final = ctx.pi(self.PIS_FINAL, 2)
        ctx.constraint(out[0] - final[0], ("row", self.num_layers - 1))
        ctx.constraint(out[1] - final[1], ("row", self.num_layers - 1))


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()
