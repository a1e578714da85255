"""XmdFieldAir: in-proof XMD byte plumbing + hash_to_field mod-p reduction.

Closes the hash_to_field gap (`hash_to_field.rs:82-203` parity): the
reference proves, in-circuit, the b0-xor chain between expand_message_xmd
compressions and the L=64-byte big-endian mod-p reductions producing the
field elements. Here the same statements are one small STARK:

* XOR rows (one per 32-bit word): x_i[w] = b0[w] XOR b_{i-1}[w] for
  i = 2..ell, proved with bit decompositions of both operands and the
  bitwise identity x = a + b - 2ab; all three words are PI-bound, so the
  link layer can bind them to the Sha256Air stage's public words (the
  xored words ARE the next compression's message words).
* Reduction windows (12 rows each): u_k = val_k mod p where
  val_k = sum_j words[j] * 2^(32*(15-j)) over the 16 words of b_{2k+1} ||
  b_{2k+2} (the 64-byte big-endian string of RFC 9380 hash_to_field).
  Witnessed as val = q*p + r with q range-bound to 160 bits (q < 2^131.4
  mathematically), r < p range-checked: (q, r) is unique given val, and
  val is PI-bound limb by limb to the proved words.

PIs: [b0 (8w) | b1..b8 (64w) | x2..x8 (56w) | u limbs (4 x 12)].
The aggregate link layer binds b0/b_i to the h2f stage's chaining
outputs, x_i to the h2f stage's message words, and the u limbs to the
h2c stage's inputs — the field elements never need native recomputation.
"""

from __future__ import annotations

import numpy as np

from ..backend.air import Air
from ..chips import limbs
from ..chips.core import ChipBuilder, FillRecorder, finish_trace, put, put_rows
from ..chips.fp import AddNGadget, FpMulGadget, RangeCheckGadget, _rows_of
from ..fields.bls12_381 import P381

ELL = 8  # 256 bytes / 32 per digest
NXOR = (ELL - 1) * 8  # 56 xor words
NRED = 4  # u0.c0, u0.c1, u1.c0, u1.c1


class XmdFieldAir(Air):
    PI_B0 = 0
    PI_B = 8
    PI_X = 72
    PI_U = 128
    num_pis = 176

    def __init__(self):
        self.num_rows = 128
        cb = ChipBuilder(self.num_rows)
        self.cb = cb
        w = cb.wit

        # ---- xor rows 0..55 ------------------------------------------
        self.abits = w.take(32)
        self.bbits = w.take(32)
        self.aval = w.take(1)
        self.bval = w.take(1)
        self.oval = w.take(1)
        xor_rows = frozenset(range(NXOR))
        self.sel_xor = cb.indicator(xor_rows)
        for r in range(NXOR):
            i, word = divmod(r, 8)  # i = 0..6 -> chain step i+2
            cb.bind_pi({r}, self.aval, self.PI_B0 + word, 1)
            cb.bind_pi({r}, self.bval, self.PI_B + 8 * i + word, 1)
            cb.bind_pi({r}, self.oval, self.PI_X + r, 1)

        # ---- reduction windows rows 64..111 --------------------------
        row0s = [64 + 12 * k for k in range(NRED)]
        r11 = _rows_of(row0s, 11)
        self.qp = FpMulGadget(cb, row0s)  # q * p (q in the x register)
        cb.bind_const(_rows_of(row0s, 0), self.qp.y, limbs.P381_LIMBS)
        # q < 2^160: limbs 5..11 pinned zero
        cb.bind_const(_rows_of(row0s, 0), self.qp.x + 5, [0] * 7)
        self.r = w.take(12)
        from ..chips.fp import RegPinGadget, _all_rows

        RegPinGadget(cb, self.r, 12, _all_rows(row0s, 11))
        self.rc = RangeCheckGadget(cb, r11)
        cb.wire(r11, self.rc.x, self.r, 12)
        self.add = AddNGadget(cb, r11, 24)  # q*p + r == val
        cb.wire(r11, self.add.x, self.qp.sum, 24)
        cb.wire(r11, self.add.y, self.r, 12)
        cb.bind_const(r11, self.add.y + 12, [0] * 12)
        # val: 16 little-endian limbs == big-endian words of b_{2k+1}||b_{2k+2};
        # limbs 16..23 zero
        cb.bind_const(r11, self.add.sum + 16, [0] * 8)
        for k in range(NRED):
            row = 64 + 12 * k + 11
            for limb in range(16):
                word = 15 - limb  # big-endian word order
                j = 2 * k + (0 if word < 8 else 1)  # b_{2k+1} or b_{2k+2}
                cb.bind_pi({row}, self.add.sum + limb, self.PI_B + 8 * j + word % 8, 1)
            cb.bind_pi({row}, self.r, self.PI_U + 12 * k, 12)

        cb.finalize_wiring_patterns()
        self._const = cb.build_const_matrix()
        self.num_cols = cb.wit.n

    def constant_columns(self):
        return self._const

    def eval(self, ctx):
        self.cb.eval_all(ctx)
        sel = ctx.const(self.sel_xor)
        a = ctx.local(self.abits, 32)
        b = ctx.local(self.bbits, 32)
        ctx.constraint(sel[None] * a * (a - 1))
        ctx.constraint(sel[None] * b * (b - 1))
        pw = ctx.lift(np.asarray([1 << j for j in range(32)], dtype=np.uint64))
        ctx.constraint(sel * ((a * pw).sum0() - ctx.local(self.aval)))
        ctx.constraint(sel * ((b * pw).sum0() - ctx.local(self.bval)))
        x = a + b - 2 * a * b
        ctx.constraint(sel * ((x * pw).sum0() - ctx.local(self.oval)))

    def generate_trace(self, b_digests, device: bool = False):
        """b_digests: [b0, b1, ..., b8] as 8-word tuples (the h_out words
        of the XMD compressions). Returns (trace, pis)."""
        assert len(b_digests) == ELL + 1
        trace = FillRecorder(self.num_rows, self.num_cols)
        b0 = b_digests[0]
        pis = [int(x) for x in b0]
        for b in b_digests[1:]:
            pis.extend(int(x) for x in b)
        xors = []
        for i in range(2, ELL + 1):
            prev = b_digests[i - 1]
            xors.extend(int(b0[w]) ^ int(prev[w]) for w in range(8))
        pis.extend(xors)
        for r in range(NXOR):
            i, word = divmod(r, 8)
            a = int(b0[word])
            b = int(b_digests[i + 1][word])
            put(trace, r, self.abits, np.asarray([(a >> j) & 1 for j in range(32)], dtype=np.uint64))
            put(trace, r, self.bbits, np.asarray([(b >> j) & 1 for j in range(32)], dtype=np.uint64))
            put_rows(trace, r, self.aval, np.asarray([[a]], dtype=np.uint64))
            put_rows(trace, r, self.bval, np.asarray([[b]], dtype=np.uint64))
            put_rows(trace, r, self.oval, np.asarray([[a ^ b]], dtype=np.uint64))
        us = []
        for k in range(NRED):
            words = list(b_digests[2 * k + 1]) + list(b_digests[2 * k + 2])
            val = 0
            for wv in words:
                val = (val << 32) | int(wv)
            q, r = divmod(val, P381)
            assert q < (1 << 160)
            row0 = 64 + 12 * k
            self.qp.fill(trace, row0, q, P381)
            put_rows(trace, row0, self.r, np.broadcast_to(limbs.to_limbs(r), (12, 12)))
            self.rc.fill(trace, row0 + 11, limbs.to_limbs(r))
            self.add.fill(trace, row0 + 11, limbs.to_limbs(q * P381, 24), limbs.to_limbs(r, 24))
            us.append(r)
        for r_val in us:
            pis.extend(int(x) for x in limbs.to_limbs(r_val))
        return finish_trace(self, trace, device), pis
