"""Fiat–Shamir challenger: Poseidon duplex sponge over Goldilocks.

Re-creates the capability of plonky2's `Challenger` that starky's prover and
verifier thread through the protocol (SURVEY.md §2.2, §5 "faithful
Fiat–Shamir"). Runs host-side on python ints (it is inherently sequential
and tiny); the exact duplex order below IS the protocol — prover and
verifier both use this class, so they agree by construction.

Overwrite-mode duplex, rate 8, capacity 4 (256-bit).
"""

from __future__ import annotations

from . import poseidon as ps
from ..fields.goldilocks import P


class Challenger:
    def __init__(self):
        self.sponge = [0] * ps.WIDTH
        self.input_buf: list[int] = []
        self.output_buf: list[int] = []

    # -- observation ---------------------------------------------------
    def observe(self, x: int):
        self.output_buf = []
        self.input_buf.append(int(x) % P)
        if len(self.input_buf) == ps.RATE:
            self._absorb_chunk()

    def observe_many(self, xs):
        for x in xs:
            self.observe(int(x))

    def observe_cap(self, cap):
        """cap: (k, 4) array of digests."""
        for row in cap:
            self.observe_many(int(v) for v in row)

    def observe_ext(self, e):
        self.observe(e[0])
        self.observe(e[1])

    def observe_array(self, arr):
        """Absorb a wide uint64 array by its Poseidon tree digest (batched
        hashing host-side; both prover and verifier use this same path)."""
        for v in ps.hash_flat_tree(arr):
            self.observe(v)

    # -- internals -----------------------------------------------------
    def _absorb_chunk(self):
        chunk = self.input_buf[: ps.RATE]
        self.input_buf = self.input_buf[ps.RATE :]
        for j, v in enumerate(chunk):
            self.sponge[j] = v
        self.sponge = ps.permute_s(self.sponge)

    def _duplex(self):
        if self.input_buf:
            self._absorb_chunk()
        else:
            self.sponge = ps.permute_s(self.sponge)
        self.output_buf = list(self.sponge[: ps.RATE])

    # -- challenges ----------------------------------------------------
    def get_challenge(self) -> int:
        if not self.output_buf or self.input_buf:
            self._duplex()
        return self.output_buf.pop()

    def get_challenges(self, n: int):
        return [self.get_challenge() for _ in range(n)]

    def get_ext_challenge(self):
        return (self.get_challenge(), self.get_challenge())

    def get_indices(self, n: int, domain_size: int):
        assert domain_size & (domain_size - 1) == 0
        return [self.get_challenge() % domain_size for _ in range(n)]
