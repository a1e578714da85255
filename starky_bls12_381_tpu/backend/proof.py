"""Proof containers (host-side numpy payloads, pickle/npz serializable).

Shape of the protocol mirrors starky's proof objects (trace cap, quotient
cap, DEEP openings at zeta / zeta*g, FRI commit-phase caps + final
polynomial + query rounds + grinding witness); SURVEY.md §2.2.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np


@dataclass
class FriStep:
    """One fold layer at one query: the committed (v(x), v(-x)) pair and its
    Merkle path. Values are GF(p^2): arrays of shape (2,) = (re, im)."""

    pair: np.ndarray  # (2, 2) uint64: [value(x), value(-x)] x (re, im)
    path: List[np.ndarray]  # sibling digests, each (4,)


@dataclass
class FriQueryRound:
    index: int
    trace_row: np.ndarray  # (C,) uint64 — opened trace LDE row
    trace_path: List[np.ndarray]
    quotient_row: np.ndarray  # (Q,) uint64
    quotient_path: List[np.ndarray]
    steps: List[FriStep]


@dataclass
class FriProof:
    layer_caps: List[np.ndarray]  # per fold layer: (2^cap, 4)
    final_coeffs: np.ndarray  # (L, 2) uint64 — GF(p^2) coefficients
    pow_nonce: int
    query_rounds: List[FriQueryRound]


@dataclass
class StarkProof:
    trace_cap: np.ndarray  # (2^cap, 4) uint64
    quotient_cap: np.ndarray
    trace_local: np.ndarray  # (C, 2) — openings at zeta
    trace_next: np.ndarray  # (C, 2) — openings at g*zeta
    quotient_open: np.ndarray  # (num_challenges * factor, 2) at zeta
    fri: FriProof

    def size_bytes(self) -> int:
        total = 0

        def visit(x):
            nonlocal total
            if isinstance(x, np.ndarray):
                total += x.nbytes
            elif isinstance(x, (list, tuple)):
                for y in x:
                    visit(y)
            elif hasattr(x, "__dataclass_fields__"):
                for f in x.__dataclass_fields__:
                    visit(getattr(x, f))

        visit(self)
        return total
