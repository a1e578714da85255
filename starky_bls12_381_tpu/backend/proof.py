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
    # phase-2 commitment (permutation-argument columns); None single-phase
    trace2_row: np.ndarray | None = None  # (C2,) uint64
    trace2_path: List[np.ndarray] | None = None


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
    # phase-2 commitment (two-phase airs); None for single-phase proofs
    trace2_cap: np.ndarray | None = None
    trace2_local: np.ndarray | None = None  # (C2, 2)
    trace2_next: np.ndarray | None = None  # (C2, 2)

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


# ---------------------------------------------------------------------------
# Wire format: versioned, deterministic little-endian u64 stream.
# The reference serializes proofs through plonky2's buffer format (and
# declares plonky2-circuit-serializer, Cargo.toml:19); here the capability
# is a self-describing binary encoding independent of pickle.
# ---------------------------------------------------------------------------

_MAGIC = b"SBTP"  # starky_bls12_381_tpu proof
_VERSION = 1


def _w_arr(out: list, a: np.ndarray):
    a = np.ascontiguousarray(a, dtype=np.uint64)
    out.append(np.uint64(a.ndim).tobytes())
    out.append(np.asarray(a.shape, dtype=np.uint64).tobytes())
    out.append(a.tobytes())


class _Reader:
    def __init__(self, data: bytes, off: int = 0):
        self.data = data
        self.off = off

    def u64(self) -> int:
        v = int.from_bytes(self.data[self.off : self.off + 8], "little")
        self.off += 8
        return v

    def arr(self) -> np.ndarray:
        ndim = self.u64()
        shape = tuple(self.u64() for _ in range(ndim))
        n = int(np.prod(shape)) if shape else 1
        a = np.frombuffer(self.data, dtype="<u8", count=n, offset=self.off).reshape(shape)
        self.off += 8 * n
        return a.astype(np.uint64)


def proof_to_bytes(p: StarkProof) -> bytes:
    # single-phase proofs keep the exact version-1 byte stream; a phase-2
    # commitment bumps the version and appends its fields in-place
    two_phase = p.trace2_cap is not None
    out: list = [_MAGIC, (2 if two_phase else _VERSION).to_bytes(4, "little")]
    _w_arr(out, p.trace_cap)
    if two_phase:
        _w_arr(out, p.trace2_cap)
    _w_arr(out, p.quotient_cap)
    _w_arr(out, p.trace_local)
    _w_arr(out, p.trace_next)
    if two_phase:
        _w_arr(out, p.trace2_local)
        _w_arr(out, p.trace2_next)
    _w_arr(out, p.quotient_open)
    f = p.fri
    out.append(np.uint64(len(f.layer_caps)).tobytes())
    for cap in f.layer_caps:
        _w_arr(out, cap)
    _w_arr(out, f.final_coeffs)
    out.append(np.uint64(f.pow_nonce).tobytes())
    out.append(np.uint64(len(f.query_rounds)).tobytes())
    for q in f.query_rounds:
        out.append(np.uint64(q.index).tobytes())
        _w_arr(out, q.trace_row)
        out.append(np.uint64(len(q.trace_path)).tobytes())
        for d in q.trace_path:
            _w_arr(out, d)
        if two_phase:
            _w_arr(out, q.trace2_row)
            out.append(np.uint64(len(q.trace2_path)).tobytes())
            for d in q.trace2_path:
                _w_arr(out, d)
        _w_arr(out, q.quotient_row)
        out.append(np.uint64(len(q.quotient_path)).tobytes())
        for d in q.quotient_path:
            _w_arr(out, d)
        out.append(np.uint64(len(q.steps)).tobytes())
        for s in q.steps:
            _w_arr(out, s.pair)
            out.append(np.uint64(len(s.path)).tobytes())
            for d in s.path:
                _w_arr(out, d)
    return b"".join(out)


def proof_from_bytes(data: bytes) -> StarkProof:
    assert data[:4] == _MAGIC, "bad proof magic"
    version = int.from_bytes(data[4:8], "little")
    assert version in (_VERSION, 2), f"unsupported proof version {version}"
    two_phase = version == 2
    r = _Reader(data, 8)
    trace_cap = r.arr()
    trace2_cap = r.arr() if two_phase else None
    quotient_cap = r.arr()
    trace_local = r.arr()
    trace_next = r.arr()
    trace2_local = r.arr() if two_phase else None
    trace2_next = r.arr() if two_phase else None
    quotient_open = r.arr()
    layer_caps = [r.arr() for _ in range(r.u64())]
    final_coeffs = r.arr()
    pow_nonce = r.u64()
    rounds = []
    for _ in range(r.u64()):
        index = r.u64()
        trace_row = r.arr()
        trace_path = [r.arr() for _ in range(r.u64())]
        trace2_row = trace2_path = None
        if two_phase:
            trace2_row = r.arr()
            trace2_path = [r.arr() for _ in range(r.u64())]
        quotient_row = r.arr()
        quotient_path = [r.arr() for _ in range(r.u64())]
        steps = []
        for _ in range(r.u64()):
            pair = r.arr()
            path = [r.arr() for _ in range(r.u64())]
            steps.append(FriStep(pair=pair, path=path))
        rounds.append(
            FriQueryRound(
                index=index,
                trace_row=trace_row,
                trace_path=trace_path,
                quotient_row=quotient_row,
                quotient_path=quotient_path,
                steps=steps,
                trace2_row=trace2_row,
                trace2_path=trace2_path,
            )
        )
    assert r.off == len(data), "trailing bytes in proof"
    return StarkProof(
        trace_cap=trace_cap,
        quotient_cap=quotient_cap,
        trace_local=trace_local,
        trace_next=trace_next,
        quotient_open=quotient_open,
        fri=FriProof(
            layer_caps=layer_caps,
            final_coeffs=final_coeffs,
            pow_nonce=pow_nonce,
            query_rounds=rounds,
        ),
        trace2_cap=trace2_cap,
        trace2_local=trace2_local,
        trace2_next=trace2_next,
    )
