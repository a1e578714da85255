"""ctypes binding for the native C tape evaluator (ext-op tapes).

Like backend/poseidon_native.py: builds `native/tape_eval.c` with the
system gcc on first use and evaluates an op tape (backend/optape.py) over
GF(p^2) in one C pass — the production-size tapes (~10^6 ops for the wide
BLS airs) evaluate in milliseconds instead of a minute of python loop.
Falls back silently (available() False) without a compiler."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_DIR, "tape_eval.c")

_lib = None
AVAILABLE = False
_BUILD_FAILED = False


def _build() -> str | None:
    try:
        src = open(_SRC, "rb").read()
    except OSError:
        return None
    tag = hashlib.blake2b(src, digest_size=8).hexdigest()
    so = os.path.join(_DIR, f"tape_eval-{tag}.so")
    if os.path.exists(so):
        return so
    cmd = ["gcc", "-O2", "-march=native", "-shared", "-fPIC", _SRC, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return so if os.path.exists(so) else None


def _load():
    global _lib, AVAILABLE, _BUILD_FAILED
    if _lib is not None or AVAILABLE:
        return _lib
    if _BUILD_FAILED:
        return None
    so = _build()
    if so is None:
        _BUILD_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        _BUILD_FAILED = True
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.eval_tape.argtypes = [i64p, i64p, i64p, ctypes.c_size_t, u64p, u64p]
    lib.eval_tape.restype = None
    _lib = lib
    AVAILABLE = True
    return _lib


def available() -> bool:
    return _load() is not None


def eval_tape(tape, leaves: dict) -> np.ndarray:
    """Evaluate all nodes: returns (len(tape), 2) uint64."""
    from .optape import L_INT, LEAF

    lib = _load()
    assert lib is not None
    nt = len(tape.ops)
    ops = np.empty(nt, dtype=np.int64)
    aa = np.empty(nt, dtype=np.int64)
    bb = np.empty(nt, dtype=np.int64)
    # leaf nodes are pre-resolved host-side: the C kernel sees opcode LEAF
    # with (a, b) = the ext value
    leaf_vals = np.zeros((nt, 2), dtype=np.uint64)
    for i, (op, a, b) in enumerate(tape.ops):
        ops[i] = op
        if op == LEAF:
            v = (np.uint64(b % 0xFFFFFFFF00000001), np.uint64(0)) if a == L_INT else leaves[a][b]
            leaf_vals[i] = v
            aa[i] = 0
            bb[i] = 0
        else:
            aa[i] = a
            bb[i] = b
    out = np.zeros((nt, 2), dtype=np.uint64)
    lib.eval_tape(
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nt,
        np.ascontiguousarray(leaf_vals).ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return out
