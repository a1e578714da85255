"""ctypes binding for the native C Poseidon2 batch kernel.

Builds `native/poseidon2.c` with the system gcc on first use (cached as
a .so next to the source; rebuilt when the source changes) and exposes
`permute_batch` over (N, 12) uint64 numpy arrays. Round constants and
the internal-diagonal exponents are passed in from backend/poseidon.py —
the python module stays the single source of truth for the instance.

Used by the HOST paths only (verifier row hashing, flat-tree digests):
the TPU path stays the jitted XLA implementation. Falls back silently
(AVAILABLE = False) when no compiler is present.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_DIR, "poseidon2.c")

_lib = None
AVAILABLE = False
_BUILD_FAILED = False  # a failed build is attempted at most once per process


def _build() -> str | None:
    try:
        src = open(_SRC, "rb").read()
    except OSError:
        return None
    tag = hashlib.blake2b(src, digest_size=8).hexdigest()
    so = os.path.join(_DIR, f"poseidon2-{tag}.so")
    if os.path.exists(so):
        return so
    cmd = [
        "gcc", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        _SRC, "-o", so,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        # retry without OpenMP (still correct, single-threaded)
        try:
            subprocess.run(
                [c for c in cmd if c != "-fopenmp"], check=True, capture_output=True, timeout=120
            )
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
    lib.permute_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.permute_batch.restype = None
    lib.permute_record_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int64),
    ] + [ctypes.c_int] * 9
    lib.permute_record_batch.restype = None
    _lib = lib
    AVAILABLE = True
    return _lib


def available() -> bool:
    return _load() is not None


def permute_batch(states: np.ndarray) -> np.ndarray:
    """Permute an (N, 12) uint64 array; returns a NEW array.
    Bit-identical to poseidon.permute_s per row."""
    from . import poseidon as ps

    lib = _load()
    assert lib is not None, "native kernel unavailable"
    out = np.ascontiguousarray(states, dtype=np.uint64).copy()
    rc = np.ascontiguousarray(ps._RC_NP, dtype=np.uint64)
    de = np.asarray(ps.DIAG_EXP, dtype=np.int64)
    lib.permute_batch(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.shape[0],
        rc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        de.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ps.N_ROUNDS,
        ps.N_FULL // 2,
        ps.N_PARTIAL,
    )
    return out


def permute_record_batch(states: np.ndarray, rows_per_perm: int, block_cols: int,
                         s_off: int, w3_off: int, w6_off: int, u_off: int):
    """Witness-recording batch permutation: returns (blocks, out) matching
    starks/poseidon_block.py permute_record bit-for-bit. `blocks` is
    (B, rows_per_perm, block_cols); `out` (B, 12) final states."""
    from . import poseidon as ps

    lib = _load()
    assert lib is not None, "native kernel unavailable"
    st = np.ascontiguousarray(states, dtype=np.uint64)
    b = st.shape[0]
    blocks = np.zeros((b, rows_per_perm, block_cols), dtype=np.uint64)
    rc = np.ascontiguousarray(ps._RC_NP, dtype=np.uint64)
    de = np.asarray(ps.DIAG_EXP, dtype=np.int64)
    lib.permute_record_batch(
        st.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        b,
        blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        rc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        de.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ps.N_ROUNDS,
        ps.N_FULL // 2,
        ps.N_PARTIAL,
        rows_per_perm,
        block_cols,
        s_off,
        w3_off,
        w6_off,
        u_off,
    )
    out = blocks[:, rows_per_perm - 1, s_off : s_off + 12].copy()
    return blocks, out
