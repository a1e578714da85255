"""Kernel microbenchmarks: Poseidon permutation + NTT throughput vs roofline.

Measures the two hot kernels of the prover's commit stage on the real TPU
and reports absolute throughput plus a roofline ratio (BASELINE.md:
"every field-arithmetic kernel measured"):

* Poseidon2-GL12 permutations/s over large batches (the Merkle
  leaf/sponge workload). Each permutation touches 12 u64 lanes (192 B r+w)
  and costs ~470 full Goldilocks muls (the x^7 sboxes) plus shift-add
  linear layers (M_E 4-block schedule, M_I power-of-two diagonal), so it
  is compute-bound on the VPU; the roofline reference is achieved HBM GB/s
  against the chip's ~819 GB/s.
* Radix-2 NTT butterflies/s via ntt.lde over a wide matrix (the coset-LDE
  workload): n log2(n) / 2 butterflies per column; also reported as
  effective HBM GB/s (log2(n) passes over the matrix).

Prints one JSON line per kernel; BENCH_RECORD appends a combined record.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import starky_bls12_381_tpu  # noqa: F401

from starky_bls12_381_tpu.backend import ntt
from starky_bls12_381_tpu.backend import poseidon as ps
from starky_bls12_381_tpu.fields import goldilocks as gl

HBM_GBPS = 819.0  # v5e peak HBM bandwidth


def _timeit(fn, arg, reps=8):
    """Remote-backend-safe timing: the jitted fn returns a SCALAR checksum
    of its result, and jax.device_get on it forces the whole same-stream
    sequence to complete (block_until_ready over the axon tunnel returns
    before remote execution finishes, which inflates naive timings ~100x)."""
    import jax

    s = fn(arg)
    jax.device_get(s)  # compile + sync
    t0 = time.time()
    for _ in range(reps):
        s = fn(arg)
    jax.device_get(s)
    return (time.time() - t0) / reps


def bench_poseidon():
    import jax

    B = 1 << 20
    rng = np.random.default_rng(0)
    states = rng.integers(0, gl.P, size=(B, ps.WIDTH), dtype=np.uint64)
    import jax.numpy as jnp

    dev = jnp.asarray(states)

    def f(x):
        return ps.permute(x).sum()

    dt = _timeit(jax.jit(f), dev)
    perms_s = B / dt
    gbs = B * ps.WIDTH * 8 * 2 / dt / 1e9
    return {
        "metric": "poseidon_perms_per_s",
        "value": round(perms_s / 1e6, 2),
        "unit": "Mperm/s",
        "batch": B,
        "hbm_gbps": round(gbs, 1),
        "hbm_roofline_frac": round(gbs / HBM_GBPS, 3),
    }


def bench_poseidon_t():
    """Lane-major (12, B) permutation — the layout the sponge/Merkle/PoW
    paths actually run (batch on the 128-lane axis, see ps.permute_t)."""
    import jax
    import jax.numpy as jnp

    B = 1 << 20
    rng = np.random.default_rng(0)
    states = rng.integers(0, gl.P, size=(ps.WIDTH, B), dtype=np.uint64)
    dev = jnp.asarray(states)

    def f(x):
        return ps.permute_t(x).sum()

    dt = _timeit(jax.jit(f), dev)
    perms_s = B / dt
    return {
        "metric": "poseidon_t_perms_per_s",
        "value": round(perms_s / 1e6, 2),
        "unit": "Mperm/s",
        "batch": B,
    }


def bench_poseidon_pallas():
    """The hand-written Pallas u32-pair kernel vs the XLA u64 path."""
    import jax
    import jax.numpy as jnp

    from starky_bls12_381_tpu.backend import poseidon_pallas as pp

    B = 1 << 20
    rng = np.random.default_rng(0)
    states = rng.integers(0, gl.P, size=(B, ps.WIDTH), dtype=np.uint64)
    dev = jnp.asarray(states)

    def f(x):
        return pp.permute(x).sum()

    dt = _timeit(jax.jit(f), dev)
    perms_s = B / dt
    return {
        "metric": "poseidon_pallas_perms_per_s",
        "value": round(perms_s / 1e6, 2),
        "unit": "Mperm/s",
        "batch": B,
    }


def bench_ntt():
    import jax
    import jax.numpy as jnp

    n, C = 2048, 4096
    rng = np.random.default_rng(1)
    mat = rng.integers(0, gl.P, size=(n, C), dtype=np.uint64)
    dev = jnp.asarray(mat)

    def f(m):
        return ntt.lde(m, 1, gl.GENERATOR)[0].sum()

    dt = _timeit(jax.jit(f), dev)
    # ifft (n log n / 2) + coset eval (2n log 2n / 2) butterflies per col
    n0 = 2 * n
    bflies = C * (n * n.bit_length() // 2 + n0 * n0.bit_length() // 2)
    passes = n.bit_length() + n0.bit_length()
    gbs = (n * C * 8 * passes) / dt / 1e9
    return {
        "metric": "ntt_butterflies_per_s",
        "value": round(bflies / dt / 1e9, 2),
        "unit": "Gbfly/s",
        "shape": [n, C],
        "hbm_gbps": round(gbs, 1),
        "hbm_roofline_frac": round(gbs / HBM_GBPS, 3),
    }


def main():
    out = {}
    for fn in (bench_poseidon, bench_poseidon_t, bench_poseidon_pallas, bench_ntt):
        try:
            rec = fn()
        except Exception as exc:  # keep the other kernels' numbers
            rec = {"metric": fn.__name__, "error": f"{type(exc).__name__}: {exc}"[:200]}
        print(json.dumps(rec), flush=True)
        out[rec["metric"]] = rec
    path = os.environ.get("BENCH_RECORD")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
