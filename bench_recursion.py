"""Recursive-wrap benchmark: compress a real BLS stark proof on the TPU.

Wraps an inner proof's query phase in outer STARK proofs via the
query-sharded DAG (starks/recursive_verifier.py), the capability the
reference gets from `recursive_proof` (aggregate_proof.rs:417-451).
Records wrap wall time, inner vs compressed bytes, and verify time into
a JSON artifact (bench_results/).

Inner configs match bench.py's production point (rate 1, 84 queries,
16-bit grinding). The outer config trades rate for queries (blowup 4 ->
~2 bits/query -> 42 queries + grinding reach the same ~100-bit budget as
the inner's 84 queries at blowup 2) so each shard proof stays small.

Select the inner with BENCH_STARK in {fp12_mul, miller_loop}; shard size
with BENCH_SHARD (queries per outer proof).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import starky_bls12_381_tpu  # noqa: F401

from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.backend.proof import proof_to_bytes
from starky_bls12_381_tpu.backend.prover import StarkProver
from starky_bls12_381_tpu.starks.recursive_verifier import (
    RecursiveVerifierAir,
    prove_recursive_dag,
    verify_recursive_dag,
)


def inner_fp12_mul():
    import random

    from starky_bls12_381_tpu.fields.bls12_381 import P381
    from starky_bls12_381_tpu.starks.fp12_mul import FP12MulAir

    rng = random.Random(0)
    f = lambda: tuple(  # noqa: E731
        tuple((rng.randrange(P381), rng.randrange(P381)) for _ in range(3)) for _ in range(2)
    )
    air = FP12MulAir()
    trace, pis = air.generate_trace(f(), f())
    return air, trace, pis, "fp12_mul"


def inner_miller_loop():
    from starky_bls12_381_tpu.fields import bls12_381 as bls
    from starky_bls12_381_tpu.starks.miller_loop import MillerLoopAir

    air = MillerLoopAir()
    pk_x = 2620359726099670991095913421423408052907220385587653382880494211997835858894431070728023161812841650498384724513574
    pk_y = 3516737663249789719313994746945990853755171862112391852604784999536233979171013701039178918880615112139780777770781
    hm = (
        (2260803321181951703309420903406460477209912434020120381027413359130883713514969717876465885091628521232768207917010,
         2651754974217764549573984422821173864573267897233450902768900290919635595830847280035238812354259899816422437732519),
        (98328085801950751198634977711657076320088798571641012335466428770177401024922163125657710674003178075431656844523,
         1156585784149709375944843577113354173925120574246839648967751052400396372157500751188298724114933365921247443786825),
        (1, 0),
    )
    coeffs = bls.calc_pairing_precomp(*hm)
    trace, pis = air.generate_trace(pk_x, (-pk_y) % bls.P381, coeffs)
    return air, trace, pis, "miller_loop"


def main():
    which = os.environ.get("BENCH_STARK", "fp12_mul")
    shard = int(os.environ.get("BENCH_SHARD", "2"))
    air, trace, pis, name = {"fp12_mul": inner_fp12_mul, "miller_loop": inner_miller_loop}[which]()

    icfg = StarkConfig(rate_bits=1, cap_height=4, num_queries=84, pow_bits=16)
    from starky_bls12_381_tpu.aggregate import OUTER_CONFIG as ocfg

    t0 = time.time()
    prover = StarkProver(air, icfg)
    proof = prover.prove(trace, pis)
    inner_prove_s = time.time() - t0
    inner_bytes = len(proof_to_bytes(proof))

    rair = RecursiveVerifierAir(air, icfg, num_queries=shard)
    print(json.dumps({
        "note": "outer air shape", "rows": rair.num_rows, "cols": rair.num_cols,
        "rows_per_query": rair.rows_per_query,
    }), flush=True)

    t0 = time.time()
    rair, dag = prove_recursive_dag(air, proof, pis, icfg, ocfg, shard=shard, rair=rair)
    wrap_s = time.time() - t0
    comp_bytes = len(proof_to_bytes(dag.inner_public)) + sum(
        len(proof_to_bytes(p)) for p in dag.outer_proofs
    )
    t0 = time.time()
    verify_recursive_dag(air, pis, icfg, dag, ocfg, rair=rair)
    verify_s = time.time() - t0

    out = {
        "metric": f"{name}_recursive_wrap_s",
        "value": round(wrap_s, 2),
        "unit": "s",
        "inner_prove_s": round(inner_prove_s, 2),
        "shards": len(dag.outer_proofs),
        "shard_queries": shard,
        "inner_bytes": inner_bytes,
        "compressed_bytes": comp_bytes,
        "compression": round(inner_bytes / comp_bytes, 2),
        "verify_compressed_s": round(verify_s, 2),
        "outer_rows": rair.num_rows,
        "outer_cols": rair.num_cols,
    }
    print(json.dumps(out), flush=True)
    rec = os.environ.get("BENCH_RECORD")
    if rec:
        with open(rec, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
