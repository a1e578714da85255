"""Multi-process DAG scheduling of the 12-stage aggregate pipeline.

The reference proves its seven starks strictly serially and lists
"parallelize stark proof generation" as future work (README.md:28;
SURVEY.md §2.3 pipeline row). Here the stage DAG is explicit: every
stage proof depends only on the NATIVE witness values (pairing math,
hash-to-curve — milliseconds), never on another stage's PROOF, so the
stage set is a classic independent-task scheduling problem:

    pp1 ‖ pp2 ‖ ecc ‖ pkc ‖ sigc ‖ h2f ‖ h2fr ‖ h2c
    ml1 ‖ ml2           (after native coeffs, not after pp proofs)
    fp12mul ‖ finalexp  (after native ml values, not after ml proofs)

`prove_aggregate_dag` partitions the stages across N worker PROCESSES
(greedy longest-processing-time on the trace-cell count) and proves each
partition in its own process; proofs return as wire bytes. On one
multi-core host this overlaps the per-stage host fills and proves; on a
multi-host deployment the same partition maps one worker per host
(process == host; the partition function is identical).

Cross-process backends: workers default to the numpy prover (xp=np) —
self-contained, no XLA compile per process; a TPU-holding parent can
instead keep the heavy stages local (`local_stages`) and farm the rest.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, List, Sequence

_STAGE_KEYS = {"pp1": "pp", "pp2": "pp", "ml1": "ml", "ml2": "ml"}


def stage_cost(pipeline, stage: str) -> int:
    """Scheduling weight: trace cells (rows x cols) of the stage's air."""
    air = pipeline._air_for(stage)
    return int(air.num_rows) * int(air.num_cols)


def partition_stages(pipeline, stages: Sequence[str], workers: int) -> List[List[str]]:
    """Greedy LPT: heaviest stage first onto the least-loaded worker."""
    order = sorted(stages, key=lambda s: -stage_cost(pipeline, s))
    loads = [0] * workers
    parts: List[List[str]] = [[] for _ in range(workers)]
    for s in order:
        w = loads.index(min(loads))
        parts[w].append(s)
        loads[w] += stage_cost(pipeline, s)
    return [p for p in parts if p]


def _worker_prove(args):
    """Child-process entry: prove a list of stages with the numpy prover.
    Rebuilds airs locally; receives only the statement (cheap to pickle)."""
    (stages, num_points, cfg_tuple, pubkeys, bits, message, signature) = args
    # one compute thread per worker: stage-level parallelism comes from
    # the PROCESS grid (one worker per host/core), not from intra-kernel
    # threads — otherwise co-located workers oversubscribe each other
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    import numpy as np

    from ..aggregate import AggregatePipeline
    from ..backend.config import StarkConfig
    from ..backend.proof import proof_to_bytes

    cfg = StarkConfig(*cfg_tuple)
    pipeline = AggregatePipeline(num_points=num_points, config=cfg, xp=np)
    builders, _ = pipeline._trace_builders(pubkeys, bits, message, signature)
    out = {}
    for stage in stages:
        t0 = time.time()
        trace, pis = builders[stage]()
        proof = pipeline._prove(stage, trace, pis)
        out[stage] = (proof_to_bytes(proof), [int(x) for x in pis], time.time() - t0)
    return out


def prove_aggregate_dag(num_points, config, pubkeys, bits, message, signature,
                        workers: int = 2, stages: Sequence[str] | None = None):
    """Prove the stage set across `workers` processes. Returns
    ({stage: (proof_bytes, pis)}, {stage: wall_s}, partition)."""
    import multiprocessing as mp

    from ..aggregate import STAGES, AggregatePipeline

    todo = list(STAGES) if stages is None else list(stages)
    pipeline = AggregatePipeline(num_points=num_points, config=config)
    parts = partition_stages(pipeline, todo, workers)
    cfg_tuple = (config.rate_bits, config.cap_height, config.num_queries,
                 config.pow_bits, config.num_challenges, config.final_poly_len)
    jobs = [(p, num_points, cfg_tuple, pubkeys, bits, message, signature) for p in parts]
    ctx = mp.get_context("spawn")
    with ctx.Pool(processes=len(parts)) as pool:
        results = pool.map(_worker_prove, jobs)
    proofs: Dict[str, tuple] = {}
    walls: Dict[str, float] = {}
    for res in results:
        for stage, (blob, pis, dt) in res.items():
            proofs[stage] = (blob, pis)
            walls[stage] = dt
    return proofs, walls, parts


def _demo(argv):
    """2-process scheduling demonstration on a synthetic committee:
    serial numpy proving vs the LPT partition, same statement, recorded
    as one JSON line (+ BENCH_RECORD artifact)."""
    import random

    import numpy as np

    from ..aggregate import STAGES, AggregatePipeline
    from ..backend.config import StarkConfig
    from ..fields import bls12_381 as bls
    from ..fields import hash_to_curve as h2c

    num_points = int(os.environ.get("DAG_POINTS", "8"))
    workers = int(os.environ.get("DAG_WORKERS", "2"))
    stages = os.environ.get("DAG_STAGES")
    todo = stages.split(",") if stages else list(STAGES)

    rng = random.Random(11)
    sks = [rng.randrange(1, h2c.R_ORDER) for _ in range(num_points)]

    def g1_mul(p, k):
        acc, add = None, p
        while k:
            if k & 1:
                acc = add if acc is None else (
                    bls.g1_double(acc) if acc == add else bls.g1_add(acc, add))
            add = bls.g1_double(add)
            k >>= 1
        return acc

    pubkeys = [g1_mul(bls.G1_GEN, sk) for sk in sks]
    bits = [1 if i % 5 != 3 else 0 for i in range(num_points)]
    message = b"dag scheduling demo"
    hm = h2c.hash_to_curve_g2(message)
    agg_sk = sum(sk for sk, b in zip(sks, bits) if b) % h2c.R_ORDER
    signature = h2c.g2_scalar_mul(hm, agg_sk)

    config = StarkConfig(
        rate_bits=1, cap_height=4,
        num_queries=int(os.environ.get("DAG_QUERIES", "84")), pow_bits=16,
    )

    # serial reference: same worker code, one partition
    t0 = time.time()
    _, serial_walls, _ = prove_aggregate_dag(
        num_points, config, pubkeys, bits, message, signature, workers=1, stages=todo)
    serial_s = time.time() - t0

    t0 = time.time()
    proofs, walls, parts = prove_aggregate_dag(
        num_points, config, pubkeys, bits, message, signature, workers=workers, stages=todo)
    parallel_s = time.time() - t0

    out = {
        "metric": "dag_pipeline_speedup",
        "value": round(serial_s / parallel_s, 2),
        "unit": "x",
        "serial_s": round(serial_s, 1),
        "parallel_s": round(parallel_s, 1),
        "workers": workers,
        "stages": todo,
        "partition": parts,
        "stage_wall_s": {k: round(v, 1) for k, v in walls.items()},
    }
    print(json.dumps(out), flush=True)
    rec = os.environ.get("BENCH_RECORD")
    if rec:
        with open(rec, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    _demo(sys.argv[1:])
