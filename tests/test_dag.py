"""Multi-process DAG scheduling of the aggregate pipeline (parallel/dag.py)."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from starky_bls12_381_tpu.aggregate import STAGES, AggregatePipeline
from starky_bls12_381_tpu.backend.config import StarkConfig
from starky_bls12_381_tpu.parallel.dag import partition_stages, stage_cost


def test_partition_covers_all_stages_balanced():
    pipeline = AggregatePipeline(num_points=8, config=StarkConfig())
    parts = partition_stages(pipeline, STAGES, 3)
    flat = [s for p in parts for s in p]
    assert sorted(flat) == sorted(STAGES)
    loads = [sum(stage_cost(pipeline, s) for s in p) for p in parts]
    # LPT guarantee: max load <= (4/3) * optimal >= average
    assert max(loads) <= 2 * (sum(loads) / len(loads))


def test_worker_prove_roundtrip_tiny():
    """One worker partition proves + the proof verifies (in-process call
    of the child entry; the spawn path is exercised by the demo/bench)."""
    import random

    from starky_bls12_381_tpu.backend.proof import proof_from_bytes
    from starky_bls12_381_tpu.backend.verifier import verify
    from starky_bls12_381_tpu.fields import bls12_381 as bls
    from starky_bls12_381_tpu.fields import hash_to_curve as h2c
    from starky_bls12_381_tpu.parallel.dag import _worker_prove

    rng = random.Random(3)
    sks = [rng.randrange(1, h2c.R_ORDER) for _ in range(8)]

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
    bits = [1] * 8
    message = b"dag worker test"
    hm = h2c.hash_to_curve_g2(message)
    agg_sk = sum(sks) % h2c.R_ORDER
    signature = h2c.g2_scalar_mul(hm, agg_sk)
    cfg = (1, 4, 12, 8, 2, 64)
    out = _worker_prove((["h2fr"], 8, cfg, pubkeys, bits, message, signature))
    blob, pis, _dt = out["h2fr"]
    pipeline = AggregatePipeline(num_points=8, config=StarkConfig(*cfg))
    verify(pipeline._air_for("h2fr"), proof_from_bytes(blob), pis, StarkConfig(*cfg))
