"""Full light-client aggregate bench: prove the REAL mainnet 512-key sync
aggregate end-to-end on the TPU and record per-stage wall times.

This is the reference's headline workload (main.rs: two light-client
update JSONs -> 12-stage aggregate bundle; the reference's README.md:30-45
documents ~112 s of STARK proving for its 7 starks on a 32-vCPU
r6a.8xlarge). Consumes the same fixture JSONs; records:

* per-stage prove wall seconds (pipeline.stage_wall_s — trace fills are
  overlapped with device proving, so these are device-critical-path times),
* total prove wall, bundle bytes, verify wall,
* optionally (BENCH_LC_COMPRESS=1) compress_bundle wall + compressed bytes.

Artifact: bench_results/lc_r3.json (BENCH_RECORD to override).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import starky_bls12_381_tpu  # noqa: F401

FIX_1052 = "/root/reference/src/light_client_update_period_1052.json"
FIX_1053 = "/root/reference/src/light_client_update_period_1053.json"
DOMAIN = "070000006a95a1a967855d676d48be69883b712607f952d5198d0f5677564636"


def main():
    from starky_bls12_381_tpu.aggregate import (
        AggregatePipeline,
        bundle_to_bytes,
    )
    from starky_bls12_381_tpu.cli import load_light_client_input

    num_points, pubkeys, bits, message, signature = load_light_client_input(
        FIX_1052, FIX_1053, DOMAIN
    )
    pipeline = AggregatePipeline(num_points=num_points)
    t0 = time.time()
    bundle = pipeline.prove_aggregate(pubkeys, bits, message, signature)
    prove_s = time.time() - t0
    rec = {
        "metric": "lc_aggregate_prove_s",
        "value": round(prove_s, 1),
        "unit": "s",
        "vs_baseline": round(112.0 / prove_s, 3),
        "num_points": num_points,
        "stages": len(bundle.proofs),
        "stage_s": dict(pipeline.stage_wall_s),
        "bundle_bytes": len(bundle_to_bytes(bundle)),
    }
    print(json.dumps(rec), flush=True)

    t0 = time.time()
    pipeline.verify_aggregate(bundle, pubkeys, bits, message, signature)
    rec["verify_s"] = round(time.time() - t0, 1)

    if os.environ.get("BENCH_LC_COMPRESS", "0") == "1":
        from starky_bls12_381_tpu.aggregate import (
            compress_bundle,
            compressed_bundle_to_bytes,
            verify_compressed_bundle,
        )

        t0 = time.time()
        cb = compress_bundle(pipeline, bundle)
        rec["compress_s"] = round(time.time() - t0, 1)
        data = compressed_bundle_to_bytes(cb)
        rec["compressed_bytes"] = len(data)
        t0 = time.time()
        verify_compressed_bundle(pipeline, cb, pubkeys, bits, message, signature)
        rec["compressed_verify_s"] = round(time.time() - t0, 1)

    out = os.environ.get("BENCH_RECORD", "bench_results/lc_r3.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"record": out, **{k: rec[k] for k in ("verify_s",) if k in rec}}), flush=True)


if __name__ == "__main__":
    main()
