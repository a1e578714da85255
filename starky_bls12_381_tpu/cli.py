"""CLI driver: prove BLS aggregate-signature verification from a JSON file.

Capability-parity with the reference's `main.rs` (parse input, compute the
witness, run the 7-stark pipeline). Input format (see
`tests/data/aggregate_example.json` / `make_example_input`):

{
  "num_points": 8,
  "pubkeys": [[x_dec, y_dec], ...],     # affine G1, decimal strings
  "bits": [1, 0, ...],
  "message_hex": "...",                 # the signing root / message bytes
  "signature": [[x0, x1], [y0, y1]]     # affine G2, decimal strings
}

The reference's fixtures are Ethereum light-client updates whose signing
root comes from SSZ tree-hashing (main.rs:34-39); SSZ derivation of the
root is not reimplemented here — callers supply the signing root directly.
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
import time


def load_input(path: str):
    with open(path) as f:
        data = json.load(f)
    pubkeys = [(int(x), int(y)) for x, y in data["pubkeys"]]
    bits = [int(b) for b in data["bits"]]
    message = bytes.fromhex(data["message_hex"])
    sx, sy = data["signature"]
    signature = ((int(sx[0]), int(sx[1])), (int(sy[0]), int(sy[1])))
    return data.get("num_points", len(pubkeys)), pubkeys, bits, message, signature


def make_example_input(path: str, num_points: int = 8, seed: int = 7):
    """Generate a self-consistent example: random committee, real signature."""
    from .fields import bls12_381 as bls
    from .fields import hash_to_curve as h2c

    def g1_mul(p, k):
        acc, add = None, p
        while k:
            if k & 1:
                acc = add if acc is None else (
                    bls.g1_double(acc) if acc == add else bls.g1_add(acc, add)
                )
            add = bls.g1_double(add)
            k >>= 1
        return acc

    import random

    rng = random.Random(seed)
    sks = [rng.randrange(1, h2c.R_ORDER) for _ in range(num_points)]
    pubkeys = [g1_mul(bls.G1_GEN, sk) for sk in sks]
    bits = [1 if rng.random() < 0.8 else 0 for _ in range(num_points)]
    if not any(bits):
        bits[0] = 1
    message = bytes.fromhex("deadbeef" * 8)
    hm = h2c.hash_to_curve_g2(message)
    agg_sk = sum(sk for sk, b in zip(sks, bits) if b) % h2c.R_ORDER
    signature = h2c.g2_scalar_mul(hm, agg_sk)
    with open(path, "w") as f:
        json.dump(
            {
                "num_points": num_points,
                "pubkeys": [[str(x), str(y)] for x, y in pubkeys],
                "bits": bits,
                "message_hex": message.hex(),
                "signature": [
                    [str(signature[0][0]), str(signature[0][1])],
                    [str(signature[1][0]), str(signature[1][1])],
                ],
            },
            f,
            indent=1,
        )


def main(argv=None):
    ap = argparse.ArgumentParser(description="TPU BLS12-381 aggregate-signature STARK prover")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_prove = sub.add_parser("prove", help="run the 7-stark pipeline on a JSON input")
    p_prove.add_argument("input")
    p_prove.add_argument("--out", default="aggregate_proof.pkl")
    p_prove.add_argument("--cpu", action="store_true", help="use numpy instead of the TPU")
    p_ver = sub.add_parser("verify", help="verify a proof bundle against a JSON input")
    p_ver.add_argument("input")
    p_ver.add_argument("proof")
    p_ex = sub.add_parser("make-example", help="write a self-consistent example input")
    p_ex.add_argument("path")
    p_ex.add_argument("--num-points", type=int, default=8)
    args = ap.parse_args(argv)

    if args.cmd == "make-example":
        make_example_input(args.path, args.num_points)
        print(f"wrote {args.path}")
        return

    import numpy as np

    from .aggregate import AggregatePipeline

    num_points, pubkeys, bits, message, signature = load_input(args.input)
    pipeline = AggregatePipeline(
        num_points=num_points, xp=np if getattr(args, "cpu", False) else None
    )
    if args.cmd == "prove":
        t0 = time.time()
        bundle = pipeline.prove_aggregate(pubkeys, bits, message, signature)
        print(f"proved 7 starks in {time.time() - t0:.1f}s")
        with open(args.out, "wb") as f:
            pickle.dump(bundle, f)
        print(f"wrote {args.out}")
    else:
        with open(args.proof, "rb") as f:
            bundle = pickle.load(f)
        t0 = time.time()
        pipeline.verify_aggregate(bundle, pubkeys, bits, message, signature)
        print(f"verified 7 proofs + links in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1:])
