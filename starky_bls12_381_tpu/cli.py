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

The `prove-lc` subcommand consumes the reference's actual fixture format —
two Ethereum light-client update JSONs — decoding the 512 compressed
pubkeys, the sync-committee bitfield and signature, and deriving the
signing root via SSZ tree-hashing + domain exactly as main.rs:29-39 does
(fields/ssz.py, fields/compression.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def load_input(path: str):
    with open(path) as f:
        data = json.load(f)
    if "pubkeys_hex" in data:  # compressed wire format (48B/96B, ZCash flags)
        from .fields import compression as cz

        pubkeys = [cz.g1_decompress(bytes.fromhex(h.removeprefix("0x"))) for h in data["pubkeys_hex"]]
        signature = cz.g2_decompress(bytes.fromhex(data["signature_hex"].removeprefix("0x")))
    else:
        # decimal affine input: enforce the same validity the compressed
        # path gets from decompression (on-curve + prime-order subgroup,
        # matching the reference's in-circuit pk_point_check /
        # signature_point_check, g1_plonky2.rs:11-56 / g2_plonky2.rs:241-302)
        from .fields import bls12_381 as bls
        from .fields import compression as cz

        pubkeys = [(int(x), int(y)) for x, y in data["pubkeys"]]
        for i, p in enumerate(pubkeys):
            if not bls.g1_is_on_curve(p):
                raise ValueError(f"pubkey {i} is not on the G1 curve")
            if not cz.g1_subgroup_check(p):
                raise ValueError(f"pubkey {i} is not in the prime-order G1 subgroup")
        sx, sy = data["signature"]
        signature = ((int(sx[0]), int(sx[1])), (int(sy[0]), int(sy[1])))
        if not bls.g2_is_on_curve(signature):
            raise ValueError("signature is not on the G2 curve")
        if not cz.g2_subgroup_check(signature):
            raise ValueError("signature is not in the prime-order G2 subgroup")
    bits = [int(b) for b in data["bits"]]
    message = bytes.fromhex(data["message_hex"])
    return data.get("num_points", len(pubkeys)), pubkeys, bits, message, signature


def load_light_client_input(prev_path: str, cur_path: str, domain_hex: str):
    """The reference's exact input flow (main.rs:8-55): pubkeys from the
    previous period's next_sync_committee, sync aggregate + attested header
    from the current update, signing root via SSZ tree-hash + domain."""
    from .fields import compression as cz
    from .fields import ssz

    with open(prev_path) as f:
        prev = json.load(f)
    with open(cur_path) as f:
        cur = json.load(f)
    pubkeys = [
        cz.g1_decompress(bytes.fromhex(h.removeprefix("0x")))
        for h in prev["data"]["next_sync_committee"]["pubkeys"]
    ]
    agg = cur["data"]["sync_aggregate"]
    bits = ssz.decode_sync_committee_bits(agg["sync_committee_bits"], len(pubkeys))
    signature = cz.g2_decompress(bytes.fromhex(agg["sync_committee_signature"].removeprefix("0x")))
    domain = bytes.fromhex(domain_hex.removeprefix("0x"))
    message = ssz.light_client_signing_root(cur["data"]["attested_header"]["beacon"], domain)
    return len(pubkeys), pubkeys, bits, message, signature


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
    p_prove = sub.add_parser("prove", help="run the stark pipeline on a JSON input")
    p_prove.add_argument("input")
    p_prove.add_argument("--out", default="aggregate_proof.bin")
    p_prove.add_argument("--cpu", action="store_true", help="use numpy instead of the TPU")
    p_prove.add_argument(
        "--compress", action="store_true",
        help="recursively wrap every stage proof: ONE compressed object, no query rounds",
    )
    p_ver = sub.add_parser("verify", help="verify a proof bundle against a JSON input")
    p_ver.add_argument("input")
    p_ver.add_argument("proof")
    p_ex = sub.add_parser("make-example", help="write a self-consistent example input")
    p_ex.add_argument("path")
    p_ex.add_argument("--num-points", type=int, default=8)
    p_lc = sub.add_parser(
        "prove-lc", help="prove from two light-client update JSONs (main.rs flow)"
    )
    p_lc.add_argument("prev_update", help="previous period update (pubkey source)")
    p_lc.add_argument("cur_update", help="current update (sync aggregate + header)")
    p_lc.add_argument("--domain", required=True, help="32-byte signing domain, hex")
    p_lc.add_argument("--out", default="aggregate_proof.bin")
    p_lc.add_argument("--cpu", action="store_true")
    p_lc.add_argument("--compress", action="store_true")
    p_vlc = sub.add_parser(
        "verify-lc", help="verify a bundle against two light-client update JSONs"
    )
    p_vlc.add_argument("prev_update")
    p_vlc.add_argument("cur_update")
    p_vlc.add_argument("--domain", required=True)
    p_vlc.add_argument("proof")
    args = ap.parse_args(argv)

    if args.cmd == "make-example":
        make_example_input(args.path, args.num_points)
        print(f"wrote {args.path}")
        return

    import numpy as np

    from .aggregate import AggregatePipeline

    def _write_bundle(pipeline, bundle, out, compress):
        from .aggregate import bundle_to_bytes, compress_bundle, compressed_bundle_to_bytes

        if compress:
            t0 = time.time()
            cb = compress_bundle(pipeline, bundle)
            data = compressed_bundle_to_bytes(cb)
            plain = len(bundle_to_bytes(bundle))
            print(
                f"compressed {len(cb.dags)} stage proofs in {time.time() - t0:.1f}s "
                f"({plain} -> {len(data)} bytes, {plain / len(data):.1f}x)"
            )
        else:
            data = bundle_to_bytes(bundle)
        with open(out, "wb") as f:
            f.write(data)
        print(f"wrote {out}")

    if args.cmd == "prove-lc":
        num_points, pubkeys, bits, message, signature = load_light_client_input(
            args.prev_update, args.cur_update, args.domain
        )
        pipeline = AggregatePipeline(
            num_points=num_points, xp=np if args.cpu else None
        )
        t0 = time.time()
        bundle = pipeline.prove_aggregate(pubkeys, bits, message, signature)
        total_s = time.time() - t0
        print(f"proved {len(bundle.proofs)} starks in {total_s:.1f}s")
        print("stage wall s:", pipeline.stage_wall_s)
        rec = os.environ.get("BENCH_RECORD")
        if rec:
            with open(rec, "w") as f:
                json.dump(
                    {
                        "metric": "aggregate_prove_lc_s",
                        "value": round(total_s, 1),
                        "unit": "s",
                        "num_points": num_points,
                        "stage_wall_s": pipeline.stage_wall_s,
                    },
                    f,
                    indent=1,
                )
        _write_bundle(pipeline, bundle, args.out, args.compress)
        return

    if args.cmd == "verify-lc":
        num_points, pubkeys, bits, message, signature = load_light_client_input(
            args.prev_update, args.cur_update, args.domain
        )
        args.cmd = "verify"  # shares the verify path below
    else:
        num_points, pubkeys, bits, message, signature = load_input(args.input)
    pipeline = AggregatePipeline(
        num_points=num_points, xp=np if getattr(args, "cpu", False) else None
    )
    if args.cmd == "prove":
        t0 = time.time()
        bundle = pipeline.prove_aggregate(pubkeys, bits, message, signature)
        print(f"proved {len(bundle.proofs)} starks in {time.time() - t0:.1f}s")
        _write_bundle(pipeline, bundle, args.out, args.compress)
    else:
        from .aggregate import (
            _CBUNDLE_MAGIC,
            bundle_from_bytes,
            compressed_bundle_from_bytes,
            verify_compressed_bundle,
        )

        with open(args.proof, "rb") as f:
            data = f.read()
        t0 = time.time()
        if data[:4] == _CBUNDLE_MAGIC:
            cb = compressed_bundle_from_bytes(data)
            verify_compressed_bundle(pipeline, cb, pubkeys, bits, message, signature)
            print(
                f"verified compressed bundle ({len(cb.dags)} stages, no query rounds) "
                f"+ links in {time.time() - t0:.1f}s"
            )
        else:
            bundle = bundle_from_bytes(data)
            pipeline.verify_aggregate(bundle, pubkeys, bits, message, signature)
            print(f"verified {len(bundle.proofs)} proofs + links in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1:])
