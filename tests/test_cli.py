"""CLI smoke tests (no proving: input generation + loading + consistency)."""

import json

from starky_bls12_381_tpu import cli
from starky_bls12_381_tpu.fields import bls12_381 as bls
from starky_bls12_381_tpu.fields import hash_to_curve as h2c


def test_make_example_roundtrip(tmp_path):
    path = tmp_path / "input.json"
    cli.make_example_input(str(path), num_points=4, seed=3)
    num_points, pubkeys, bits, message, signature = cli.load_input(str(path))
    assert num_points == 4 and len(pubkeys) == 4 and len(bits) == 4
    for p in pubkeys:
        assert bls.g1_is_on_curve(p)
    assert bls.g2_is_on_curve(signature)
    # the generated signature really verifies
    apk = bls.g1_aggregate(pubkeys, bits)
    hm = h2c.hash_to_curve_g2(message)
    assert bls.verify_bls_signature(
        apk, (hm[0], hm[1], (1, 0)), (signature[0], signature[1], (1, 0))
    )


def test_example_json_schema(tmp_path):
    path = tmp_path / "input.json"
    cli.make_example_input(str(path), num_points=4, seed=4)
    data = json.loads(path.read_text())
    assert set(data) == {"num_points", "pubkeys", "bits", "message_hex", "signature"}
