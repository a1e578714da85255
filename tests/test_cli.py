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


def test_load_input_rejects_invalid_points(tmp_path):
    """Decimal-JSON inputs get the same validation as compressed bytes:
    off-curve or out-of-subgroup points are rejected at load (the
    reference binds this in-circuit, g1_plonky2.rs:11 / g2_plonky2.rs:241)."""
    import pytest

    path = tmp_path / "input.json"
    cli.make_example_input(str(path), num_points=4, seed=5)
    good = json.loads(path.read_text())

    # off-curve pubkey
    bad = json.loads(json.dumps(good))
    bad["pubkeys"][1][1] = str((int(bad["pubkeys"][1][1]) + 1) % bls.P381)
    (tmp_path / "bad1.json").write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="not on the G1 curve"):
        cli.load_input(str(tmp_path / "bad1.json"))

    # on-curve but wrong-subgroup pubkey: a point on y^2=x^3+4 of cofactor
    # order (search a small x whose point is NOT killed by r)
    from starky_bls12_381_tpu.fields import compression as cz

    x = 0
    found = None
    while found is None:
        x += 1
        y2 = (x * x * x + 4) % bls.P381
        y = pow(y2, (bls.P381 + 1) // 4, bls.P381)
        if (y * y - y2) % bls.P381 == 0 and not cz.g1_subgroup_check((x, y)):
            found = (x, y)
    bad = json.loads(json.dumps(good))
    bad["pubkeys"][0] = [str(found[0]), str(found[1])]
    (tmp_path / "bad2.json").write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="subgroup"):
        cli.load_input(str(tmp_path / "bad2.json"))

    # off-curve signature
    bad = json.loads(json.dumps(good))
    bad["signature"][1][0] = str((int(bad["signature"][1][0]) + 1) % bls.P381)
    (tmp_path / "bad3.json").write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="G2"):
        cli.load_input(str(tmp_path / "bad3.json"))
