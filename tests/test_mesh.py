"""Multi-device sharding: the full dryrun (column-sharded commit +
collective DEEP + row-sharded halo-exchange quotient) on the 8-device
virtual CPU mesh, bit-exact against the single-chip prover."""

import jax
import os

import numpy as np
import pytest

from starky_bls12_381_tpu.fields import goldilocks as gl


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.skipif(not os.environ.get("RUN_SLOW"), reason="driver gate runs the dryrun; RUN_SLOW here")
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_prover_bit_identical(monkeypatch):
    """One StarkProver.prove() call spanning the mesh (commit column-chunk
    sharded, one all-to-all to rows, GSPMD collectives downstream) —
    proof bit-identical to the single-device prover. Uses PoseidonAir
    (the SPMD compile of a wide BLS air takes minutes on the virtual CPU
    mesh; the math path is identical)."""
    from jax.sharding import Mesh

    from starky_bls12_381_tpu.backend.config import StarkConfig
    from starky_bls12_381_tpu.backend.proof import proof_to_bytes
    from starky_bls12_381_tpu.backend.prover import StarkProver
    from starky_bls12_381_tpu.backend.verifier import verify
    from starky_bls12_381_tpu.starks.poseidon_air import PoseidonAir

    rng = np.random.default_rng(3)
    air = PoseidonAir(num_perms=8)
    inputs = [list(rng.integers(0, gl.P, size=12, dtype=np.uint64)) for _ in range(8)]
    trace, pis = air.generate_trace(inputs)
    config = StarkConfig(pow_bits=4, num_queries=8, cap_height=2)

    # force a multi-chunk commit so the chunk axis actually shards
    monkeypatch.setattr(StarkProver, "_CHUNK_BYTES", 1 << 12)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("d",))
    mp = StarkProver(air, config, mesh=mesh)
    assert mp.num_chunks % 8 == 0 and mp.num_chunks >= 8
    proof_mesh = mp.prove(trace, pis)
    verify(air, proof_mesh, pis, config)

    sp = StarkProver(air, config, xp=np)
    proof_single = sp.prove(trace, pis)
    assert proof_to_bytes(proof_mesh) == proof_to_bytes(proof_single)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_segmented_quotient_bit_identical(monkeypatch):
    """Row-segmented quotient UNDER A MESH (the FinalExp-scale path,
    prover.py `_quotient` nseg>1 + sharded LDE): proof bit-identical to
    the single-device prover."""
    from jax.sharding import Mesh

    from starky_bls12_381_tpu.backend.config import StarkConfig
    from starky_bls12_381_tpu.backend.proof import proof_to_bytes
    from starky_bls12_381_tpu.backend.prover import StarkProver
    from starky_bls12_381_tpu.backend.verifier import verify
    from starky_bls12_381_tpu.starks.poseidon_air import PoseidonAir

    rng = np.random.default_rng(5)
    air = PoseidonAir(num_perms=8)
    inputs = [list(rng.integers(0, gl.P, size=12, dtype=np.uint64)) for _ in range(8)]
    trace, pis = air.generate_trace(inputs)
    config = StarkConfig(pow_bits=4, num_queries=8, cap_height=2)

    monkeypatch.setattr(StarkProver, "_CHUNK_BYTES", 1 << 12)
    # force segmentation: per-device estimate must exceed this budget
    monkeypatch.setattr(StarkProver, "_QUOTIENT_SEG_BYTES", 1 << 12)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("d",))
    mp = StarkProver(air, config, mesh=mesh)
    proof_mesh = mp.prove(trace, pis)
    verify(air, proof_mesh, pis, config)

    sp = StarkProver(air, config, xp=np)
    assert proof_to_bytes(proof_mesh) == proof_to_bytes(sp.prove(trace, pis))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_device_resident_trace(monkeypatch):
    """Device-resident trace (FillRecorder.flush_device) + mesh prove:
    the trace is sliced and resharded in HBM (prover.py
    `_slice_device_chunks` mesh path), proof bit-identical."""
    from jax.sharding import Mesh

    from starky_bls12_381_tpu.backend.config import StarkConfig
    from starky_bls12_381_tpu.backend.proof import proof_to_bytes
    from starky_bls12_381_tpu.backend.prover import StarkProver
    from starky_bls12_381_tpu.backend.verifier import verify
    from starky_bls12_381_tpu.fields import bls12_381 as bls
    from starky_bls12_381_tpu.starks.point_check import PkPointCheckAir

    air = PkPointCheckAir(num_points=4)
    pts = [bls.G1_GEN]
    for _ in range(3):
        pts.append(bls.g1_double(pts[-1]))
    trace_dev, pis = air.generate_trace(pts, device=True)
    assert not isinstance(trace_dev, np.ndarray)
    config = StarkConfig(pow_bits=4, num_queries=8, cap_height=2)

    monkeypatch.setattr(StarkProver, "_CHUNK_BYTES", 1 << 16)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("d",))
    mp = StarkProver(air, config, mesh=mesh)
    proof_mesh = mp.prove(trace_dev, pis)
    verify(air, proof_mesh, pis, config)

    trace_host, pis2 = air.generate_trace(pts)
    assert pis2 == pis
    sp = StarkProver(air, config, xp=np)
    assert proof_to_bytes(proof_mesh) == proof_to_bytes(sp.prove(trace_host, pis))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_shard_quotient_matches_single_chip_on_merkle_air():
    """Halo-exchange quotient on a second air type (MerklePathAir) and a
    4-device mesh."""
    from jax.sharding import Mesh

    from starky_bls12_381_tpu.backend import merkle, ntt
    from starky_bls12_381_tpu.backend.config import StarkConfig
    from starky_bls12_381_tpu.backend.prover import StarkProver
    from starky_bls12_381_tpu.parallel.mesh import shard_quotient_step
    from starky_bls12_381_tpu.starks.merkle_air import MerklePathAir

    rng = np.random.default_rng(2)
    leaves = rng.integers(0, 2**63, size=(8, 4), dtype=np.uint64)
    layers = [np.asarray(l) for l in merkle.build_layers(leaves, 0)]
    air = MerklePathAir(depth=3)
    path = merkle.prove_path(layers, 5)
    trace, pis = air.generate_trace(list(leaves[5]), path, 5)

    config = StarkConfig(pow_bits=4, num_queries=8)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("row",))
    qv = shard_quotient_step(mesh, air, config, trace, [7, 11], pis)

    prover = StarkProver(air, config, xp=np)
    lde_ref, _ = ntt.lde(trace.astype(np.uint64), config.rate_bits, gl.GENERATOR)
    qv_ref = prover._quotient(
        [np.asarray(lde_ref)],
        np.asarray([7, 11], dtype=np.uint64),
        np.asarray([int(x) % gl.P for x in pis], dtype=np.uint64),
        prover.filters_np,
        prover.zh_inv_np,
        prover.const_lde_np,
    )
    np.testing.assert_array_equal(qv, np.asarray(qv_ref))
