"""Multi-device sharding: column-sharded commitment + collective DEEP sums.

The reference is single-threaded (SURVEY.md §2.3); scaling here follows the
TPU-native plan of SURVEY.md §7.5: trace COLUMNS are the embarrassingly
parallel axis (per-column NTT/LDE), so commitment shards columns across a
`jax.sharding.Mesh` axis. Each shard commits its own Merkle cap (the
challenger observes all shard caps — a protocol-level choice that removes
every cross-device dependency from the commit path), while the DEEP
composition's column-weighted sums reduce across shards with one `psum`
over ICI.

`dryrun_multichip(n)` (wired to /root/repo/__graft_entry__.py) builds an
n-device mesh and runs one sharded commit + collective-combine step on tiny
shapes to validate the sharded program compiles and executes.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ..backend import merkle, ntt
from ..backend import poseidon as ps
from ..fields import goldilocks as gl


def shard_commit_step(mesh, trace, weights, rate_bits: int = 1, cap_height: int = 2):
    """One sharded commitment + DEEP-combine step.

    trace: (n, C) uint64 numpy; weights: (C, 2) ext weights. Columns are
    sharded over the mesh axis 'col'. Returns (caps (S, 2^cap, 4),
    combined ext pair over the LDE domain) — caps per shard, combination
    psum-reduced across shards.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    n, c = trace.shape
    n_dev = len(mesh.devices.reshape(-1))
    assert c % n_dev == 0, "columns must divide evenly across devices"

    def psum_mod(x, axis_name):
        # overflow-safe cross-device modular sum: psum 32-bit halves
        lo = jax.lax.psum(x & jnp.uint64(0xFFFFFFFF), axis_name)
        hi = jax.lax.psum(x >> jnp.uint64(32), axis_name)
        return gl.gl_add(lo % jnp.uint64(gl.P), gl.gl_mul(hi, jnp.uint64(1 << 32)))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, "col"), P("col", None)),
        out_specs=(P("col", None, None), P(None, None)),
    )
    def step(tr_shard, w_shard):
        lde_vals, _ = ntt.lde(tr_shard, rate_bits, gl.GENERATOR)
        layers = merkle.build_layers(ps.hash_rows(lde_vals), cap_height)
        cap = layers[-1]
        part0 = gl.gl_sum(gl.gl_mul(lde_vals, w_shard[:, 0][None, :]), axis=1)
        part1 = gl.gl_sum(gl.gl_mul(lde_vals, w_shard[:, 1][None, :]), axis=1)
        comb0 = psum_mod(part0, "col")
        comb1 = psum_mod(part1, "col")
        return cap[None], jnp.stack([comb0, comb1], axis=0)

    tr = jnp.asarray(trace)
    w = jnp.asarray(np.asarray(weights, dtype=np.uint64))
    caps, combined = jax.jit(step)(tr, w)
    return caps, combined


def dryrun_multichip(n_devices: int) -> None:
    """Build an n-device mesh and run one sharded prove step on tiny shapes."""
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:n_devices])
    assert devs.size == n_devices, f"need {n_devices} devices, have {devs.size}"
    mesh = Mesh(devs, ("col",))

    n, c = 16, 8 * n_devices
    rng = np.random.default_rng(0)
    trace = rng.integers(0, gl.P, size=(n, c), dtype=np.uint64)
    weights = rng.integers(0, gl.P, size=(c, 2), dtype=np.uint64)
    caps, combined = shard_commit_step(mesh, trace, weights)
    caps = np.asarray(caps)
    combined = np.asarray(combined)
    assert caps.shape == (n_devices, 1 << 2, 4)
    # cross-check the collective combination against a host reference
    lde_vals, _ = ntt.lde(trace, 1, gl.GENERATOR)
    ref0 = gl.gl_sum(gl.gl_mul(lde_vals, weights[:, 0][None, :]), axis=1)
    np.testing.assert_array_equal(combined[0], ref0)
