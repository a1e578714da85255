"""TPU-native BLS12-381 STARK proving framework.

A brand-new JAX/XLA/Pallas implementation with the capabilities of the
Rust reference Electron-Labs/starky_bls12_381 (see /root/reference and
SURVEY.md): the reference's five STARKs (PairingPrecomp, MillerLoop, FP12Mul,
FinalExponentiate, ECCAggregate) plus seven further in-proof AIRs
(SHA-256, XMD field reduction, hash-to-curve, point checks, recursion
chips) proving BLS12-381 aggregate-signature verification over a
Goldilocks-field FRI STARK backend rebuilt from
scratch for TPU (coset-LDE NTT, Poseidon Merkle caps, DEEP-FRI), with
multi-device sharding via jax.sharding / shard_map.

Everything that touches device arrays uses uint64, so x64 mode must be
enabled before any JAX computation — importing this package does it.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Keep the CPU backend registered alongside the TPU: the host-side verifier
# jit-compiles its bulk hashing on CPU (the container pins
# JAX_PLATFORMS=axon, which would otherwise hide the CPU backend). Respect
# any explicit override already applied via jax.config (e.g. tests force
# plain "cpu").
if jax.config.jax_platforms == "axon":
    jax.config.update("jax_platforms", "axon,cpu")

# Persistent XLA compilation cache: compiling over the axon remote-compile
# tunnel costs minutes per stage; cached executables cut re-runs to seconds.
_cache_dir = os.environ.get(
    "STARKY_JAX_CACHE", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

__version__ = "0.1.0"
