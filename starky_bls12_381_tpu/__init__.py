"""TPU-native BLS12-381 STARK proving framework.

A brand-new JAX/XLA/Pallas implementation with the capabilities of the
Rust reference Electron-Labs/starky_bls12_381 (see /root/reference and
SURVEY.md): five AIR "chips" proving BLS12-381 aggregate-signature
verification (PairingPrecomp, MillerLoop, FP12Mul, FinalExponentiate,
ECCAggregate) over a Goldilocks-field FRI STARK backend rebuilt from
scratch for TPU (coset-LDE NTT, Poseidon Merkle caps, DEEP-FRI), with
multi-device sharding via jax.sharding / shard_map.

Everything that touches device arrays uses uint64, so x64 mode must be
enabled before any JAX computation — importing this package does it.
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
