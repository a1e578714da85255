"""STARK configuration.

Mirrors starky's `StarkConfig::standard_fast_config()` parameter point used
by the reference (`aggregate_proof.rs:32-34,76,122,155-156,186-187`):
rate_bits 1 (2 for the high-degree starks), 84 query rounds, 16 bits of
proof-of-work grinding, cap height 4, two base-field constraint-combination
challenges (64-bit field => 2 parallel combinations), DEEP openings over
GF(p^2). Conjectured soundness ~ num_queries * rate_bits + pow_bits.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class StarkConfig:
    rate_bits: int = 1
    cap_height: int = 4
    num_queries: int = 84
    pow_bits: int = 16
    num_challenges: int = 2
    # FRI folding stops once the folded polynomial has at most this many
    # coefficients; the remaining coefficients ship in the proof.
    final_poly_len: int = 64

    @property
    def blowup(self) -> int:
        return 1 << self.rate_bits

    def fri_num_folds(self, lde_size: int) -> int:
        """Number of arity-2 folds from lde_size down to the final poly."""
        folds = 0
        size = lde_size
        while size > self.final_poly_len * self.blowup and size > (2 << self.cap_height):
            size >>= 1
            folds += 1
        return folds


def standard_fast_config(rate_bits: int = 1) -> StarkConfig:
    return StarkConfig(rate_bits=rate_bits)
