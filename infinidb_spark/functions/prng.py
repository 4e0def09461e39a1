"""The ONE deterministic LCG behind every seeded construction.

MinHash parameters (operators/dedup.py), LSH hyperplanes
(operators/similarity.py), and JL projection signs
(operators/embeddings.py) all derive their pseudo-randomness from the
same 63-bit linear congruential step (Knuth/MMIX multiplier).  The
constants USED to be inlined in each module; similarity.py's own
docstring warned that drifting copies "silently break" executor/driver/
oracle agreement — this module makes the drift impossible instead of
documented.  tests/test_properties.py pins golden values so a
refactor can never change the sequences (persisted signature stores
and oracle-embedded plane literals depend on them bit-for-bit).
"""

from __future__ import annotations

LCG_MULT = 6364136223846793005
LCG_INC = 1442695040888963407
LCG_MOD = 1 << 63


def lcg_next(state: int) -> int:
    """One LCG step: state' = (state * MULT + INC) mod 2^63."""
    return (state * LCG_MULT + LCG_INC) % LCG_MOD
