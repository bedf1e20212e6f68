"""Skew-handling join utilities for hot keys at scale.

AQE's skew-join splitting (on in ``session.py``) handles most skew at
runtime; ``salted_join`` is the explicit fallback for the pathological
case AQE can't fix — a *single* key so hot that one task would own it
even after splitting (e.g. an entity mentioned in half the corpus, the
graph-sink hot-key risk flagged in SURVEY.md §4).

Mechanism: the big side's key is salted with a random-but-deterministic
shard in [0, salt); the small side is exploded ×salt so every shard of
a hot key still finds its match. Correctness is invariant to ``salt``
(pinned by tests); only the shuffle distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small ON on`` with the big side salted ``salt``
    ways. ``small`` is replicated ×salt (keep it the genuinely smaller
    side). Supported how: inner, left.

    Limitation (r11 review, by design): the shard is a hash of the
    whole row, so BYTE-IDENTICAL duplicate rows share a shard and do
    not spread — dedup such rows upstream (exact_dedup) or aggregate
    them to (row, count) first; any nondeterministic salt would break
    replay/retry determinism, which this repo ranks above spreading a
    pathological duplicate flood."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # deterministic shard: hash of the whole row spread over [0, salt)
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")
