"""Vector kernels over ``array<float>`` embedding columns.

Pure Spark higher-order-function expressions (``zip_with`` +
``aggregate``) — JVM-side, no Python in the loop. These are the
building blocks for similarity search and embedding-based dedup; at
100 TB the dot products run inside whole-stage codegen next to the
scan, so the only scale concern is the *pairing* strategy (see
operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    a, b = _c(a), _c(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_from_norms(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """:func:`cosine_similarity` with the two L2 norms supplied by the
    caller — bit-identical output (same dot fold, same ``norm(a) *
    norm(b)`` product of the same doubles, same NULL propagation: a
    NULL vector yields a NULL norm → NULL product → NULL result, a
    zero norm yields 0.0), but the norms are computed ONCE PER ROW
    before a pair join instead of once per candidate pair. In every
    LSH/top-k verify stage candidates ≫ rows, and the two norm folds
    are 2/3 of the per-pair fold work — measured 1.9 s vs 3.8 s on the
    sf0.1 bucket self-join (guide §1.2: fix the per-task work; §2.3:
    do per-row work before the pairing multiplies it)."""
    denom = _c(na) * _c(nb)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)
