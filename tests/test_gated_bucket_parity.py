"""Cross-engine parity of the gated LSH bucket SQL at plane counts the
fixture SFs never reach.

The registered LSH family auto-sizes P from COUNT(*), so the oracle
compares at sf0.001/0.01/0.1 only exercise P = 4 and P = 6 — planes
7..15 of the gated static SQL (queries._gated_bucket_sql) and the
fixed per-table index stride (similarity.PLANE_STRIDE) would go
untested against the Spark expression until a bigger corpus hit them
(the 8× probe regime auto-sizes P = 9 but runs no oracle). These
tests pin bucket-id equality directly: same synthetic vectors through
``lsh_bucket_expr`` and through the gated SQL with the plane-count
CTE forced to high P values, at table 0 and a non-zero table (the
stride case the round-7 de-pin introduced).
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from oculus_data_pipeline_spark.operators.similarity import (
    PLANE_STRIDE,
    auto_planes,
    lsh_bucket_expr,
)
from oculus_data_pipeline_spark.queries import _auto_planes_sql, _gated_bucket_sql

DIM = 64
N = 64


@pytest.fixture(scope="module")
def vec_parquet(spark, tmp_path_factory):
    """Deterministic synthetic vectors, written once, read by BOTH
    engines from the same parquet file (identical float64 bits)."""
    path = str(tmp_path_factory.mktemp("gated") / "vecs.parquet")
    rows = spark.range(N).select(
        F.col("id").cast("long").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), "
            "d -> cast(pmod(xxhash64(id, d), 2001) - 1000 as double) / 997.0)"
        ).alias("v"),
    )
    rows.coalesce(1).write.mode("overwrite").parquet(path)
    return path


@pytest.mark.parametrize(
    ("n_planes", "table"),
    [(12, 0), (12, 2), (16, 1), (9, 3), (4, 0)],
)
def test_bucket_ids_match_duckdb_at_high_p(spark, vec_parquet, n_planes, table):
    got = {
        r["vec_id"]: r["bucket"]
        for r in spark.read.parquet(vec_parquet)
        .select("vec_id", lsh_bucket_expr("v", DIM, n_planes, table).alias("bucket"))
        .collect()
    }
    sql = f"""
    WITH e AS (SELECT vec_id, v FROM read_parquet('{vec_parquet}/*.parquet')),
    np AS (SELECT {n_planes} AS p)
    SELECT vec_id, {_gated_bucket_sql('v', table, 16, DIM)} AS bucket
    FROM e, np
    """
    want = dict(duckdb.sql(sql).fetchall())
    assert got == want
    # at high P the ids must actually spread (a constant-zero bucket
    # column would also "match"). Sign-bit buckets are NOT uniform
    # hashes — correlated vectors collide by design — so this only
    # guards degeneracy, not birthday-bound uniformity (measured ~51
    # distinct of 64 at P=9 on this fixture).
    if n_planes >= 9:
        assert len(set(got.values())) >= N // 2


def test_auto_planes_formula_matches_duckdb():
    """similarity.auto_planes == _auto_planes_sql for counts crossing
    every clamp and bit-length boundary."""
    conn = duckdb.connect()
    for n in [0, 1, 31, 32, 63, 64, 127, 128, 500, 2000, 2047, 2048,
              16_000, 65_535, 65_536, 2_000_000, 10_000_000]:
        sql_p = conn.execute(
            f"SELECT {_auto_planes_sql(str(n), 16)}"
        ).fetchone()[0]
        assert sql_p == auto_planes(n, 32, 16), n


def test_auto_planes_sql_floor():
    """_gated_bucket_sql precondition: its only legal ``np`` source,
    _auto_planes_sql, can NEVER produce p < 4 (planes j < 4 are
    inlined ungated on that floor) — and the Spark policy agrees."""
    conn = duckdb.connect()
    for n in [0, 1, 2, 3, 31, 32, 63]:
        sql_p = conn.execute(f"SELECT {_auto_planes_sql(str(n), 16)}").fetchone()[0]
        assert sql_p >= 4, n
        assert auto_planes(n, 32, 16) >= 4, n


def test_auto_planes_none_pmax_clamps_to_stride():
    """Production callers (p_max=None) must degrade to PLANE_STRIDE at
    absurd N, never hand _planes2d_expr a plan-build ValueError — and
    an oversized EXPLICIT p_max budget clamps the same way (the loud
    error stays reserved for explicit n_planes overrides)."""
    assert auto_planes(2**60) == PLANE_STRIDE
    assert auto_planes(32 * (2**31), target_bucket_size=32) == PLANE_STRIDE
    assert auto_planes(2**60, p_max=48) == PLANE_STRIDE
    assert auto_planes(2**60, p_max=16) == 16
    # unchanged below the ceiling
    assert auto_planes(2000) == auto_planes(2000, 32, 16)


def test_stride_bounds_enforced():
    """A plane count above PLANE_STRIDE must fail loudly — per-table
    plane sets would silently overlap otherwise."""
    with pytest.raises(ValueError, match="PLANE_STRIDE"):
        lsh_bucket_expr("v", DIM, PLANE_STRIDE + 1)


def test_spark_parquet_dir_glob(vec_parquet):
    # read_parquet('<dir>/*.parquet') must actually see the file the
    # Spark writer produced (guards the fixture, not the engines)
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{vec_parquet}/*.parquet')"
    ).fetchone()[0]
    assert n == N


def test_auto_planes_python_duckdb_parity_fuzz():
    """The whole LSH family's cross-engine exactness reduces to BOTH
    engines deriving the identical P from the identical COUNT(*) —
    fuzz the Python policy against the SQL mirror across the full
    integer range: boundary Ns around every power-of-two crossing of
    N // 32, plus seeded random Ns up to 2^62 (hypothesis-style, but
    deterministic so the suite stays replayable)."""
    import random

    conn = duckdb.connect()
    ns = set()
    for k in range(0, 40):
        for d in (-2, -1, 0, 1, 2):
            n = 32 * (2**k) + d
            if n >= 0:
                ns.add(n)
    rng = random.Random(0xA117)
    ns.update(rng.randrange(0, 2**62) for _ in range(400))
    # one SQL round-trip for all cases: engines must agree EVERYWHERE
    rows = conn.execute(
        "SELECT n, " + _auto_planes_sql("n", 16) + " FROM (SELECT "
        "UNNEST(?::BIGINT[]) AS n)", [sorted(ns)]
    ).fetchall()
    for n, sql_p in rows:
        assert sql_p == auto_planes(n, 32, 16), n
