"""grouped_prefix_sum — the two-pass distributed scan must be
row-identical to the single-task window for ANY partition count,
including when one giant group spans every partition (the carry-chain
case a per-group window can't parallelize)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from oculus_data_pipeline_spark.operators.prefixsum import grouped_prefix_sum


def _window_reference(df):
    w = (
        W.partitionBy("g")
        .orderBy("i")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return df.withColumn("cum_before", F.sum("v").over(w) - F.col("v"))


def _rows(df):
    return sorted(tuple(r) for r in df.select("g", "i", "v", "cum_before").collect())


@pytest.fixture(scope="module")
def fixture_df(spark):
    # 3 uneven groups, ids deliberately interleaved across insert order
    rows = [("a", i, (i * 7) % 13 + 1) for i in range(40)]
    rows += [("b", i, (i * 5) % 11 + 1) for i in range(15)]
    rows += [("c", i, 3) for i in range(2)]
    import random

    random.Random(6).shuffle(rows)
    return spark.createDataFrame(rows, "g string, i long, v long")


def test_matches_window_reference(spark, fixture_df):
    got = _rows(grouped_prefix_sum(fixture_df, "g", ["i"], "v"))
    want = _rows(_window_reference(fixture_df))
    assert got == want


@pytest.mark.parametrize("n_part", [1, 3, 7, 16])
def test_partition_count_invariance(spark, fixture_df, n_part):
    got = _rows(
        grouped_prefix_sum(fixture_df, "g", ["i"], "v", num_partitions=n_part)
    )
    want = _rows(_window_reference(fixture_df))
    assert got == want


def test_giant_group_spans_every_partition(spark):
    # ONE group, 500 rows, forced through 8 partitions: every boundary
    # cuts the group, so the carry chain is exercised end to end and
    # the offsets must still be the exact serial prefix sums.
    df = spark.createDataFrame(
        [("big", i, i % 9 + 1) for i in range(500)], "g string, i long, v long"
    )
    got = grouped_prefix_sum(df, "g", ["i"], "v", num_partitions=8)
    rows = {r.i: r.cum_before for r in got.collect()}
    run = 0
    for i in range(500):
        assert rows[i] == run, f"row {i}: {rows[i]} != {run}"
        run += i % 9 + 1


def test_custom_out_column_and_schema(spark, fixture_df):
    got = grouped_prefix_sum(fixture_df, "g", ["i"], "v", out="offset")
    assert got.columns == ["g", "i", "v", "offset"]
    assert dict(got.dtypes)["offset"] == "bigint"


def test_null_group_spanning_partitions(spark):
    # A NULL group key is a real group (window semantics: partitionBy
    # groups NULLs together). Forced through 8 partitions the NULL
    # group spans boundaries, so its carries must flow through the
    # null-safe join — the round-7 fix; a plain equi-join left these
    # rows silently un-offset.
    rows = [(None, i, i % 5 + 1) for i in range(300)]
    rows += [("z", i, 2) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, i long, v long")
    got = grouped_prefix_sum(df, "g", ["i"], "v", num_partitions=8)
    null_rows = {r.i: r.cum_before for r in got.where(F.col("g").isNull()).collect()}
    run = 0
    for i in range(300):
        assert null_rows[i] == run, f"null-group row {i}: {null_rows[i]} != {run}"
        run += i % 5 + 1
    z_rows = {r.i: r.cum_before for r in got.where(F.col("g") == "z").collect()}
    assert z_rows == {i: 2 * i for i in range(20)}


def test_all_null_value_slice_contributes_zero(spark):
    # An all-NULL value slice used to make the driver-side carry math
    # raise (None += int); it must instead contribute a 0 partial and
    # leave later rows' offsets exact. NULL values inside a group are
    # skipped by SUM on both the window and the scan path.
    rows = [("a", 0, 5), ("a", 1, None), ("a", 2, None), ("a", 3, 7), ("a", 4, 1)]
    df = spark.createDataFrame(rows, "g string, i long, v long")
    got = {
        r.i: r.cum_before
        for r in grouped_prefix_sum(df, "g", ["i"], "v", num_partitions=5).collect()
    }
    assert got == {0: 0, 1: 5, 2: 5, 3: 5, 4: 12}


def test_high_cardinality_group_collect_is_bounded(spark):
    # 2000 distinct groups through 4 partitions: at most 3 groups span
    # a boundary, so the pass-1 collect must stay O(#partitions), not
    # O(#groups) — asserted by counting rows surviving the spanning
    # filter (the round-7 plan-side bound), plus full value equality.
    rows = [(f"g{i:05d}", j, j + 1) for i in range(2000) for j in range(3)]
    df = spark.createDataFrame(rows, "g string, i long, v long")
    n_part = 4
    d = (
        df.repartitionByRange(n_part, "g", "i")
        .withColumn("_pid", F.spark_partition_id())
    )
    survivors = (
        d.groupBy("_pid", "g")
        .agg(F.count("*").alias("_c"))
        .withColumn("_nspan", F.count(F.lit(1)).over(W.partitionBy("g")))
        .where(F.col("_nspan") > 1)
        .count()
    )
    assert survivors <= 2 * n_part
    got = grouped_prefix_sum(df, "g", ["i"], "v", num_partitions=n_part)
    bad = got.where(F.col("cum_before") != F.col("i") * (F.col("i") + 1) / 2).count()
    assert bad == 0
