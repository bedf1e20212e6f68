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
