"""Scale-behavior tests: these assert properties of the PHYSICAL PLAN
(broadcasts chosen, shuffles absent, filters pushed) — the properties
that decide whether a query survives a 100× scale-up — plus
correctness invariance of the skew utilities."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oculus_data_pipeline_spark.operators.skew import salted_join
from oculus_data_pipeline_spark.queries import get_queries
from oculus_data_pipeline_spark.sources.tables import load_table


def physical_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_and_projection_pushdown(spark, sf_dir):
    plan = physical_plan(get_queries()["q01_pricing_summary"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning: unused lineitem columns never leave the scan
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = physical_plan(get_queries()["q03_region_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # no dim join should sort-merge here


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = o.join(c, "o_custkey").groupBy("c_mktsegment").count()
    for salt in (2, 8):
        salted = (
            salted_join(o, c, "o_custkey", salt=salt)
            .groupBy("c_mktsegment")
            .count()
        )
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        )


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], ["k", "v"])
    small = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "w"])
    got = sorted(
        (r["k"], r["w"]) for r in salted_join(big, small, "k", salt=4, how="left").collect()
    )
    assert got == [(1, "x"), (2, "y"), (99, None)]


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both sides on the join key co-locates partitions so
    the join plans with zero Exchange operators — the cluster-scale
    answer to repeated large-table equi-joins."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "orders_bucketed"
    )
    li.selectExpr("l_orderkey", "l_quantity").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("lineitem_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = spark.table("orders_bucketed")
        lb = spark.table("lineitem_bucketed")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).select(
            "o_orderkey", "l_quantity"
        )
        plan = physical_plan(joined)
        assert "Exchange" not in plan, plan[:800]
        # and the same join unbucketed DOES shuffle
        plain = li.selectExpr("l_orderkey", "l_quantity").join(
            o, F.col("l_orderkey") == o.o_orderkey
        )
        assert "Exchange" in physical_plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_aqe_coalesces_small_shuffles(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .count()
    )
    df.collect()
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    )


def test_partition_pruning(spark, sf_dir, tmp_path):
    """Writing partitioned by a date column and filtering on it must
    prune partitions at planning time (the scan lists only matching
    directories) — the core trick for time-series data at 100 TB."""
    out = str(tmp_path / "events_parted")
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    e.write.partitionBy("day").mode("overwrite").parquet(out)
    df = spark.read.parquet(out).where(F.col("day") == "2024-01-05")
    plan = physical_plan(df)
    assert "PartitionFilters" in plan
    assert "2024-01-05" in plan
    # count only reads the one partition's files
    expected = e.where(F.col("day") == "2024-01-05").count()
    assert df.count() == expected > 0


def test_join_strategy_hints(spark, sf_dir):
    """merge/shuffle_hash/broadcast hints override Catalyst's choice —
    the manual control needed when statistics mislead at scale."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    merged = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    assert "SortMergeJoin" in physical_plan(merged)
    hashed = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    assert "ShuffledHashJoin" in physical_plan(hashed)
    bcast = li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey)
    assert "BroadcastHashJoin" in physical_plan(bcast)
    # all three strategies agree on the answer
    n = merged.count()
    assert n == hashed.count() == bcast.count()


def test_observe_metrics_without_extra_action(spark, sf_dir):
    """df.observe collects data-quality metrics inline with the main
    action — no second pass over 100 TB just to count nulls."""
    from pyspark.sql import Observation

    obs = Observation("quality")
    li = load_table(spark, sf_dir, "lineitem")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias("bad_qty"),
    )
    n = observed.count()
    assert obs.get["rows"] == n
    assert obs.get["bad_qty"] == 0
