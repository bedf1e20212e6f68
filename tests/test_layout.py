"""Plan-level proof for the storage-layout scale patterns:

1. bucketed-bucketed join → NO Exchange in the physical plan (the
   one-time bucketed write replaces every future shuffle on that key);
2. partitioned write + partition filter → the scan prunes partitions
   at planning time (filter never touches data files).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oculus_data_pipeline_spark.sinks.layout import (
    drop_table,
    physical_plan,
    write_bucketed,
    write_partitioned,
)
from oculus_data_pipeline_spark.sources.tables import load_table


@pytest.fixture()
def no_broadcast(spark):
    """Disable auto-broadcast so small test tables exercise the
    shuffle path a 100 TB fact-fact join would take."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, no_broadcast):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(lineitem, "t_lineitem_b", ["l_orderkey"], 8, ["l_orderkey"])
    try:
        bo, bl = spark.table("t_orders_b"), spark.table("t_lineitem_b")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).select(
            "o_orderkey", "l_quantity"
        )
        plan = physical_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        # same join on the raw parquet DOES shuffle — the control
        raw = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).select("o_orderkey", "l_quantity")
        assert "Exchange" in physical_plan(raw)

        # and values agree
        assert joined.count() == raw.count()
    finally:
        drop_table(spark, "t_orders_b")
        drop_table(spark, "t_lineitem_b")


def test_bucketed_aggregation_is_shuffle_free(spark, sf_dir, no_broadcast):
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(lineitem, "t_lineitem_agg", ["l_orderkey"], 8)
    try:
        agg = (
            spark.table("t_lineitem_agg")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        assert "Exchange" not in physical_plan(agg)
        # values match the shuffled computation
        raw = lineitem.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
        assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, raw.collect()))
    finally:
        drop_table(spark, "t_lineitem_agg")


def test_partition_pruning(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    write_partitioned(events, out, ["event_type"])

    part = spark.read.parquet(out)
    n_types = part.select("event_type").distinct().count()
    assert n_types > 1

    pruned = part.where(F.col("event_type") == "view")
    plan = physical_plan(pruned)
    # pruning happened at planning time: the partition filter reaches
    # the scan node and the unselected partitions never appear
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    expected = events.where(F.col("event_type") == "view").count()
    assert pruned.count() == expected


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir, no_broadcast):
    """Spark's runtime row-group filter: a selective dim predicate
    injects a bloom filter on the fact side's join key, so fact rows
    that cannot match are dropped AT THE SCAN, before the join
    shuffle — at 100 TB this is the difference between shuffling the
    whole fact table and shuffling the matching slice. Thresholds are
    lowered because the injection heuristics are sized for cluster
    scans, not sf0.001 fixtures; the mechanism under test is the same.
    """
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        pa = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
        j = li.join(pa, li.l_partkey == pa.p_partkey)
        plan = physical_plan(j)
        assert "might_contain" in plan, plan
        # the filter lands on the FACT (lineitem) side of the join
        assert "l_partkey" in plan.split("might_contain", 1)[1][:400], plan
        # and the result is identical to the unfiltered join
        n_expected = li.join(
            pa.hint("broadcast"), li.l_partkey == pa.p_partkey
        ).count()
        assert j.count() == n_expected
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_zorder_files_are_tight_in_every_dimension(spark, sf_dir, tmp_path):
    """Z-ordered files must be bounding boxes in BOTH clustered
    columns (so parquet min/max stats can skip files for predicates
    on either), where a linear sort is tight only in its leading
    column and spans the full secondary range in every file."""
    import glob

    import pyarrow.parquet as pq

    from oculus_data_pipeline_spark.sinks.layout import write_zordered

    events = load_table(spark, sf_dir, "events").select("user_id", "value")
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(events, zpath, ["user_id", "value"], num_files=8)
    (
        events.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    import numpy as np

    def coverages(path, col):
        """Per-file min/max span in global RANK space — rank space
        (what range-bucketed skipping effectively sees) is robust to
        the value column's long tail, raw ranges are not."""
        mins, maxs, allvals = [], [], []
        for f in glob.glob(f"{path}/part-*.parquet"):
            t = pq.read_table(f, columns=[col]).to_pandas()[col]
            if len(t) == 0:
                continue
            mins.append(float(t.min()))
            maxs.append(float(t.max()))
            allvals.append(t.to_numpy())
        g = np.sort(np.concatenate(allvals))
        lo = np.searchsorted(g, mins, side="left") / len(g)
        hi = np.searchsorted(g, maxs, side="right") / len(g)
        return (hi - lo).tolist()

    z_user, z_val = coverages(zpath, "user_id"), coverages(zpath, "value")
    l_val = coverages(lpath, "value")
    assert len(z_user) >= 4
    # linear sort: every file spans ~the whole secondary rank range
    assert sum(l_val) / len(l_val) > 0.85, l_val
    # z-order: both dimensions bounded well below full range
    assert sum(z_user) / len(z_user) < 0.7, z_user
    assert sum(z_val) / len(z_val) < 0.7, z_val

    # and the layout is lossless
    assert spark.read.parquet(zpath).count() == events.count()


def test_zorder_key_outliers_clamp_to_nearest_edge(spark):
    """Sample-derived bounds mean real data can fall OUTSIDE [lo, hi].
    Below-lo used to become bucket -1 — all-ones in two's complement,
    z-sorting the row to the far TOP corner of every dimension (r11
    review). Outliers must clamp to the nearest edge: below-lo sorts
    before everything in-range, above-hi after."""
    from oculus_data_pipeline_spark.sinks.layout import zorder_key

    df = spark.createDataFrame(
        [(-50.0, -50.0), (0.0, 0.0), (50.0, 50.0), (100.0, 100.0),
         (200.0, 200.0)],
        "x double, y double",
    )
    keys = {
        r["x"]: r["k"]
        for r in df.select(
            "x",
            zorder_key([(F.col("x"), 0.0, 100.0),
                        (F.col("y"), 0.0, 100.0)]).alias("k"),
        ).collect()
    }
    assert keys[-50.0] == keys[0.0] == 0  # clamped to the low edge
    assert keys[200.0] == keys[100.0]    # clamped to the top bucket
    assert keys[0.0] < keys[50.0] < keys[100.0]  # monotone in-range
