"""Watermark late-data semantics: an aggregate in append mode must
DROP events arriving after the watermark has passed their window —
the behavior that bounds state and defines correctness under
out-of-order data."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_late_events_dropped_beyond_watermark(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    d = tmp_path / "late_src"
    d.mkdir()

    import pyarrow as pa
    import pyarrow.parquet as pq

    def write_batch(name, rows):
        # single flat files so the stream's file ordering (mod time)
        # follows write order deterministically
        tbl = pa.table(
            {
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, str(d / name))
        # file source orders by modification time; force strictly
        # increasing mtimes so arrival order == write order
        import os

        write_batch.seq = getattr(write_batch, "seq", 0) + 1
        t = 1700000000 + write_batch.seq * 60
        os.utime(str(d / name), (t, t))

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    # batch 1: events at 10:00-10:05 — watermark will trail at 09:55
    write_batch("b1.parquet", [(t0, 1, 1.0), (t0 + dt.timedelta(minutes=5), 1, 2.0)])
    # batch 2: far-future event pushes the watermark WAY past 10:xx
    write_batch("b2.parquet", [(t0 + dt.timedelta(hours=6), 1, 4.0)])
    # batch 3: another on-time event — the watermark advance from b2
    # takes effect here and the 10:00 window is finalized + evicted
    # (watermark updates propagate at the NEXT batch boundary)
    write_batch("b3.parquet", [(t0 + dt.timedelta(hours=6, minutes=5), 1, 8.0)])
    # batch 4: a LATE event back at 10:01 — its window state is gone
    # and its event time is far below the watermark → must be dropped
    write_batch("b4.parquet", [(t0 + dt.timedelta(minutes=1), 1, 100.0)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.sum("value").alias("total"))
        .select(F.date_format("w.start", "HH:mm").alias("w_start"), "total")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    finalized = {
        r["w_start"]: r["total"] for r in spark.sql("SELECT * FROM late_out").collect()
    }
    # the 10:00 window closed when the 16:00 event advanced the
    # watermark; it must contain ONLY the on-time values (1+2), never
    # the late 100.0
    assert finalized.get("10:00") == 3.0, finalized
