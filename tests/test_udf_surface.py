"""UDF surface breadth: spark.udf.register + SQL usage, row-at-a-time
udf (exists but documented slow), Python UDTF (Spark 4), mapInPandas.
The hot paths use built-ins; these tests pin that every sanctioned
extension point works."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oculus_data_pipeline_spark.sources.tables import load_table

from . import ref_model


def test_register_udf_for_sql(spark, sf_dir):
    from oculus_data_pipeline_spark.functions.text import generate_uri

    def uri_py(s):
        return ref_model.uri(s) if s is not None else None

    spark.udf.register("uri_py", uri_py, T.StringType())
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("cust_udf_v")
    rows = spark.sql(
        "SELECT c_name, uri_py(c_name) AS u FROM cust_udf_v LIMIT 20"
    ).collect()
    # the registered Python UDF and the JVM expression kernel agree
    jvm = {
        r["c_name"]: r["u"]
        for r in load_table(spark, sf_dir, "customer")
        .select("c_name", generate_uri("c_name").alias("u"))
        .limit(20)
        .collect()
    }
    for r in rows:
        assert r["u"] == ref_model.uri(r["c_name"])
        if r["c_name"] in jvm:
            assert r["u"] == jvm[r["c_name"]]


def test_python_udtf(spark):
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield w, i

    rows = SplitWords(lit("spark scales out")).collect()
    assert [(r["word"], r["pos"]) for r in rows] == [
        ("spark", 0),
        ("scales", 1),
        ("out", 2),
    ]


def test_map_in_pandas(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def add_ratio(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["chars_x2"] = pdf["n_chars"] * 2
            yield pdf

    out = docs.mapInPandas(add_ratio, schema="doc_id long, n_chars long, chars_x2 long")
    rows = out.collect()
    assert all(r["chars_x2"] == 2 * r["n_chars"] for r in rows)
    assert len(rows) == docs.count()


def test_stateful_streaming_profile(spark, sf_dir, tmp_path):
    from oculus_data_pipeline_spark.sources.tables import load_table
    from oculus_data_pipeline_spark.streaming.ingest import read_events_stream
    from oculus_data_pipeline_spark.streaming.stateful import user_profile_stream

    stream = user_profile_stream(read_events_stream(spark, f"{sf_dir}/events.parquet"))
    q = (
        stream.writeStream.format("memory")
        .queryName("profiles_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last update per user must equal the batch aggregate
    got = {
        r["user_id"]: r
        for r in spark.sql(
            """
            SELECT * FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY n_events DESC) AS rn FROM profiles_out
            ) WHERE rn = 1
            """
        ).collect()
    }
    batch = {
        r["user_id"]: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(got) == set(batch)
    for uid, b in batch.items():
        assert got[uid]["n_events"] == b["n_events"]
        assert got[uid]["last_seen"].startswith(str(b["last_ts"])[:19])
