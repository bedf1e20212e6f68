"""Hypothesis property tests: the Spark scalar kernels must agree with
the independent pure-Python reference model on arbitrary inputs, not
just curated examples. One Spark job per property (inputs batched into
a single DataFrame) keeps runtime sane."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from oculus_data_pipeline_spark.functions.text import (
    generate_uri,
    normalize_term,
    strip_parenthetical,
    with_converted_name,
)

from . import ref_model

# printable-ascii text, plus the characters the kernels treat specially
TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " ,.()'\t-",
    min_size=0,
    max_size=40,
)

NAME_PARTS = st.text(
    alphabet=string.ascii_letters + " .", min_size=1, max_size=15
)


def _run_batch(spark, values, col_builder, out_col):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], ["i", "s"])
    out = col_builder(df)
    return [r[out_col] for r in out.orderBy("i").collect()]


def test_normalize_strip_uri_properties(spark):
    samples = []

    @settings(max_examples=60, deadline=None)
    @given(TEXT)
    def collect(s):
        samples.append(s)

    collect()
    values = [s for s in samples if s is not None]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], ["i", "s"]
    )
    rows = df.select(
        "i",
        "s",
        normalize_term("s").alias("norm"),
        strip_parenthetical("s").alias("strip"),
        generate_uri("s").alias("uri"),
    ).orderBy("i").collect()
    for r in rows:
        assert r["norm"] == ref_model.normalize(r["s"]), repr(r["s"])
        assert r["strip"] == ref_model.strip_paren(r["s"]), repr(r["s"])
        assert r["uri"] == ref_model.uri(r["s"]), repr(r["s"])
        # idempotence of normalize
        assert ref_model.normalize(r["norm"]) == r["norm"]


def test_convert_name_property(spark):
    samples = []

    @settings(max_examples=60, deadline=None)
    @given(NAME_PARTS, NAME_PARTS, st.booleans())
    def collect(last, first, with_comma):
        samples.append(f"{last}, {first}" if with_comma else f"{last} {first}")

    collect()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(samples)], ["i", "name"]
    )
    rows = with_converted_name(df, "name", "conv").orderBy("i").collect()
    for r in rows:
        expected = ref_model.convert_name(r["name"])
        assert r["conv"] == expected, repr(r["name"])
