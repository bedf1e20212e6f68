"""Edge-semantics pins for the late-r9 operator-hardening review.

Each test here pins one of the review's findings — NULL handling,
multi-row preconditions, encoding ambiguity, working-column
collisions — on tiny hand-built frames where the expected output is
computable by eye. The registry oracles cover the well-formed-data
paths; these cover the paths a dirty 100 TB table actually exercises.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# --- scd2_apply -----------------------------------------------------------


def test_scd2_multi_update_per_key_builds_a_version_chain(spark):
    """Two updates for one key = one closed old row (at the FIRST
    change date) + a chained version per update (valid_to = next
    change date, last open). The pre-r9 single-shot form emitted TWO
    closed copies of the old row and TWO simultaneously-open
    versions."""
    from oculus_data_pipeline_spark.operators.scd import OPEN_END, scd2_apply

    current = spark.createDataFrame(
        [(1, "a", "2020-01-01", OPEN_END)],
        "k int, v string, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame(
        [(1, "b", "2021-01-01"), (1, "c", "2022-01-01")],
        "k int, v string, change_date string",
    )
    got = _rows(scd2_apply(current, updates, key="k"))
    assert got == sorted(
        [
            (1, "a", "2020-01-01", "2021-01-01"),  # closed ONCE, at first
            (1, "b", "2021-01-01", "2022-01-01"),  # chained to next
            (1, "c", "2022-01-01", OPEN_END),      # last stays open
        ]
    )


def test_scd2_null_valid_to_is_open_not_dropped(spark):
    """NULL valid_to rows matched NEITHER the == OPEN_END nor the
    != OPEN_END branch pre-r9 and vanished from the returned history.
    Now NULL means open: closable when updated, passed through (NULL
    intact) when not."""
    from oculus_data_pipeline_spark.operators.scd import OPEN_END, scd2_apply

    current = spark.createDataFrame(
        [(1, "a", "2020-01-01", None), (2, "x", "2020-01-01", None)],
        "k int, v string, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame(
        [(1, "b", "2021-01-01")], "k int, v string, change_date string"
    )
    got = _rows(scd2_apply(current, updates, key="k"))
    assert got == sorted(
        [
            (1, "a", "2020-01-01", "2021-01-01"),
            (1, "b", "2021-01-01", OPEN_END),
            (2, "x", "2020-01-01", None),  # untouched, NULL preserved
        ]
    )


def test_scd2_single_update_semantics_unchanged(spark):
    """The chain generalization must reduce to the pre-r9 output for
    single-update-per-key input (q74's oracle shape)."""
    from oculus_data_pipeline_spark.operators.scd import OPEN_END, scd2_apply

    current = spark.createDataFrame(
        [
            (1, "a", "2019-01-01", "2020-01-01"),  # history row
            (1, "b", "2020-01-01", OPEN_END),
            (2, "z", "2020-01-01", OPEN_END),
        ],
        "k int, v string, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame(
        [(1, "c", "2021-06-15")], "k int, v string, change_date string"
    )
    got = _rows(scd2_apply(current, updates, key="k"))
    assert got == sorted(
        [
            (1, "a", "2019-01-01", "2020-01-01"),
            (1, "b", "2020-01-01", "2021-06-15"),
            (1, "c", "2021-06-15", OPEN_END),
            (2, "z", "2020-01-01", OPEN_END),
        ]
    )


# --- cdc_apply ------------------------------------------------------------


def test_cdc_null_op_is_not_a_delete(spark):
    """Keys whose winning row carries op=NULL (feeds that only tag
    deletes) must appear in the snapshot — the pre-r9 plain != made
    the filter NULL and silently dropped them."""
    from oculus_data_pipeline_spark.operators.scd import cdc_apply

    chg = spark.createDataFrame(
        [(1, 10, None, "v1"), (2, 20, "D", "v2"), (3, 30, "U", "v3")],
        "k int, seq int, op string, v string",
    )
    got = _rows(cdc_apply(chg, key_cols=["k"], seq_col="seq"))
    assert got == sorted([(1, 10, None, "v1"), (3, 30, "U", "v3")])


# --- snapshot_diff --------------------------------------------------------


def test_snapshot_diff_empty_compare_cols(spark):
    """An added/removed-only diff is legitimate; pre-r9 it raised
    TypeError at plan build (F.when(None, ...))."""
    from oculus_data_pipeline_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame([(1,), (2,)], "k int")
    new = spark.createDataFrame([(2,), (3,)], "k int")
    got = _rows(snapshot_diff(old, new, ["k"], []))
    assert got == sorted([(1, "removed"), (3, "added")])


# --- table_fingerprint ----------------------------------------------------


def test_fingerprint_column_boundaries_are_unambiguous(spark):
    """('a|b','c') and ('a','b|c') serialized identically under the
    old bare '|' join — a real divergence hashed clean. The
    length-prefix encoding must give the buckets different digests.
    Same for NULL vs the literal strings '<NULL>' and 'N'."""
    from oculus_data_pipeline_spark.operators.scd import table_fingerprint

    def fp(rows):
        df = spark.createDataFrame(rows, "k int, a string, b string")
        return _rows(table_fingerprint(df, "k", ["a", "b"], n_buckets=1))

    assert fp([(1, "a|b", "c")]) != fp([(1, "a", "b|c")])
    assert fp([(1, None, "x")]) != fp([(1, "<NULL>", "x")])
    assert fp([(1, None, "x")]) != fp([(1, "N", "x")])
    # identical rows still agree (the whole point of the fingerprint)
    assert fp([(1, "a", "b")]) == fp([(1, "a", "b")])


# --- sketches: NULL is a real key ----------------------------------------


def test_cms_heavy_hitters_reports_a_null_modal_key(spark):
    """NULL as the most frequent key must appear in the top-k with a
    sound estimate — pre-r9 its probe rows had NULL buckets that fell
    out of the grid equi-join and the heaviest hitter went missing."""
    from oculus_data_pipeline_spark.operators.sketch import cms_heavy_hitters

    df = spark.createDataFrame(
        [(None,)] * 5 + [("a",)] * 2 + [("b",)], "k string"
    )
    got = {r["key"]: r for r in cms_heavy_hitters(df, "k", topk=3).collect()}
    assert None in got
    assert got[None]["exact_n"] == 5
    assert got[None]["sound"] and got[None]["est_n"] >= 5


def test_count_sketch_estimates_include_null_key(spark):
    from oculus_data_pipeline_spark.operators.sketch import (
        count_sketch_estimates,
    )

    df = spark.createDataFrame(
        [(None,)] * 4 + [("a",)] * 2, "k string"
    )
    got = {r["key"]: r for r in count_sketch_estimates(df, "k", topk=2).collect()}
    assert None in got and got[None]["exact_n"] == 4


def test_bloom_no_false_negative_on_null_key(spark):
    """Build side contains NULL, probe side probes NULL: the
    no-false-negatives contract must hold — pre-r9 the NULL probe key
    hashed to NULL positions and the present-join missed it, so a
    false negative was miscounted as a true negative."""
    from oculus_data_pipeline_spark.operators.sketch import (
        bloom_membership_report,
    )

    build = spark.createDataFrame([("x",), (None,)], "k string")
    probe = spark.createDataFrame([("x",), (None,), ("absent",)], "k string")
    row = bloom_membership_report(build, probe, "k", "k").collect()[0]
    assert row["n_probed"] == 3
    assert row["n_present"] == 2
    assert row["false_negatives"] == 0


def test_null_key_digest_distinct_from_sentinel_lookalikes(spark):
    """The 'V'/'N' prefix code: NULL's digest differs from the digests
    of the literal keys 'N', '<NULL>', and '' (a bare coalesce
    sentinel would collide with one of these)."""
    from oculus_data_pipeline_spark.functions.hashing import key_digest

    df = spark.createDataFrame(
        [(None,), ("N",), ("<NULL>",), ("",)], "k string"
    )
    digs = [
        r[0] for r in df.select(key_digest(F.col("k"))).collect()
    ]
    assert len(set(digs)) == 4


# --- group_aware_split ----------------------------------------------------


def test_group_aware_split_assigns_null_text_docs(spark):
    """NULL-text docs hashed to a NULL content key pre-r9 and fell out
    of the equi-join — no split assignment, silently missing from the
    corpus. They now form one dedup group with one assignment."""
    from oculus_data_pipeline_spark.operators.split import group_aware_split

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, None), (4, "hello world")],
        "doc_id int, text string",
    )
    got = group_aware_split(docs).collect()
    assert len(got) == 4  # nobody dropped
    by_id = {r["doc_id"]: r for r in got}
    # NULL-text docs share a canonical and therefore a split
    assert by_id[2]["canonical_id"] == by_id[3]["canonical_id"] == 2
    assert by_id[2]["split"] == by_id[3]["split"]
    # exact dups still share a group
    assert by_id[1]["canonical_id"] == by_id[4]["canonical_id"] == 1


def test_group_aware_split_matches_exact_dedup_canonicals(spark, sf_dir):
    """The single-scan (hash → canonical) derivation must produce the
    identical map exact_dedup builds (the pre-r9 two-scan source) on
    real data."""
    from oculus_data_pipeline_spark.operators.dedup import exact_dedup
    from oculus_data_pipeline_spark.operators.split import group_aware_split
    from oculus_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    via_split = _rows(
        group_aware_split(docs).select("doc_id", "canonical_id")
    )
    ed = exact_dedup(docs).select("content_hash", "canonical_id")
    hashed = docs.select(
        F.col("doc_id"),
        F.md5(
            __import__(
                "oculus_data_pipeline_spark.functions.text",
                fromlist=["normalize_term"],
            ).normalize_term("text")
        ).alias("content_hash"),
    )
    via_dedup = _rows(hashed.join(ed, "content_hash").select("doc_id", "canonical_id"))
    assert via_split == via_dedup


# --- working-column collision guards -------------------------------------


def test_grouped_prefix_sum_rejects_colliding_columns(spark):
    from oculus_data_pipeline_spark.operators.prefixsum import (
        grouped_prefix_sum,
    )

    df = spark.createDataFrame([(1, 1, 1)], "g int, o int, _pid int")
    with pytest.raises(ValueError, match="_pid"):
        grouped_prefix_sum(df, "g", ["o"], "o")
    df2 = spark.createDataFrame([(1, 1, 1)], "g int, o int, cum_before int")
    with pytest.raises(ValueError, match="cum_before"):
        grouped_prefix_sum(df2, "g", ["o"], "o")


def test_stratified_split_rejects_colliding_columns(spark):
    from oculus_data_pipeline_spark.operators.split import stratified_split

    df = spark.createDataFrame([(1, "s", 0)], "id int, src string, _h int")
    with pytest.raises(ValueError, match="_h"):
        stratified_split(df, "src", "id")
