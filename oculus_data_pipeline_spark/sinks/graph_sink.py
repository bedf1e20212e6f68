"""Graph sinks (reference json_to_db.py re-expressed).

Default: parquet tables — correctness never depends on an external DB
(SURVEY.md §7 step 8). The per-document ~13-transaction loop
(json_to_db.py:78-127) becomes two bulk writes after set-wise dedup,
which reproduces Cypher MERGE idempotency.

Neo4j: available when the Neo4j Spark Connector jar is on the
classpath (it is not in this environment); gated behind a runtime
check, same two-DataFrame interface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Endpoint labels per relationship type, exactly the labels the
# reference's Cypher hardcodes at each call site (json_to_db.py:
# create_relationship callers at :94-116 bind Person/Place/
# Organization → Document; relate_index_term :54-60 binds
# (d:Document)-[:HAS_TERM]->(t:Term); date edges :84-92 bind
# (d:Document)→(:Date)). MIDSUB/SUB (relate_sub_term :63-69) carry a
# None source: the parent is a Term in the reference-faithful default
# graph, but under build_document_graph(typed_parent_sub_edges=True)
# it can be any typed entity, so the writer resolves those source
# labels from the nodes table instead of guessing.
REL_ENDPOINT_LABELS: dict[str, tuple[str | None, str]] = {
    "AUTHOR": ("Person", "Document"),
    "RECIPIENT": ("Person", "Document"),
    "LOCATION": ("Place", "Document"),
    "DATE_FROM": ("Document", "Date"),
    "DATE_TO": ("Document", "Date"),
    "HAS_TERM": ("Document", "Term"),
    "HAS_PERSON": ("Person", "Document"),
    "HAS_PLACE": ("Place", "Document"),
    "HAS_ORGANIZATION": ("Organization", "Document"),
    "MIDSUB": (None, "Term"),
    "SUB": (None, "Term"),
}


def node_write_options(label: str) -> dict[str, str]:
    """The exact per-label option map write_graph_neo4j hands the
    Neo4j Spark Connector for a node write (MERGE on (label, key) —
    json_to_db.py:7-44). Split out so tests can golden-pin the
    rendered contract even though the connector jar is absent here."""
    return {"labels": f":{label}", "node.keys": "key"}


def relationship_write_options(
    src_label: str, dst_label: str, rel_type: str
) -> dict[str, str]:
    """The exact per-group option map write_graph_neo4j hands the
    Neo4j Spark Connector for one relationship_groups() group: MERGE
    the relationship by keys, Match (never create) the typed
    endpoints written by the node pass (json_to_db.py:46-76). Keys
    and save modes here ARE the writer contract — golden-pinned by
    tests so a jar-present environment is plug-in."""
    return {
        "relationship": rel_type,
        "relationship.save.strategy": "keys",
        "relationship.source.labels": f":{src_label}",
        "relationship.source.node.keys": "src:key",
        "relationship.source.save.mode": "Match",
        "relationship.target.labels": f":{dst_label}",
        "relationship.target.node.keys": "dst:key",
        "relationship.target.save.mode": "Match",
    }


def relationship_groups(
    nodes: DataFrame,
    edges: DataFrame,
    persisted: list[DataFrame] | None = None,
) -> list[tuple[str, str, str, DataFrame]]:
    """Split the edge table into label-homogeneous groups
    (src_label, dst_label, rel_type, edges_subset) — the unit a
    label-aware bulk writer (Neo4j connector) needs, since its
    relationship MERGE matches endpoints BY LABEL + key.

    rel_types outside the reference set raise (an edge written with
    wrong endpoint labels would silently MERGE orphan nodes — the
    failure mode this function exists to prevent). MIDSUB/SUB source
    labels are resolved from ``nodes``; a SOURCE KEY mapped to more
    than one label is ambiguous (e.g. a term text colliding with a
    doc id) and raises rather than guessing — duplicate edge ROWS
    (legitimate in streaming-append output, which defers dedup to
    read time) are NOT ambiguity and pass through (r10 advice).

    ``edges`` (and the MIDSUB/SUB label-resolution join, if needed)
    are persisted for the duration of the write so the discovery
    aggregations and the per-group scans at write time recompute the
    edge lineage once, not once per driver action (r10 advice). Pass a
    list as ``persisted`` to receive the persisted handles; the caller
    unpersists them after consuming the groups (write_graph_neo4j
    does). Without it the cache ages out under Spark's LRU.
    """
    edges = edges.persist()
    if persisted is not None:
        persisted.append(edges)
    present = {
        r["rel_type"] for r in edges.select("rel_type").distinct().collect()
    }
    unknown = present - set(REL_ENDPOINT_LABELS)
    if unknown:
        edges.unpersist()
        raise ValueError(
            f"relationship_groups: no endpoint-label mapping for "
            f"rel_type(s) {sorted(unknown)!r}; extend "
            f"REL_ENDPOINT_LABELS (labels must match the node writes "
            f"or the connector MERGEs orphan endpoints)"
        )
    groups: list[tuple[str, str, str, DataFrame]] = []
    for rel in sorted(present):
        src_l, dst_l = REL_ENDPOINT_LABELS[rel]
        if src_l is None:
            continue  # MIDSUB/SUB: resolved below
        sub = edges.where(F.col("rel_type") == rel)
        groups.append((src_l, dst_l, rel, sub))
    if {"MIDSUB", "SUB"} & present:
        sub_edges = edges.where(F.col("rel_type").isin("MIDSUB", "SUB"))
        key_labels = nodes.select("key", "label").distinct()
        resolved = sub_edges.join(
            key_labels.withColumnRenamed("key", "src").withColumnRenamed(
                "label", "src_label"
            ),
            "src",
            "left",
        ).persist()
        if persisted is not None:
            persisted.append(resolved)
        # One bounded aggregation (≤ one row per rel_type) answers all
        # three discovery questions: the distinct source labels per
        # rel_type, whether any single src KEY resolved to >1 label
        # (ambiguous — collect_set per src, not a raw row count, so
        # duplicate edge rows don't misreport), and whether any src is
        # absent from the nodes table (left join → NULL label →
        # collect_set size 0).
        summary = (
            resolved.groupBy("src", "rel_type")
            .agg(F.collect_set("src_label").alias("labels"))
            .groupBy("rel_type")
            .agg(
                F.array_distinct(
                    F.flatten(F.collect_set("labels"))
                ).alias("labels"),
                F.max(F.size("labels")).alias("max_labels"),
                F.max_by("src", F.size("labels")).alias("worst_src"),
                F.min_by("src", F.size("labels")).alias("orphan_src"),
                F.min(F.size("labels")).alias("min_labels"),
            )
            .collect()
        )
        for row in summary:
            if row["max_labels"] > 1:
                edges.unpersist()
                resolved.unpersist()
                raise ValueError(
                    f"relationship_groups: source key "
                    f"{row['worst_src']!r} of a {row['rel_type']} edge "
                    f"exists under multiple node labels — ambiguous "
                    f"endpoint, refusing to guess"
                )
            if row["min_labels"] == 0:
                edges.unpersist()
                resolved.unpersist()
                raise ValueError(
                    f"relationship_groups: {row['rel_type']} edge "
                    f"source {row['orphan_src']!r} not found in the "
                    f"nodes table"
                )
        for row in sorted(summary, key=lambda r: r["rel_type"]):
            rel = row["rel_type"]
            for src_l in sorted(row["labels"]):
                sub = resolved.where(
                    (F.col("src_label") == src_l)
                    & (F.col("rel_type") == rel)
                ).drop("src_label")
                groups.append((src_l, "Term", rel, sub))
    return groups


def write_graph_parquet(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    nodes.dropDuplicates(["label", "key"]).write.mode("overwrite").parquet(
        f"{out_dir}/nodes"
    )
    edges.dropDuplicates(["src", "dst", "rel_type"]).write.mode("overwrite").parquet(
        f"{out_dir}/edges"
    )


def write_graph_delta_merge(
    nodes: DataFrame, edges: DataFrame, out_dir: str
) -> None:
    """Transactional graph upsert via Delta Lake ``MERGE INTO`` — the
    reference's Cypher MERGE (json_to_db.py:7-76) as an ACID table
    operation: nodes keyed on (label, key), edges on (src, dst,
    rel_type), matched rows updated in place, new rows inserted, all
    under one optimistic-concurrency commit per table. Unlike the
    parquet overwrite (write_graph_parquet — set-wise MERGE semantics
    but last-writer-wins at the file level), concurrent pipelines and
    incremental re-ingest stay consistent.

    Gated on the Delta jars. Probe note (2026-08-15, round 7 — same
    result as the 2026-08-14 round-5 probe): this
    container has no delta-spark package, no io.delta jars under the
    pyspark distribution, and no network to resolve
    spark.jars.packages, so the gate is the honest default here —
    re-probe on an image with io.delta:delta-spark_2.13 available.
    The MERGE path below is real and exercised wherever the jars
    exist; in this environment tests pin the gate's behavior.
    """
    spark = nodes.sparkSession
    try:
        from delta.tables import DeltaTable  # noqa: PLC0415

        # py4j resolves classes lazily; Class.forName is a real probe
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        )
    except Exception as e:
        raise NotImplementedError(
            "Delta Lake is not on the classpath (probed 2026-08-15: no "
            "delta-spark package, no io.delta jars, no network in this "
            "container); use write_graph_parquet (default sink) or add "
            "io.delta:delta-spark_2.13 to spark.jars.packages and set "
            "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"
        ) from e

    for name, df, keys in (  # pragma: no cover - needs delta jars
        ("nodes", nodes.dropDuplicates(["label", "key"]), ["label", "key"]),
        (
            "edges",
            edges.dropDuplicates(["src", "dst", "rel_type"]),
            ["src", "dst", "rel_type"],
        ),
    ):
        path = f"{out_dir}/{name}"
        if DeltaTable.isDeltaTable(spark, path):
            cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
            (
                DeltaTable.forPath(spark, path)
                .alias("t")
                .merge(df.alias("s"), cond)
                .whenMatchedUpdateAll()
                .whenNotMatchedInsertAll()
                .execute()
            )
        else:
            df.write.format("delta").save(path)


def write_graph_neo4j(
    nodes: DataFrame,
    edges: DataFrame,
    url: str,
    user: str,
    password: str,
    database: str = "neo4j",
) -> None:
    """Bulk upsert via the Neo4j Spark Connector (node keys = (label,
    key) — MERGE semantics like json_to_db.py:7-44; relationships
    keyed on (src, dst, rel_type) like :46-76).

    Relationship writes go per (src_label, dst_label, rel_type) group
    with the ACTUAL endpoint labels (r10 review: the connector MERGEs
    endpoints by label + key, so the previous hardcoded ':Node'
    source/target labels would have MERGEd orphan :Node endpoints
    instead of linking the typed nodes written above — the grouping
    logic is connector-independent and pinned by tests)."""
    spark = nodes.sparkSession
    try:
        # py4j resolves packages lazily; Class.forName is a real probe
        spark._jvm.java.lang.Class.forName("org.neo4j.spark.DataSource")  # noqa: SLF001
    except Exception as e:  # pragma: no cover - connector not in this env
        raise NotImplementedError(
            "Neo4j Spark Connector jar not on the classpath; use "
            "write_graph_parquet (default sink) or add "
            "org.neo4j:neo4j-connector-apache-spark to spark.jars.packages"
        ) from e

    common = {
        "url": url,
        "authentication.basic.username": user,
        "authentication.basic.password": password,
        "database": database,
    }
    for label_row in nodes.select("label").distinct().collect():  # pragma: no cover
        label = label_row["label"]
        (
            nodes.where(nodes.label == label)
            .drop("label")
            .write.format("org.neo4j.spark.DataSource")
            .mode("Overwrite")
            .options(**common)
            .options(**node_write_options(label))
            .save()
        )
    held: list[DataFrame] = []  # pragma: no cover
    try:  # pragma: no cover
        for src_l, dst_l, rel, sub in relationship_groups(
            nodes, edges, persisted=held
        ):
            (
                sub.write.format("org.neo4j.spark.DataSource")
                .mode("Overwrite")
                .options(**common)
                .options(**relationship_write_options(src_l, dst_l, rel))
                .save()
            )
    finally:  # pragma: no cover
        for df in held:
            df.unpersist()
