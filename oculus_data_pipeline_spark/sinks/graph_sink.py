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
    keyed on (src, dst, rel_type) like :46-76)."""
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
            .option("labels", f":{label}")
            .option("node.keys", "key")
            .save()
        )
    for rel_row in edges.select("rel_type").distinct().collect():  # pragma: no cover
        rel = rel_row["rel_type"]
        (
            edges.where(edges.rel_type == rel)
            .write.format("org.neo4j.spark.DataSource")
            .mode("Overwrite")
            .options(**common)
            .option("relationship", rel)
            .option("relationship.save.strategy", "keys")
            .option("relationship.source.labels", ":Node")
            .option("relationship.source.node.keys", "src:key")
            .option("relationship.target.labels", ":Node")
            .option("relationship.target.node.keys", "dst:key")
            .save()
        )
