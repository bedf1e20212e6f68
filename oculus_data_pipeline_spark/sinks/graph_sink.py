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
