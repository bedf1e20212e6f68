"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the full reference-pipeline
DAG: documents → term extraction → dedup → known-entity precedence →
classification → URI keys → graph edges) on sf0.001.

``queries()`` / ``oracle_sql()`` expose the operator registry from
``oculus_data_pipeline_spark.queries`` — one PySpark implementation +
one DuckDB oracle per operator in SURVEY.md §2 / §2.13.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust under import-by-path: the package lives next to this file
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from oculus_data_pipeline_spark.queries import get_oracle_sql, get_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = get_queries()
    return qs["q62_graph_edges"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return get_queries()


def oracle_sql() -> dict[str, str]:
    return get_oracle_sql()
