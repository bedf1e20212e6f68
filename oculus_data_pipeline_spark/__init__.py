"""oculus_data_pipeline_spark — a PySpark-native analytics / ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline (tclaughridge/Oculus-Data-Pipeline: XML ingest →
term extraction/dedup → LLM NER classification → hash surrogate keys →
property-graph sink), widened to the full relational operator surface
(joins, aggregations, windows, rollup/cube, set ops, JSON/date/array
scalars), LLM-training-data operators (exact + MinHash-LSH + SimHash +
n-gram-Jaccard + embedding dedup, ANN similarity search, text analysis,
multimodal binary columns) and Structured Streaming equivalents.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection, AQE. Python UDFs appear only where semantics
require them (Arrow-vectorized, never row-at-a-time in hot paths).
"""

__version__ = "0.1.0"
