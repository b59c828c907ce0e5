"""pulseboard_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Connektn/pulseboard reference
(real-time anomaly detection + CDP stream processor), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, with
Structured Streaming twins for the streaming path.

Layout:
  session     — tuned SparkSession helpers (AQE, shuffle partitions, UTC)
  sources     — parquet loaders + derived entity/CDP event views
  operators   — batch operators (windows, ewma, rules, identity, profiles,
                segments, rolling counter, dedup, similarity, text)
  functions   — scalar column-expression builders (normalize, severity, ...)
  streaming   — Structured Streaming pipelines sharing the same operators
  oracle      — DuckDB oracle SQL for every operator (correctness gate)
"""

__version__ = "0.1.0"
