"""feature_store_fraud_detection_spark — a PySpark-native feature-store analytics engine.

A from-scratch, idiomatic-Spark re-expression of the query and data-processing
capabilities of the reference project ``huybro/feature-store-fraud-detection``
(batch PySpark features -> Postgres offline store; PyFlink+Kafka -> Redis online
store; FastAPI serving; sklearn/torch training), replaced here by:

- one canonical schema + one shared feature-expression layer (``functions``),
- batch pipeline to a partitioned Parquet offline store (``plans``, ``sources``),
- event-time Structured Streaming with watermarks for the online store
  (``streaming``),
- serving access patterns (point/range/bulk/latest-N) as DataFrame queries
  (``operators.relational``, ``operators.windows``),
- MLlib training/scoring pipeline (``ml``),
- LLM-data-pipeline extras: dedup, similarity search, text analysis, multimodal
  column plumbing (``operators``).

Everything is built on DataFrame/SQL so Catalyst handles pushdown, pruning,
join strategy, and whole-stage codegen; Python UDFs are confined to the few
operators whose semantics Spark built-ins cannot express (documented inline).
"""

from feature_store_fraud_detection_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
