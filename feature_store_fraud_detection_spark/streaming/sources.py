"""Streaming source constructors (reference S5).

The engine's streaming pipeline is source-agnostic — everything downstream
of ``parse_stream`` sees the same typed columns. These constructors build
the raw frame for each source kind; only the rate/file sources are
exercisable in this container (no Kafka broker), but the Kafka wiring is
the one-line production swap the reference's consumer config maps to
(``stream_processing/pipeline.py:33-42``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "transactions",
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source with the reference's topic; value is the JSON payload
    that parse_stream types. Requires the spark-sql-kafka package on the
    cluster (not bundled here)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    )


def file_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-drop source (each file a batch of JSON lines) — the test and
    backfill path; exactly-once with a checkpoint dir."""
    return spark.readStream.schema("value string").json(path)
