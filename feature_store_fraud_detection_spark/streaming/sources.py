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


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str = "transactions",
    starting_offsets: str = "latest",
) -> dict[str, str]:
    """The Kafka reader contract, as data: the option map ``kafka_stream``
    feeds into ``format("kafka")``. Mirrors the reference consumer config
    (``stream_processing/pipeline.py:33-42``: bootstrap.servers +
    topics='transactions'); Flink's ``group.id`` has no Spark analog —
    Structured Streaming tracks offsets in the CHECKPOINT, not in a Kafka
    consumer group, which is also why ``startingOffsets`` only applies to
    the first start of a fresh checkpoint. Split out so the contract is
    unit-testable in a container that lacks the spark-sql-kafka jar."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "transactions",
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source with the reference's topic; value is the JSON payload
    that parse_stream types. Requires the spark-sql-kafka package on the
    cluster (not bundled here)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(
        bootstrap_servers, topic, starting_offsets
    ).items():
        reader = reader.option(k, v)
    return reader.load().selectExpr("CAST(value AS STRING) AS value")


def file_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-drop source (each file a batch of JSON lines) — the test and
    backfill path; exactly-once with a checkpoint dir."""
    return spark.readStream.schema("value string").json(path)
