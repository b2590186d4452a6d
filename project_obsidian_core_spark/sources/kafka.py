"""Kafka transport for the ingest hop (the reference's production path).

The reference ingests QAN/OTLP batches through a Kafka topic — Druid's
supervisor spec is a Kafka consumer (`druid/config/qan_ingestion_spec.json:58`
``"type": "kafka"``, broker/topic at ``:62-66``). The Spark-native
equivalent is ``spark.readStream.format("kafka")``: each record's ``value``
is one OTLP/JSON payload document, which feeds the SAME
``sources.otlp.parse_otlp_metrics`` column-expression parser the file
source and the batch receiver use — the transport is the only moving part.

No broker (or kafka connector jar) exists in this sandbox, so the adapter
is CONFIG-GATED: :func:`read_metric_stream` dispatches on the config's
``kind`` exactly like the Druid spec's ``ioConfig.type``, and the unit
tests substitute the file source for the Kafka one
(`test_kafka_source.py`) — proving the payload→parse chain is
source-agnostic and the option mapping matches the reference spec. On a
real cluster the only requirement is the
``spark-sql-kafka-0-10`` package on the classpath.

Scale notes
-----------
- Kafka partitions map 1:1 to Spark input partitions; size the topic's
  partition count to the desired ingest parallelism (the reference tunes
  ``maxRowsPerSegment``/``maxRowsInMemory`` — here backpressure is
  ``maxOffsetsPerTrigger`` per micro-batch).
- Offsets live in the checkpoint, not the consumer group (Spark manages
  its own offsets; ``kafka.group.id`` is only an identity for broker-side
  ACLs/quotas — exactly-once into the rollup sink comes from the
  checkpoint + idempotent parquet publish, not Kafka commits).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_obsidian_core_spark.sources import otlp


@dataclass(frozen=True)
class KafkaSourceConfig:
    """The fields of the reference's Kafka ioConfig, Spark-shaped.

    Mirrors `qan_ingestion_spec.json`: ``bootstrap_servers`` ←
    ``consumerProperties."bootstrap.servers"``, ``topic`` ← ``topic``,
    ``group_id`` ← ``consumerProperties."group.id"``.
    """

    bootstrap_servers: str
    topic: str
    group_id: str = "obsidian-spark-otlp-qan"
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int | None = None
    fail_on_data_loss: bool = True


def kafka_reader_options(cfg: KafkaSourceConfig) -> dict[str, str]:
    """The exact option map handed to ``readStream.format("kafka")`` —
    split out so the mapping is unit-testable without a broker."""
    opts = {
        "kafka.bootstrap.servers": cfg.bootstrap_servers,
        "subscribe": cfg.topic,
        "kafka.group.id": cfg.group_id,
        "startingOffsets": cfg.starting_offsets,
        "failOnDataLoss": "true" if cfg.fail_on_data_loss else "false",
    }
    if cfg.max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(cfg.max_offsets_per_trigger)
    return opts


def payload_stream_to_metrics(raw: DataFrame) -> DataFrame:
    """payload-document stream → parsed long metric rows.

    The shared post-transport stage: both the Kafka ``value`` column (cast
    to string) and the file source's ``text`` lines land here as a single
    ``payload`` string column, so every transport runs the identical
    batch-tested parse plan (`otlp_metrics_parse` gate).
    """
    return otlp.parse_otlp_metrics(raw)


def read_otlp_kafka_stream(
    spark: SparkSession, cfg: KafkaSourceConfig
) -> DataFrame:
    """OTLP/JSON payloads from a Kafka topic → parsed long metric rows.

    Feed the result to ``streaming.otlp_stream.otlp_stream_rollup`` (or
    the delta pipeline) exactly like the file-source stream — the
    downstream stages cannot tell transports apart.
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(cfg).items():
        reader = reader.option(k, v)
    raw = reader.load().select(F.col("value").cast("string").alias("payload"))
    return payload_stream_to_metrics(raw)


def read_metric_stream(spark: SparkSession, source: dict) -> DataFrame:
    """Config-gated transport dispatch (the Druid ``ioConfig.type`` knob).

    ``{"kind": "kafka", "bootstrap_servers": ..., "topic": ...}`` → Kafka;
    ``{"kind": "file", "path": ...}`` → the file-replay source used by the
    sandbox tests and the oracle gate. Unknown kinds fail loudly.
    """
    kind = source.get("kind")
    if kind == "kafka":
        cfg = KafkaSourceConfig(
            bootstrap_servers=source["bootstrap_servers"],
            topic=source["topic"],
            group_id=source.get("group_id", KafkaSourceConfig.group_id),
            starting_offsets=source.get("starting_offsets", "earliest"),
            max_offsets_per_trigger=source.get("max_offsets_per_trigger"),
            fail_on_data_loss=source.get("fail_on_data_loss", True),
        )
        return read_otlp_kafka_stream(spark, cfg)
    if kind == "file":
        from project_obsidian_core_spark.streaming.otlp_stream import (
            read_otlp_stream,
        )

        return read_otlp_stream(
            spark, source["path"], source.get("max_files_per_trigger")
        )
    raise ValueError(f"unknown metric-stream source kind: {kind!r}")
