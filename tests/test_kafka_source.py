"""Kafka transport adapter (sources/kafka.py): option mapping vs the
reference ingestion spec, and file-source substitution proving the
payload→parse chain is transport-agnostic (no broker in the sandbox)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from project_obsidian_core_spark.sources import kafka as K
from project_obsidian_core_spark.sources import otlp
from tests.test_otlp_stream import _mins, _payload


def test_kafka_reader_options_match_reference_spec():
    """The option map carries the reference spec's consumer fields
    (qan_ingestion_spec.json:58-66) under Spark's kafka-source keys."""
    cfg = K.KafkaSourceConfig(
        bootstrap_servers="broker-1:9092,broker-2:9092",
        topic="otlp-logs",
        group_id="druid-otlp-qan",
        max_offsets_per_trigger=100_000,
    )
    opts = K.kafka_reader_options(cfg)
    assert opts["kafka.bootstrap.servers"] == "broker-1:9092,broker-2:9092"
    assert opts["subscribe"] == "otlp-logs"
    assert opts["kafka.group.id"] == "druid-otlp-qan"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "100000"
    assert opts["failOnDataLoss"] == "true"


def test_kafka_defaults_omit_backpressure_cap():
    opts = K.kafka_reader_options(
        K.KafkaSourceConfig(bootstrap_servers="b:9092", topic="t")
    )
    assert "maxOffsetsPerTrigger" not in opts
    assert opts["kafka.group.id"] == "obsidian-spark-otlp-qan"


def test_read_metric_stream_rejects_unknown_kind(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown metric-stream source"):
        K.read_metric_stream(spark, {"kind": "pulsar"})


def test_file_substitution_matches_batch_parse(spark, tmp_path):
    """The config-gated file transport (the sandbox stand-in for Kafka)
    produces EXACTLY the batch parser's rows for the same payloads — the
    transport contributes nothing but the payload column."""
    payloads = [
        _payload("db-1", "mysql.buffer_pool.ops", _mins(0), 10),
        _payload("db-2", "mysql.threads", _mins(1), 7),
    ]
    src = tmp_path / "stream_src"
    src.mkdir()
    (src / "batch0.txt").write_text("\n".join(payloads) + "\n")

    stream = K.read_metric_stream(spark, {"kind": "file", "path": str(src)})
    assert stream.isStreaming
    name = "kafka_subst_sink"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    got = sorted(map(tuple, spark.table(name).collect()))

    batch = otlp.parse_otlp_metrics(
        spark.createDataFrame([(p,) for p in payloads], ["payload"])
    )
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) == 2


def test_kafka_value_column_feeds_same_parser(spark):
    """A batch relation shaped like Kafka's wire schema (binary `value`)
    run through the adapter's cast+parse stage equals the batch parser —
    pinning the exact column chain read_otlp_kafka_stream uses."""
    payloads = [_payload("db-9", "mysql.uptime", _mins(2), 42)]
    kafka_shaped = spark.createDataFrame(
        [(bytearray(p.encode("utf-8")),) for p in payloads], "value binary"
    )
    got = K.payload_stream_to_metrics(
        kafka_shaped.select(F.col("value").cast("string").alias("payload"))
    )
    want = otlp.parse_otlp_metrics(
        spark.createDataFrame([(p,) for p in payloads], ["payload"])
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
