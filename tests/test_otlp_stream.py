"""Streaming OTLP ingest: file-stream payloads → parse → watermarked
rollup, across two micro-batches with a late-row drop."""

from __future__ import annotations

import json

from project_obsidian_core_spark.streaming import otlp_stream as OS

T0_NANOS = 1704067200000000000  # 2024-01-01T00:00:00Z


def _payload(instance: str, metric: str, t_nanos: int, as_int: int) -> str:
    return json.dumps(
        {
            "resourceMetrics": [
                {
                    "resource": {
                        "attributes": [
                            {
                                "key": "service.instance.id",
                                "value": {"stringValue": instance},
                            },
                            {"key": "db.system", "value": {"stringValue": "mysql"}},
                        ]
                    },
                    "scopeMetrics": [
                        {
                            "scope": {"name": "otelcol/mysqlreceiver"},
                            "metrics": [
                                {
                                    "name": metric,
                                    "sum": {
                                        "dataPoints": [
                                            {
                                                "timeUnixNano": str(t_nanos),
                                                "asInt": str(as_int),
                                            }
                                        ],
                                        "isMonotonic": True,
                                        "aggregationTemporality": 2,
                                    },
                                }
                            ],
                        }
                    ],
                }
            ]
        }
    )


def _mins(m: int) -> int:
    return T0_NANOS + m * 60 * 1_000_000_000


def _run(spark, src, ckpt, sink):
    parsed = OS.read_otlp_stream(spark, src)
    agg = OS.otlp_stream_rollup(parsed, watermark="30 seconds", granularity="1 minute")
    q = (
        agg.writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, eid: df.write.mode("overwrite").parquet(f"{sink}/_b={eid}"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    try:
        return {
            (r["window_start"].isoformat(), r["metric_name"]): r
            for r in spark.read.parquet(sink).collect()
        }
    except Exception:
        return {}


def test_otlp_stream_parses_and_rolls_up(spark, tmp_path):
    src, ckpt, sink = tmp_path / "s", str(tmp_path / "c"), str(tmp_path / "o")
    src.mkdir()

    # batch 1: two points in minute-0, one in minute-5 (advances watermark
    # past minute-0 so its window finalizes)
    (src / "b1.jsonl").write_text(
        "\n".join(
            [
                _payload("db-1", "mysql.questions", _mins(0), 10),
                _payload("db-1", "mysql.questions", _mins(0) + 20_000_000_000, 15),
                _payload("db-1", "mysql.questions", _mins(5), 1),
            ]
        )
    )
    out = _run(spark, str(src), ckpt, str(sink))
    key0 = ("2024-01-01T00:00:00", "mysql.questions")
    assert key0 in out
    assert out[key0]["metric_value"] == 25.0
    assert out[key0]["n_points"] == 2
    assert out[key0]["db_system"] == "mysql"
    assert out[key0]["instance_id"] == "db-1"

    # batch 2: a straggler for minute-0 (behind the watermark → dropped) and
    # a minute-10 row that finalizes minute-5
    (src / "b2.jsonl").write_text(
        "\n".join(
            [
                _payload("db-1", "mysql.questions", _mins(0) + 40_000_000_000, 99),
                _payload("db-1", "mysql.questions", _mins(10), 2),
            ]
        )
    )
    out = _run(spark, str(src), ckpt, str(sink))
    assert out[key0]["metric_value"] == 25.0  # late 99 dropped, not re-emitted
    key5 = ("2024-01-01T00:05:00", "mysql.questions")
    assert key5 in out and out[key5]["metric_value"] == 1.0
