"""S11 receiver: parse a hand-written OTLP/JSON payload (the public wire
format the stock mysql/postgresql receivers emit — int64s as decimal
strings, gauge + monotonic sum, resource attributes) and check the long
rows, plus the metrics_db bridge feeding analytics.metrics."""

from __future__ import annotations

import json

from project_obsidian_core_spark.sources import otlp

#: a faithful ExportMetricsServiceRequest JSON document: one MySQL resource,
#: one gauge (threads) + one monotonic sum (questions) — the two point kinds
#: the reference receivers produce (otel-config.yaml:11-23).
PAYLOAD = {
    "resourceMetrics": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.instance.id", "value": {"stringValue": "db-1"}},
                    {"key": "db.system", "value": {"stringValue": "mysql"}},
                ]
            },
            "scopeMetrics": [
                {
                    "scope": {"name": "otelcol/mysqlreceiver", "version": "0.96.0"},
                    "metrics": [
                        {
                            "name": "mysql.threads",
                            "unit": "1",
                            "gauge": {
                                "dataPoints": [
                                    {
                                        "timeUnixNano": "1704067200000000000",
                                        "asInt": "42",
                                        "attributes": [
                                            {
                                                "key": "kind",
                                                "value": {"stringValue": "running"},
                                            }
                                        ],
                                    }
                                ]
                            },
                        },
                        {
                            "name": "mysql.questions",
                            "unit": "1",
                            "sum": {
                                "dataPoints": [
                                    {
                                        "timeUnixNano": "1704067260000000000",
                                        "startTimeUnixNano": "1704067200000000000",
                                        "asDouble": 1234.5,
                                        "attributes": [],
                                    }
                                ],
                                "aggregationTemporality": 2,
                                "isMonotonic": True,
                            },
                        },
                    ],
                }
            ],
        }
    ]
}


def test_parse_otlp_metrics_payload(spark):
    df = spark.createDataFrame([(json.dumps(PAYLOAD),)], ["payload"])
    rows = {r["metric_name"]: r for r in otlp.parse_otlp_metrics(df).collect()}
    assert set(rows) == {"mysql.threads", "mysql.questions"}

    g = rows["mysql.threads"]
    assert g["metric_kind"] == "gauge"
    assert g["instance_id"] == "db-1"
    assert g["db_system"] == "mysql"
    assert g["metric_value_int"] == 42
    assert g["metric_value_double"] == 42.0
    assert g["time"].isoformat() == "2024-01-01T00:00:00"
    assert g["point_attrs"]["kind"] == "running"

    s = rows["mysql.questions"]
    assert s["metric_kind"] == "sum"
    assert s["metric_value_int"] is None  # asDouble point
    assert s["metric_value_double"] == 1234.5
    assert s["time"].isoformat() == "2024-01-01T00:01:00"


def test_db_system_inferred_from_metric_prefix(spark):
    # no db.system resource attribute → the receiver namespace prefix decides
    payload = {
        "resourceMetrics": [
            {
                "resource": {"attributes": []},
                "scopeMetrics": [
                    {
                        "scope": {"name": "x"},
                        "metrics": [
                            {
                                "name": "postgresql.blocks_hit",
                                "sum": {
                                    "dataPoints": [
                                        {"timeUnixNano": "1704067200000000000", "asInt": "9"}
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
    df = spark.createDataFrame([(json.dumps(payload),)], ["payload"])
    out = otlp.parse_otlp_metrics(df).collect()
    assert len(out) == 1 and out[0]["db_system"] == "postgresql"
    assert out[0]["instance_id"] is None


def test_to_metrics_long_feeds_analytics(spark):
    from project_obsidian_core_spark.analytics import metrics as MA

    df = spark.createDataFrame([(json.dumps(PAYLOAD),)], ["payload"])
    long_df = otlp.to_metrics_long(otlp.parse_otlp_metrics(df))
    assert long_df.columns == [
        "time",
        "instance_id",
        "db_system",
        "metric_name",
        "metric_value",
    ]
    series = MA.metric_series(long_df, ["mysql.threads"], bucket="1 minute").collect()
    assert len(series) == 1 and series[0]["avg_value"] == 42.0
