"""S11 — OTLP/JSON metrics receiver → long-format metric rows.

The reference's metric feed is the stock OTel collector `mysqlreceiver` /
`postgresqlreceiver` pipeline (otel-collector/config/otel-config.yaml:11-23)
whose wire format is OTLP `ExportMetricsServiceRequest`. This module is the
Spark-native receiver: it parses the **public OTLP JSON encoding**
(opentelemetry-proto; int64 fields are serialized as decimal strings) with
`from_json` and a fixed schema, then explodes
resourceMetrics → scopeMetrics → metrics → dataPoints into the long
(time, instance, db_system, metric_name, value) shape `metrics_db` ingests
(druid-specs metrics spec; analytics/metrics.py consumes it).

Everything is JVM-side: one `from_json`, three `explode`s, map lookups —
no Python in the row path, so a 100 TB OTLP archive parses inside
whole-stage codegen at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------- schema ---
_ATTR = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField(
                "value",
                T.StructType(
                    [
                        T.StructField("stringValue", T.StringType()),
                        # OTLP/JSON renders int64 as a decimal string
                        T.StructField("intValue", T.StringType()),
                        T.StructField("doubleValue", T.DoubleType()),
                        T.StructField("boolValue", T.BooleanType()),
                    ]
                ),
            ),
        ]
    )
)

_DATA_POINT = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("startTimeUnixNano", T.StringType()),
        T.StructField("asInt", T.StringType()),
        T.StructField("asDouble", T.DoubleType()),
        T.StructField("attributes", _ATTR),
    ]
)

_METRIC = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("unit", T.StringType()),
        T.StructField(
            "gauge",
            T.StructType([T.StructField("dataPoints", T.ArrayType(_DATA_POINT))]),
        ),
        T.StructField(
            "sum",
            T.StructType(
                [
                    T.StructField("dataPoints", T.ArrayType(_DATA_POINT)),
                    T.StructField("isMonotonic", T.BooleanType()),
                    T.StructField("aggregationTemporality", T.IntegerType()),
                ]
            ),
        ),
    ]
)

#: ExportMetricsServiceRequest, JSON encoding (gauge + sum data; histogram /
#: summary points are out of the reference receivers' output and ignored).
OTLP_METRICS_JSON_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceMetrics",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", _ATTR)]),
                        ),
                        T.StructField(
                            "scopeMetrics",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [
                                                    T.StructField("name", T.StringType()),
                                                    T.StructField("version", T.StringType()),
                                                ]
                                            ),
                                        ),
                                        T.StructField("metrics", T.ArrayType(_METRIC)),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _attrs_to_map(attrs: Column) -> Column:
    """attribute list → map<string,string> (AnyValue collapsed to text)."""
    return F.map_from_entries(
        F.transform(
            attrs,
            lambda a: F.struct(
                a["key"].alias("key"),
                F.coalesce(
                    a["value"]["stringValue"],
                    a["value"]["intValue"],
                    a["value"]["doubleValue"].cast("string"),
                    a["value"]["boolValue"].cast("string"),
                ).alias("value"),
            ),
        )
    )


def parse_otlp_metrics(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """OTLP/JSON payloads → long metric rows.

    Output: (time, instance_id, db_system, metric_name, metric_kind, unit,
    metric_value_int, metric_value_double, resource_attrs, point_attrs).
    `instance_id` follows OTel resource-attribute conventions —
    `service.instance.id`, else the receiver endpoint attributes the stock
    mysql/postgresql receivers stamp; `db_system` from `db.system`, else
    inferred from the metric-name prefix (mysql.* / postgresql.* — the
    receivers' documented namespaces).
    """
    rm = df.select(
        F.from_json(F.col(payload_col), OTLP_METRICS_JSON_SCHEMA).alias("req")
    ).select(F.explode("req.resourceMetrics").alias("rm"))

    sm = rm.select(
        _attrs_to_map(F.col("rm.resource.attributes")).alias("resource_attrs"),
        F.explode("rm.scopeMetrics").alias("sm"),
    )
    m = sm.select(
        "resource_attrs",
        F.explode("sm.metrics").alias("m"),
    )
    dp = m.select(
        "resource_attrs",
        F.col("m.name").alias("metric_name"),
        F.col("m.unit").alias("unit"),
        F.when(F.col("m.sum").isNotNull(), F.lit("sum"))
        .otherwise(F.lit("gauge"))
        .alias("metric_kind"),
        F.explode(
            F.coalesce("m.sum.dataPoints", "m.gauge.dataPoints")
        ).alias("dp"),
    )
    inst = F.coalesce(
        dp["resource_attrs"].getItem("service.instance.id"),
        dp["resource_attrs"].getItem("mysql.instance.endpoint"),
        dp["resource_attrs"].getItem("postgresql.instance.endpoint"),
    )
    db_system = F.coalesce(
        dp["resource_attrs"].getItem("db.system"),
        F.when(F.col("metric_name").startswith("mysql."), F.lit("mysql")).when(
            F.col("metric_name").startswith("postgresql."), F.lit("postgresql")
        ),
    )
    return dp.select(
        F.timestamp_micros(
            F.expr("try_cast(dp.timeUnixNano AS BIGINT) div 1000")
        ).alias("time"),
        inst.alias("instance_id"),
        db_system.alias("db_system"),
        "metric_name",
        "metric_kind",
        "unit",
        F.col("dp.asInt").try_cast("long").alias("metric_value_int"),
        F.coalesce(
            F.col("dp.asDouble"), F.col("dp.asInt").try_cast("double")
        ).alias("metric_value_double"),
        "resource_attrs",
        _attrs_to_map(F.col("dp.attributes")).alias("point_attrs"),
    )


def to_metrics_long(parsed: DataFrame) -> DataFrame:
    """Receiver output → the metrics_db long shape analytics consume
    (time, instance_id, db_system, metric_name, metric_value)."""
    return parsed.select(
        "time",
        "instance_id",
        "db_system",
        "metric_name",
        F.coalesce(
            F.col("metric_value_double"),
            F.col("metric_value_int").cast("double"),
        ).alias("metric_value"),
    )
